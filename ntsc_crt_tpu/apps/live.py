"""Interactive real-time session — the library equivalent of the reference's
LIVE build (crt_main.c:284-557, controls.txt).

The reference wires keyboard callbacks to `struct CRT` fields and runs a
60 Hz modulate/demodulate loop with phosphor fade and interlace toggling.
Here the same loop is a host-side object holding the CRT state pytree and a
jitted step; `handle_key` implements the exact key map from controls.txt so
embedders (emulators, notebooks, a curses frontend) drive it directly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import SystemConfig
from ntsc_crt_tpu.models import pipeline, video
from ntsc_crt_tpu.models.demodulate import MonitorParams


@dataclasses.dataclass
class LiveSession:
    """60 Hz-style interactive loop state (crt_main.c:284-557)."""

    cfg: SystemConfig
    outw: int = 832
    outh: int = 624
    noise: int = 0
    hue: int = 0                 # artifact hue (encoder)
    monitor_hue: int = 0         # decoding hue (7/8 keys)
    brightness: int = 0
    contrast: int = 180
    saturation: int = 10
    black_point: int = 0
    white_point: int = 100
    blend: int = 0
    scanlines: int = 0
    color: bool = True
    raw: bool = False
    progressive: bool = False
    fadephos: bool = True
    field: int = 0
    frame: int = 0
    dot_crawl_offset: int = 0
    v_fac: int = 0               # vertical stretch (crt_core.h:86); static —
    #                              set at construction like outw/outh
    # build-variant modes (compile-time in the reference; static here —
    # set at construction, like v_fac, since the jitted step bakes them in):
    do_bloom: bool = False       # CRT_DO_BLOOM (crt_core.h:70)
    eq_mode: str = "threeband"   # USE_CONVOLUTION conv7/6/5/4 (crt_core.c:85)
    do_vsync: bool = True        # CRT_DO_VSYNC (crt_core.h:71)
    do_hsync: bool = True        # CRT_DO_HSYNC (crt_core.h:72)
    draw_border: bool = False    # NES_BORDER (crt_nes.c:69)
    border_color: int = 0
    optimized: bool = True       # NES_OPTIMIZED (crt_nes.c:63)

    def __post_init__(self):
        self.state = pipeline.crt_init(self.cfg, self.outw, self.outh)
        self._step = jax.jit(self._step_impl, static_argnames=("raw",))
        self._fast = jax.jit(self._fast_impl,
                             static_argnames=("raw", "progressive",
                                              "preview_hw"),
                             donate_argnums=(0, 1))
        self._imgj = None
        self._img_key = None
        self._knobs = None
        self._dirty = True
        self._loop = None

    def _mode_kw(self) -> dict:
        """Static build-variant kwargs forwarded to pipeline.step."""
        return dict(do_bloom=self.do_bloom, eq_mode=self.eq_mode,
                    do_vsync=self.do_vsync, do_hsync=self.do_hsync,
                    draw_border=self.draw_border,
                    border_color=self.border_color, optimized=self.optimized)

    def _mon(self) -> MonitorParams:
        return MonitorParams(
            hue=np.int32(self.monitor_hue),
            brightness=np.int32(self.brightness),
            contrast=np.int32(self.contrast),
            saturation=np.int32(self.saturation),
            black_point=np.int32(self.black_point),
            white_point=np.int32(self.white_point),
            blend=np.int32(self.blend),
            scanlines=np.int32(self.scanlines))

    def _step_impl(self, state, img, field, frame, hue, noise, as_color,
                   dco, mon, fade, *, raw):
        out_prev = jnp.where(fade, video.fade_phosphors(state.out),
                             jnp.zeros_like(state.out))  # crt_main.c:459-463
        state = state._replace(out=out_prev)
        return pipeline.step(self.cfg, state, img, field=field, frame=frame,
                             hue=hue, noise=noise, mon=mon, as_color=as_color,
                             raw=raw, dot_crawl_offset=dco,
                             v_fac=self.v_fac, **self._mode_kw())

    def tick(self, img) -> np.ndarray:
        """One display frame (displaycb, crt_main.c:454-497).
        img: (h, w, 3) uint8 RGB, or (h, w) uint16 PPU indices for NES."""
        if self.cfg.cc_vper > 1:
            self.dot_crawl_offset = (self.dot_crawl_offset + 1) % self.cfg.cc_vper
        if self.field == 0:
            self.frame ^= 1                       # crt_main.c:482-484
        self.state = self._step(
            self.state, jnp.asarray(img), np.int32(self.field),
            np.int32(self.frame), np.int32(self.hue), np.int32(self.noise),
            np.int32(1 if self.color else 0),
            np.int32(self.dot_crawl_offset), self._mon(),
            np.bool_(self.fadephos), raw=self.raw)
        if not (self.progressive or self.cfg.progressive):
            self.field ^= 1                       # crt_main.c:492-494
        return np.asarray(self.state.out)

    # ---- device-resident fast loop -------------------------------------
    # The tunneled TPU pays ~1-2 ms per host->device buffer; the naive tick
    # uploads the image plus ~15 scalars every frame (~80 ms/frame).  The
    # fast path keeps the image and a packed knob vector cached on device
    # (re-uploaded only when a key changes something), advances the
    # field/frame/dot-crawl progression ON device, and returns a
    # terminal-sized preview so only ~tens of KB come back per frame.

    _KNOBS = ("monitor_hue", "brightness", "contrast", "saturation",
              "black_point", "white_point", "blend", "scanlines",
              "fadephos", "hue", "noise", "color")

    def _knob_vec(self) -> np.ndarray:
        v = [int(getattr(self, k)) if k not in ("fadephos", "color")
             else int(bool(getattr(self, k))) for k in self._KNOBS]
        return np.asarray(v, np.int32)

    def _fast_impl(self, state, loop, imgj, knobs, *, raw, progressive,
                   preview_hw):
        field, frame, dco = loop[0], loop[1], loop[2]
        if self.cfg.cc_vper > 1:              # crt_main.c:466-488
            dco = (dco + 1) % self.cfg.cc_vper
        frame = jnp.where(field == 0, frame ^ 1, frame)  # crt_main.c:482-484
        mon = MonitorParams(
            hue=knobs[0], brightness=knobs[1], contrast=knobs[2],
            saturation=knobs[3], black_point=knobs[4], white_point=knobs[5],
            blend=knobs[6], scanlines=knobs[7])
        out_prev = jnp.where(knobs[8] != 0, video.fade_phosphors(state.out),
                             jnp.zeros_like(state.out))
        state = state._replace(out=out_prev)
        state = pipeline.step(self.cfg, state, imgj, field=field, frame=frame,
                              hue=knobs[9], noise=knobs[10], mon=mon,
                              as_color=knobs[11], raw=raw,
                              dot_crawl_offset=dco, v_fac=self.v_fac,
                              **self._mode_kw())
        if not (progressive or self.cfg.progressive):
            field = field ^ 1                 # crt_main.c:492-494
        loop = jnp.stack([field, frame, dco])
        if preview_hw is None:
            preview = state.out
        else:
            rows, cols = preview_hw
            h, w = self.outh, self.outw
            ph = min(2 * rows, h)
            pw = min(cols, w)
            preview = state.out[::max(1, h // ph)][:ph,
                                                   ::max(1, w // pw)][:, :pw]
        return state, loop, preview

    def tick_fast(self, img, preview_hw=None, fetch: bool = True):
        """One display frame with device-resident loop state.  `img` is
        cached by object identity — pass a NEW array for new content.
        preview_hw=(rows, cols) returns a strided-downsampled preview
        (top/bottom pixel pairs for half-block cells) instead of the full
        frame, minimizing the per-frame device->host fetch.  fetch=False
        returns the device array with an async host copy already issued —
        display loops double-buffer with it to overlap the link round trip
        (the tunneled TPU costs ~30 ms per SYNCHRONOUS fetch)."""
        if self._imgj is None or self._img_key != id(img):
            self._imgj = jnp.asarray(img)
            self._img_key = id(img)
        if self._dirty or self._knobs is None:
            self._knobs = jnp.asarray(self._knob_vec())
            self._dirty = False
        if self._loop is None:
            self._loop = jnp.asarray(
                [self.field, self.frame, self.dot_crawl_offset], np.int32)
        self.state, self._loop, preview = self._fast(
            self.state, self._loop, self._imgj, self._knobs,
            raw=self.raw, progressive=self.progressive,
            preview_hw=preview_hw)
        # python mirrors advance with the same rules (display only)
        if self.cfg.cc_vper > 1:
            self.dot_crawl_offset = (self.dot_crawl_offset + 1) % self.cfg.cc_vper
        if self.field == 0:
            self.frame ^= 1
        if not (self.progressive or self.cfg.progressive):
            self.field ^= 1
        if not fetch:
            try:
                preview.copy_to_host_async()
            except Exception:
                pass
            return preview
        return np.asarray(preview)

    def reset(self):
        """'r' — crt_reset defaults (crt_core.c:250-261)."""
        self.monitor_hue = 0
        self.saturation = 10
        self.brightness = 0
        self.contrast = 180
        self.black_point = 0
        self.white_point = 100
        self._dirty = True

    def handle_key(self, key: str):
        """The controls.txt key map (crt_main.c:310-435)."""
        k = key
        self._dirty = True                    # re-upload the knob vector
        if k in ("f", "e"):
            self._loop = None                 # field/progressive: resync
        if k == "q":
            self.black_point += 1
        elif k == "a":
            self.black_point -= 1
        elif k == "w":
            self.white_point += 1
        elif k == "s":
            self.white_point -= 1
        elif k == "r":
            self.reset()
        elif k == "f":
            self.field ^= 1
        elif k == "e":
            self.progressive = not self.progressive
        elif k == "t":
            self.raw = not self.raw
        elif k == "m":
            self.fadephos = not self.fadephos
        elif k == "g":
            self.scanlines ^= 1
        elif k == "b":
            self.blend ^= 1
        elif k == " ":
            self.color = not self.color
        elif k == "up":
            self.brightness += 1
        elif k == "down":
            self.brightness -= 1
        elif k == "right":
            self.contrast += 1
        elif k == "left":
            self.contrast -= 1
        elif k == "1":
            self.saturation -= 1
        elif k == "2":
            self.saturation += 1
        elif k == "3":
            self.noise = max(0, self.noise - 1)
        elif k == "4":
            self.noise += 1
        elif k == "5":
            self.hue = (self.hue - 1) % 360
        elif k == "6":
            self.hue = (self.hue + 1) % 360
        elif k == "7":
            self.monitor_hue = (self.monitor_hue - 1) % 360
        elif k == "8":
            self.monitor_hue = (self.monitor_hue + 1) % 360
