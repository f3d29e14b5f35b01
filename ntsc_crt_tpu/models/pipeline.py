"""CRT state pytree and the modulate->demodulate frame step.

The reference's entire runtime state is `struct CRT` (crt_core.h:74-92).
Here that state is an explicit, immutable pytree threaded through pure
functions — trivially serializable (checkpoint/resume of a video pipeline is
a jnp save) and shardable over a device mesh (parallel/).

The compute cores are **batch-first** (a leading frame-batch dim on every
tensor, no vmap — see models/modulate.py).  This module accepts either a
batched state (analog (B, VRES, HRES)) or a single-frame state
(analog (VRES, HRES)), lifting the latter to a batch of one.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import SystemConfig
from ntsc_crt_tpu.models import modulate as _mod
from ntsc_crt_tpu.models import demodulate as _dem
from ntsc_crt_tpu.models.demodulate import MonitorParams


class CRTState(NamedTuple):
    """Persistent cross-frame decoder/encoder state (crt_core.h:74-92)."""
    analog: jax.Array         # int8 [B,] VRES, HRES — modulated signal
    out: jax.Array            # uint8 [B,] outh, outw, 3 — canonical RGB
    ccf: jax.Array            # int32 [B,] cc_vper, cc_samples — carrier EMA
    hsync: jax.Array          # int32 [B]
    vsync: jax.Array          # int32 [B]
    rn: jax.Array             # int32 [B] — noise LCG state
    randstate: jax.Array      # int32 [B] — crt_rand state (VHS paths)


def crt_init(cfg: SystemConfig, outw: int, outh: int,
             rand_seed: int = 1, batch: Optional[int] = None) -> CRTState:
    """Fresh zeroed state; rn seeded to 194 like crt_init (crt_core.c:269).
    batch=None gives a single-frame state (no leading batch dim)."""
    state = CRTState(
        analog=jnp.zeros((cfg.vres, cfg.hres), jnp.int8),
        out=jnp.zeros((outh, outw, 3), jnp.uint8),
        ccf=jnp.zeros((cfg.cc_vper, cfg.cc_samples), jnp.int32),
        hsync=jnp.zeros((), jnp.int32),
        vsync=jnp.zeros((), jnp.int32),
        rn=jnp.full((), 194, jnp.int32),
        randstate=jnp.full((), rand_seed, jnp.int32),
    )
    if batch is not None:
        state = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (batch,) + x.shape), state)
    return state


def crt_resize(cfg: SystemConfig, state: CRTState, outw: int,
               outh: int) -> CRTState:
    """Change the output geometry while keeping all signal state
    (crt_resize, crt_core.c:241-248 — the out buffer is caller-owned in the
    reference; here it is part of the pytree and gets re-allocated)."""
    batch = state.analog.shape[:-2]
    return state._replace(
        out=jnp.zeros(batch + (outh, outw, 3), jnp.uint8))


def _lift(state: CRTState, img):
    """(state, img, batched?) with a guaranteed leading batch dim."""
    if state.analog.ndim == 3:
        return state, img, True
    state = jax.tree.map(lambda x: x[None], state)
    return state, (img[None] if img is not None else None), False


def _unlift(state: CRTState, batched: bool) -> CRTState:
    if batched:
        return state
    return jax.tree.map(lambda x: x[0], state)


def modulate(cfg: SystemConfig, state: CRTState, img: jax.Array, *,
             field=0, frame=0, hue=0, as_color=1, xoffset=0, yoffset=0,
             black_point=0, white_point=100, raw: bool = False,
             dot_crawl_offset=0, do_aberration=0,
             do_bloom: bool = False,
             border_color=0, draw_border: bool = False,
             optimized: bool = True) -> CRTState:
    """Encode one frame (or batch of frames) into the analog buffer.
    Dispatches to the per-system encoder family like the reference's
    CRT_SYSTEM compile switch (crt_core.h:38-59)."""
    state, img, batched = _lift(state, img)
    if cfg.name.startswith("NTSCVHS"):
        analog, ccf, randstate = _mod.modulate_vhs(
            cfg, state.analog, img, state.randstate, field=field, frame=frame,
            hue=hue, as_color=as_color, xoffset=xoffset, yoffset=yoffset,
            black_point=black_point, white_point=white_point, raw=raw,
            do_aberration=do_aberration, do_bloom=do_bloom)
        # reset hsync each frame so only the bottom warps (crt_ntscvhs.c:258)
        state = state._replace(analog=analog, ccf=ccf, randstate=randstate,
                               hsync=jnp.zeros_like(state.hsync))
        return _unlift(state, batched)
    if cfg.name == "NES":
        analog, ccf = _mod.modulate_nes(
            cfg, state.analog, img, hue=hue, dot_crawl_offset=dot_crawl_offset,
            xoffset=xoffset, yoffset=yoffset,
            black_point=black_point, white_point=white_point,
            border_color=border_color, draw_border=draw_border,
            optimized=optimized)
    elif cfg.name == "NESRGB":
        analog, ccf = _mod.modulate_nesrgb(
            cfg, state.analog, img, hue=hue, dot_crawl_offset=dot_crawl_offset,
            xoffset=xoffset, yoffset=yoffset,
            black_point=black_point, white_point=white_point)
    elif cfg.cc_vper > 1:  # SNES / TEMPLATE / PV1K
        analog, ccf = _mod.modulate_vper(
            cfg, state.analog, img, field=field, frame=frame, hue=hue,
            as_color=as_color, xoffset=xoffset, yoffset=yoffset,
            black_point=black_point, white_point=white_point, raw=raw,
            dot_crawl_offset=dot_crawl_offset, do_bloom=do_bloom)
    else:  # NTSC
        analog, ccf = _mod.modulate_rgb(
            cfg, state.analog, img, field=field, frame=frame, hue=hue,
            as_color=as_color, xoffset=xoffset, yoffset=yoffset,
            black_point=black_point, white_point=white_point, raw=raw,
            do_bloom=do_bloom)
    return _unlift(state._replace(analog=analog, ccf=ccf), batched)


def demodulate(cfg: SystemConfig, state: CRTState, noise=0,
               mon: Optional[MonitorParams] = None, *,
               v_fac: int = 0, eq_mode: str = "threeband",
               do_bloom: bool = False,
               do_vsync: bool = True, do_hsync: bool = True) -> CRTState:
    """Decode the analog buffer into the output image (crt_demodulate).
    eq_mode: "threeband" (default) or "conv7"/"conv6"/"conv5"/"conv4" for
    the reference's USE_CONVOLUTION filter builds.  do_vsync/do_hsync=False
    reproduce the CRT_DO_VSYNC/CRT_DO_HSYNC=0 builds (fixed sync positions,
    crt_core.h:71-72)."""
    mon = mon or MonitorParams()
    state, _, batched = _lift(state, None)
    out, new = _dem.demodulate_core(
        cfg, state.analog, state.out, state.hsync, state.vsync, state.ccf,
        state.rn, noise, mon, randstate=state.randstate, v_fac=v_fac,
        eq_mode=eq_mode, do_bloom=do_bloom,
        do_vsync=do_vsync, do_hsync=do_hsync)
    randstate = new["randstate"]
    if randstate is None:
        randstate = state.randstate
    state = state._replace(out=out, ccf=new["ccf"], hsync=new["hsync"],
                           vsync=new["vsync"], rn=new["rn"],
                           randstate=randstate)
    return _unlift(state, batched)


def step(cfg: SystemConfig, state: CRTState, img: jax.Array, *,
         field=0, frame=0, hue=0, noise=0,
         mon: Optional[MonitorParams] = None,
         as_color=1, raw: bool = False,
         dot_crawl_offset=0, do_aberration=0, v_fac: int = 0,
         do_bloom: bool = False, eq_mode: str = "threeband",
         do_vsync: bool = True, do_hsync: bool = True,
         border_color=0, draw_border: bool = False,
         optimized: bool = True) -> CRTState:
    """modulate + demodulate: one full frame through the composite path.

    black_point/white_point live in the monitor state in the reference
    (crt_core.h:83) and are read by BOTH the encoder (crt_ntsc.c:311,318)
    and decoder (crt_core.c:305), so they come from `mon` here.
    v_fac is the vertical stretch factor (crt_core.h:86) — a static
    trace-time int like the output geometry.

    The reference's compile-time build variants are static kwargs here:
    do_bloom (CRT_DO_BLOOM, crt_core.h:70), eq_mode (USE_CONVOLUTION,
    crt_core.c:85-147), do_vsync/do_hsync (crt_core.h:71-72),
    draw_border/border_color (NES_BORDER, crt_nes.c:69), optimized
    (NES_OPTIMIZED, crt_nes.c:63).
    """
    mon = mon or MonitorParams()
    state = modulate(cfg, state, img, field=field, frame=frame, hue=hue,
                     as_color=as_color,
                     black_point=mon.black_point, white_point=mon.white_point,
                     raw=raw, dot_crawl_offset=dot_crawl_offset,
                     do_aberration=do_aberration, do_bloom=do_bloom,
                     border_color=border_color, draw_border=draw_border,
                     optimized=optimized)
    return demodulate(cfg, state, noise=noise, mon=mon, v_fac=v_fac,
                      eq_mode=eq_mode, do_bloom=do_bloom,
                      do_vsync=do_vsync, do_hsync=do_hsync)
