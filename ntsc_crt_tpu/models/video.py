"""Video-sequence pipeline: lax.scan over frames with explicit CRT state.

Equivalent of the reference's video batch driver (extra/video_convert.c:
246-277), which processes frames strictly sequentially with cross-frame
state (field/frame parity, sync estimates, ccf EMA, PRNG streams, blend
buffer).  Two TPU execution modes (SURVEY.md §5):

* ``video_exact`` — a lax.scan over frames preserves the reference's
  frame-to-frame semantics bit-for-bit; throughput bounded by the serial
  chain but each step is the full batched-capable pipeline.
* ``video_strided`` — splits the sequence into B interleaved strides, one
  CRT state per stride, and scans the strides together as a batch.  Each
  stride is an exact CRT emulation of its sub-video; cross-frame state does
  not flow between strides (the documented throughput-mode divergence).

Also provides the live-loop phosphor fade (crt_main.c:437-452) and the
analog-signal dump (crt_main.c:257-268) as pure ops.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from ntsc_crt_tpu.models.systems import SystemConfig
from ntsc_crt_tpu.models import pipeline
from ntsc_crt_tpu.models.demodulate import MonitorParams


def _parities(n_frames: int, progressive: bool):
    """field/frame parity sequences of the video driver
    (extra/video_convert.c:261-267): field ^= 1 each frame; frame ^= 1
    after every even-indexed frame."""
    import numpy as np
    field = np.zeros(n_frames, np.int32)
    frame = np.zeros(n_frames, np.int32)
    f = fr = 0
    for i in range(n_frames):
        field[i], frame[i] = f, fr
        if not progressive:
            f ^= 1
            if (i & 1) == 0:
                fr ^= 1
    return field, frame


def video_exact(cfg: SystemConfig, state: pipeline.CRTState,
                frames: jax.Array, *, noise=0,
                mon: Optional[MonitorParams] = None,
                progressive: bool = False, hue=0, out_transform=None,
                **step_kw):
    """Sequential scan over T frames; state flows exactly like the C driver.
    frames: uint8 (T, h, w, 3) (or (T, h, w) uint16 for NES).
    Extra keyword args (do_bloom, eq_mode, do_vsync/do_hsync,
    draw_border/border_color, do_aberration, v_fac, ...) forward to
    pipeline.step, so every build-variant mode is reachable from the video
    surface.  Returns (state', outs uint8 (T, outh, outw, 3)).

    ``out_transform`` (optional) maps each frame's decoded image INSIDE the
    scan body before stacking — streaming consumers (checksums, per-frame
    downsampling/metrics) avoid materializing all T full frames in HBM,
    which matters at T in the hundreds (a 1024-frame 640x480 RGB stack is
    ~0.9 GB)."""
    mon = mon or MonitorParams()
    T = frames.shape[0]
    fseq, frseq = _parities(T, progressive or cfg.progressive)
    fseq = jnp.asarray(fseq)
    frseq = jnp.asarray(frseq)
    dcos = jnp.arange(T, dtype=jnp.int32) % max(cfg.cc_vper, 1)

    def body(st, xs):
        img, fi, fr, dc = xs
        st = pipeline.step(cfg, st, img, field=fi, frame=fr, hue=hue,
                           noise=noise, mon=mon, dot_crawl_offset=dc,
                           **step_kw)
        return st, (st.out if out_transform is None
                    else out_transform(st.out))

    return lax.scan(body, state, (frames, fseq, frseq, dcos))


def video_strided(cfg: SystemConfig, states: pipeline.CRTState,
                  frames: jax.Array, *, noise=0,
                  mon: Optional[MonitorParams] = None,
                  progressive: bool = False, hue=0, out_transform=None,
                  **step_kw):
    """Throughput mode: frames (T, ...) with T = B * k are processed as B
    interleaved strides (slot b handles frames b, b+B, b+2B, ...), each
    stride carrying its own CRTState.  states: batched CRTState (B slots).
    Extra keyword args forward to pipeline.step (see video_exact).
    Returns (states', outs (T, outh, outw, 3)) in original frame order.
    ``out_transform`` folds each chunk's frames inside the scan body (see
    video_exact) — with it, outs is (k, ...transformed...) instead."""
    mon = mon or MonitorParams()
    B = states.analog.shape[0]
    T = frames.shape[0]
    assert T % B == 0, "frame count must be a multiple of the slot count"
    k = T // B
    fseq, frseq = _parities(k, progressive or cfg.progressive)
    fseq = jnp.asarray(fseq)
    frseq = jnp.asarray(frseq)
    dcos = jnp.arange(k, dtype=jnp.int32) % max(cfg.cc_vper, 1)

    # (T, ...) -> (k, B, ...): stride b sees frames [b, b+B, ...]
    chunked = frames.reshape(k, B, *frames.shape[1:])

    def body(st, xs):
        imgs, fi, fr, dc = xs
        st = pipeline.step(cfg, st, imgs,
                           field=jnp.broadcast_to(fi, (B,)),
                           frame=jnp.broadcast_to(fr, (B,)),
                           hue=hue, noise=noise, mon=mon,
                           dot_crawl_offset=jnp.broadcast_to(dc, (B,)),
                           **step_kw)
        return st, (st.out if out_transform is None
                    else out_transform(st.out))

    states, outs = lax.scan(body, states, (chunked, fseq, frseq, dcos))
    if out_transform is not None:
        return states, outs
    return states, outs.reshape(T, *outs.shape[2:])


def fade_phosphors(out: jax.Array) -> jax.Array:
    """Persistence emulation over the output buffer (crt_main.c:437-452):
    per channel c -> (c>>1)+(c>>2)+(c>>3)+(c>>4)."""
    c = jnp.asarray(out, jnp.int32)
    return ((c >> 1) + (c >> 2) + (c >> 3) + (c >> 4)).astype(jnp.uint8)


def analog_dump(cfg: SystemConfig, analog: jax.Array) -> jax.Array:
    """Render the modulated composite signal as a grayscale image
    (the CLI's -a flag, crt_main.c:257-268)."""
    norm = (jnp.asarray(analog, jnp.int32) + 128).astype(jnp.uint8)
    return jnp.stack([norm] * 3, axis=-1)
