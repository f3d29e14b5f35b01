"""Fused scan-conversion Pallas kernel: fixed-point lerp + YIQ->RGB +
contrast + clamp + byte-packing in one VMEM pass.

The scan-conversion source indices are static (pos = p*dx with dx fixed by
(av_len, outw), crt_core.c:528-532), so each output pixel reads two static
rows of the time-major EQ output.  The kernel keeps a full (T, S, 128) tile
of each YIQ channel in VMEM and emits packed 0x00RRGGBB int32 — one read and
one small write per element instead of the matmul formulation's 12x-blown
limb products.

Layout matches ops/pallas/filters_pallas.py: rows = frames x lines ride the
(sublane, lane) axes, time-major."""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ntsc_crt_tpu.ops.pallas.tiling import shrink_sub

from ntsc_crt_tpu.ops.fastpath import lerp_resample_weights

LANE = 128
SUB = 4  # rows per block = SUB * LANE (VMEM: 3 in + 1 out tiles, double-buffered)


def _kernel(oy_ref, oi_ref, oq_ref, ct_ref, out_ref, *, smap):
    """smap: static list of (s, L, R) per output pixel."""
    contrast = ct_ref[0]
    for p, (s, Lw, Rw) in enumerate(smap):
        ya, yb = oy_ref[s], oy_ref[s + 1]
        ia, ib = oi_ref[s], oi_ref[s + 1]
        qa, qb = oq_ref[s], oq_ref[s + 1]
        y = ((ya * Lw) >> 2) + ((yb * Rw) >> 2)          # crt_core.c:568
        i = ((ia * Lw) >> 14) + ((ib * Rw) >> 14)
        q = ((qa * Lw) >> 14) + ((qb * Rw) >> 14)
        r = (((y + 3879 * i + 2556 * q) >> 12) * contrast) >> 8
        g = (((y - 1126 * i - 2605 * q) >> 12) * contrast) >> 8
        b = (((y - 4530 * i + 7021 * q) >> 12) * contrast) >> 8
        r = jnp.clip(r, 0, 255)
        g = jnp.clip(g, 0, 255)
        b = jnp.clip(b, 0, 255)
        out_ref[p] = (r << 16) | (g << 8) | b


@functools.partial(jax.jit, static_argnames=("outw", "interpret"))
def scanconv_rows(oy, oi, oq, contrast, *, outw: int, interpret: bool = False):
    """oy/oi/oq: int32 (R, T); contrast: int32 (R,).
    Returns packed RGB int32 (R, outw) = r<<16 | g<<8 | b, clamped."""
    R, T = oy.shape
    s, L, Rw = lerp_resample_weights(T, outw)
    smap = [(int(s[p]), int(L[p]), int(Rw[p])) for p in range(outw)]

    # shrink the block height when R is small (batch-1 live runs)
    sub = shrink_sub(R, SUB, LANE)
    rows_blk = sub * LANE
    Rp = -(-R // rows_blk) * rows_blk

    def to_tiles(x):
        xp = jnp.zeros((Rp, T), jnp.int32).at[:R].set(x)
        # (RB, T+1, S, 128): one zero row appended so s+1 at T-1 is in range
        t = xp.T.reshape(T, Rp // rows_blk, sub, LANE).swapaxes(0, 1)
        pad = jnp.zeros((Rp // rows_blk, 1, sub, LANE), jnp.int32)
        return jnp.concatenate([t, pad], axis=1)

    oyt, oit, oqt = to_tiles(oy), to_tiles(oi), to_tiles(oq)
    ct = jnp.zeros((Rp,), jnp.int32).at[:R].set(contrast)
    ct = ct.reshape(Rp // rows_blk, 1, sub, LANE)

    def body(*refs):
        oy_r, oi_r, oq_r, ct_r, out_r = refs
        _kernel(oy_r.at[0], oi_r.at[0], oq_r.at[0], ct_r.at[0], out_r.at[0],
                smap=smap)

    out = pl.pallas_call(
        body,
        grid=(Rp // rows_blk,),
        in_specs=[pl.BlockSpec((1, T + 1, sub, LANE), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * 3 +
                 [pl.BlockSpec((1, 1, sub, LANE), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, outw, sub, LANE), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp // rows_blk, outw, sub, LANE),
                                       jnp.int32),
        interpret=interpret,
    )(oyt, oit, oqt, ct)

    return out.swapaxes(0, 1).reshape(outw, Rp).T[:R]
