"""Fused encode kernel: per-line IIR bandlimit + quadrature carrier multiply
+ IRE scale/clamp, emitting int8 composite samples directly.

Covers every RGB-family encoder (the carrier tables arrive premultiplied by
the CC_PHASE sign / per-line vertical phase row, so NTSC, VHS, SNES-style and
NESRGB all reduce to the same kernel); the IIR coefficients are compile-time
constants (crt_ntsc.c:142-147 derives them from static config).  Inputs ride
int16 (RGB->YIQ of 8-bit pixels is < 2^11); output is the clamped 0..110 IRE
int8 block ready to scatter into the analog field — one third of the
unfused pipeline's HBM traffic and no intermediate materializations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ntsc_crt_tpu.ops.pallas.tiling import shrink_sub

from ntsc_crt_tpu.ops.fixedpoint import EXP_P

LANE = 128
SUB = 8


def _chunk(cc: int) -> int:
    """Serial unroll; multiple of the chroma period (in-chunk phase static).
    32 for 4-sample systems (measured best), 40 for 5-sample."""
    return 32 if cc == 4 else 40


def _make_kernel(T, coefs, xo_mod, cc, rgb, col_map=None):
    K = _chunk(cc)
    def kernel(fy_ref, fi_ref, fq_ref, mi_ref, mq_ref, gain_ref, base_ref,
               out_ref):
        gain = gain_ref[0]
        base = base_ref[0]
        zero = jnp.zeros_like(gain)

        def to_yiq(rA, gA, bA):
            if rgb:
                # refs carry the R/G/B u8 planes; RGB->YIQ happens
                # in-register (crt_ntsc.c:307-310) — skipping the s32 YIQ +
                # s16 convert HBM intermediates that were the 2nd-largest
                # kernel in the PV1K step profile
                sy = (19595 * rA + 38470 * gA + 7471 * bA) >> 14
                si = (39059 * rA - 18022 * gA - 21103 * bA) >> 14
                sq = (13894 * rA - 34275 * gA + 20382 * bA) >> 14
                return sy, si, sq
            return rA, gA, bA

        def sample(t, sy, si, sq, carry):
            hy, hi, hq = carry
            if coefs is not None:
                cY, cI, cQ = coefs
                hy = hy + (((sy - hy) * cY) >> EXP_P)      # crt_ntsc.c:117-126
                hi = hi + (((si - hi) * cI) >> EXP_P)
                hq = hq + (((sq - hq) * cQ) >> EXP_P)
                vy, vi, vq = hy, hi, hq
            else:
                vy, vi, vq = sy, si, sq                    # CRT_DO_BANDLIMITING 0
            ph = (t + xo_mod) % cc                         # static per sample
            vi = (vi * mi_ref[ph]) >> 4                    # crt_ntsc.c:316-317
            vq = (vq * mq_ref[ph]) >> 4
            ire = base + (((vy + vi + vq) * gain) >> 10)
            return (hy, hi, hq), jnp.clip(ire, 0, 110).astype(jnp.int8)

        if col_map is not None:
            # In-kernel nearest-neighbor column resample: the reference's
            # sx = x * w / destw source map (crt_ntsc.c:296-305) is a
            # trace-time constant, so the refs hold the NARROW (w-wide)
            # image rows and each destination sample is a static-index VMEM
            # read — the wide resampled planes (90 MB each at PV1K/256),
            # the one-hot resample matmuls and every relayout copy between
            # them and this kernel never exist.  The loop is python-unrolled
            # (static indices need concrete t); upsampling repeats sources
            # ~destw/w times, so the load + RGB->YIQ of a repeated source is
            # computed once and reused.
            carry = (zero, zero, zero)
            last_src = None
            sy = si = sq = None
            for tb in range(T // K):
                outs = []
                for j in range(K):
                    t = tb * K + j
                    src = col_map[min(t, len(col_map) - 1)]
                    if src != last_src:
                        sy, si, sq = to_yiq(fy_ref[src].astype(jnp.int32),
                                            fi_ref[src].astype(jnp.int32),
                                            fq_ref[src].astype(jnp.int32))
                        last_src = src
                    carry, o = sample(t, sy, si, sq, carry)
                    outs.append(o)
                out_ref[pl.ds(tb * K, K)] = jnp.stack(outs)
            return

        def chunk(tb, carry):
            ry = fy_ref[pl.ds(tb * K, K)]
            ri = fi_ref[pl.ds(tb * K, K)]
            rq = fq_ref[pl.ds(tb * K, K)]
            outs = []
            for j in range(K):
                sy, si, sq = to_yiq(ry[j].astype(jnp.int32),
                                    ri[j].astype(jnp.int32),
                                    rq[j].astype(jnp.int32))
                # in-chunk phase is static: K % cc == 0, so j == t (mod cc)
                carry, o = sample(j, sy, si, sq, carry)
                outs.append(o)
            out_ref[pl.ds(tb * K, K)] = jnp.stack(outs)
            return carry

        lax.fori_loop(0, T // K, chunk, (zero, zero, zero))

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("coefs", "xo_mod", "rgb", "interpret",
                                    "col_map"))
def encode_fused_rows(fy, fi, fq, modI, modQ, gain, base, *,
                      coefs, xo_mod: int, rgb: bool = False,
                      interpret: bool = False, col_map=None):
    """fy/fi/fq: int16 (R, T) YIQ — or, with rgb=True, the uint8 R/G/B
    planes (RGB->YIQ runs in-kernel); modI/modQ: int32 (R, cc) carrier
    tables (premultiplied by any phase sign, cc = 4 or 5 chroma samples);
    gain/base: int32 (R,).  coefs: (cY, cI, cQ) python ints or None.
    xo_mod: static (xo % cc).  Returns clamped IRE int8 (R, T).

    col_map (static tuple of ints, optional): in-kernel nearest-neighbor
    column resample — fy/fi/fq are then the NARROW (R, w) source rows and
    the output is (R, len(col_map)) with sample t sourced from column
    col_map[t] (the reference's x*w/destw map, crt_ntsc.c:296-305)."""
    R, w_in = fy.shape
    T = w_in if col_map is None else len(col_map)
    cc = modI.shape[-1]
    K = _chunk(cc)
    Tp = -(-T // K) * K
    # shrink the block height when R is small (batch-1 live runs: 236 rows)
    sub = shrink_sub(R, SUB, LANE)
    rows_blk = sub * LANE
    Rp = -(-R // rows_blk) * rows_blk
    RB = Rp // rows_blk

    def tiles(x, n, dtype):
        xp = jnp.zeros((Rp, n), dtype).at[:R].set(x.reshape(R, n).astype(dtype))
        return xp.T.reshape(n, RB, sub, LANE).swapaxes(0, 1)

    in_dt = jnp.uint8 if rgb else jnp.int16
    if col_map is None:
        W = Tp
        padw = Tp - T
    else:
        W = w_in             # stage the narrow source rows as-is
        padw = 0
    fyt = tiles(jnp.pad(jnp.asarray(fy, in_dt), ((0, 0), (0, padw))),
                W, in_dt)
    fit = tiles(jnp.pad(jnp.asarray(fi, in_dt), ((0, 0), (0, padw))),
                W, in_dt)
    fqt = tiles(jnp.pad(jnp.asarray(fq, in_dt), ((0, 0), (0, padw))),
                W, in_dt)
    mi = tiles(modI, cc, jnp.int32)
    mq = tiles(modQ, cc, jnp.int32)
    g = tiles(gain, 1, jnp.int32)
    b = tiles(base, 1, jnp.int32)

    kern = _make_kernel(Tp, coefs, xo_mod, cc, rgb, col_map=col_map)

    def body(*refs):
        f1, f2, f3, m1, m2, gg, bb, out = refs
        kern(f1.at[0], f2.at[0], f3.at[0], m1.at[0], m2.at[0],
             gg.at[0], bb.at[0], out.at[0])

    spec = lambda n: pl.BlockSpec((1, n, sub, LANE), lambda i: (i, 0, 0, 0),
                                  memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        body,
        grid=(RB,),
        in_specs=[spec(W)] * 3 + [spec(cc)] * 2 + [spec(1)] * 2,
        out_specs=spec(Tp),
        out_shape=jax.ShapeDtypeStruct((RB, Tp, sub, LANE), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            # PV1K rows are 1520 wide (~18 MB scoped); default elsewhere
            vmem_limit_bytes=(28 if Tp > 1024 else 16) * 1024 * 1024),
        interpret=interpret,
    )(fyt, fit, fqt, mi, mq, g, b)

    return out.swapaxes(0, 1).reshape(Tp, Rp).T[:R, :T]
