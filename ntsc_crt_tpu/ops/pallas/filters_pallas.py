"""Pallas TPU kernels for the serial-in-x integer filter recurrences.

The reference's filters (1-pole IIR crt_ntsc.c:117-126, 3-band EQ
crt_core.c:206-233) apply per-sample truncating integer rounding, so the
recurrence must march x serially.  The TPU-native layout turns the batch of
independent recurrences (frames x scanlines x channels) into the *vector*
dimension: rows live on (sublane, lane) tiles and every serial step is a
handful of full-width VPU ops.

Layout: input transposed to (T, R) and blocked as (TB, S, 128):
  grid = (R / (S*128), T / TB)   -- row-blocks outer, time-blocks inner
  filter state persists across time-blocks in VMEM scratch and resets at
  t-block 0 (the reference resets state per scanline; a row IS a scanline
  here, so reset-at-zero is exactly the per-line reset).

Within a time-block the loop is chunked: K serial steps are unrolled per
fori_loop iteration around one (K, S, 128) vector load/store — loop-iteration
overhead dominates at K=1, so amortizing it across K steps and S*128 rows is
the main throughput lever.

All arithmetic is int32 with wrap — identical bits to the scan path in
ops/filters.py (tested interpret-mode against it).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from ntsc_crt_tpu.ops.pallas.tiling import shrink_sub

from ntsc_crt_tpu.ops.filters import EQ_P, EQ_R
from ntsc_crt_tpu.ops.fixedpoint import EXP_P

LANE = 128
# tuned on TPU v5e (see bench history): sublanes per block, serial unroll,
# time-block size
EQ_SUB, EQ_K, EQ_TB = 16, 32, 256
IIR_SUB, IIR_K, IIR_TB = 16, 32, 256


def _eq_kernel(x_ref, lf_ref, hf_ref, g0_ref, g1_ref, g2_ref, y_ref, st_ref,
               *, K: int):
    """One (TB, S, 128) time-block of the 3-band EQ for S*128 rows.

    st_ref: (11, S, 128) VMEM scratch — fL[0..3], fH[0..3], h[0..2]."""
    tblk = pl.program_id(1)

    @pl.when(tblk == 0)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    lf = lf_ref[0]
    hf = hf_ref[0]
    g0 = g0_ref[0]
    g1 = g1_ref[0]
    g2 = g2_ref[0]

    def body(tb, carry):
        fL0, fL1, fL2, fL3, fH0, fH1, fH2, fH3, h0, h1, h2 = carry
        chunk = x_ref[pl.ds(tb * K, K)]
        outs = []
        for j in range(K):
            sx = chunk[j]
            fL0 = fL0 + ((lf * (sx - fL0) + EQ_R) >> EQ_P)
            fH0 = fH0 + ((hf * (sx - fH0) + EQ_R) >> EQ_P)
            fL1 = fL1 + ((lf * (fL0 - fL1) + EQ_R) >> EQ_P)
            fH1 = fH1 + ((hf * (fH0 - fH1) + EQ_R) >> EQ_P)
            fL2 = fL2 + ((lf * (fL1 - fL2) + EQ_R) >> EQ_P)
            fH2 = fH2 + ((hf * (fH1 - fH2) + EQ_R) >> EQ_P)
            fL3 = fL3 + ((lf * (fL2 - fL3) + EQ_R) >> EQ_P)
            fH3 = fH3 + ((hf * (fH2 - fH3) + EQ_R) >> EQ_P)
            outs.append(((fL3 * g0) >> EQ_P)
                        + (((fH3 - fL3) * g1) >> EQ_P)
                        + (((h2 - fH3) * g2) >> EQ_P))
            h2, h1, h0 = h1, h0, sx
        y_ref[pl.ds(tb * K, K)] = jnp.stack(outs)
        return fL0, fL1, fL2, fL3, fH0, fH1, fH2, fH3, h0, h1, h2

    init = tuple(st_ref[i] for i in range(11))
    final = lax.fori_loop(0, x_ref.shape[0] // K, body, init)
    for i in range(11):
        st_ref[i] = final[i]


def _iir_kernel(x_ref, c_ref, y_ref, st_ref, *, K: int):
    """One time-block of h += (s - h) * c >> 11 (crt_ntsc.c:117-126)."""
    tblk = pl.program_id(1)

    @pl.when(tblk == 0)
    def _():
        st_ref[...] = jnp.zeros_like(st_ref)

    c = c_ref[0]

    def body(tb, h):
        chunk = x_ref[pl.ds(tb * K, K)]
        outs = []
        for j in range(K):
            h = h + (((chunk[j] - h) * c) >> EXP_P)
            outs.append(h)
        y_ref[pl.ds(tb * K, K)] = jnp.stack(outs)
        return h

    st_ref[0] = lax.fori_loop(0, x_ref.shape[0] // K, body, st_ref[0])


def _run_rowwise(kernel, n_state: int, x_rows: jax.Array,
                 coef_rows: list[jax.Array], *, sub: int, k: int,
                 t_block: int, interpret: bool = False) -> jax.Array:
    """Shared driver: x_rows (R, T) int32, coefs each (R,) int32 -> (R, T).

    Pads R to a sub*LANE multiple and T to a t_block multiple, runs the
    2D-grid pallas_call, and slices the result back.
    """
    R, T = x_rows.shape
    sub = shrink_sub(R, sub, LANE)  # shrink block height for small-batch runs
    rows_blk = sub * LANE
    assert t_block % k == 0
    Rp = -(-R // rows_blk) * rows_blk
    Tp = -(-T // t_block) * t_block
    x = jnp.zeros((Rp, Tp), jnp.int32).at[:R, :T].set(x_rows)
    coefs = [jnp.zeros((Rp,), jnp.int32).at[:R].set(c) for c in coef_rows]

    xT = x.T.reshape(Tp, Rp // rows_blk, sub, LANE).swapaxes(0, 1)
    # xT: (RB, Tp, S, 128) — row-block major so each grid cell is contiguous
    cs = [c.reshape(Rp // rows_blk, 1, sub, LANE) for c in coefs]

    grid = (Rp // rows_blk, Tp // t_block)
    body = functools.partial(kernel, K=k)

    def squeezed(*refs):
        scratch = refs[-1]
        body(*[r.at[0] for r in refs[:-1]], scratch)

    out = pl.pallas_call(
        squeezed,
        grid=grid,
        in_specs=[pl.BlockSpec((1, t_block, sub, LANE),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec((1, 1, sub, LANE), lambda i, j: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)] * len(cs),
        out_specs=pl.BlockSpec((1, t_block, sub, LANE),
                               lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Rp // rows_blk, Tp, sub, LANE),
                                       jnp.int32),
        scratch_shapes=[pltpu.VMEM((n_state, sub, LANE), jnp.int32)],
        interpret=interpret,
    )(xT, *cs)

    y = out.swapaxes(0, 1).reshape(Tp, Rp).T
    return y[:R, :T]


@functools.partial(jax.jit,
                   static_argnames=("sub", "k", "t_block", "interpret"))
def eq_threeband_rows(x_rows, lf, hf, g0, g1, g2, *, sub: int = EQ_SUB,
                      k: int = EQ_K, t_block: int = EQ_TB,
                      interpret: bool = False):
    """3-band EQ over independent rows: x_rows (R, T), coefs (R,)."""
    return _run_rowwise(_eq_kernel, 11, x_rows, [lf, hf, g0, g1, g2],
                        sub=sub, k=k, t_block=t_block, interpret=interpret)


@functools.partial(jax.jit,
                   static_argnames=("sub", "k", "t_block", "interpret"))
def iir_lowpass_rows(x_rows, c, *, sub: int = IIR_SUB, k: int = IIR_K,
                     t_block: int = IIR_TB, interpret: bool = False):
    """1-pole IIR over independent rows: x_rows (R, T), c (R,)."""
    return _run_rowwise(_iir_kernel, 1, x_rows, [c],
                        sub=sub, k=k, t_block=t_block, interpret=interpret)
