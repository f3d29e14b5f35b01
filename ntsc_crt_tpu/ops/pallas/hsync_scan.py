"""Pallas TPU kernel for the serial hsync chase (crt_core.c:434-450).

The demodulator probes ONE 16-sample window per line at the running hsync
estimate; the estimate chains line to line, so the loop is irreducibly
serial across the ~240 active lines.  The XLA formulation
(models/demodulate.py::_line_scan hstep) runs it as a lax.scan whose ~20
small ops per line are dispatch-overhead-bound: ~1.75 ms/step on a v5e —
one of the two structural residuals named in docs/PERF.md.

This kernel runs the same chase with the BATCH on (sublane, lane) tiles and
the padded sample axis as the block-major dim, one grid step per line:

* the running hsync estimate lives in VMEM scratch across grid steps (the
  TPU grid is sequential), so the 240-step chain costs zero dispatches;
* each line's probe window is pulled out by the same block-rebase +
  residual-gated funnel as ops/pallas/decode_fused.py: one dynamic-offset
  copy at the batch-min window base (a scalar major-dim slice — free in
  this tiling) plus masked funnel passes over the residual, each pass
  gated on the residual max actually needing that bit.  In steady state
  the chase is locked (residual ~jitter), so ~log2(jitter) passes live;
* the 16-sample threshold scan (first window position whose running sum
  drops below thresh, fall-through j == 2W, crt_core.c:440-445) unrolls
  into ~4 VPU ops per sample.

Bit-exactness: identical integer ops to the scan path; pinned against it in
interpret mode (tests/test_pallas_kernels.py) and transitively against the
compiled reference (test_hsync_paths.py runs both hsync strategies).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntsc_crt_tpu.ops.pallas.tiling import shrink_sub

LANE = 128
SUB = 8
COPY_C = 128   # initial-copy chunk along the sample dim


def _make_kernel(L, HP, W, c0, thresh, H, bits):
    tW = 2 * W
    S = tW + (1 << bits)          # scratch extent consumed by the funnel

    def kernel(rows_ref, act_ref, h0_ref, out_ref, hs_s, w_s):
        l = pl.program_id(0)

        @pl.when(l == 0)
        def _():
            hs_s[...] = h0_ref[0]

        hs = hs_s[...]                                   # (sub, LANE) int32
        base = hs + c0                                   # in [c0, H-1+c0]
        smin = jnp.min(base)
        # clamp the copy start so chunked reads never pass HP (the real
        # window reads stay inside HP by the caller's PAD contract; only
        # the chunk ROUNDUP could poke past it)
        rmax0 = jnp.max(base) - smin
        n_live = jnp.minimum((rmax0 + tW + COPY_C - 1) // COPY_C,
                             HP // COPY_C)
        start = jnp.minimum(smin, HP - n_live * COPY_C)
        r = base - start                                 # residual, >= 0
        rmax = jnp.max(r)

        rows = rows_ref.at[0]                            # (HP, sub, LANE)

        def rpass(c, z):
            t0 = c * COPY_C
            w_s[pl.ds(t0, COPY_C)] = rows[pl.ds(start + t0, COPY_C)]
            return z

        lax.fori_loop(0, n_live, rpass, 0)

        for kb in range(bits - 1, -1, -1):
            off = 1 << kb
            ext = tW + off                               # static extent
            m = ((r >> kb) & 1) == 1

            @pl.when(rmax >= off)
            def _(off=off, ext=ext, m=m):
                a = w_s[pl.ds(off, ext)]
                b = w_s[pl.ds(0, ext)]
                w_s[pl.ds(0, ext)] = jnp.where(m[None], a, b)

        # threshold scan over the aligned 2W window (crt_core.c:440-445)
        run = jnp.zeros_like(hs)
        j = jnp.full_like(hs, tW)
        found = jnp.zeros(hs.shape, jnp.bool_)
        for t in range(tW):
            run = run + w_s[t].astype(jnp.int32)
            hit = (run <= thresh) & ~found
            j = jnp.where(hit, t, j)
            found = found | hit

        nxt = j - W + hs                                 # in [-W, H-1+W]
        nxt = nxt + jnp.where(nxt < 0, H, 0)
        nxt = nxt - jnp.where(nxt >= H, H, 0)
        act = act_ref[0, 0] != 0
        hs = jnp.where(act, nxt, hs)
        hs_s[...] = hs
        out_ref[0] = hs

    return kernel, S


@functools.partial(jax.jit,
                   static_argnames=("W", "c0", "thresh", "H", "interpret"))
def hsync_chase(rows2, active_l, hsync0, *, W: int, c0: int, thresh: int,
                H: int, interpret: bool = False):
    """rows2: int8 (B, L, HP) padded per-line rows (the same layout the XLA
    scan reads; HP covers base + 2W for every legal hsync by the caller's
    PAD contract).  active_l: bool (B, L); hsync0: int32 (B,).
    Returns hseq int32 (B, L) — the estimate AFTER each line's update."""
    B, L, HP = rows2.shape
    assert HP % COPY_C == 0, "PAD lane-aligns HP to 128 in the caller"
    sub = shrink_sub(B, SUB, LANE)
    Bp = sub * LANE
    # residual upper bound: max base - clamped start <= H-1+c0
    bits = int(H - 1 + c0).bit_length()

    rowsP = jnp.zeros((Bp, L, HP), jnp.int8).at[:B].set(rows2)
    rowsT = rowsP.transpose(1, 2, 0).reshape(L, HP, sub, LANE)
    actP = jnp.zeros((Bp, L), jnp.int32).at[:B].set(active_l.astype(jnp.int32))
    actT = actP.T.reshape(L, 1, sub, LANE)
    h0 = jnp.zeros((Bp,), jnp.int32).at[:B].set(jnp.asarray(hsync0, jnp.int32))
    h0 = h0.reshape(1, sub, LANE)

    kern, S = _make_kernel(L, HP, W, c0, thresh, H, bits)
    out = pl.pallas_call(
        kern,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, HP, sub, LANE), lambda l: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub, LANE), lambda l: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sub, LANE), lambda l: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sub, LANE), lambda l: (l, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, sub, LANE), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((sub, LANE), jnp.int32),          # carried hsync
            pltpu.VMEM((S + COPY_C, sub, LANE), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(rowsT, actT, h0)
    return out.reshape(L, Bp).T[:B]
