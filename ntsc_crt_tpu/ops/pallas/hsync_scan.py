"""Pallas TPU kernel for the serial hsync chase (crt_core.c:434-450).

The demodulator probes ONE 16-sample window per line at the running hsync
estimate; the estimate chains line to line, so the loop is irreducibly
serial across the ~240 active lines.  The XLA formulation
(models/demodulate.py::_line_scan hstep) runs it as a lax.scan whose ~20
small ops per line are dispatch-overhead-bound: ~1.75 ms/step on a v5e —
one of the two structural residuals named in docs/PERF.md.

This kernel runs the same chase with the BATCH on (sublane, lane) tiles and
the padded sample axis as the block-major dim, one grid step per line.
The chase itself executes in ~0.22 ms at batch 256 (8x the XLA scan), but
the (B, L, HP) -> (L, HPw, B) input relayout XLA emits costs ~3.7 ms/step
at that batch (int8->int32 word-pack via a 283 MB u32 blowup + T(4,128)
copies — r4 trace), so the caller gates the kernel to the SMALL-BATCH
(latency) regime where the prep is trivial and the serial chain dominates
the step.  Kernel design:

* the input rides as little-endian int32 words of 4 int8 samples
  (a bitcast view): the (B, L, HP) -> (L, HP, B) relayout XLA emits for an
  int8 operand runs at ~47 GB/s (sublane-packing shuffles, ~3 ms/step at
  batch 256 — measured); the same relayout on the int32 view is ~2 orders
  of magnitude cheaper.  The kernel extracts bytes in-register;
* the running hsync estimate lives in VMEM scratch across grid steps (the
  TPU grid is sequential), so the 240-step chain costs zero dispatches;
* each line's probe window is pulled out by the same block-rebase +
  residual-gated funnel as ops/pallas/decode_fused.py, at WORD
  granularity: one dynamic-offset copy at the batch-min window base plus
  masked funnel passes over the word residual, each gated on the residual
  max actually needing that bit.  In steady state the chase is locked
  (residual ~jitter), so ~log2(jitter/4) passes live;
* the 16-sample threshold scan (first window position whose running sum
  drops below thresh, fall-through j == 2W, crt_core.c:440-445) unrolls
  into sign-extended byte picks + adds on the VPU.

Bit-exactness: identical integer ops to the scan path; pinned against a
scalar port of the reference loop in interpret mode
(tests/test_pallas_kernels.py) and against the XLA strategies end to end
(tests/test_hsync_paths.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
SUB = 8
COPY_C = 32    # initial-copy chunk along the word dim (128 samples; HP is
#                lane-aligned to 128 so 4*COPY_C always divides it)


def _sx_byte(word, bp: int):
    """Sign-extended byte bp (0..3, little-endian) of an int32 word."""
    if bp == 3:
        return word >> 24
    return (word << (24 - 8 * bp)) >> 24


def _make_kernel(L, HPw, W, c0, thresh, H, bits_w):
    tW = 2 * W
    tWw = (3 + tW + 3) // 4 + 1    # words covering [rb, rb+tW) for rb<4
    S = tWw + (1 << bits_w)        # scratch extent consumed by the funnel

    def kernel(rows_ref, act_ref, h0_ref, out_ref, hs_s, w_s):
        l = pl.program_id(0)

        @pl.when(l == 0)
        def _():
            hs_s[...] = h0_ref[0]

        hs = hs_s[...]                                   # (sub, LANE) int32
        base = hs + c0                                   # in [c0, H-1+c0]
        wbase = base >> 2
        rb = base & 3
        smin = jnp.min(wbase)
        # clamp the copy start so chunked reads never pass HPw (the real
        # window reads stay inside HPw by the caller's PAD contract; only
        # the chunk ROUNDUP could poke past it)
        rmax0 = jnp.max(wbase) - smin
        n_live = jnp.minimum((rmax0 + tWw + COPY_C - 1) // COPY_C,
                             HPw // COPY_C)
        start = jnp.minimum(smin, HPw - n_live * COPY_C)
        r = wbase - start                                # word residual >= 0
        rmax = jnp.max(r)

        rows = rows_ref.at[0]                            # (HPw, sub, LANE)

        def rpass(c, z):
            t0 = c * COPY_C
            w_s[pl.ds(t0, COPY_C)] = rows[pl.ds(start + t0, COPY_C)]
            return z

        lax.fori_loop(0, n_live, rpass, 0)

        for kb in range(bits_w - 1, -1, -1):
            off = 1 << kb
            ext = tWw + off                              # static extent
            m = ((r >> kb) & 1) == 1

            @pl.when(rmax >= off)
            def _(off=off, ext=ext, m=m):
                a = w_s[pl.ds(off, ext)]
                b = w_s[pl.ds(0, ext)]
                w_s[pl.ds(0, ext)] = jnp.where(m[None], a, b)

        # threshold scan over the aligned 2W window (crt_core.c:440-445):
        # sample t of lane b is byte (rb+t)&3 of word w_s[(rb+t)>>2]
        run = jnp.zeros_like(hs)
        j = jnp.full_like(hs, tW)
        found = jnp.zeros(hs.shape, jnp.bool_)
        words = [w_s[k] for k in range(tWw)]
        for t in range(tW):
            w_lo = words[t >> 2]
            w_hi = words[(t + 3) >> 2]
            s_t = jnp.zeros_like(hs)
            for rbv in range(4):
                bp = (rbv + t) & 3
                word = w_lo if rbv + (t & 3) < 4 else w_hi
                s_t = jnp.where(rb == rbv, _sx_byte(word, bp), s_t)
            run = run + s_t
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


def _make_kernel_b(L, HP, W, c0, thresh, H, bits):
    """Sample-granularity variant for the einsum-prep (big batch) path: the
    MXU transpose delivers (L, HP, B) samples directly (int8, bf16 or int32
    depending on prep_dtype — the body is dtype-agnostic; the threshold
    scan converts each sample to int32, exact for the +-127 row values in
    all three), so the funnel and scan run per sample (COPY chunk 128)."""
    tW = 2 * W
    CB = 128
    S = tW + (1 << bits)

    def kernel(rows_ref, act_ref, h0_ref, out_ref, hs_s, w_s):
        l = pl.program_id(0)

        @pl.when(l == 0)
        def _():
            hs_s[...] = h0_ref[0]

        hs = hs_s[...]                                   # (sub, LANE) int32
        base = hs + c0
        smin = jnp.min(base)
        rmax0 = jnp.max(base) - smin
        n_live = jnp.minimum((rmax0 + tW + CB - 1) // CB, HP // CB)
        start = jnp.minimum(smin, HP - n_live * CB)
        r = base - start
        rmax = jnp.max(r)

        rows = rows_ref.at[0]                            # (HP, sub, LANE) s8

        def rpass(c, z):
            t0 = c * CB
            w_s[pl.ds(t0, CB)] = rows[pl.ds(start + t0, CB)]
            return z

        lax.fori_loop(0, n_live, rpass, 0)

        for kb in range(bits - 1, -1, -1):
            off = 1 << kb
            ext = tW + off
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

        nxt = j - W + hs
        nxt = nxt + jnp.where(nxt < 0, H, 0)
        nxt = nxt - jnp.where(nxt >= H, H, 0)
        act = act_ref[0, 0] != 0
        hs = jnp.where(act, nxt, hs)
        hs_s[...] = hs
        out_ref[0] = hs

    return kernel, S


@functools.partial(jax.jit,
                   static_argnames=("W", "c0", "thresh", "H", "interpret",
                                    "einsum_prep", "prep_dtype", "direct_t"))
def hsync_chase(rows2, active_l, hsync0, *, W: int, c0: int, thresh: int,
                H: int, interpret: bool = False, einsum_prep: bool = False,
                prep_dtype: str = "i8", direct_t: bool = False):
    """rows2: int8 (B, L, HP) padded per-line rows (the same layout the XLA
    scan reads; HP covers base + 2W for every legal hsync by the caller's
    PAD contract).  active_l: bool (B, L); hsync0: int32 (B,).
    Returns hseq int32 (B, L) — the estimate AFTER each line's update.

    einsum_prep=True (big batch): the (B, L, HP) -> (L, HP, B) relayout is
    done as a one-hot MXU transpose (s8 x s8 identity dot -> int32, ~36 G
    MACs at batch 256 = sub-ms on the MXU) instead of XLA's sublane-packing
    shuffle relayout (~47 GB/s) or the int32 word-pack blowup — and the
    kernel runs at sample granularity on the result.  prep_dtype picks the
    transpose OUTPUT dtype the kernel reads: "i8" re-packs to int8 (min
    VMEM, but the int32->int8 convert costs ~2 ms of (4,1) sublane-pack
    relayouts — the r4 negative result), "bf16" converts to bfloat16
    ((16,128) tiles, cheaper convert; exact for +-127 row values), "i32"
    hands the MXU output straight to the kernel (no convert at all, 4x
    VMEM).

    direct_t=True (big batch, B % 128 == 0, the r5 default): a plain
    jnp.transpose(rows2, (1, 2, 0)) feeds the SAME sample-granularity s8
    kernel.  The step already materializes rows2 batch-minor
    ({0,2,1} physical layout) for the burst extraction's masked-select
    stages, so XLA resolves this transpose as a layout bitcast off that
    shared copy — no MXU pass, no word-pack, no extra relayout (verified
    in the r5 kernel table: while.7 + the scan's {3,2,0,1} copy are gone)."""
    B, L, HP = rows2.shape
    if einsum_prep or direct_t:
        from ntsc_crt_tpu.ops.pallas.tiling import shrink_sub
        sub = shrink_sub(B, SUB, LANE)
        Bp = sub * LANE
        bits = int(H - 1 + c0).bit_length()
        if direct_t:
            kdt = jnp.int8
            rowsT = jnp.transpose(rows2, (1, 2, 0))     # layout bitcast
            if B < Bp:
                # s8 blocks need a multiple-of-4 sublane height (tiling.py),
                # so e.g. B=256 pads to 512 lanes.  The pad reads the
                # batch-minor copy in memory order (B is minor on both
                # sides) — a cheap streaming pass, NOT a relayout.
                rowsT = jnp.zeros((L, HP, Bp), jnp.int8).at[..., :B].set(
                    rowsT)
            rowsT = rowsT.reshape(L, HP, sub, LANE)
        else:
            eye = jnp.eye(Bp, B, dtype=jnp.int8)
            rowsT = jnp.einsum("cb,bls->lsc", eye, rows2,
                               preferred_element_type=jnp.int32)
            kdt = {"i8": jnp.int8, "bf16": jnp.bfloat16,
                   "i32": jnp.int32}[prep_dtype]
            rowsT = rowsT.astype(kdt).reshape(L, HP, sub, LANE)
        actP = jnp.zeros((Bp, L), jnp.int32).at[:B].set(
            active_l.astype(jnp.int32))
        actT = actP.T.reshape(L, 1, sub, LANE)
        h0 = jnp.zeros((Bp,), jnp.int32).at[:B].set(
            jnp.asarray(hsync0, jnp.int32)).reshape(1, sub, LANE)
        kern, S = _make_kernel_b(L, HP, W, c0, thresh, H, bits)
        Sb = max(S + 128, HP)
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
                pltpu.VMEM((sub, LANE), jnp.int32),      # carried hsync
                pltpu.VMEM((Sb, sub, LANE), kdt),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=interpret,
        )(rowsT, actT, h0)
        return out.reshape(L, Bp).T[:B]
    assert HP % (4 * COPY_C) == 0, "PAD lane-aligns HP to 128 in the caller"
    HPw = HP // 4
    # all kernel operands are int32 (no packed-dtype sublane constraint, cf.
    # tiling.shrink_sub), so the block height can shrink to a single sublane
    # — at batch 1 (the latency regime this kernel is gated to) that keeps
    # the padded prep volume at 128 rows, not 512
    sub = min(SUB, -(-B // LANE))
    Bp = sub * LANE
    # word-residual upper bound: max wbase - clamped start
    bits_w = int((H - 1 + c0) >> 2).bit_length()

    rows32 = lax.bitcast_convert_type(
        rows2.reshape(B, L, HPw, 4), jnp.int32)         # little-endian pack
    rowsP = jnp.zeros((Bp, L, HPw), jnp.int32).at[:B].set(rows32)
    rowsT = rowsP.transpose(1, 2, 0).reshape(L, HPw, sub, LANE)
    actP = jnp.zeros((Bp, L), jnp.int32).at[:B].set(active_l.astype(jnp.int32))
    actT = actP.T.reshape(L, 1, sub, LANE)
    h0 = jnp.zeros((Bp,), jnp.int32).at[:B].set(jnp.asarray(hsync0, jnp.int32))
    h0 = h0.reshape(1, sub, LANE)

    kern, S = _make_kernel(L, HPw, W, c0, thresh, H, bits_w)
    # the clamped initial copy can write up to min(HPw, rmax+tWw+C) words
    # rounded up to a COPY_C chunk — size the scratch to cover both that
    # and the funnel's largest shifted read (S)
    Sw = max(S + COPY_C, HPw)
    out = pl.pallas_call(
        kern,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, HPw, sub, LANE), lambda l: (l, 0, 0, 0),
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
            pltpu.VMEM((Sw, sub, LANE), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(rowsT, actT, h0)
    return out.reshape(L, Bp).T[:B]
