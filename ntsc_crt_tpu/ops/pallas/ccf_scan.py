"""Pallas TPU kernel for the per-line ccf EMA chain (crt_core.c:452-466).

The demodulator folds each line's burst samples into a per-vertical-phase
colour-carrier EMA (`ccf`); the fold chains line to line through the
carried (VP, CC) state, so — like the hsync chase — the loop is serial
across the ~240 active lines.  The XLA formulation
(models/demodulate.py::_line_scan cstep) runs it as a lax.scan(unroll=16)
whose residual ~0.5 ms/step is loop/dispatch overhead, not compute (the
real work is ~m*CC*B adds per line).

This kernel runs the chain with the batch on (sublane, lane) tiles, one
sequential grid step per line, the (VP, CC) state per batch entry living
in VMEM scratch across steps — zero per-line dispatches.

STATUS: opt-in (NTSC_CRT_CCF_KERNEL=1), measured r4 NEGATIVE at batch
256 — NTSC 14.1k vs 14.6k fps/chip with the XLA scan (flat on PV1K):
the (L, ..., sub, LANE) prep transposes plus the serial line grid cost
more than the scan's loop overhead saves.  Kept opt-in + parity-tested
like place_rows (docs/PERF.md r4 negatives).

Bit-exactness: identical integer ops to the scan path (lax.div truncation
via the same shift-free `*127/128` EMA, crt_core.c:461); pinned against
the XLA scan in tests/test_pallas_kernels.py and end to end through the
demodulator parity suites.
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


def _make_kernel(L, VP, CC, m):
    def kernel(pc_ref, vp_ref, act_ref, ccf0_ref, ccr_ref, ccff_ref, ccf_s):
        l = pl.program_id(0)

        @pl.when(l == 0)
        def _():
            ccf_s[...] = ccf0_ref[...]

        vp = vp_ref[0, 0]                               # (sub, LANE) int32
        act = act_ref[0, 0] != 0
        # ccr = ccf[vper] — VP is 1/3/5, unrolled masked selects
        ccr = [jnp.zeros(vp.shape, jnp.int32) for _ in range(CC)]
        for v in range(VP):
            sel = vp == v
            for c in range(CC):
                ccr[c] = jnp.where(sel, ccf_s[v, c], ccr[c])
        # EMA fold over the line's m burst sample groups (crt_core.c:461):
        # ccr = ccr*127/128 + sample, C-truncating division
        new = list(ccr)
        for mm in range(m):
            for c in range(CC):
                new[c] = lax.div(new[c] * 127, 128) + pc_ref[0, mm, c]
        for c in range(CC):
            ccr[c] = jnp.where(act, new[c], ccr[c])
        # write back to the carried state at row vper (no-op when inactive:
        # ccr is then the unchanged selected row, matching the scan path)
        for v in range(VP):
            sel = vp == v
            for c in range(CC):
                ccf_s[v, c] = jnp.where(sel, ccr[c], ccf_s[v, c])
        for c in range(CC):
            ccr_ref[0, c] = ccr[c]

        @pl.when(l == L - 1)
        def _():
            ccff_ref[...] = ccf_s[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def ccf_ema(per_cls, vper_l, active_l, ccf0, *, interpret: bool = False):
    """per_cls: int32 (B, L, m, CC) burst sample groups per line.
    vper_l: int32 (B, L) vertical phase row per line; active_l: bool (B, L);
    ccf0: int32 (B, VP, CC) carried state.
    Returns (ccf_f int32 (B, VP, CC), ccr_l int32 (B, L, CC)) — identical
    to the lax.scan formulation in demodulate._line_scan."""
    from ntsc_crt_tpu.ops.pallas.tiling import shrink_sub
    B, L, m, CC = per_cls.shape
    VP = ccf0.shape[1]
    sub = shrink_sub(B, SUB, LANE)
    Bp = sub * LANE

    def bpad(x, fill=0):
        pad = [(0, Bp - B)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    # (L, ..., sub, LANE) relayouts — small tensors, cheap XLA transposes
    pcT = jnp.moveaxis(bpad(per_cls), 0, -1).reshape(L, m, CC, sub, LANE)
    vpT = jnp.moveaxis(bpad(vper_l.astype(jnp.int32)), 0, -1
                       ).reshape(L, 1, sub, LANE)
    actT = jnp.moveaxis(bpad(active_l.astype(jnp.int32)), 0, -1
                        ).reshape(L, 1, sub, LANE)
    ccf0T = jnp.moveaxis(bpad(jnp.asarray(ccf0, jnp.int32)), 0, -1
                         ).reshape(VP, CC, sub, LANE)

    kern = _make_kernel(L, VP, CC, m)
    ccr_out, ccff_out = pl.pallas_call(
        kern,
        grid=(L,),
        in_specs=[
            pl.BlockSpec((1, m, CC, sub, LANE), lambda l: (l, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub, LANE), lambda l: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sub, LANE), lambda l: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VP, CC, sub, LANE), lambda l: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, CC, sub, LANE), lambda l: (l, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((VP, CC, sub, LANE), lambda l: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, CC, sub, LANE), jnp.int32),
            jax.ShapeDtypeStruct((VP, CC, sub, LANE), jnp.int32),
        ],
        scratch_shapes=[pltpu.VMEM((VP, CC, sub, LANE), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(pcT, vpT, actT, ccf0T)

    ccr_l = jnp.moveaxis(ccr_out.reshape(L, CC, Bp), -1, 0)[:B]
    ccf_f = jnp.moveaxis(ccff_out.reshape(VP, CC, Bp), -1, 0)[:B]
    return ccf_f, ccr_l
