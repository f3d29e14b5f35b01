"""Pallas TPU kernel for the VHS tracking-noise region-B rand scan.

The reference consumes the crt_rand stream sequentially with a data-dependent
call count per sample (crt_core.c:343-357: the second rand() of the band test
only fires when the first comparison passes, via C's && short circuit).  The
XLA formulation (models/demodulate.py::_inject_noise_vhs) reduces the serial
part to a lean `lax.scan` carrying one (B,) uint32 state — but 19*H (~17k)
steps of ~6 tiny vector ops are dispatch-overhead-bound at ~33 ns/op,
~7 ms/step on a v5e: the entire NTSCVHS-vs-NTSC throughput gap
(docs/PERF.md).

This kernel marches the same recurrence fully in-register: the batch lives
on (sublane, lane) tiles and each step is a handful of full-width VPU ops
with zero dispatch overhead.  The per-step threshold
tk(t) = (19H-1-t)//H + 1 is recomputed on the scalar unit (a table would
need 17k scalar loads).  Output is the per-step ENTRY state (the scan's
emitted carry), blocked over a sequential time grid exactly like
ops/pallas/filters_pallas.py; the final region-C entry state is derived
outside from the last emitted entry (one more composed step).

Bit-exactness: all arithmetic is uint32 with wrap, identical to the scan
path; tested exhaustively against it in interpret mode and against the
compiled reference end-to-end (tests/test_vhs.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntsc_crt_tpu.ops.lcg import RAND_A, RAND_B

LANE = 128
VHS_K, VHS_TB = 32, 512  # serial unroll, time-block size

_A1 = RAND_A & 0xFFFFFFFF
_C1 = RAND_B & 0xFFFFFFFF
_A2 = (_A1 * _A1) & 0xFFFFFFFF
_C2 = (_A1 * _C1 + _C1) & 0xFFFFFFFF
_A3 = (_A2 * _A1) & 0xFFFFFFFF
_C3 = (_A1 * _C2 + _C1) & 0xFFFFFFFF


def _kernel(st0_ref, out_ref, st_ref, *, K: int, TB: int, H: int):
    """One time-block: emit TB entry states, carry the state in scratch."""
    tblk = pl.program_id(0)

    @pl.when(tblk == 0)
    def _():
        st_ref[...] = st0_ref[...]

    A2 = jnp.uint32(_A2)
    C2 = jnp.uint32(_C2)
    A3 = jnp.uint32(_A3)
    C3 = jnp.uint32(_C3)
    twenty = jnp.uint32(20)
    Hc = jnp.int32(H)
    lim = jnp.int32(19 * H - 1)
    base = tblk * TB

    def body(tb, st):
        t0 = base + tb * K
        outs = []
        for j in range(K):
            outs.append(st)
            # cond1: m1 >= tk(t) with tk = (19H-1-t)//H + 1, evaluated as
            # m1*H + t > 19H-1 — the vector multiply-add beats a per-step
            # scalar integer division by ~25% measured (padded tail steps
            # emit garbage that is sliced off)
            st2 = st * A2 + C2
            st3 = st * A3 + C3
            m1 = ((st2 >> 1) % twenty).astype(jnp.int32)
            st = jnp.where(m1 * Hc + (t0 + j) > lim, st3, st2)
        out_ref[pl.ds(tb * K, K)] = jnp.stack(outs)
        return st

    st_ref[...] = lax.fori_loop(0, TB // K, body, st_ref[...])


@functools.partial(jax.jit, static_argnames=("n_steps", "H", "interpret"))
def vhs_region_b_entries(st0, *, n_steps: int, H: int,
                         interpret: bool = False):
    """March the region-B recurrence n_steps times from st0 (B,) uint32.
    Returns the (n_steps, B) uint32 ENTRY state per step (== the lax.scan
    emission order of demodulate._inject_noise_vhs::stepB)."""
    B = st0.shape[0]
    sub = -(-B // LANE)               # sublanes needed to hold the batch
    Bp = sub * LANE
    Tp = -(-n_steps // VHS_TB) * VHS_TB

    st0p = jnp.zeros((Bp,), jnp.uint32).at[:B].set(st0).reshape(sub, LANE)

    out = pl.pallas_call(
        functools.partial(_kernel, K=VHS_K, TB=VHS_TB, H=H),
        grid=(Tp // VHS_TB,),
        in_specs=[pl.BlockSpec((sub, LANE), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((VHS_TB, sub, LANE), lambda j: (j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, sub, LANE), jnp.uint32),
        scratch_shapes=[pltpu.VMEM((sub, LANE), jnp.uint32)],
        interpret=interpret,
    )(st0p)

    return out.reshape(Tp, Bp)[:n_steps, :B]
