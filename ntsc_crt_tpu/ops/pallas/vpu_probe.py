"""VPU int32 issue-rate probe — the measurement behind the EQ-floor cycle
budget (docs/PERF.md r5).

decode_fused's dominant cost is the serial 3-band EQ march
(ops/pallas/decode_fused.py::_eq_chain — 8 chained one-pole stages x 3
channels per sample, crt_core.c:206-233).  Whether that march is at its
formulation optimum is a question about the VPU's sustained int32 op rate
under the chain's dependency structure.  This module measures exactly that,
on the same (sub x LANE) register tiles the real kernel uses:

  peak   — independent mul/add/shift streams, no cross-op dependencies:
           the VPU's achievable int32 issue ceiling (DCE-proof: every
           stream folds into the output).
  eq3    — the REAL _eq_chain x3 (Y/I/Q), verbatim dependency structure,
           marching a synthetic input; ops counted exactly.
  eq1    — a single channel (no cross-channel interleaving available):
           the spread eq3 <-> eq1 shows how much latency the 3-channel
           interleave already hides.

Each pattern reports sustained Gops/s (int32 elementwise ops, counted from
the source); eq3's rate / peak's rate IS the EQ march's issue efficiency.
Run on hardware via tests/perf or directly:

    python -m ntsc_crt_tpu.ops.pallas.vpu_probe
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ntsc_crt_tpu.ops.pallas.decode_fused import _eq_chain

LANE = 128
SUB = 8

# NTSC Y-channel 3-band coefficients (filters.init_eq output for the
# shipped config) — representative magnitudes; any odd constants work, the
# probe measures issue rate, not values
_COEFS = (56360, 28235, 65536, 8192, 9175)

# ops per _eq_chain step, counted from the source (decode_fused.py:85-97):
# 8 stages x (sub, mul, add, shift, add) + output (3 mul, 3 shift, 2 sub,
# 2 add)
EQ_OPS_PER_STEP = 8 * 5 + 10


def _probe_kernel(pattern: str, iters: int):
    def kernel(x_ref, o_ref):
        x = x_ref[0]                                     # (SUB, LANE) int32

        if pattern == "peak":
            # 16 independent mul/add/shift/add streams — 4 ops each, no
            # cross-stream deps, no scalar-loop-index operand; matches the
            # EQ's op MIX without its chains
            regs = [x + j for j in range(16)]

            def body(i, regs):
                del i
                return tuple(((r * 58361 + 977) >> 3) + r for r in regs)

            regs = lax.fori_loop(0, iters, body, tuple(regs))
            acc = regs[0]
            for r in regs[1:]:
                acc = acc ^ r
            o_ref[0] = acc
            return

        n_ch = 3 if pattern == "eq3" else 1
        states = tuple((x + c,) * 11 for c in range(n_ch))

        def body(i, states):
            outs = []
            nxt = []
            for st in states:
                st2, out = _eq_chain(st, i, *_COEFS)
                nxt.append(st2)
                outs.append(out)
            # feed outputs back so no iteration is dead
            nxt = tuple(tuple(s + (outs[k] & 1) for s in st)
                        for k, st in enumerate(nxt))
            return nxt

        states = lax.fori_loop(0, iters, body, states)
        acc = states[0][0]
        for st in states:
            for s in st[1:]:
                acc = acc ^ s
        o_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("pattern", "iters", "blocks",
                                             "interpret"))
def probe(pattern: str, iters: int = 4096, blocks: int = 64,
          interpret: bool = False):
    x = jnp.arange(blocks * SUB * LANE, dtype=jnp.int32).reshape(
        blocks, 1, SUB, LANE)
    spec = pl.BlockSpec((1, 1, SUB, LANE), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _probe_kernel(pattern, iters),
        grid=(blocks,),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((blocks, 1, SUB, LANE), jnp.int32),
        interpret=interpret,
    )(x)


def ops_per_iter(pattern: str) -> int:
    """int32 elementwise ops per fori_loop iteration per tile element."""
    if pattern == "peak":
        return 16 * 4
    n_ch = 3 if pattern == "eq3" else 1
    # + per-channel feedback (and + mask) keeping iterations live: 22 + 2
    return n_ch * (EQ_OPS_PER_STEP + 11 + 1)


def measure(pattern: str, iters: int = 4096, blocks: int = 64,
            reps: int = 20) -> float:
    """Sustained Gops/s on the current default device."""
    import time
    out = probe(pattern, iters=iters, blocks=blocks)
    out.block_until_ready()
    int(jnp.sum(out))                                    # drain the queue
    t0 = time.perf_counter()
    for _ in range(reps):
        out = probe(pattern, iters=iters, blocks=blocks)
    int(jnp.sum(out))
    dt = time.perf_counter() - t0
    total = reps * blocks * SUB * LANE * iters * ops_per_iter(pattern)
    return total / dt / 1e9


if __name__ == "__main__":
    for p in ("peak", "eq3", "eq1"):
        r = measure(p)
        print(f"{p:5s} {r:9.1f} Gops/s int32")
