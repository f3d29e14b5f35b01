"""Closed-form parallel evaluation of the reference's sequential noise LCG.

The reference injects per-sample noise from a stateful 32-bit LCG carried
across frames (crt_core.c:346-367):

    rn = 214019 * rn + 140327895;              // per sample, sequential
    s  = analog[i] + ((((rn >> 16) & 0xff) - 0x7f) * noise >> 8);

A linear congruential recurrence has the closed form

    rn_k = A^k * rn_0 + B * (A^{k-1} + ... + A + 1)   (mod 2^32)

so the entire 238k-503k sample stream is evaluated in parallel on the VPU
from two precomputed constant tables (A^k and the geometric prefix sums,
both mod 2^32, independent of the seed).  This turns the reference's hottest
serial loop into one fused elementwise pass — the TPU-native formulation.

Note on C semantics: the reference does this arithmetic in a signed `int`
(wrapping in practice on its target compilers); bit patterns are identical to
uint32 wrapping, and the only consumer is `(rn >> 16) & 0xff`, which reads
bits 16..23 — the same for arithmetic and logical shifts.  We therefore carry
the LCG state as uint32 and bit-cast to int32 at the state boundary.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

LCG_A = 214019
LCG_B = 140327895

# The framework-defined deterministic replacement for libc rand() used by the
# VHS tracking-noise path (crt_core.c:343-357 calls rand(), which is not
# reproducible cross-platform).  Both this framework and the compiled test
# oracle (see oracle/crt_rand_shim.c — built with -Drand=crt_oracle_rand) use
# this exact generator: state = state*1103515245 + 12345 (mod 2^32);
# output = state >> 1 (31 bits, like glibc's range — the VHS noise byte
# reads bits 16..23 of the output, crt_core.c:362).
RAND_A = 1103515245
RAND_B = 12345


@functools.lru_cache(maxsize=8)
def _lcg_tables(n: int, a: int, b: int) -> tuple[np.ndarray, np.ndarray]:
    """(A^k mod 2^32, B * sum_{j<k} A^j mod 2^32) for k = 1..n.

    uint64 arithmetic wraps mod 2^64; reducing mod 2^32 afterwards is exact
    because mod 2^32 factors through mod 2^64.
    """
    apow = np.cumprod(np.full(n, a, dtype=np.uint64))          # A^1..A^n
    geo = np.cumsum(np.concatenate([[np.uint64(1)], apow[:-1]]))  # S_1..S_n
    return (
        (apow & 0xFFFFFFFF).astype(np.uint32),
        ((np.uint64(b) * geo) & 0xFFFFFFFF).astype(np.uint32),
    )


def lcg_stream(rn0: jax.Array, n: int, a: int = LCG_A, b: int = LCG_B) -> jax.Array:
    """States rn_1..rn_n of the LCG starting from seed rn_0, as uint32 (n,).

    rn0 may be int32 (bit-cast) or uint32; fully parallel on device.
    """
    apow, csum = _lcg_tables(n, a, b)
    rn0 = jax.lax.bitcast_convert_type(jnp.asarray(rn0, jnp.int32), jnp.uint32)
    return jnp.asarray(apow) * rn0 + jnp.asarray(csum)


def noise_bytes(rn0: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """((rn_k >> 16 & 0xff) - 0x7f for k=1..n as int32, final state as int32).

    Matches the per-sample noise extraction at crt_core.c:359-362.
    """
    stream = lcg_stream(rn0, n)
    byte = ((stream >> 16) & 0xFF).astype(jnp.int32) - 0x7F
    rn_out = jax.lax.bitcast_convert_type(stream[-1], jnp.int32)
    return byte, rn_out


def crt_rand_out(state: jax.Array) -> jax.Array:
    """crt_rand output function: 31-bit value from a uint32 state."""
    return (state >> 1).astype(jnp.int32)


def crt_rand_step(state: jax.Array) -> jax.Array:
    """One crt_rand state transition on int32 state (wrapping)."""
    return jnp.asarray(state, jnp.int32) * RAND_A + RAND_B


def crt_rand_stream(state0: jax.Array, n: int) -> tuple[jax.Array, jax.Array]:
    """n sequential crt_rand() values (the spec'd libc-rand replacement).

    Returns (values int32 (n,) in [0, 2^31), final state int32).
    """
    stream = lcg_stream(state0, n, RAND_A, RAND_B)
    vals = crt_rand_out(stream)
    state_out = jax.lax.bitcast_convert_type(stream[-1], jnp.int32)
    return vals, state_out
