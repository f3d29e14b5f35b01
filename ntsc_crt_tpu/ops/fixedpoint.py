"""Integer fixed-point primitives with exact C89 semantics, vectorized for TPU.

The reference library is integer-only; bit-exact parity requires reproducing
C's *truncating* division/modulo (Python/JAX default to flooring), arithmetic
right shifts of negative int32, and two's-complement wraparound.  Everything
here operates on int32 jnp arrays (XLA integer ops wrap mod 2^32, and
``jnp.right_shift`` on signed ints is arithmetic — both match gcc on the
reference's target platforms).

Reference citations:
  - 14-bit sine/cosine table interpolation: /root/reference/crt_core.c:19-61
  - 11-bit fixed point e^x:                /root/reference/crt_ntsc.c:25-83
  - noise LCG recurrence:                  /root/reference/crt_core.c:359
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# 2*pi == 16384 in the 14-bit angle domain (crt_core.h:135-137)
T14_2PI = 16384
T14_MASK = T14_2PI - 1
T14_PI = T14_2PI // 2

# ---------------------------------------------------------------------------
# C integer semantics helpers
# ---------------------------------------------------------------------------


def i32(x) -> jax.Array:
    return jnp.asarray(x, jnp.int32)


def cdiv(a, b) -> jax.Array:
    """C truncating integer division (lax.div truncates toward zero)."""
    return lax.div(i32(a), i32(b))


def crem(a, b) -> jax.Array:
    """C truncating remainder (sign follows the dividend, like C's %)."""
    return lax.rem(i32(a), i32(b))


def posmod(a, n) -> jax.Array:
    """((a % n) + n) % n with C truncating %, always in [0, n).

    Mirrors the reference's POSMOD macro (crt_core.c:17).
    """
    r = crem(a, n)
    return jnp.where(r < 0, r + i32(n), r)


def host_tdiv(a: int, b: int) -> int:
    """C truncating division on host Python ints."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def host_posmod(a: int, n: int) -> int:
    return ((a % n) + n) % n  # Python % already floors; matches POSMOD for n>0


# ---------------------------------------------------------------------------
# 14-bit angle sine/cosine (crt_core.c:19-61)
# ---------------------------------------------------------------------------

# significant points on sine wave (15-bit), crt_core.c:19-24
_SIGPSIN15 = np.array(
    [0x0000,
     0x0C88, 0x18F8, 0x2528, 0x30F8, 0x3C50, 0x4718, 0x5130, 0x5A80,
     0x62F0, 0x6A68, 0x70E0, 0x7640, 0x7A78, 0x7D88, 0x7F60, 0x8000,
     0x7F60],
    dtype=np.int32,
)


def _sintabil8(n: jax.Array) -> jax.Array:
    """Linear interpolation over the quarter-wave table (crt_core.c:26-39).

    Valid for n in [0, 4096]; callers may pass out-of-range lanes on the
    not-taken side of a select, so table indices are clipped (result of such
    lanes is discarded by jnp.where).
    """
    tab = jnp.asarray(_SIGPSIN15)
    f = n & 0xFF
    i = (n >> 8) & 0xFF
    i = jnp.clip(i, 0, 16)
    a = jnp.take(tab, i)
    b = jnp.take(tab, i + 1)
    return a + ((b - a) * f >> 8)


def sincos14(n) -> tuple[jax.Array, jax.Array]:
    """14-bit interpolated sine/cosine; returns (sin, cos), each 15-bit.

    Exact vectorized port of crt_sincos14 (crt_core.c:42-61).  `n` is an
    angle where 16384 == 2*pi; any int32 value is accepted (masked).
    """
    n = i32(n) & T14_MASK
    h = n & ((T14_2PI >> 1) - 1)
    hi = h > ((T14_2PI >> 2) - 1)
    c = jnp.where(hi, -_sintabil8(h - (T14_2PI >> 2)), _sintabil8((T14_2PI >> 2) - h))
    s = jnp.where(hi, _sintabil8((T14_2PI >> 1) - h), _sintabil8(h))
    flip = n > ((T14_2PI >> 1) - 1)
    return jnp.where(flip, -s, s), jnp.where(flip, -c, c)


def np_sincos14(n) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized host-numpy crt_sincos14 — exact same integer semantics as
    sincos14 for building trace-time constant tables (int32 results)."""
    n = np.asarray(n, np.int64) & T14_MASK
    tab = _SIGPSIN15.astype(np.int64)

    def interp(m):
        f = m & 0xFF
        i = np.clip((m >> 8) & 0xFF, 0, 16)
        a = tab[i]
        b = tab[i + 1]
        return a + ((b - a) * f >> 8)

    h = n & ((T14_2PI >> 1) - 1)
    hi = h > ((T14_2PI >> 2) - 1)
    c = np.where(hi, -interp(h - (T14_2PI >> 2)), interp((T14_2PI >> 2) - h))
    s = np.where(hi, interp((T14_2PI >> 1) - h), interp(h))
    flip = n > ((T14_2PI >> 1) - 1)
    return (np.where(flip, -s, s).astype(np.int32),
            np.where(flip, -c, c).astype(np.int32))


def host_sincos14(n: int) -> tuple[int, int]:
    """Host-Python exact crt_sincos14 for init-time coefficient derivation."""
    def tab(m: int) -> int:
        f = m & 0xFF
        i = (m >> 8) & 0xFF
        a = int(_SIGPSIN15[i])
        b = int(_SIGPSIN15[i + 1])
        return a + ((b - a) * f >> 8)

    n &= T14_MASK
    h = n & ((T14_2PI >> 1) - 1)
    if h > ((T14_2PI >> 2) - 1):
        c = -tab(h - (T14_2PI >> 2))
        s = tab((T14_2PI >> 1) - h)
    else:
        c = tab((T14_2PI >> 2) - h)
        s = tab(h)
    if n > ((T14_2PI >> 1) - 1):
        c = -c
        s = -s
    return s, c


# ---------------------------------------------------------------------------
# 11-bit fixed-point e^x (crt_ntsc.c:25-83; duplicated into every encoder)
# ---------------------------------------------------------------------------

EXP_P = 11
EXP_ONE = 1 << EXP_P
EXP_MASK = EXP_ONE - 1
EXP_PI = 6434

_E11 = [EXP_ONE, 5567, 15133, 41135, 111817]  # e^0..e^4 (crt_ntsc.c:32-38)


def host_expx(n: int) -> int:
    """Fixed-point e^x on host ints — only used to derive IIR coefficients,
    so a host (trace-time) implementation suffices.  Port of expx
    (crt_ntsc.c:41-83); all intermediate values fit well inside int32 for the
    coefficient-derivation inputs the library uses.
    """
    def mul(x: int, y: int) -> int:
        return (x * y) >> EXP_P

    if n == 0:
        return EXP_ONE
    neg = n < 0
    if neg:
        n = -n
    idx = n >> EXP_P
    res = EXP_ONE
    for _ in range(idx // 4):
        res = mul(res, _E11[4])
    idx &= 3
    if idx > 0:
        res = mul(res, _E11[idx])
    n &= EXP_MASK
    nxt = EXP_ONE
    acc = 0
    dl = 1
    for i in range(1, 17):
        acc += host_tdiv(nxt, dl)
        nxt = mul(nxt, n)
        dl *= i
        if dl > nxt or nxt <= 0 or dl <= 0:
            break
    res = mul(res, acc)
    if neg:
        res = host_tdiv(EXP_ONE << EXP_P, res)
    return res
