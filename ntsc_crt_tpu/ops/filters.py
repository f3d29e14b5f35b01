"""Bandlimiting filters with exact reference integer semantics.

Two filter families exist in the reference:

* encode side — a 1-pole IIR low-pass per Y/I/Q channel, state reset per
  scanline (crt_ntsc.c:89-126, duplicated into every encoder);
* decode side — a 3-band equalizer built from two cascaded 4-stage one-pole
  low-pass chains plus a 3-deep delay line, also reset per scanline
  (crt_core.c:151-233).

Both apply *per-sample integer rounding/truncation* ((x + R) >> P), which
makes the recurrences non-linear, so they cannot be evaluated with a
closed-form/associative-scan reformulation without changing bits.  The
TPU-native formulation instead exploits the structure orthogonal to the
recurrence: filters are serial along x but independent across scanlines and
frames, so we run one `lax.scan` over x carrying a state vector that is
batched over (frames x lines x channels) — hundreds to thousands of parallel
recurrences per step, which the VPU eats lanes-first.  A Pallas kernel with
lines laid out on the 128-lane axis is the planned fast path (ops/pallas/).

All arithmetic is int32 with two's-complement wrap, matching the reference's
(technically UB, practically wrapping) C `int` arithmetic.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax


def _use_pallas() -> bool:
    """Route the filter recurrences through the Pallas TPU kernels unless
    running on CPU (tests) or explicitly disabled.  Under spatial
    line-sharding the kernels still run — per shard, via
    spatial.shard_rows_call (the rows dim is row-independent, so shard_map
    over the flattened (data, spatial) axes keeps the fused fast path while
    GSPMD only handles the seams).  NTSC_CRT_FORCE_PALLAS=1 forces the
    kernel path in interpret mode on CPU (sharded-kernel parity tests)."""
    if os.environ.get("NTSC_CRT_FORCE_SCAN"):
        return False
    if os.environ.get("NTSC_CRT_FORCE_PALLAS"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _pallas_interpret() -> bool:
    """interpret= flag for the kernel dispatches: True off-TPU (the Mosaic
    compiler only targets TPU; interpret mode runs the same lowering as
    pure XLA ops — bit-identical, used by the forced-kernel CPU tests)."""
    try:
        return jax.devices()[0].platform != "tpu"
    except Exception:
        return True

from ntsc_crt_tpu.ops.fixedpoint import (
    EXP_ONE,
    EXP_P,
    EXP_PI,
    T14_PI,
    host_expx,
    host_sincos14,
    host_tdiv,
)

EQ_P = 16  # crt_core.c:155
EQ_R = 1 << (EQ_P - 1)


# ---------------------------------------------------------------------------
# Coefficient derivation (trace-time, host ints)
# ---------------------------------------------------------------------------


class EQCoefs(NamedTuple):
    lf: int
    hf: int
    g_lo: int
    g_mid: int
    g_hi: int


def init_eq(f_lo: int, f_hi: int, rate: int, g_lo: int, g_mid: int, g_hi: int) -> EQCoefs:
    """Exact init_eq (crt_core.c:171-196) at EQ_P == 16."""
    sn, _ = host_sincos14(host_tdiv(T14_PI * f_lo, rate))
    lf = 2 * (sn << (EQ_P - 15))
    sn, _ = host_sincos14(host_tdiv(T14_PI * f_hi, rate))
    hf = 2 * (sn << (EQ_P - 15))
    return EQCoefs(lf, hf, g_lo, g_mid, g_hi)


def init_iir(freq: int, limit: int) -> int:
    """Exact init_iir coefficient (crt_ntsc.c:98-106): c for h += (s-h)*c >> 11."""
    rate = host_tdiv(freq << 9, limit)
    return EXP_ONE - host_expx(-host_tdiv(EXP_PI << 9, rate))


# ---------------------------------------------------------------------------
# Encode-side 1-pole IIR (crt_ntsc.c:117-126)
# ---------------------------------------------------------------------------


def iir_lowpass(s: jax.Array, c, hipass: bool = False) -> jax.Array:
    """h += ((s - h) * c) >> 11 marched along the LAST axis, h reset to 0.

    s: int32 [..., n]; c: int32 scalar or broadcastable to s[..., 0].
    Returns the filtered sequence (the reference returns h per sample);
    hipass=True returns s - h instead — the reference's HIPASS debug
    fixture (crt_ntsc.c:114-126).
    """
    s = jnp.asarray(s, jnp.int32)
    c = jnp.asarray(c, jnp.int32)
    if hipass:
        xs = jnp.moveaxis(s, -1, 0)

        def hstep(h, sx):
            h = h + (((sx - h) * c) >> EXP_P)
            return h, sx - h

        _, ys = lax.scan(hstep, jnp.zeros_like(xs[0]), xs)
        return jnp.moveaxis(ys, 0, -1)
    if _use_pallas():
        from ntsc_crt_tpu.ops.pallas import filters_pallas as fp
        from ntsc_crt_tpu.parallel import spatial
        lead = s.shape[:-1]
        rows = s.reshape(-1, s.shape[-1])
        crow = jnp.broadcast_to(c, lead).reshape(-1)
        interp = _pallas_interpret()
        y = spatial.shard_rows_call(
            lambda r, cr: fp.iir_lowpass_rows(r, cr, interpret=interp),
            rows, crow)
        return y.reshape(s.shape)
    xs = jnp.moveaxis(s, -1, 0)

    def step(h, sx):
        h = h + (((sx - h) * c) >> EXP_P)
        return h, h

    h0 = jnp.zeros_like(xs[0])
    _, ys = lax.scan(step, h0, xs)
    return jnp.moveaxis(ys, 0, -1)


# ---------------------------------------------------------------------------
# Decode-side 3-band EQ (crt_core.c:206-233)
# ---------------------------------------------------------------------------


def eq_threeband(s: jax.Array, lf, hf, g_lo, g_mid, g_hi) -> jax.Array:
    """Exact eqf() marched along the LAST axis with per-line state reset.

    s: int32 [..., n]; coefficients broadcastable to s[..., 0] (so Y/I/Q can
    ride a channel axis in one scan).  State: two cascaded 4-stage one-pole
    chains (fL, fH) + 3-deep history, all starting at zero (reset_eq,
    crt_core.c:198-204).
    """
    s = jnp.asarray(s, jnp.int32)
    lf = jnp.asarray(lf, jnp.int32)
    hf = jnp.asarray(hf, jnp.int32)
    g = (jnp.asarray(g_lo, jnp.int32), jnp.asarray(g_mid, jnp.int32),
         jnp.asarray(g_hi, jnp.int32))
    if _use_pallas():
        from ntsc_crt_tpu.ops.pallas import filters_pallas as fp
        from ntsc_crt_tpu.parallel import spatial
        lead = s.shape[:-1]
        rows = s.reshape(-1, s.shape[-1])
        cs = [jnp.broadcast_to(x, lead).reshape(-1)
              for x in (lf, hf, g[0], g[1], g[2])]
        interp = _pallas_interpret()
        y = spatial.shard_rows_call(
            lambda r, *c5: fp.eq_threeband_rows(r, *c5, interpret=interp),
            rows, *cs)
        return y.reshape(s.shape)
    xs = jnp.moveaxis(s, -1, 0)
    zero = jnp.zeros_like(xs[0])

    def step(carry, sx):
        fL, fH, h = carry  # tuples of per-stage arrays
        fL0 = fL[0] + ((lf * (sx - fL[0]) + EQ_R) >> EQ_P)
        fH0 = fH[0] + ((hf * (sx - fH[0]) + EQ_R) >> EQ_P)
        nL = [fL0]
        nH = [fH0]
        for i in range(1, 4):
            nL.append(fL[i] + ((lf * (nL[i - 1] - fL[i]) + EQ_R) >> EQ_P))
            nH.append(fH[i] + ((hf * (nH[i - 1] - fH[i]) + EQ_R) >> EQ_P))
        r0 = (nL[3] * g[0]) >> EQ_P
        r1 = ((nH[3] - nL[3]) * g[1]) >> EQ_P
        r2 = ((h[2] - nH[3]) * g[2]) >> EQ_P
        out = r0 + r1 + r2
        return (tuple(nL), tuple(nH), (sx, h[0], h[1])), out

    init = ((zero,) * 4, (zero,) * 4, (zero,) * 3)
    _, ys = lax.scan(step, init, xs)
    return jnp.moveaxis(ys, 0, -1)


# ---------------------------------------------------------------------------
# Convolution EQ — the reference's compile-time alternative to the 3-band
# equalizer (USE_CONVOLUTION, crt_core.c:96-147): a short symmetric FIR with
# zero history at line start.  "much faster but the EQ looks softer".
# Only valid for 4-sample chroma systems (crt_core.c:90-94).
# ---------------------------------------------------------------------------

_CONV_EQ_KERNELS = {
    7: ([1, 4, 7, 8, 7, 4, 1], 5),   # crt_core.c:130-133
    6: ([1, 3, 4, 4, 3, 1], 4),      # crt_core.c:134-137
    5: ([1, 2, 2, 2, 1], 3),         # crt_core.c:138-141
    4: ([1, 1, 1, 1], 2),            # crt_core.c:142-145
}


def eq_convolution(s: jax.Array, taps: int = 7) -> jax.Array:
    """out_i = (sum_k w_k * s_{i-k}) >> p along the last axis, zeros before
    the line start — exactly eqf() in the USE_CONVOLUTION build.  Pure
    static-shift adds; embarrassingly parallel (no recurrence)."""
    weights, shift = _CONV_EQ_KERNELS[taps]
    s = jnp.asarray(s, jnp.int32)
    out = jnp.zeros_like(s)
    for k, wk in enumerate(weights):
        shifted = s if k == 0 else jnp.pad(s, [(0, 0)] * (s.ndim - 1) + [(k, 0)])[..., :s.shape[-1]]
        out = out + wk * shifted
    return out >> shift
