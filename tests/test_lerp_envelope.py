"""Numeric envelope of the scan-conversion lerp (ops/fastpath.py):

The reference computes `(yiqA->y * L) >> 2` in int32 with -fwrapv wrap
(crt_core.c:565-570).  Our MXU limb decomposition is exact for |v| < 2^21
with the default 3 limbs; NTSC_CRT_LERP_WIDE=1 selects the 5-limb path,
exact mod 2^32 for ANY int32 input (VERDICT.md r1 weak #5)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from ntsc_crt_tpu.ops import fastpath


def _c_reference(vals, outw, shift):
    """The reference's exact semantics: int32-wrapped products, arithmetic
    shift, int32 sum."""
    T = vals.shape[-1]
    s, L, R = fastpath.lerp_resample_weights(T, outw)
    a = vals[:, s].astype(np.int64) * L
    b = vals[:, np.minimum(s + 1, T - 1)].astype(np.int64) * R
    return ((a.astype(np.int32) >> shift).astype(np.int64)
            + (b.astype(np.int32) >> shift)).astype(np.int32)


@pytest.fixture
def wide_env():
    os.environ["NTSC_CRT_LERP_WIDE"] = "1"
    yield
    os.environ.pop("NTSC_CRT_LERP_WIDE", None)


def test_narrow_exact_inside_envelope():
    vals = np.random.RandomState(0).randint(
        -(1 << 21) + 1, 1 << 21, (8, 753)).astype(np.int32)
    got = np.asarray(fastpath.lerp_resample(jnp.asarray(vals), 640, 2,
                                            wide=False))
    np.testing.assert_array_equal(got, _c_reference(vals, 640, 2))


def test_narrow_envelope_is_tight():
    """Past 2^21 the 3-limb path is documented-inexact — keep the envelope
    claim honest by asserting it actually diverges there."""
    vals = np.random.RandomState(1).randint(
        -(1 << 24), 1 << 24, (8, 753)).astype(np.int32)
    got = np.asarray(fastpath.lerp_resample(jnp.asarray(vals), 640, 2,
                                            wide=False))
    assert not np.array_equal(got, _c_reference(vals, 640, 2))


def test_auto_wide_selection():
    """Trace-time envelope guard (demodulate._lerp_wide_needed): concrete
    knobs inside the documented bounds pick the fast 3-limb form; traced or
    out-of-bounds knobs auto-widen."""
    import jax
    from ntsc_crt_tpu.models.demodulate import _lerp_wide_needed

    assert not _lerp_wide_needed(np.int32(10), np.int32(-50))
    assert not _lerp_wide_needed(np.full(4, 127, np.int32), np.int32(16384))
    assert _lerp_wide_needed(np.int32(128), np.int32(0))       # sat OOB
    assert _lerp_wide_needed(np.int32(10), np.int32(20000))    # bright OOB
    traced = []
    jax.make_jaxpr(lambda s: traced.append(_lerp_wide_needed(s, np.int32(0)))
                   or s)(np.int32(10))
    assert traced == [True]                                    # traced knob


def test_auto_wide_pipeline_parity():
    """Extreme knobs WITHOUT any env var: the guard must auto-select the
    wide form and stay bit-exact vs the oracle (VERDICT r3 weak #4)."""
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import NTSC
    from ntsc_crt_tpu.models import pipeline
    from ntsc_crt_tpu.models.demodulate import MonitorParams
    from oracle import Oracle

    assert "NTSC_CRT_LERP_WIDE" not in os.environ
    img = np.random.RandomState(4).randint(0, 256, (72, 96, 3), np.uint8)
    bright, sat = 2_000_000, 100_000
    orc = Oracle("NTSC", outw=160, outh=120)
    orc.crt.brightness = bright
    orc.crt.saturation = sat
    orc.modulate(img, field=0, frame=0)
    ref = orc.demodulate(noise=7)
    mon = MonitorParams(brightness=np.int32(bright),
                        saturation=np.int32(sat))
    st = pipeline.crt_init(NTSC, 160, 120)
    st = pipeline.step(NTSC, st, jnp.asarray(img), field=0, frame=0,
                       noise=7, mon=mon)
    np.testing.assert_array_equal(np.asarray(st.out), ref)


def test_wide_exact_full_int32(wide_env):
    rng = np.random.RandomState(2)
    vals = rng.randint(-2**31, 2**31 - 1, (8, 753), dtype=np.int64) \
        .astype(np.int32)
    got = np.asarray(fastpath.lerp_resample(jnp.asarray(vals), 640, 2))
    np.testing.assert_array_equal(got, _c_reference(vals, 640, 2))


def test_wide_pipeline_parity_extreme_knobs(wide_env):
    """Full roundtrip under NTSC_CRT_LERP_WIDE=1 with maxed knobs vs the
    oracle (the monitor values are unclamped in the reference; huge
    brightness/saturation wrap int32 identically on both sides)."""
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import NTSC
    from ntsc_crt_tpu.models import pipeline
    from ntsc_crt_tpu.models.demodulate import MonitorParams
    from oracle import Oracle

    img = np.random.RandomState(3).randint(0, 256, (72, 96, 3), np.uint8)
    for bright, sat in [(0, 10), (30, 25), (2_000_000, 100_000)]:
        orc = Oracle("NTSC", outw=160, outh=120)
        orc.crt.brightness = bright
        orc.crt.saturation = sat
        orc.modulate(img, field=0, frame=0)
        ref = orc.demodulate(noise=7)
        mon = MonitorParams(brightness=np.int32(bright),
                            saturation=np.int32(sat))
        st = pipeline.crt_init(NTSC, 160, 120)
        st = pipeline.step(NTSC, st, jnp.asarray(img), field=0, frame=0,
                           noise=7, mon=mon)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"bright={bright} sat={sat}")
