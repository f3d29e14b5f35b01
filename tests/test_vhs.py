"""VHS system parity: SP-mode bandwidths, head-switch aberration (sync-tip
loss at frame bottom), tracking-noise band, hsync reset per frame, zeroed ccf
export — all against the oracle built with the spec'd crt_rand."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import NTSCVHS
from ntsc_crt_tpu.models import pipeline
from oracle import Oracle
from oracle.parity import assert_parity_outside_ub
from helpers import run_step


def _img(seed, w=320, h=240):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("aberration", [0, 1])
def test_vhs_roundtrip(aberration):
    seed = 987654
    orc = Oracle("NTSCVHS", outw=320, outh=240)
    orc.srand(seed)

    st = pipeline.crt_init(NTSCVHS, 320, 240, rand_seed=seed)

    img = _img(4)
    field = frame = 0
    for n in range(3):
        orc.modulate(img, field=field, frame=frame,
                     do_aberration=aberration)
        ref = orc.demodulate(noise=20)
        st = run_step(NTSCVHS, st, img, field=field, frame=frame, noise=20,
                      do_aberration=aberration)
        np.testing.assert_array_equal(np.asarray(st.analog), orc.analog,
                                      err_msg=f"frame {n} analog")
        got = np.asarray(st.out)
        # Output rows sourced from the final analog line are excluded: there
        # the reference reads past its signal buffer (UB) and our gathers
        # wrap — the ONE shared helper (oracle/parity.py) computes the
        # excluded rows, and its surface is pinned by a golden fixture in
        # test_edge_modes.py.
        assert_parity_outside_ub(got, ref, NTSCVHS, orc.crt.vsync,
                                 err_msg=f"frame {n} out")
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
        assert int(st.hsync) == orc.crt.hsync, f"frame {n} hsync"
        assert int(st.rn) == orc.crt.rn, f"frame {n} rn"
        field ^= 1
        if n == 1:
            frame ^= 1
