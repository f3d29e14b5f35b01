"""Cross-system bit-exact parity: every system's modulator output (full
analog field + ccf export) and full encode+decode round trip vs the compiled
reference.  VHS noise/aberration paths are covered in test_vhs.py."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import SYSTEMS
from ntsc_crt_tpu.models import pipeline
from ntsc_crt_tpu.models.demodulate import MonitorParams
from oracle import Oracle
from helpers import run_step, run_modulate


def _img(seed, w=320, h=240):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _ppu(seed, w=256, h=240):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 512, size=(h, w), dtype=np.uint16)


RGB_SYSTEMS = ["NTSC", "SNES", "TEMPLATE", "PV1K", "NESRGB"]


@pytest.mark.parametrize("system", RGB_SYSTEMS + ["NES"])
def test_modulate_parity(system):
    cfg = SYSTEMS[system]
    orc = Oracle(system, outw=320, outh=240)
    img = _ppu(0) if system == "NES" else _img(0)

    st = pipeline.crt_init(cfg, 320, 240)
    for dc in (0, 1, 2):
        orc.modulate(img, field=0, frame=0, hue=0, dot_crawl_offset=dc)
        st = run_modulate(cfg, st, img, dc=dc)
        np.testing.assert_array_equal(np.asarray(st.analog), orc.analog,
                                      err_msg=f"{system} dc={dc} analog")
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf,
                                      err_msg=f"{system} dc={dc} ccf")


@pytest.mark.parametrize("system", RGB_SYSTEMS + ["NES"])
@pytest.mark.parametrize("noise", [0, 30])
def test_roundtrip_parity(system, noise):
    cfg = SYSTEMS[system]
    orc = Oracle(system, outw=320, outh=240)
    img = _ppu(1) if system == "NES" else _img(1)

    st = pipeline.crt_init(cfg, 320, 240)
    field = frame = 0
    for n in range(3):
        dc = n % 3
        orc.modulate(img, field=field, frame=frame, dot_crawl_offset=dc)
        ref = orc.demodulate(noise=noise)
        st = run_step(cfg, st, img, field=field, frame=frame, noise=noise,
                      dc=dc)
        np.testing.assert_array_equal(
            np.asarray(st.out), ref, err_msg=f"{system} frame {n}")
        assert int(st.hsync) == orc.crt.hsync, f"{system} frame {n} hsync"
        assert int(st.vsync) == orc.crt.vsync
        np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)
        if not cfg.progressive:
            field ^= 1
