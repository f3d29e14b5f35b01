"""Bit-exact decode parity vs the compiled reference for the NTSC system:
single frame, the CLI's 4-frame interlace+blend accumulation loop
(crt_main.c:241-255), seeded noise, and monitor-knob sweeps."""

import numpy as np
import pytest
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import NTSC
from ntsc_crt_tpu.models import pipeline
from ntsc_crt_tpu.models.demodulate import MonitorParams
from oracle import Oracle
from helpers import run_step


def _img(seed, w=320, h=240):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _oracle_state(orc):
    return dict(hsync=orc.crt.hsync, vsync=orc.crt.vsync, rn=orc.crt.rn,
                ccf=orc.ccf.tolist())


def test_single_frame_noise0():
    """Flagship full-geometry (640x480) parity case."""
    orc = Oracle("NTSC", outw=640, outh=480)
    img = _img(1)
    orc.modulate(img, field=0, frame=0)
    ref = orc.demodulate(noise=0)

    st = pipeline.crt_init(NTSC, 640, 480)
    st = run_step(NTSC, st, img)
    got = np.asarray(st.out)
    np.testing.assert_array_equal(got, ref, err_msg=str(_oracle_state(orc)))
    assert int(st.hsync) == orc.crt.hsync
    assert int(st.vsync) == orc.crt.vsync
    assert int(st.rn) == orc.crt.rn
    np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)


@pytest.mark.parametrize("noise", [0, 24, 80])
def test_cli_accumulation_loop(noise):
    """The reference CLI converts an image by running 4 frames with blend=1,
    scanlines=1, toggling field and frame parity (crt_main.c:235-255)."""
    orc = Oracle("NTSC", outw=640, outh=480)
    orc.crt.blend = 1
    orc.crt.scanlines = 1
    img = _img(2)

    st = pipeline.crt_init(NTSC, 640, 480)
    mon = MonitorParams(blend=jnp.int32(1), scanlines=jnp.int32(1))

    field, frame = 0, 0
    for n in range(4):
        orc.modulate(img, field=field, frame=frame)
        ref = orc.demodulate(noise=noise)
        st = run_step(NTSC, st, img, field=field, frame=frame, noise=noise,
                      mon=mon)
        np.testing.assert_array_equal(np.asarray(st.out), ref,
                                      err_msg=f"frame {n} {_oracle_state(orc)}")
        field ^= 1
        if n == 1:
            frame ^= 1  # crt_main.c:247-251

    assert int(st.hsync) == orc.crt.hsync
    assert int(st.vsync) == orc.crt.vsync
    np.testing.assert_array_equal(np.asarray(st.ccf), orc.ccf)


@pytest.mark.parametrize("outh,scanlines", [(720, 1), (720, 2), (240, 0)])
def test_interlace_at_other_repeat_ratios(outh, scanlines):
    """outh = 3*L and 1*L exercise the stacked uniform placement at ratio
    != 2: the odd-field bottom clip (crt_core.c:432 end=outh) makes the last
    group's duplicate range shrink — a ratio>=3 + scanlines>=1 regression
    shipped in round 2 (ADVICE.md r2 #2 / the kL fix in demodulate.py)."""
    orc = Oracle("NTSC", outw=640, outh=outh)
    orc.crt.scanlines = scanlines
    img = _img(11)

    st = pipeline.crt_init(NTSC, 640, outh)
    mon = MonitorParams(scanlines=jnp.int32(scanlines))

    field, frame = 0, 0
    for n in range(4):
        orc.modulate(img, field=field, frame=frame)
        ref = orc.demodulate(noise=0)
        st = run_step(NTSC, st, img, field=field, frame=frame, mon=mon)
        np.testing.assert_array_equal(
            np.asarray(st.out), ref,
            err_msg=f"frame {n} field {field} {_oracle_state(orc)}")
        field ^= 1
        if n == 1:
            frame ^= 1


def test_monitor_knobs():
    orc = Oracle("NTSC", outw=320, outh=240)
    orc.crt.hue = 33
    orc.crt.brightness = 10
    orc.crt.contrast = 210
    orc.crt.saturation = 18
    orc.crt.black_point = 4
    orc.crt.white_point = 110
    img = _img(3)
    orc.modulate(img, field=0, frame=0)
    ref = orc.demodulate(noise=5)

    st = pipeline.crt_init(NTSC, 320, 240)
    mon = MonitorParams(hue=jnp.int32(33), brightness=jnp.int32(10),
                        contrast=jnp.int32(210), saturation=jnp.int32(18),
                        black_point=jnp.int32(4), white_point=jnp.int32(110))
    st = run_step(NTSC, st, img, noise=5, mon=mon)
    np.testing.assert_array_equal(np.asarray(st.out), ref)


@pytest.mark.parametrize("v_fac", [60, 240, 480])
@pytest.mark.parametrize("blend,scanlines", [(0, 0), (1, 1)])
def test_v_fac_vertical_stretch(v_fac, blend, scanlines):
    """v_fac stretches beg/end row mapping (crt_core.h:86, crt_core.c:428-429)
    while the odd-field shift still derives from outh alone
    (crt_core.c:403-406) — oracle parity across 4 interlaced frames,
    including outh+v_fac a multiple of CRT_LINES (the uniform-path gate's
    risk regime, VERDICT.md r2 #6)."""
    outw, outh = 320, 240
    orc = Oracle("NTSC", outw=outw, outh=outh)
    orc.crt.v_fac = v_fac
    orc.crt.blend = blend
    orc.crt.scanlines = scanlines
    img = _img(13)

    st = pipeline.crt_init(NTSC, outw, outh)
    mon = MonitorParams(blend=jnp.int32(blend),
                        scanlines=jnp.int32(scanlines))

    field, frame = 0, 0
    for n in range(4):
        orc.modulate(img, field=field, frame=frame)
        ref = orc.demodulate(noise=0)
        st = run_step(NTSC, st, img, field=field, frame=frame, mon=mon,
                      v_fac=v_fac)
        np.testing.assert_array_equal(
            np.asarray(st.out), ref,
            err_msg=f"v_fac={v_fac} frame {n} {_oracle_state(orc)}")
        field ^= 1
        if n == 1:
            frame ^= 1
