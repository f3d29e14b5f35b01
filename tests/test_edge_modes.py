"""Oracle parity for the less-traveled encoder options: raw (unscaled)
input, x/y offsets, extreme monitor knobs, odd output geometries."""

import numpy as np
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import NTSC, SNES
from ntsc_crt_tpu.models import pipeline
from ntsc_crt_tpu.models.demodulate import MonitorParams
from oracle import Oracle


def _img(seed, w, h):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def test_raw_mode_parity():
    """raw=1 skips the fit-to-monitor scaling (crt_ntsc.c:163-172) — needed
    for artifact-color probe images."""
    orc = Oracle("NTSC", outw=640, outh=480)
    img = _img(11, w=640, h=200)  # w < AV_LEN, h < desth cap
    orc.modulate(img, field=0, frame=0, raw=1)
    ref = orc.demodulate(noise=0)
    st = pipeline.crt_init(NTSC, 640, 480)
    st = pipeline.step(NTSC, st, jnp.asarray(img), field=0, frame=0,
                       noise=0, raw=True)
    np.testing.assert_array_equal(np.asarray(st.out), ref)


def test_offsets_parity():
    """x/y offsets shift the active block in signal space (crt_ntsc.c:194)."""
    orc = Oracle("NTSC", outw=320, outh=240)
    img = _img(12, w=160, h=120)
    orc.modulate(img, field=0, frame=0, xoffset=24, yoffset=5)
    ref = orc.demodulate(noise=0)
    st = pipeline.crt_init(NTSC, 320, 240)
    st = pipeline.modulate(NTSC, st, jnp.asarray(img), field=0, frame=0,
                           xoffset=24, yoffset=5)
    np.testing.assert_array_equal(np.asarray(st.analog), orc.analog)
    st = pipeline.demodulate(NTSC, st, noise=0)
    got = np.asarray(st.out)
    # exclude rows sourced from the final analog line, where the reference
    # reads past its buffer (UB) and we wrap — see docs/PARITY.md #1
    vs = int(st.vsync)
    ok = np.ones(240, bool)
    for line in range(NTSC.top, NTSC.bot):
        if (line + vs + 3) % NTSC.vres == NTSC.vres - 1:
            beg = (line - NTSC.top) * 240 // NTSC.lines
            ok[max(0, beg):beg + 3] = False
    np.testing.assert_array_equal(got[ok], ref[ok])
    assert (got != ref).mean() < 1e-3


def test_extreme_knobs_parity():
    orc = Oracle("SNES", outw=320, outh=240)
    orc.crt.saturation = 25
    orc.crt.contrast = 255
    orc.crt.brightness = -30
    orc.crt.hue = 350
    img = _img(13, w=256, h=224)
    orc.modulate(img, field=0, frame=0, hue=180, dot_crawl_offset=2)
    ref = orc.demodulate(noise=40)
    mon = MonitorParams(saturation=np.int32(25), contrast=np.int32(255),
                        brightness=np.int32(-30), hue=np.int32(350))
    st = pipeline.crt_init(SNES, 320, 240)
    st = pipeline.step(SNES, st, jnp.asarray(img), field=0, frame=0,
                       hue=180, noise=40, mon=mon, dot_crawl_offset=2)
    np.testing.assert_array_equal(np.asarray(st.out), ref)


def test_odd_output_geometry():
    """Non-multiple output sizes exercise the general (matmul) row placement
    and the fractional scan-conversion stepping."""
    orc = Oracle("NTSC", outw=531, outh=377)
    img = _img(14, w=123, h=77)
    orc.modulate(img, field=1, frame=0)
    ref = orc.demodulate(noise=3)
    st = pipeline.crt_init(NTSC, 531, 377)
    st = pipeline.step(NTSC, st, jnp.asarray(img), field=1, frame=0, noise=3)
    np.testing.assert_array_equal(np.asarray(st.out), ref)
