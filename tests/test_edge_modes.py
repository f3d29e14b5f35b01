"""Oracle parity for the less-traveled encoder options: raw (unscaled)
input, x/y offsets, extreme monitor knobs, odd output geometries."""

import numpy as np
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import NTSC, SNES
from ntsc_crt_tpu.models import pipeline
from ntsc_crt_tpu.models.demodulate import MonitorParams
from oracle import Oracle
from oracle.parity import assert_parity_outside_ub
from helpers import run_step, run_modulate, run_demodulate


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
    st = run_step(NTSC, st, img, raw=True)
    np.testing.assert_array_equal(np.asarray(st.out), ref)


def test_offsets_parity():
    """x/y offsets shift the active block in signal space (crt_ntsc.c:194)."""
    orc = Oracle("NTSC", outw=320, outh=240)
    img = _img(12, w=160, h=120)
    orc.modulate(img, field=0, frame=0, xoffset=24, yoffset=5)
    ref = orc.demodulate(noise=0)
    st = pipeline.crt_init(NTSC, 320, 240)
    st = run_modulate(NTSC, st, img, xoffset=24, yoffset=5)
    np.testing.assert_array_equal(np.asarray(st.analog), orc.analog)
    st = run_demodulate(NTSC, st, noise=0)
    got = np.asarray(st.out)
    # rows sourced from the final analog line are excluded (reference reads
    # OOB there — UB; we wrap): see oracle/parity.py and docs/PARITY.md #1
    assert_parity_outside_ub(got, ref, NTSC, int(st.vsync))


def test_ub_divergence_fixture(tmp_path):
    """Pin the wrap-vs-UB divergence surface itself: the excluded rows'
    contents are a golden fixture (tests/fixtures/ub_rows.npz), so a
    regression INSIDE the masked region is caught, not hidden by the mask
    (VERDICT.md r1 weak #8)."""
    from pathlib import Path
    from oracle.parity import ub_rows
    orc = Oracle("NTSC", outw=320, outh=240)
    img = _img(12, w=160, h=120)
    orc.modulate(img, field=0, frame=0, xoffset=24, yoffset=5)
    ref = orc.demodulate(noise=0)
    st = pipeline.crt_init(NTSC, 320, 240)
    st = run_modulate(NTSC, st, img, xoffset=24, yoffset=5)
    st = run_demodulate(NTSC, st, noise=0)
    got = np.asarray(st.out)
    ok = ub_rows(NTSC, int(st.vsync), 240)
    masked = got[~ok]
    fix_path = Path(__file__).parent / "fixtures" / "ub_rows.npz"
    if not fix_path.exists():  # first run records the golden fixture
        fix_path.parent.mkdir(exist_ok=True)
        np.savez_compressed(fix_path, rows=np.where(~ok)[0], masked=masked,
                            ref_masked=ref[~ok])
    fix = np.load(fix_path)
    np.testing.assert_array_equal(np.where(~ok)[0], fix["rows"],
                                  err_msg="UB row set moved")
    np.testing.assert_array_equal(masked, fix["masked"],
                                  err_msg="wrapped-row contents changed")
    np.testing.assert_array_equal(ref[~ok], fix["ref_masked"],
                                  err_msg="oracle UB-row contents changed")


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
    st = run_step(SNES, st, img, hue=180, noise=40, mon=mon,
                  dot_crawl_offset=2)
    np.testing.assert_array_equal(np.asarray(st.out), ref)


def test_odd_output_geometry():
    """Non-multiple output sizes exercise the general (matmul) row placement
    and the fractional scan-conversion stepping."""
    orc = Oracle("NTSC", outw=531, outh=377)
    img = _img(14, w=123, h=77)
    orc.modulate(img, field=1, frame=0)
    ref = orc.demodulate(noise=3)
    st = pipeline.crt_init(NTSC, 531, 377)
    st = run_step(NTSC, st, img, field=1, noise=3)
    np.testing.assert_array_equal(np.asarray(st.out), ref)


def test_blend_small_outh_divergence_fixture():
    """Pin documented divergence #2 (docs/PARITY.md): with blend=1 and
    outh < CRT_LINES the reference blends a row against values written
    earlier in the SAME call (each output row is hit by ~L/outh lines),
    while the parallel placement resolves last-writer-wins against the
    PREVIOUS frame.  Golden fixture pins both sides' full frames and the
    divergence region's shape, so a regression inside the divergent regime
    is caught rather than hidden (VERDICT.md r2 weak #5)."""
    from pathlib import Path
    outw, outh = 160, 120          # outh < CRT_LINES=240: 2 lines per row
    orc = Oracle("NTSC", outw=outw, outh=outh)
    orc.crt.blend = 1
    img = _img(21, w=160, h=120)
    from ntsc_crt_tpu.models.demodulate import MonitorParams
    mon = MonitorParams(blend=jnp.int32(1))
    st = pipeline.crt_init(NTSC, outw, outh)
    field = frame = 0
    for n in range(2):             # 2 frames so prev-frame blending engages
        orc.modulate(img, field=field, frame=frame)
        ref = orc.demodulate(noise=0)
        st = run_step(NTSC, st, img, field=field, frame=frame, mon=mon)
        field ^= 1
    got = np.asarray(st.out)

    fix_path = Path(__file__).parent / "fixtures" / "blend_small_outh.npz"
    if not fix_path.exists():      # first run records the golden fixture
        np.savez_compressed(fix_path, got=got, ref=ref)
    fix = np.load(fix_path)
    div_rows = np.where((got != ref).any(axis=(1, 2)))[0]
    fix_div = np.where((fix["got"] != fix["ref"]).any(axis=(1, 2)))[0]
    np.testing.assert_array_equal(div_rows, fix_div,
                                  err_msg="divergence region moved")
    np.testing.assert_array_equal(got, fix["got"],
                                  err_msg="framework side changed")
    np.testing.assert_array_equal(ref, fix["ref"],
                                  err_msg="oracle side changed")
    # sync state must be immune to the divergence (it precedes placement)
    assert int(st.hsync) == orc.crt.hsync
    assert int(st.vsync) == orc.crt.vsync
