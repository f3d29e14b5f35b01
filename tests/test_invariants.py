"""Behavioral invariants from the reference docs (SURVEY.md §4): artifact
colors from B/W probes, dot-crawl periodicity, vsync recovery under noise,
the rainbow chroma variant, and crt_resize."""

import numpy as np
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import NTSC, SYSTEMS
from ntsc_crt_tpu.models import pipeline
from helpers import run_step, run_modulate, run_demodulate


def test_artifact_colors_from_bw_probe():
    """A purely black/white high-frequency pattern must decode IN COLOR
    (README.md:9-12, 62-63) when passed raw."""
    img = np.zeros((240, 640, 3), np.uint8)
    img[:, 0::4] = 255  # stripes at the subcarrier frequency (4 samples/cc)
    img[:, 1::4] = 255
    st = pipeline.crt_init(NTSC, 640, 480)
    st = run_step(NTSC, st, img, raw=True)
    out = np.asarray(st.out).astype(int)
    chroma = np.abs(out[..., 0] - out[..., 2]).mean()
    assert chroma > 8, f"expected artifact colors, chroma={chroma}"


def test_vsync_recovery_under_noise():
    """The decoder must keep vertical lock across heavy noise
    (crt_core.c:369-397 'integrated to lessen the noise')."""
    img = np.random.RandomState(0).randint(0, 256, (240, 320, 3), np.uint8)
    st = pipeline.crt_init(NTSC, 320, 240)
    for n in range(4):
        st = run_step(NTSC, st, img, field=n & 1, noise=90)
    # vsync estimate stays near the true sync region (lines 3-6 + jitter)
    assert 0 <= int(st.vsync) <= 10


def test_rainbow_variant_runs():
    cfg = SYSTEMS["NTSC_RAINBOW"]
    assert cfg.hres == 912
    img = np.random.RandomState(1).randint(0, 256, (72, 96, 3), np.uint8)
    st = pipeline.crt_init(cfg, 160, 120)
    st = run_step(cfg, st, img)
    assert np.asarray(st.out).mean() > 5


def test_dot_crawl_periodicity():
    """SNES chroma phase repeats every CC_VPER lines: modulating with
    dot_crawl_offset=k equals shifting the phase pattern by k lines in the
    carrier tables (vert term (y + dco) * step, crt_snes.c:172)."""
    cfg = SYSTEMS["SNES"]
    img = np.random.RandomState(2).randint(0, 256, (72, 96, 3), np.uint8)
    outs = []
    for dco in range(cfg.cc_vper + 1):
        st = pipeline.crt_init(cfg, 160, 120)
        st = run_modulate(cfg, st, img, dot_crawl_offset=dco)
        outs.append(np.asarray(st.analog))
    np.testing.assert_array_equal(outs[0], outs[cfg.cc_vper])  # period VPER
    assert (outs[0] != outs[1]).any()


def test_crt_resize():
    img = np.random.RandomState(3).randint(0, 256, (72, 96, 3), np.uint8)
    st = pipeline.crt_init(NTSC, 160, 120)
    st = run_step(NTSC, st, img)
    st2 = pipeline.crt_resize(NTSC, st, 320, 240)
    assert st2.out.shape == (240, 320, 3)
    np.testing.assert_array_equal(np.asarray(st2.analog), np.asarray(st.analog))
    st2 = run_demodulate(NTSC, st2, noise=0)
    assert np.asarray(st2.out).mean() > 5
