"""Every reference build-variant mode is reachable from the driver surfaces
(VERDICT r3 missing #3): pipeline.step, video_exact/strided, LiveSession,
and the CLIs plumb do_bloom / eq_mode / do_vsync / do_hsync /
draw_border+border_color / optimized (crt_core.h:70-72, crt_core.c:85-147,
crt_nes.c:63-69).  Bit-exact parity for the modes themselves lives in
test_variants_parity.py; these are cheap reachability smokes pinning that
each surface forwards the kwargs to the same core path."""

import numpy as np
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import NTSC, NES
from ntsc_crt_tpu.models import pipeline, video


def _img(seed=0, w=96, h=72):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def test_step_forwards_modes():
    """step(mode kwargs) ≡ explicit modulate(...) + demodulate(...)."""
    img = jnp.asarray(_img())
    st0 = pipeline.crt_init(NTSC, 160, 120)
    got = pipeline.step(NTSC, st0, img, field=0, frame=0, noise=0,
                        do_bloom=True, eq_mode="threeband",
                        do_vsync=False, do_hsync=False)
    ref = pipeline.modulate(NTSC, st0, img, field=0, frame=0, do_bloom=True)
    ref = pipeline.demodulate(NTSC, ref, noise=0, do_bloom=True,
                              do_vsync=False, do_hsync=False)
    np.testing.assert_array_equal(np.asarray(got.out), np.asarray(ref.out))
    assert int(got.vsync) == int(ref.vsync) == -3     # CRT_DO_VSYNC=0 pin


def test_step_forwards_conv_eq():
    img = jnp.asarray(_img(1))
    st0 = pipeline.crt_init(NTSC, 160, 120)
    a = pipeline.step(NTSC, st0, img, field=0, frame=0, eq_mode="conv7")
    b = pipeline.demodulate(
        NTSC, pipeline.modulate(NTSC, st0, img, field=0, frame=0),
        noise=0, eq_mode="conv7")
    np.testing.assert_array_equal(np.asarray(a.out), np.asarray(b.out))


def test_step_forwards_nes_modes():
    ppu = np.random.RandomState(2).randint(0, 512, (120, 128), np.uint16)
    st0 = pipeline.crt_init(NES, 160, 120)
    a = pipeline.step(NES, st0, jnp.asarray(ppu), draw_border=True,
                      border_color=0x22, optimized=False)
    b = pipeline.modulate(NES, st0, jnp.asarray(ppu), draw_border=True,
                          border_color=0x22, optimized=False,
                          black_point=0, white_point=100)
    np.testing.assert_array_equal(np.asarray(a.analog), np.asarray(b.analog))


def test_video_exact_forwards_modes():
    frames = jnp.asarray(np.stack([_img(i) for i in range(2)]))
    st0 = pipeline.crt_init(NTSC, 160, 120)
    _, outs = video.video_exact(NTSC, st0, frames, noise=0, do_bloom=True)
    # serial reference: two steps by hand
    st = st0
    ref = []
    for i, (fi, fr) in enumerate([(0, 0), (1, 1)]):
        st = pipeline.step(NTSC, st, frames[i], field=fi, frame=fr,
                           noise=0, do_bloom=True,
                           dot_crawl_offset=i % max(NTSC.cc_vper, 1))
        ref.append(np.asarray(st.out))
    np.testing.assert_array_equal(np.asarray(outs), np.stack(ref))


def test_video_strided_forwards_modes():
    frames = jnp.asarray(np.stack([_img(i) for i in range(2)]))
    sts = pipeline.crt_init(NTSC, 160, 120, batch=2)
    _, outs = video.video_strided(NTSC, sts, frames, noise=0,
                                  eq_mode="conv4")
    assert outs.shape == (2, 120, 160, 3)
    assert np.asarray(outs).mean() > 5


def test_live_session_modes():
    from ntsc_crt_tpu.apps.live import LiveSession
    s = LiveSession(NTSC, outw=160, outh=120, do_bloom=True)
    out = s.tick(_img())
    st0 = pipeline.crt_init(NTSC, 160, 120)
    st = pipeline.step(NTSC, st0, jnp.asarray(_img()), field=0, frame=1,
                       do_bloom=True)
    np.testing.assert_array_equal(out, np.asarray(st.out))


def test_conv_eq_fused_matches_portable(monkeypatch):
    """The fused decode kernel's FIR mode, end to end: forced-Pallas
    (interpret) conv7 decode ≡ portable conv7 decode."""
    img = jnp.asarray(_img(5))
    st0 = pipeline.crt_init(NTSC, 160, 120)
    st_mod = pipeline.modulate(NTSC, st0, img, field=0, frame=0)
    ref = pipeline.demodulate(NTSC, st_mod, noise=11, eq_mode="conv7")
    monkeypatch.setenv("NTSC_CRT_FORCE_PALLAS", "1")
    got = pipeline.demodulate(NTSC, st_mod, noise=11, eq_mode="conv7")
    np.testing.assert_array_equal(np.asarray(got.out), np.asarray(ref.out))


def test_cli_bloom_eq_flags(tmp_path):
    from ntsc_crt_tpu import cli
    from ntsc_crt_tpu.utils import imageio
    src = tmp_path / "in.ppm"
    dst = tmp_path / "out.ppm"
    imageio.write_image(str(src), _img())
    rc = cli.main(["--bloom", "--eq", "conv7", "-op", "160", "120", "0", "0",
                   str(src), str(dst)])
    assert rc == 0 and dst.exists()
    out = imageio.read_image(str(dst))
    assert out.shape == (120, 160, 3) and out.mean() > 1
