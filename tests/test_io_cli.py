"""Image I/O round trips, pixel-format packing, CLI end-to-end vs the
reference CLI semantics (4-frame blend accumulation), analog dump."""

import numpy as np
import pytest

from ntsc_crt_tpu.utils import imageio, formats


def _img(seed, w=64, h=48):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def test_ppm_roundtrip(tmp_path):
    img = _img(0)
    p = tmp_path / "x.ppm"
    imageio.ppm_write(p, img)
    np.testing.assert_array_equal(imageio.ppm_read(p), img)


def test_ppm_maxval_rescale(tmp_path):
    p = tmp_path / "lo.ppm"
    img = np.clip(_img(1), 0, 63)
    with open(p, "wb") as f:
        f.write(b"P6\n# comment\n64 48\n63\n")
        f.write(img.tobytes())
    got = imageio.ppm_read(p)
    want = ((img.astype(np.uint32) * 255 + 31) // 63).astype(np.uint8)
    np.testing.assert_array_equal(got, want)


def test_bmp_roundtrip(tmp_path):
    img = _img(2, w=33, h=21)  # odd width exercises row padding
    p = tmp_path / "x.bmp"
    imageio.bmp_write(p, img)
    np.testing.assert_array_equal(imageio.bmp_read(p), img)


def test_format_pack_unpack():
    img = _img(3)
    for fmt in range(6):
        packed = formats.from_rgb(img, fmt)
        assert packed.shape[-1] == formats.bpp(fmt)
        np.testing.assert_array_equal(formats.to_rgb(packed, fmt), img)
    assert formats.bpp(99) == 0


def test_cli_matches_reference_cli(tmp_path):
    """Full `ntsc -o 200 150 0 0 in.ppm out.ppm` vs the same sequence run
    through the oracle (interlaced 4-frame accumulation, crt_main.c:241-255)."""
    from ntsc_crt_tpu import cli
    from oracle import Oracle

    img = _img(4, w=96, h=72)
    inp = tmp_path / "in.ppm"
    outp = tmp_path / "out.ppm"
    imageio.ppm_write(inp, img)
    # outh >= CRT_LINES so the blend row-placement is in its exact regime
    # (see demodulate._place_rows docstring)
    rc = cli.main(["-o", "320", "240", "0", "0", str(inp), str(outp)])
    assert rc == 0
    got = imageio.ppm_read(outp)

    orc = Oracle("NTSC", outw=320, outh=240)
    orc.crt.blend = 1
    orc.crt.scanlines = 1
    field = frame = 0
    for it in range(4):
        orc.modulate(img, field=field, frame=frame)
        ref = orc.demodulate(noise=0)
        field ^= 1
        orc.modulate(img, field=field, frame=frame)
        ref = orc.demodulate(noise=0)
        if (it & 1) == 0:
            frame ^= 1
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("flags,hue,kw", [
    ("-op", 123, dict()),                    # nonzero artifact hue
    ("-op", -77, dict()),                    # negative hue: C `%= 360` keeps sign
    ("-omp", 0, dict(as_color=0)),           # -m monochrome
    ("-orp", 0, dict(raw=1)),                # -r raw image
])
def test_cli_flag_forwarding(tmp_path, flags, hue, kw):
    """hue/-m/-r must reach the encoder (crt_main.c:229-232; ADVICE.md r1:
    artifact_hue was parsed but silently dropped)."""
    from ntsc_crt_tpu import cli
    from oracle import Oracle

    img = _img(6, w=96, h=72)
    inp = tmp_path / "in.ppm"
    outp = tmp_path / "out.ppm"
    imageio.ppm_write(inp, img)
    rc = cli.main([flags, "320", "240", "0", str(hue), str(inp), str(outp)])
    assert rc == 0
    got = imageio.ppm_read(outp)

    orc = Oracle("NTSC", outw=320, outh=240)
    orc.crt.blend = 1
    orc.crt.scanlines = 1
    chue = hue % 360 if hue >= 0 else -((-hue) % 360)
    for _ in range(4):  # -p: progressive, 4 frames (crt_main.c:241-249)
        orc.modulate(img, field=0, frame=0, hue=chue, **kw)
        ref = orc.demodulate(noise=0)
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("fmt_name", ["bgra", "argb", "abgr", "rgba", "bgr"])
def test_output_format_bytes_vs_oracle(fmt_name):
    """Non-RGB output layouts byte-for-byte vs the oracle decoding straight
    into that format (crt_core.c:613-656), including the blend readback
    swizzle (crt_core.c:584-606)."""
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import NTSC
    from ntsc_crt_tpu.models import pipeline
    from ntsc_crt_tpu.models.demodulate import MonitorParams
    from oracle import Oracle
    from oracle.oracle import FMT_RGB

    fmt = formats.by_name(fmt_name)
    # outh >= CRT_LINES keeps the blend row-placement in its exact regime
    # (see demodulate._place_rows docstring)
    orc = Oracle("NTSC", outw=320, outh=240, fmt=fmt)
    orc.crt.blend = 1
    img = _img(7, w=96, h=72)
    mon = MonitorParams(blend=np.int32(1))
    st = pipeline.crt_init(NTSC, 320, 240)
    for n in range(2):  # two frames so blend reads back prior output bytes
        orc.modulate(img, field=0, frame=0, fmt=FMT_RGB)
        raw_ref = orc.demodulate(noise=0)
        st = pipeline.step(NTSC, st, jnp.asarray(img), field=0, frame=0,
                           noise=0, mon=mon)
        got = formats.from_rgb(np.asarray(st.out), fmt)
        np.testing.assert_array_equal(got, raw_ref,
                                      err_msg=f"{fmt_name} frame {n}")


def test_cli_system_selection(tmp_path):
    """`ntsc -s SNES ...` matches the SNES-compiled reference CLI sequence;
    NES is rejected (crt_main.c:25-27)."""
    from ntsc_crt_tpu import cli
    from oracle import Oracle

    img = _img(8, w=96, h=72)
    inp = tmp_path / "in.ppm"
    outp = tmp_path / "out.ppm"
    imageio.ppm_write(inp, img)
    rc = cli.main(["-s", "SNES", "-o", "320", "240", "0", "0",
                   str(inp), str(outp)])
    assert rc == 0
    got = imageio.ppm_read(outp)

    orc = Oracle("SNES", outw=320, outh=240)
    orc.crt.blend = 1
    orc.crt.scanlines = 1
    field = frame = 0
    for it in range(4):
        orc.modulate(img, field=field, frame=frame)
        ref = orc.demodulate(noise=0)
        field ^= 1
        orc.modulate(img, field=field, frame=frame)
        ref = orc.demodulate(noise=0)
        if (it & 1) == 0:
            frame ^= 1
    np.testing.assert_array_equal(got, ref)

    assert cli.main(["-s", "NES", "-o", "320", "240", "0", "0",
                     str(inp), str(outp)]) == 1


def test_cli_raw_format_output(tmp_path):
    """`--fmt bgra` + .raw outfile dumps the oracle's exact BGRA bytes."""
    from ntsc_crt_tpu import cli
    from oracle import Oracle
    from oracle.oracle import FMT_BGRA, FMT_RGB

    img = _img(9, w=96, h=72)
    inp = tmp_path / "in.ppm"
    outp = tmp_path / "out.raw"
    imageio.ppm_write(inp, img)
    rc = cli.main(["--fmt", "bgra", "-op", "320", "240", "0", "0",
                   str(inp), str(outp)])
    assert rc == 0
    got = np.frombuffer(outp.read_bytes(), np.uint8)

    orc = Oracle("NTSC", outw=320, outh=240, fmt=FMT_BGRA)
    orc.crt.blend = 1
    orc.crt.scanlines = 1
    for _ in range(4):
        orc.modulate(img, field=0, frame=0, fmt=FMT_RGB)
        ref = orc.demodulate(noise=0)
    np.testing.assert_array_equal(got, ref.ravel())


def test_analog_dump(tmp_path):
    from ntsc_crt_tpu import cli
    img = _img(5)
    inp = tmp_path / "in.ppm"
    outp = tmp_path / "sig.ppm"
    imageio.ppm_write(inp, img)
    rc = cli.main(["-oa", "100", "80", "0", "0", str(inp), str(outp)])
    assert rc == 0
    sig = imageio.ppm_read(outp)
    assert sig.shape == (262, 910, 3)
    # grayscale: all channels equal; sync tips visible as dark bands
    assert (sig[..., 0] == sig[..., 1]).all()
    assert sig[..., 0].min() < 100 < sig[..., 0].max()


def test_native_bmp_writer_bytes_match_python(tmp_path):
    """The native batch BMP encoder must produce byte-identical files to
    imageio.bmp_write (same 32-bit container the video CLI always wrote) —
    wiring native_io into ntsc-video must not change output bytes."""
    from ntsc_crt_tpu.utils import native_io
    if not native_io.available():
        pytest.skip("native toolchain unavailable")
    rgb = np.stack([_img(20, w=33, h=21), _img(21, w=33, h=21)])
    native_io.write_batch([str(tmp_path / "n0.bmp"), str(tmp_path / "n1.bmp")],
                          rgb)
    for i in range(2):
        imageio.bmp_write(tmp_path / f"p{i}.bmp", rgb[i])
        nb = (tmp_path / f"n{i}.bmp").read_bytes()
        pb = (tmp_path / f"p{i}.bmp").read_bytes()
        assert nb == pb


def test_video_cli_pipelined_matches_serial_loop(tmp_path):
    """`ntsc-video` with the chunked prefetch/write-behind pipeline produces
    byte-identical outputs to the plain serial step+imageio loop it replaced
    (reference: extra/video_convert.c:246-277 is strictly serial)."""
    import jax
    import jax.numpy as jnp
    from ntsc_crt_tpu import cli
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.models import pipeline
    from ntsc_crt_tpu.models.demodulate import MonitorParams

    NF = 10  # > one CHUNK so the prefetch/write-behind seams are exercised
    framedir = tmp_path / "frames"
    outdir = tmp_path / "out"
    framedir.mkdir()
    for i in range(NF):
        imageio.write_image(framedir / f"{i:06d}.bmp", _img(30 + i))

    rc = cli.video_main(["-s", "NTSCVHS", "-W", "160", "-H", "120",
                         str(NF), str(framedir), str(outdir)])
    assert rc == 0

    # serial reference loop with identical parameters
    cfg = SYSTEMS["NTSCVHS"]
    mon = MonitorParams(blend=np.int32(0), scanlines=np.int32(0),
                        saturation=np.int32(10))
    state = pipeline.crt_init(cfg, 160, 120)
    step = jax.jit(lambda s, im, fi, fr, dc: pipeline.step(
        cfg, s, im, field=fi, frame=fr, noise=np.int32(24), mon=mon,
        dot_crawl_offset=dc, do_aberration=np.int32(0)))
    field = frame = 0
    for i in range(NF):
        img = imageio.read_image(framedir / f"{i:06d}.bmp")
        state = step(state, jnp.asarray(img), np.int32(field),
                     np.int32(frame), np.int32(i % max(cfg.cc_vper, 1)))
        if not cfg.progressive:
            field ^= 1
            if (i & 1) == 0:
                frame ^= 1
        ref = tmp_path / f"ref_{i:06d}.bmp"
        imageio.bmp_write(ref, np.asarray(state.out))
        assert (outdir / f"{i:06d}.bmp").read_bytes() == ref.read_bytes(), \
            f"frame {i} diverged"
