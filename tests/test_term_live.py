"""Terminal live front-end: the device-resident fast loop must match the
reference-semantics tick exactly, and the ANSI renderer must emit a sane
grid (apps/term_live.py; reference LIVE build crt_main.c:284-557)."""

import numpy as np

from ntsc_crt_tpu.models.systems import NTSC
from ntsc_crt_tpu.apps.live import LiveSession
from ntsc_crt_tpu.apps import term_live


def _img():
    return np.random.RandomState(0).randint(0, 256, (60, 80, 3), np.uint8)


def test_tick_fast_matches_tick():
    img = _img()
    a = LiveSession(NTSC, outw=160, outh=120, noise=9)
    b = LiveSession(NTSC, outw=160, outh=120, noise=9)
    for n in range(3):
        ref = a.tick(img)
        got = b.tick_fast(img, preview_hw=None)
        np.testing.assert_array_equal(got, ref, err_msg=f"frame {n}")
        assert (a.field, a.frame, a.dot_crawl_offset) == \
            (b.field, b.frame, b.dot_crawl_offset)


def test_tick_fast_knob_change_applies():
    img = _img()
    s = LiveSession(NTSC, outw=160, outh=120, noise=0)
    base = s.tick_fast(img, preview_hw=None)
    for _ in range(2):          # settle parity
        base = s.tick_fast(img, preview_hw=None)
    s.handle_key("4")           # noise += 1 -> knob vector re-uploads
    s.handle_key("2")           # saturation += 1
    changed = s.tick_fast(img, preview_hw=None)
    assert (changed != base).any()


def test_render_halfblocks_grid():
    rgb = np.zeros((4, 6, 3), np.uint8)
    rgb[0::2] = (255, 0, 0)     # top pixels red
    rgb[1::2] = (0, 0, 255)     # bottom pixels blue
    out = term_live.render_halfblocks(rgb, cols=3, rows=2)
    lines = out.split("\n")
    assert len(lines) == 2
    assert lines[0].count("▀") == 3
    assert "\x1b[38;2;255;0;0m" in lines[0]   # fg = top = red
    assert "\x1b[48;2;0;0;255m" in lines[0]   # bg = bottom = blue
    assert lines[0].endswith("\x1b[0m")


def test_term_live_main_headless():
    rc = term_live.main(["--frames", "2", "--no-display",
                         "-W", "160", "-H", "120", "--fps", "0"])
    assert rc == 0
