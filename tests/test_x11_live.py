"""X11 live frontend: ZPixmap packing, window blit/key plumbing and the
display loop, driven against a fake Xlib (no display needed — the ctypes
library handle is a constructor seam, apps/x11_live.py)."""

import ctypes

import numpy as np

from ntsc_crt_tpu.apps import x11_live
from ntsc_crt_tpu.apps.x11_live import XWindow, pack_zpixmap, run_loop


def test_pack_zpixmap_layout():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0] = (0xAB, 0xCD, 0xEF)
    rgb[1, 1] = (1, 2, 3)
    px = pack_zpixmap(rgb)
    assert px.dtype == np.uint32
    assert px[0, 0] == 0x00ABCDEF
    assert px[1, 1] == 0x00010203
    assert px[0, 1] == 0


class _Fn:
    """Callable attribute that records calls and returns a fixed value."""

    def __init__(self, log, name, ret=0):
        self.log, self.name, self.ret = log, name, ret
        self.restype = None
        self.argtypes = None

    def __call__(self, *a):
        self.log.append((self.name, a))
        return self.ret


class FakeXlib:
    """Just enough Xlib for XWindow: every function records its calls;
    XPending/XNextEvent/XLookupKeysym replay a queued keysym list."""

    def __init__(self):
        self.calls = []
        self.keysyms = []
        for name, ret in [("XOpenDisplay", 7), ("XDefaultScreen", 0),
                          ("XDefaultRootWindow", 11),
                          ("XCreateSimpleWindow", 21), ("XSelectInput", 0),
                          ("XStoreName", 0), ("XMapWindow", 0),
                          ("XDefaultGC", 31), ("XDefaultVisual", 41),
                          ("XCreateImage", 51), ("XFlush", 0),
                          ("XPutImage", 0), ("XDestroyWindow", 0),
                          ("XCloseDisplay", 0)]:
            setattr(self, name, _Fn(self.calls, name, ret))

    def XPending(self, dpy):
        return len(self.keysyms)

    def XNextEvent(self, dpy, evref):
        evref._obj.type = x11_live.KeyPress
        self._current = self.keysyms.pop(0)

    def XLookupKeysym(self, evref, idx):
        return self._current

    def names(self):
        return [c[0] for c in self.calls]


def test_xwindow_blit_records_putimage():
    fake = FakeXlib()
    win = XWindow(8, 4, xlib=fake)
    assert "XMapWindow" in fake.names()
    rgb = np.random.RandomState(0).randint(0, 256, (4, 8, 3), np.uint8)
    win.blit(rgb)
    assert "XPutImage" in fake.names()
    np.testing.assert_array_equal(win._buf, pack_zpixmap(rgb))
    win.close()
    assert fake.names()[-2:] == ["XDestroyWindow", "XCloseDisplay"]


def test_xwindow_key_translation():
    fake = FakeXlib()
    win = XWindow(8, 4, xlib=fake)
    fake.keysyms = [0xFF52, ord("q"), 0x0020, 0xFF1B, 0xFFFF]
    assert win.poll_keys() == ["up", "q", " ", "esc"]
    assert win.poll_keys() == []                          # queue drained


class FakeSession:
    def __init__(self):
        self.frame = np.zeros((4, 8, 3), np.uint8)
        self.keys = []
        self.ticks = 0

    def tick_fast(self, img, fetch=True):
        self.ticks += 1
        return self.frame + self.ticks

    def handle_key(self, k):
        self.keys.append(k)


def test_run_loop_blits_and_forwards_keys():
    fake = FakeXlib()
    win = XWindow(8, 4, xlib=fake)
    sess = FakeSession()
    fake.keysyms = [ord("g")]
    t = [0.0]

    def clock():
        t[0] += 0.001
        return t[0]

    ema = run_loop(sess, sess.frame, win, fps=0, frames=3,
                   clock=clock, sleep=lambda s: None)
    assert sess.ticks == 3
    # double-buffered: 3 ticks -> 2 blits (frame N-1 shows while N runs)
    assert fake.names().count("XPutImage") == 2
    assert sess.keys == ["g"]
    assert ema > 0


def test_esc_exits_loop():
    fake = FakeXlib()
    win = XWindow(8, 4, xlib=fake)
    sess = FakeSession()
    fake.keysyms = [0xFF1B]
    run_loop(sess, sess.frame, win, fps=0, frames=0,
             clock=lambda: 0.0, sleep=lambda s: None)
    assert sess.ticks == 2                               # exited on ESC
