"""ctypes bridge to the native threaded frame codec (native/frameio.cpp).

Builds on first use with g++; falls back to the pure-Python imageio if the
toolchain is unavailable.  Used by the video CLI to overlap host frame
decode/encode with device compute.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_REPO = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO / "native" / "frameio.cpp"
_SO = _REPO / ".native_build" / "libframeio.so"

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            _SO.parent.mkdir(exist_ok=True)
            subprocess.run(
                ["g++", "-O2", "-fPIC", "-shared", "-pthread",
                 str(_SRC), "-o", str(_SO)],
                check=True, capture_output=True)
        lib = ctypes.CDLL(str(_SO))
        lib.frameio_read_batch.restype = ctypes.c_int
        lib.frameio_write_batch.restype = ctypes.c_int
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _paths_array(paths: Sequence[str]):
    arr = (ctypes.c_char_p * len(paths))()
    keep = [str(p).encode() for p in paths]
    arr[:] = keep
    return arr, keep


def read_batch(paths: Sequence[str], h: int, w: int) -> np.ndarray:
    """Decode a batch of same-sized PPM/BMP frames -> (n, h, w, 3) uint8.
    Threads across frames in native code; falls back to Python I/O."""
    lib = _load()
    n = len(paths)
    if lib is None:
        from ntsc_crt_tpu.utils import imageio
        return np.stack([imageio.read_image(p) for p in paths])
    out = np.zeros((n, h, w, 3), np.uint8)
    arr, keep = _paths_array(paths)
    ok = lib.frameio_read_batch(
        arr, n, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w)
    if ok != n:
        raise IOError(f"frameio: decoded {ok}/{n} frames")
    del keep
    return out


def write_batch(paths: Sequence[str], rgb: np.ndarray) -> None:
    """Encode (n, h, w, 3) uint8 frames as 32-bit BMPs in parallel."""
    lib = _load()
    n, h, w = rgb.shape[0], rgb.shape[1], rgb.shape[2]
    if lib is None:
        from ntsc_crt_tpu.utils import imageio
        for p, frame in zip(paths, rgb):
            imageio.bmp_write(p, frame)
        return
    rgbc = np.ascontiguousarray(rgb, np.uint8)
    arr, keep = _paths_array(paths)
    ok = lib.frameio_write_batch(
        arr, n, rgbc.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)), h, w)
    if ok != n:
        raise IOError(f"frameio: wrote {ok}/{n} frames")
    del keep
