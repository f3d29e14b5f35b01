"""Golden-output oracle: the reference C library compiled per system and
driven through ctypes.

The reference ships no tests (SURVEY.md §4); parity against its compiled
output *is* the test strategy.  Nothing is vendored — sources are compiled
straight from the read-only reference mount.  rand()/srand() are redirected
to a spec'd LCG (crt_rand_shim.c) so VHS noise is reproducible.

Usage:
    orc = Oracle("NTSC", outw=640, outh=480)
    orc.modulate(img_rgb, field=0, frame=0)
    rgb = orc.demodulate(noise=0)
"""

from __future__ import annotations

import ctypes
import os
import re
import subprocess
from pathlib import Path

import numpy as np

from ntsc_crt_tpu.models.systems import SYSTEMS, SYSTEM_IDS

REFERENCE = Path(os.environ.get("NTSC_REFERENCE", "/root/reference"))
BUILD_DIR = Path(__file__).resolve().parent.parent / ".oracle_build"

_ENCODER_SOURCES = [
    "crt_core.c", "crt_ntsc.c", "crt_nes.c", "crt_nesrgb.c", "crt_snes.c",
    "crt_pv1k.c", "crt_ntscvhs.c", "crt_template.c",
]
_HEADERS = [s.replace(".c", ".h") for s in _ENCODER_SOURCES]

# formats (crt_core.h:62-67)
FMT_RGB, FMT_BGR, FMT_ARGB, FMT_RGBA, FMT_ABGR, FMT_BGRA = range(6)


def _patch_defines(text: str, defines: dict[str, object],
                   found: set | None = None) -> str:
    """Rewrite the FIRST `#define NAME <value>` of each overridden macro.
    Only the first: crt_core.c re-pins USE_CONVOLUTION inside the
    CRT_CC_SAMPLES!=4 guard (crt_core.c:90-94), which must stay intact."""
    for name, value in defines.items():
        text, n = re.subn(rf"(?m)^#define {re.escape(name)}\b[^\n]*",
                          f"#define {name} {value}", text, count=1)
        if n and found is not None:
            found.add(name)
    return text


def build_oracle(system: str, defines: dict[str, object] | None = None) -> Path:
    """Compile the reference as a shared library for one system (cached).

    `defines` overrides pinned compile-time macros (CRT_DO_BLOOM,
    USE_CONVOLUTION, NES_BORDER, CRT_CHROMA_PATTERN, VHS_MODE,
    CRT_DO_BANDLIMITING, CRT_DO_VSYNC/HSYNC ...) by compiling a patched COPY
    of the sources — the defines live in-file, so -D can't override them."""
    sysid = SYSTEM_IDS[system]
    BUILD_DIR.mkdir(exist_ok=True)
    shim = Path(__file__).resolve().parent / "crt_rand_shim.c"
    if defines:
        tag = "_".join(f"{k}-{v}" for k, v in sorted(defines.items()))
        tag = re.sub(r"[^A-Za-z0-9_.-]", "", tag).lower()
        vdir = BUILD_DIR / f"variant_{system.lower()}_{tag}"
        so = vdir / f"libcrt_{system.lower()}.so"
        src_dir = vdir
        stamp_inputs = [REFERENCE / s for s in _ENCODER_SOURCES + _HEADERS]
        if not (so.exists() and all(
                so.stat().st_mtime > s.stat().st_mtime
                for s in list(stamp_inputs) + [shim])):
            vdir.mkdir(parents=True, exist_ok=True)
            found: set = set()
            for name in _ENCODER_SOURCES + _HEADERS:
                patched = _patch_defines((REFERENCE / name).read_text(),
                                         defines, found)
                (vdir / name).write_text(patched)
            missing = set(defines) - found
            if missing:  # a typo here would silently test the default build
                raise ValueError(
                    f"defines not found in any reference source: {missing}")
        else:
            return so
    else:
        so = BUILD_DIR / f"libcrt_{system.lower()}.so"
        src_dir = REFERENCE
        stamp_inputs = [REFERENCE / s for s in _ENCODER_SOURCES] + [shim]
        if so.exists() and all(so.stat().st_mtime > s.stat().st_mtime
                               for s in stamp_inputs):
            return so
    srcs = [str(src_dir / s) for s in _ENCODER_SOURCES]
    cmd = [
        "gcc", "-O2", "-fPIC", "-shared", "-fwrapv",
        f"-DCRT_SYSTEM={sysid}", f"-I{src_dir}",
        "-Drand=crt_oracle_rand", "-Dsrand=crt_oracle_srand",
        "-o", str(so), *srcs, str(shim),
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return so


def _crt_struct(cfg):
    class CRT(ctypes.Structure):
        _fields_ = [
            ("analog", ctypes.c_byte * cfg.input_size),
            ("inp", ctypes.c_byte * cfg.input_size),
            ("outw", ctypes.c_int),
            ("outh", ctypes.c_int),
            ("out_format", ctypes.c_int),
            ("out", ctypes.POINTER(ctypes.c_ubyte)),
            ("hue", ctypes.c_int),
            ("brightness", ctypes.c_int),
            ("contrast", ctypes.c_int),
            ("saturation", ctypes.c_int),
            ("black_point", ctypes.c_int),
            ("white_point", ctypes.c_int),
            ("scanlines", ctypes.c_int),
            ("blend", ctypes.c_int),
            ("v_fac", ctypes.c_uint),
            ("ccf", (ctypes.c_int * cfg.cc_samples) * cfg.cc_vper),
            ("hsync", ctypes.c_int),
            ("vsync", ctypes.c_int),
            ("rn", ctypes.c_int),
        ]
    return CRT


def _settings_struct(system: str):
    i = ctypes.c_int
    if system == "NES":
        fields = [("data", ctypes.POINTER(ctypes.c_ushort)), ("w", i), ("h", i),
                  ("border_color", ctypes.c_uint), ("dot_crawl_offset", i),
                  ("hue", i), ("xoffset", i), ("yoffset", i),
                  ("field_initialized", i)]
    elif system == "NESRGB":
        fields = [("data", ctypes.POINTER(ctypes.c_ubyte)), ("format", i),
                  ("w", i), ("h", i), ("dot_crawl_offset", i),
                  ("hue", i), ("xoffset", i), ("yoffset", i),
                  ("field_initialized", i)]
    else:
        fields = [("data", ctypes.POINTER(ctypes.c_ubyte)), ("format", i),
                  ("w", i), ("h", i), ("raw", i), ("as_color", i),
                  ("field", i), ("frame", i), ("hue", i),
                  ("xoffset", i), ("yoffset", i)]
        if system in ("SNES", "PV1K", "TEMPLATE"):
            fields.append(("dot_crawl_offset", i))
        if system == "NTSCVHS":
            fields.append(("do_aberration", i))
        fields.append(("iirs_initialized", i))

    class NTSC_SETTINGS(ctypes.Structure):
        _fields_ = fields
    return NTSC_SETTINGS


class Oracle:
    """One reference-library instance (struct CRT + settings) via ctypes."""

    def __init__(self, system: str, outw: int, outh: int, fmt: int = FMT_RGB,
                 defines: dict[str, object] | None = None, cfg=None):
        """`cfg` overrides the SystemConfig used to size the ctypes structs —
        required when `defines` changes the geometry (e.g. CRT_CHROMA_PATTERN=0
        makes CRT_HRES 912; pass cfg=SYSTEMS['NTSC_RAINBOW'])."""
        self.system = system
        self.cfg = cfg if cfg is not None else SYSTEMS[system]
        self.lib = ctypes.CDLL(str(build_oracle(system, defines)))
        self.CRT = _crt_struct(self.cfg)
        self.SETTINGS = _settings_struct(system)
        # layout pin: the positional ctypes mirrors must match the compiled
        # struct sizes exactly, else every state assertion silently drifts
        self.lib.crt_oracle_sizeof_crt.restype = ctypes.c_ulong
        self.lib.crt_oracle_sizeof_settings.restype = ctypes.c_ulong
        c_sz = self.lib.crt_oracle_sizeof_crt()
        assert ctypes.sizeof(self.CRT) == c_sz, \
            f"struct CRT mirror {ctypes.sizeof(self.CRT)} != compiled {c_sz}"
        s_sz = self.lib.crt_oracle_sizeof_settings()
        assert ctypes.sizeof(self.SETTINGS) == s_sz, \
            (f"NTSC_SETTINGS mirror {ctypes.sizeof(self.SETTINGS)} != "
             f"compiled {s_sz}")
        self.bpp = 3 if fmt in (FMT_RGB, FMT_BGR) else 4
        self.outw, self.outh, self.fmt = outw, outh, fmt
        self.outbuf = np.zeros(outh * outw * self.bpp, dtype=np.uint8)
        self.crt = self.CRT()
        self.settings = self.SETTINGS()
        self.lib.crt_init(
            ctypes.byref(self.crt), outw, outh, fmt,
            self.outbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        )
        self._keepalive = None

    def srand(self, seed: int):
        self.lib.crt_oracle_srand(ctypes.c_uint(seed))

    def modulate(self, img: np.ndarray, *, field: int = 0, frame: int = 0,
                 hue: int = 0, raw: int = 0, as_color: int = 1,
                 xoffset: int = 0, yoffset: int = 0, fmt: int = FMT_RGB,
                 dot_crawl_offset: int = 0, do_aberration: int = 0,
                 border_color: int = 0):
        s = self.settings
        if self.system == "NES":
            data = np.ascontiguousarray(img, dtype=np.uint16)
            h, w = data.shape
            s.data = data.ctypes.data_as(ctypes.POINTER(ctypes.c_ushort))
            s.w, s.h = w, h
            s.border_color = border_color
            s.dot_crawl_offset = dot_crawl_offset
            s.hue, s.xoffset, s.yoffset = hue, xoffset, yoffset
        elif self.system == "NESRGB":
            data = np.ascontiguousarray(img, dtype=np.uint8)
            h, w = data.shape[:2]
            s.data = data.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
            s.format = fmt
            s.w, s.h = w, h
            s.dot_crawl_offset = dot_crawl_offset
            s.hue, s.xoffset, s.yoffset = hue, xoffset, yoffset
        else:
            data = np.ascontiguousarray(img, dtype=np.uint8)
            h, w = data.shape[:2]
            s.data = data.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
            s.format = fmt
            s.w, s.h = w, h
            s.raw, s.as_color = raw, as_color
            s.field, s.frame = field, frame
            s.hue, s.xoffset, s.yoffset = hue, xoffset, yoffset
            if self.system in ("SNES", "PV1K", "TEMPLATE"):
                s.dot_crawl_offset = dot_crawl_offset
            if self.system == "NTSCVHS":
                s.do_aberration = do_aberration
        self._keepalive = data  # keep image memory alive during the C call
        self.lib.crt_modulate(ctypes.byref(self.crt), ctypes.byref(s))

    def demodulate(self, noise: int = 0) -> np.ndarray:
        self.lib.crt_demodulate(ctypes.byref(self.crt), noise)
        return self.outbuf.reshape(self.outh, self.outw, self.bpp).copy()

    # state accessors for fine-grained parity assertions -------------------
    @property
    def analog(self) -> np.ndarray:
        return np.ctypeslib.as_array(self.crt.analog).reshape(
            self.cfg.vres, self.cfg.hres).copy()

    @property
    def inp(self) -> np.ndarray:
        return np.ctypeslib.as_array(self.crt.inp).reshape(
            self.cfg.vres, self.cfg.hres).copy()

    @property
    def ccf(self) -> np.ndarray:
        return np.ctypeslib.as_array(self.crt.ccf).copy()

    def sincos14(self, n: int) -> tuple[int, int]:
        s = ctypes.c_int()
        c = ctypes.c_int()
        self.lib.crt_sincos14(ctypes.byref(s), ctypes.byref(c), n)
        return s.value, c.value
