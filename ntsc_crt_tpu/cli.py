"""Command-line drivers mirroring the reference's `ntsc` CLI
(crt_main.c:37-283) and `ntsc_video` batch converter
(extra/video_convert.c:149-281).

    ntsc [-s SYSTEM] [--fmt FMT] \\
         -m|o|f|p|r|h|a outwidth outheight noise artifact_hue infile outfile
    ntsc-video [-s system] [-a] [-l scanlines] [-p] nframes framedir outdir

The image-convert driver accumulates 4 frames with blend=1 scanlines=1,
toggling field/frame parity for interlace (crt_main.c:235-255).

-s selects the system preset (the reference selects it at compile time via
CMake CRT_SYSTEM, CMakeLists.txt:12); NES is rejected like the reference's
"no NES command line version" #error (crt_main.c:25-27).  --fmt selects the
output pixel format (rgb/bgr/argb/rgba/abgr/bgra, crt_core.c:613-656); raw
format bytes are written verbatim when the outfile ends in .raw, otherwise
the image container gets the canonical RGB view.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np


def _build_step(cfg, outw, outh, noise, mon, *, as_color=1, raw=False):
    import jax
    from ntsc_crt_tpu.models import pipeline

    def fn(state, img, field, frame, dco, hue):
        return pipeline.step(cfg, state, img, field=field, frame=frame,
                             hue=hue, noise=noise, mon=mon, as_color=as_color,
                             raw=raw, dot_crawl_offset=dco)

    return jax.jit(fn)


def main(argv=None):
    argv = list(argv) if argv is not None else sys.argv[1:]

    system, fmt_name = "NTSC", "rgb"
    for opt in ("-s", "--fmt"):
        if opt in argv:
            i = argv.index(opt)
            val = argv[i + 1]
            del argv[i:i + 2]
            if opt == "-s":
                system = val.upper()
            else:
                fmt_name = val.lower()
    if system == "NES":
        # crt_main.c:25-27: "NES mode does not have a command line version"
        print("error: NES mode does not have a command line version")
        return 1

    if len(argv) < 7 or "h" in argv[0]:
        print(__doc__)
        print("sample: ntsc -op 640 480 24 0 in.ppm out.ppm")
        return 1 if len(argv) < 7 else 0

    flags = argv[0].lstrip("-")
    docolor = "m" not in flags
    field = 1 if "f" in flags else 0
    progressive = "p" in flags
    raw = "r" in flags
    save_analog = "a" in flags

    dooverwrite = "o" not in flags  # -o disables the prompt (crt_main.c:102)
    outw, outh = int(argv[1]), int(argv[2])
    noise = max(0, int(argv[3]))
    hue = int(argv[4])
    hue = hue % 360 if hue >= 0 else -((-hue) % 360)  # C `hue %= 360`
    infile, outfile = argv[5], argv[6]

    if dooverwrite and Path(outfile).exists():
        c = input(f"--- file ({outfile}) already exists, overwrite? (y/n)\n")
        if not c.lower().startswith("y"):
            return 1

    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.models import pipeline, video
    from ntsc_crt_tpu.models.demodulate import MonitorParams
    from ntsc_crt_tpu.utils import imageio, formats

    img = imageio.read_image(infile)
    print(f"loaded {img.shape[1]} {img.shape[0]}")

    cfg = SYSTEMS[system]
    out_fmt = formats.by_name(fmt_name)
    mon = MonitorParams(blend=np.int32(1), scanlines=np.int32(1))
    state = pipeline.crt_init(cfg, outw, outh)
    step = _build_step(cfg, outw, outh, np.int32(noise), mon,
                       as_color=np.int32(1 if docolor else 0), raw=raw)

    imgj = jnp.asarray(img)
    frame = 0
    print(f"converting to {outw}x{outh}...")
    for it in range(4):  # accumulate 4 frames (crt_main.c:241-255)
        state = step(state, imgj, np.int32(field), np.int32(frame),
                     np.int32(0), np.int32(hue))
        if not (progressive or cfg.progressive):
            field ^= 1
            state = step(state, imgj, np.int32(field), np.int32(frame),
                         np.int32(0), np.int32(hue))
            if (it & 1) == 0:
                frame ^= 1

    if save_analog:
        out = np.asarray(video.analog_dump(cfg, state.analog))
    else:
        out = np.asarray(state.out)
    if str(outfile).endswith(".raw"):
        # raw bytes in the selected pixel format (crt_core.c:613-656)
        with open(outfile, "wb") as f:
            f.write(formats.from_rgb(out, out_fmt).tobytes())
    else:
        imageio.write_image(outfile, out)
    print("done")
    return 0


def video_main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    ap = argparse.ArgumentParser(
        prog="ntsc-video",
        description="convert numbered BMP/PPM frame sequences "
                    "(frames/%06d.bmp -> output/%06d.bmp), like ntsc_video")
    ap.add_argument("nframes", type=int)
    ap.add_argument("framedir", nargs="?", default="frames")
    ap.add_argument("outdir", nargs="?", default="output")
    ap.add_argument("-s", "--system", default="NTSCVHS",
                    help="system preset (default NTSCVHS like ntsc_video)")
    ap.add_argument("-a", "--aberration", action="store_true",
                    help="enable VHS head-switch aberration")
    ap.add_argument("-l", "--scanlines", action="store_true")
    ap.add_argument("-p", "--progressive", action="store_true")
    ap.add_argument("-n", "--noise", type=int, default=24)
    ap.add_argument("-W", "--outw", type=int, default=640)
    ap.add_argument("-H", "--outh", type=int, default=480)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.models import pipeline
    from ntsc_crt_tpu.models.demodulate import MonitorParams
    from ntsc_crt_tpu.utils import imageio

    cfg = SYSTEMS[args.system.upper()]
    mon = MonitorParams(blend=np.int32(0),
                        scanlines=np.int32(1 if args.scanlines else 0),
                        saturation=np.int32(10))
    state = pipeline.crt_init(cfg, args.outw, args.outh)

    import jax

    def stepfn(state, img, field, frame, dco):
        return pipeline.step(cfg, state, img, field=field, frame=frame,
                             noise=np.int32(args.noise), mon=mon,
                             dot_crawl_offset=dco,
                             do_aberration=np.int32(1 if args.aberration else 0))

    stepfn = jax.jit(stepfn)

    Path(args.outdir).mkdir(exist_ok=True)
    field = frame = 0
    for i in range(args.nframes):
        src = Path(args.framedir) / f"{i:06d}.bmp"
        if not src.exists():
            src = Path(args.framedir) / f"{i:06d}.ppm"
        img = imageio.read_image(src)
        state = stepfn(state, jnp.asarray(img), np.int32(field),
                       np.int32(frame), np.int32(i % max(cfg.cc_vper, 1)))
        if not (args.progressive or cfg.progressive):
            field ^= 1
            if (i & 1) == 0:
                frame ^= 1
        imageio.write_image(Path(args.outdir) / f"{i:06d}.bmp",
                            np.asarray(state.out))
        print(f"frame {i + 1} / {args.nframes}")
    print("ffmpeg -r 30 -i output/%06d.bmp -c:v libx264 out.mp4")
    return 0


if __name__ == "__main__":
    sys.exit(main())
