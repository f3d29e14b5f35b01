"""Visual demo: run every system over a synthetic SMPTE-style test card and
write decoded frames + the analog-signal dump (the reference's -a fixture).

    python examples/demo.py [outdir]
"""

import sys
from pathlib import Path

import numpy as np

# runnable straight from a checkout: `python examples/demo.py`
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


from ntsc_crt_tpu.utils.testcard import test_card  # noqa: E402


def main():
    import jax.numpy as jnp
    from ntsc_crt_tpu.models.systems import SYSTEMS
    from ntsc_crt_tpu.models import pipeline, video
    from ntsc_crt_tpu.utils import imageio

    outdir = Path(sys.argv[1] if len(sys.argv) > 1 else "demo_out")
    outdir.mkdir(exist_ok=True)
    img = test_card()
    imageio.ppm_write(outdir / "input.ppm", img)

    for name, cfg in SYSTEMS.items():
        st = pipeline.crt_init(cfg, 640, 480)
        if cfg.kind == "nes":
            rng = np.random.RandomState(3)
            src = jnp.asarray(rng.randint(0, 64, (240, 256), np.uint16))
        else:
            src = jnp.asarray(img)
        field = frame = 0
        for i in range(4):
            st = pipeline.step(cfg, st, src, field=field, frame=frame,
                               noise=8,
                               dot_crawl_offset=i % max(cfg.cc_vper, 1))
            if not cfg.progressive:
                field ^= 1
                if (i & 1) == 0:
                    frame ^= 1
        imageio.ppm_write(outdir / f"{name.lower()}.ppm", np.asarray(st.out))
        imageio.ppm_write(outdir / f"{name.lower()}_analog.ppm",
                          np.asarray(video.analog_dump(cfg, st.analog)))
        print(f"{name}: wrote {name.lower()}.ppm + analog dump")


if __name__ == "__main__":
    main()
