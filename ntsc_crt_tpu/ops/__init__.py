from ntsc_crt_tpu.ops import fixedpoint, lcg, filters  # noqa: F401
