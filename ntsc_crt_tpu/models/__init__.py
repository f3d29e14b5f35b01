from ntsc_crt_tpu.models import systems  # noqa: F401
