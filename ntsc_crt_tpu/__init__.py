"""ntsc_crt_tpu — TPU-native NTSC composite video signal modem framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of LMP88959/NTSC-CRT
(reference: /root/reference, v2.3.2): integer-exact modulation of RGB (or NES
PPU) frames into a sampled analog NTSC composite signal, and demodulation back
to RGB the way a CRT television would — sync recovery, color-carrier lock,
equalization, scan conversion — reproducing artifact colors, dot crawl, chroma
bleed, interlace flicker, noise and VHS degradation.

Architecture (TPU-first, not a translation):
  ops/       int32 fixed-point math, filters-as-scans, closed-form LCG noise,
             Pallas kernels for the serial-in-x recurrences
  models/    SystemConfig presets (NTSC/NES/NESRGB/SNES/PV1K/VHS/TEMPLATE),
             modulators, the system-generic demodulator, frame pipeline
  parallel/  jax.sharding Mesh utilities: data-parallel frame batching over ICI
  utils/     image I/O (PPM/BMP), pixel format packing
"""

__version__ = "0.1.0"

from ntsc_crt_tpu.models.systems import (  # noqa: F401
    SystemConfig,
    NTSC,
    NTSCVHS,
    NTSCVHS_LP,
    NTSCVHS_EP,
    SNES,
    NES,
    NESRGB,
    PV1K,
    TEMPLATE,
    SYSTEMS,
)
