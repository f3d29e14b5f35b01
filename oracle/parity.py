"""Parity-test helpers: the pinned wrap-vs-UB divergence surface.

The reference demodulator reads `sig[i]` for i in [0, AV_LEN) from
`v->inp + pos` where pos can reach the last signal line; for the final line
(ypos == CRT_VRES-1) the 2nd-line half of the window reads PAST the end of
the inp buffer — undefined behavior in C (crt_core.c:511-550,
pos + AV_LEN > CRT_INPUT_SIZE).  Our gathers wrap to the top of the buffer
instead (models/demodulate.py line extraction).  Output rows sourced from
that final analog line are therefore excluded from bit-exact comparison.
This module is the ONE place that computes the excluded rows, so the
divergence surface itself is regression-tested (tests/test_edge_modes.py
pins a golden fixture of it).
"""

from __future__ import annotations

import numpy as np


def ub_rows(cfg, vsync: int, outh: int, v_fac: int = 0,
            field_px: int = 0) -> np.ndarray:
    """Bool mask (outh,) — True where the output row is bit-comparable,
    False for rows sourced from the final analog line (the reference's
    OOB-read region).  `vsync` is the oracle's post-frame estimate."""
    ok = np.ones(outh, bool)
    for line in range(cfg.top, cfg.bot):
        if (line + vsync + 3) % cfg.vres == cfg.vres - 1:
            beg = (line - cfg.top) * (outh + v_fac) // cfg.lines + field_px
            end = (line - cfg.top + 1) * (outh + v_fac) // cfg.lines + field_px
            # the row itself plus its scanline duplicates
            ok[max(0, beg):min(outh, max(end, beg + 4))] = False
    return ok


def assert_parity_outside_ub(got: np.ndarray, ref: np.ndarray, cfg,
                             vsync: int, *, v_fac: int = 0, field_px: int = 0,
                             err_msg: str = "") -> None:
    """Bit-exact equality outside the UB rows; the UB region must stay a
    handful of rows (guards against the mask silently hiding regressions)."""
    outh = got.shape[0]
    ok = ub_rows(cfg, vsync, outh, v_fac=v_fac, field_px=field_px)
    np.testing.assert_array_equal(got[ok], ref[ok], err_msg=err_msg)
    assert (~ok).sum() <= max(8, 2 * ((outh + v_fac) // cfg.lines + 1)), \
        f"UB mask grew unexpectedly: {(~ok).sum()} rows"
