"""Physical-layout pins for the big decode/encode intermediates.

XLA's layout assignment gives each intermediate the layout its *producer*
fusion prefers, then pays relayout copies when a consumer wants another
orientation — on PV1K these copies are ~3 ms of the ~24 ms step
(docs/PERF.md: rows2 relayouts, resample-plane copies, pair transposes).
Logical transposes cannot fix this (XLA normalizes them away and inserts
MORE copies — r3 negatives); `jax.experimental.layout.with_layout_constraint`
pins the physical orientation so the producer writes the consumer's layout
directly.

Pins are named and opt-in via NTSC_CRT_PIN=name1,name2 (or programmatically
via `ACTIVE` for in-process A/B sweeps); each shipped default is measured —
see docs/PERF.md r5.  Values are layout-invariant, so every pin is
parity-safe by construction.
"""

from __future__ import annotations

import os

# programmatic override set (union with the env var) — lets an experiment
# script re-trace with different pins in one process
ACTIVE: set[str] = set()


def _active() -> set[str]:
    env = set(filter(None, os.environ.get("NTSC_CRT_PIN", "").split(",")))
    return env | ACTIVE


def pin(x, name: str, major_to_minor: tuple[int, ...]):
    """Constrain x's physical layout iff pin `name` is active.

    major_to_minor follows jax.experimental.layout.Layout: e.g. (1, 0, 2)
    stores dim 1 outermost and dim 2 contiguous.  No-op under spatial
    sharding (the bare Layout constraint carries no sharding) and on jax
    versions that moved the API again."""
    acts = _active()
    if name not in acts and "all" not in acts:
        return x
    from ntsc_crt_tpu.parallel import spatial
    if spatial.active():
        return x
    try:
        from jax.experimental.layout import Layout, with_layout_constraint
        return with_layout_constraint(
            x, Layout(major_to_minor=tuple(major_to_minor)))
    except (ImportError, TypeError):
        return x
