"""Scanline (spatial) sharding: partition the line dimension of the heavy
per-line stages over the mesh's `spatial` axis.

The reference is strictly serial (SURVEY.md §2); the TPU-native design keeps
frames on the `data` axis and additionally splits WITHIN a frame: the
modulator's active-video block and the demodulator's line-parallel stages
(signal extraction, EQ filtering, scan conversion, row placement) are
independent across scanlines, so placing the line dim on `spatial` lets
GSPMD partition them and insert the (small) collectives at the serial seams
(vsync search, hsync chase, ccf EMA — all (B,)-sized scans) itself.

Mechanism: `make_sharded_step` (parallel/mesh.py) activates a trace-time
context carrying the mesh; the compute cores call `shard_lines(x, dim)` on
their big per-line intermediates, which is a no-op without the context and a
`with_sharding_constraint` under it.  This shards the portable XLA-op path;
the single-chip Pallas kernels run per-shard unchanged when the spatial
extent is 1 (the common throughput layout) and are bypassed under spatial
partitioning (they are manual-layout kernels; GSPMD cannot split them).

Use case: latency scaling — a batch-1 live frame on an N-chip slice rides
N-way line parallelism instead of sitting on one chip.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Callable, Optional

import jax
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"

_CTX: contextvars.ContextVar[Optional[Mesh]] = contextvars.ContextVar(
    "ntsc_crt_spatial_mesh", default=None)
# test hook: called as _INSPECT(tag, jax.sharding.Sharding) for every
# constrained tensor (via jax.debug.inspect_array_sharding)
_INSPECT: Optional[Callable] = None


@contextlib.contextmanager
def line_sharding(mesh: Optional[Mesh]):
    """Activate spatial line-sharding constraints during tracing.  Passing a
    mesh without a >1 `spatial` axis (or None) deactivates them."""
    use = mesh is not None and SPATIAL_AXIS in mesh.shape \
        and mesh.shape[SPATIAL_AXIS] > 1
    tok = _CTX.set(mesh if use else None)
    try:
        yield
    finally:
        _CTX.reset(tok)


def active() -> bool:
    return _CTX.get() is not None


def shard_rows_call(fn, *args):
    """Run a row-independent kernel dispatch under the active spatial mesh.

    `fn(*args)` must treat dim 0 of every argument and every output as an
    independent "rows" dim (the flattened batch x scanline dim every Pallas
    kernel in ops/pallas/ uses).  Outside a line_sharding context this is a
    plain call.  Under one, rows are padded to a multiple of the device
    count and `fn` runs per-shard via shard_map over the flattened
    (data, spatial) axes — so the single-chip fused kernels keep running
    when the line dim is sharded instead of falling back to the portable
    scan path (VERDICT.md r2, next-round #3).  Padding rows is safe: every
    kernel computes rows independently and the pad rows are sliced off.
    """
    mesh = _CTX.get()
    if mesh is None:
        return fn(*args)
    import jax.numpy as jnp

    n = mesh.shape[DATA_AXIS] * mesh.shape[SPATIAL_AXIS]
    R = args[0].shape[0]
    pad = (-R) % n
    padded = [jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) for a in args]
    axes = (DATA_AXIS, SPATIAL_AXIS)
    in_specs = tuple(P(axes, *([None] * (a.ndim - 1))) for a in padded)
    out_shapes = jax.eval_shape(fn, *padded)
    out_specs = jax.tree.map(
        lambda s: P(axes, *([None] * (len(s.shape) - 1))), out_shapes)
    # check_vma=False: pallas_call inside the body defeats the replication
    # checker; correctness is covered by the sharded==unsharded parity tests
    out = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)(*padded)
    if _INSPECT is not None:
        import functools
        for t in jax.tree.leaves(out):
            jax.debug.inspect_array_sharding(
                t, callback=functools.partial(_INSPECT, "rows_kernel"))
    if pad:
        out = jax.tree.map(lambda o: o[:R], out)
    return out


def shard_batch_entries_call(fn, st):
    """Run a batch-state scan kernel (st (B,) -> entries (T, B)) under the
    active mesh: the batch dim rides `data` (padded to divisibility), the
    time dim is replicated over `spatial`.  Plain call outside a context."""
    mesh = _CTX.get()
    if mesh is None:
        return fn(st)
    import jax.numpy as jnp
    n = mesh.shape[DATA_AXIS]
    B = st.shape[0]
    pad = (-B) % n
    stp = jnp.pad(st, (0, pad)) if pad else st
    out = jax.shard_map(fn, mesh=mesh, in_specs=(P(DATA_AXIS),),
                        out_specs=P(None, DATA_AXIS),
                        check_vma=False)(stp)
    return out[:, :B] if pad else out


def shard_lines(x: jax.Array, line_dim: int = 1, *, batch_dim: int = 0,
                tag: str = ""):
    """Constrain dim `line_dim` of x onto the spatial axis (batch dim onto
    data).  No-op outside a line_sharding context."""
    mesh = _CTX.get()
    if mesh is None:
        return x
    spec = [None] * x.ndim
    spec[batch_dim] = DATA_AXIS
    spec[line_dim] = SPATIAL_AXIS
    x = lax.with_sharding_constraint(x, NamedSharding(mesh, P(*spec)))
    if _INSPECT is not None:
        import functools
        jax.debug.inspect_array_sharding(
            x, callback=functools.partial(_INSPECT, tag))
    return x
