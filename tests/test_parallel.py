"""Device-mesh layer: sharded batched step over the virtual 8-device CPU
mesh must produce bit-identical results to the unsharded batched step, for
both 1D (data) and 2D (data x spatial) meshes; state stays sharded."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from ntsc_crt_tpu.models.systems import NTSC
from ntsc_crt_tpu.parallel import mesh as pmesh


def _imgs(b, seed=0, w=64, h=48):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (b, h, w, 3), np.uint8)


@pytest.mark.parametrize("shape", [(8, 1), (4, 2)])
def test_sharded_step_matches_unsharded(shape):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    mesh = pmesh.make_mesh(*shape)
    B = 8
    imgs = jnp.asarray(_imgs(B))
    z = jnp.zeros((B,), jnp.int32)
    fields = jnp.asarray(np.arange(B) % 2, jnp.int32)

    ref_states = pmesh.init_batch(NTSC, B, 128, 96)
    ref_step = pmesh.make_batched_step(NTSC, noise=9, donate=False)
    ref = ref_step(ref_states, imgs, fields, z, z)

    states = pmesh.init_batch(NTSC, B, 128, 96, mesh=mesh)
    step = pmesh.make_sharded_step(NTSC, mesh, noise=9)
    out = step(states, imgs, fields, z, z)

    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # state remains sharded over the data axis
    shard = out.analog.sharding
    assert shard.is_fully_replicated is False


def test_spatial_axis_actually_partitions_lines():
    """The `spatial` mesh axis must PARTITION the line dim of the heavy
    per-line stages (not pass by replication): inspect the compiled
    shardings of the tagged intermediates on a (4, 2) mesh (VERDICT.md r1
    weak #2)."""
    from ntsc_crt_tpu.models.systems import NTSC
    from ntsc_crt_tpu.parallel import spatial

    mesh = pmesh.make_mesh(4, 2)
    recorded = {}
    spatial._INSPECT = lambda tag, sh: recorded.setdefault(tag, sh)
    try:
        B = 8
        states = pmesh.init_batch(NTSC, B, 128, 96, mesh=mesh)
        step = pmesh.make_sharded_step(NTSC, mesh, noise=9)
        imgs = jnp.asarray(_imgs(B))
        z = jnp.zeros((B,), jnp.int32)
        out = step(states, imgs, z, z, z)
        jax.block_until_ready(out)
    finally:
        spatial._INSPECT = None

    L, AV = NTSC.lines, NTSC.av_len
    for tag, shape, ldim in [
        ("enc_y", (B, 240, 753), 1),     # modulator active block (desth)
        ("enc_ire", (B, 240, 753), 1),
        ("sig", (B, L, AV), 1),          # demodulator line extraction
        ("yiq", (B, L, 3, AV), 1),       # EQ input
        ("rgb", (B, L, 128, 3), 1),      # scan-converted lines
        ("out", (B, 96, 128, 3), 1),     # placed output rows
    ]:
        assert tag in recorded, f"{tag} constraint never traced"
        got = recorded[tag].shard_shape(shape)[ldim]
        assert got == -(-shape[ldim] // 2), \
            f"{tag}: line dim not split: shard {got} of {shape[ldim]}"
        # batch dim rides the data axis
        assert recorded[tag].shard_shape(shape)[0] == B // 4


def test_multichip_dryrun_entrypoints():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.out.shape == (480, 640, 3)
    g.dryrun_multichip(8)
    g.dryrun_multichip(2)
