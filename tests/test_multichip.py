"""Multi-chip semantics on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from egovlp_tpu.core.collectives import (
    all_gather_from_data_axis,
    chunked_global_similarity,
)
from egovlp_tpu.core.mesh import DATA_AXIS, MeshSpec, create_mesh


@pytest.fixture(scope="module")
def mesh():
    return create_mesh(MeshSpec())


def test_mesh_shape(mesh):
    assert mesh.shape[DATA_AXIS] == 8


def test_all_gather_concat_semantics(mesh, rng):
    x = rng.normal(size=(16, 4)).astype(np.float32)

    f = shard_map(
        lambda a: all_gather_from_data_axis(a),
        mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(),
            check_vma=False,
    )
    out = f(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-6)


def test_all_gather_grad_is_local_slice(mesh, rng):
    """d/dx sum(g * allgather(x)) == g — the AllGather_multi contract
    (trainer_egoclip.py:22-27): each shard receives its own slice of the
    upstream gradient."""
    x = rng.normal(size=(8, 4)).astype(np.float32)
    g = rng.normal(size=(8, 4)).astype(np.float32)

    def loss(a):
        f = shard_map(
            lambda t: all_gather_from_data_axis(t),
            mesh=mesh, in_specs=P(DATA_AXIS), out_specs=P(),
            check_vma=False,
        )
        return jnp.sum(f(a) * g)

    grad = jax.grad(loss)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(grad), g, rtol=1e-6)


def test_chunked_global_similarity(mesh, rng):
    """The ppermute-ring similarity equals the dense local @ global.T."""
    a = rng.normal(size=(16, 6)).astype(np.float32)
    b = rng.normal(size=(16, 6)).astype(np.float32)

    f = shard_map(
        lambda la, lb: chunked_global_similarity(la, lb),
        mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        out_specs=P(DATA_AXIS), check_vma=False,
    )
    got = np.asarray(f(jnp.asarray(a), jnp.asarray(b)))
    want = a @ b.T
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(jax.jit(fn), *args)
    assert out.shape == (4, 4)
