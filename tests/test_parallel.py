"""Multi-device tests on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from relaxtpu.parallel.mesh import data_sharding, make_mesh, shard_batch
from relaxtpu.parallel.train_dp import DistributedMlpTrainStep


def test_mesh_shape():
    mesh = make_mesh(n_data=4, n_model=2, platform="cpu")
    assert mesh.shape == {"data": 4, "model": 2}


def test_dp_tp_train_step_matches_single_device(rng):
    dim, hidden, bsz = 64, 32, 16
    x = rng.normal(size=(bsz, dim)).astype(np.float32)
    y = rng.uniform(1, 5, size=(bsz,)).astype(np.float32)

    def run(mesh):
        step = DistributedMlpTrainStep(mesh, input_dim=dim, hidden=hidden, use_bn=False, drop_rate=0.0)
        params, opt_state = step.init(jax.random.PRNGKey(0))
        params, opt_state, loss = step.step(params, opt_state, x, y, jax.random.PRNGKey(1))
        return float(loss), jax.device_get(params)

    loss_multi, params_multi = run(make_mesh(n_data=4, n_model=2, platform="cpu"))
    loss_single, params_single = run(make_mesh(n_data=1, n_model=1, devices=jax.devices("cpu")[:1]))
    assert abs(loss_multi - loss_single) < 1e-4
    flat_m = jax.tree_util.tree_leaves(params_multi)
    flat_s = jax.tree_util.tree_leaves(params_single)
    for a, b in zip(flat_m, flat_s):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_shard_batch_pads_and_restores(rng):
    mesh = make_mesh(n_data=8, n_model=1, platform="cpu")
    a = rng.normal(size=(13, 4)).astype(np.float32)
    padded, real = shard_batch(mesh, a)
    assert padded.shape[0] % 8 == 0
    assert real == 13
    np.testing.assert_array_equal(np.asarray(padded)[:13], a)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
