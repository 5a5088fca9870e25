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


def test_mesh_falls_back_to_virtual_cpu(monkeypatch):
    """A requested mesh larger than the default backend (e.g. one tunneled
    TPU) falls back to the virtual CPU host devices; an unsatisfiable
    request raises instead of reshape-crashing."""
    real = jax.devices

    def fake(platform=None):
        cpus = real("cpu")
        return cpus if platform == "cpu" else cpus[:1]

    monkeypatch.setattr(jax, "devices", fake)
    mesh = make_mesh(n_data=4, n_model=2)  # default backend has 1 device
    assert mesh.shape == {"data": 4, "model": 2}
    assert all(d.platform == "cpu" for d in mesh.devices.ravel())
    with pytest.raises(ValueError, match="mesh needs"):
        make_mesh(n_data=64, n_model=2)


def test_dp_tp_train_step_matches_single_device(rng):
    """The REAL head shape: fc1 is (35,203 x 256), and 35,203 is odd — the
    'model' split needs train_dp's exact zero-pad row (35,203 -> 35,204).
    The dp+tp step must still match a single-device step bit-closely
    (VERDICT r4 item 4: toy dims never compiled the real TP split)."""
    dim, hidden, bsz = 35203, 256, 16
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
    # fc1 rows past the true dim are the zero pad that makes 35,203 divisible
    # by the model axis — exact by construction, and must STAY zero
    pad_rows = np.asarray(params_multi["fc1"]["kernel"])[dim:]
    assert pad_rows.shape[0] == 1 and not pad_rows.any()
    params_multi["fc1"]["kernel"] = params_multi["fc1"]["kernel"][:dim]
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


def _tiny_extractor():
    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.models import ResNet50, ViT
    from relaxtpu.models.initutil import fast_init

    rn = fast_init(ResNet50(), jnp.zeros((1, 224, 224, 3)))
    vit = fast_init(ViT(), jnp.zeros((1, 224, 224, 3)), key=jax.random.PRNGKey(1))
    return FeatureExtractor(rn, vit)


def _synth_videos(rng, n_videos, n_frames=4, h=64, w=96):
    """[(bgr_frames, bgr_next, i420_frames, i420_next)] per video."""
    from relaxtpu.ops.colorspace import bgr_to_yuv420, pack_i420

    out = []
    for _ in range(n_videos):
        frames = rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8)
        nxt = rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8)
        out.append((frames, nxt, pack_i420(*bgr_to_yuv420(frames)),
                    pack_i420(*bgr_to_yuv420(nxt))))
    return out


@pytest.mark.slow
def test_sharded_evaluator_run_matches_single_device(rng):
    """ShardedVideoEvaluator.run on a 2-device mesh == the single-device
    programs, for mixed i420 (video-axis-sharded batch) and BGR
    (frame-axis-sharded) decodes; results come back in input order."""
    from relaxtpu.parallel.eval import ShardedVideoEvaluator

    fx = _tiny_extractor()
    vids = _synth_videos(rng, 3)
    h, w = 64, 96

    def decode(v):
        i = v["i"]
        if v["kind"] == "i420":
            return ("i420", vids[i][2], vids[i][3], h, w)
        frames, nxt = vids[i][0], vids[i][1]
        return frames, frames[: len(nxt)], nxt

    videos = [
        {"i": 0, "kind": "i420"},
        {"i": 1, "kind": "bgr"},
        {"i": 2, "kind": "i420"},
    ]
    mesh = make_mesh(n_data=2, n_model=1, platform="cpu")
    ev = ShardedVideoEvaluator(fx, mesh, decode_workers=2)
    seen: list[int] = []
    got = ev.run(videos, decode, on_result=lambda i, _vec: seen.append(i))
    assert len(got) == 3
    # the BGR single (index 1) finishes while i420 batches are still grouped;
    # on_result must still fire in input order
    assert seen == [0, 1, 2]

    want = []
    for v in videos:
        i = v["i"]
        if v["kind"] == "i420":
            want.append(np.asarray(
                fx.video_feature_async_i420(vids[i][2], vids[i][3], h, w)
            ))
        else:
            frames, nxt = vids[i][0], vids[i][1]
            want.append(fx.video_feature(frames, frames[: len(nxt)], nxt))
    for g, e in zip(got, want):
        assert g.shape == (35203,)
        np.testing.assert_allclose(g, e, rtol=2e-2, atol=1e-3)


@pytest.mark.slow
def test_sharded_evaluator_run_distributed_single_process(rng):
    """run_distributed degenerates to run() in a single process (the DCN
    allgather becomes an identity scatter into the output matrix)."""
    from relaxtpu.parallel.eval import ShardedVideoEvaluator

    fx = _tiny_extractor()
    vids = _synth_videos(rng, 2)
    h, w = 64, 96

    def decode(i):
        return ("i420", vids[i][2], vids[i][3], h, w)

    mesh = make_mesh(n_data=2, n_model=1, platform="cpu")
    ev = ShardedVideoEvaluator(fx, mesh, decode_workers=2)
    mat = ev.run_distributed([0, 1], decode)
    assert mat.shape == (2, 35203)
    direct = ev.run([0, 1], decode)
    np.testing.assert_allclose(mat, np.stack(direct), rtol=1e-5, atol=1e-6)


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
