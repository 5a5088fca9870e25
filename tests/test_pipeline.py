"""Feature pipeline shape/semantics tests (small shapes, random weights)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from relaxtpu.features.layout import FEATURE_LAYOUT, TOTAL_FEATURE_DIM
from relaxtpu.features.pipeline import FeatureExtractor
from relaxtpu.models import ResNet50, ViT


@pytest.fixture(scope="module")
def extractor():
    key = jax.random.PRNGKey(0)
    rn_vars = ResNet50().init(key, jnp.zeros((1, 224, 224, 3)))
    vit_vars = ViT().init(key, jnp.zeros((1, 224, 224, 3)))
    return FeatureExtractor(rn_vars, vit_vars)


@pytest.mark.slow
def test_video_feature_dim_and_layout(extractor, rng):
    frames = rng.integers(0, 256, (2, 96, 128, 3), dtype=np.uint8)
    pairs = rng.integers(0, 256, (3, 96, 128, 3), dtype=np.uint8)
    vec = extractor.video_feature(frames, pairs[:-1], pairs[1:])
    assert vec.shape == (TOTAL_FEATURE_DIM,)
    assert np.isfinite(vec).all()
    dims = dict(FEATURE_LAYOUT)
    stack, vit_stats = extractor.frame_features(frames)
    assert stack.shape == (2, dims["resnet_stack"])
    assert vit_stats.shape == (2, dims["vit_pool"])
    frag_rn, frag_vit = extractor.pair_features(pairs[:-1], pairs[1:])
    assert frag_rn.shape == (2, dims["frag_resnet"])
    assert frag_vit.shape == (2, dims["frag_vit"])


@pytest.mark.slow
def test_video_feature_async_matches_sync(extractor, rng):
    frames = rng.integers(0, 256, (3, 96, 128, 3), dtype=np.uint8)
    pairs = rng.integers(0, 256, (4, 96, 128, 3), dtype=np.uint8)
    sync = extractor.video_feature(frames, pairs[:-1], pairs[1:])
    # bucket=4 pads frames 3 -> 4; masked means must keep the math exact
    async_vec = np.asarray(
        extractor.video_feature_async(frames, pairs[:-1], pairs[1:], bucket=4)
    )
    np.testing.assert_allclose(async_vec, sync, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_chunked_highres_path_matches_unchunked(extractor, rng, monkeypatch):
    """The chunked async high-res path (pairs beyond max_pair_batch run as
    dynamic-slice chunk programs over the device-resident I420 buffers, sums
    accumulated on device) == the single-program path."""
    from relaxtpu.ops.colorspace import bgr_to_yuv420, pack_i420

    chain = rng.integers(0, 256, (6, 96, 128, 3), dtype=np.uint8)
    nxt_c = np.roll(chain, -1, axis=0)[:5]
    fbuf = pack_i420(*bgr_to_yuv420(chain))
    nbuf = pack_i420(*bgr_to_yuv420(nxt_c))
    want = np.asarray(
        extractor.video_feature_async_i420(fbuf, nbuf, 96, 128, bucket=2)
    )
    # force the chunked fallback: cap in-flight pairs at 2 -> 3 chunk calls
    monkeypatch.setattr(
        type(extractor), "max_pair_batch", lambda self, h, w: 2
    )
    got = np.asarray(
        extractor.video_feature_async_i420(fbuf, nbuf, 96, 128, bucket=2)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_pair_features_batch_invariance(extractor, rng):
    """Batched execution == per-pair execution (no cross-pair leakage)."""
    pairs = rng.integers(0, 256, (3, 96, 128, 3), dtype=np.uint8)
    prev, nxt = pairs[:-1], pairs[1:]
    fr_b, fv_b = extractor.pair_features(prev, nxt)
    fr_0, fv_0 = extractor.pair_features(prev[:1], nxt[:1])
    np.testing.assert_allclose(fr_b[0], fr_0[0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(fv_b[0], fv_0[0], rtol=2e-3, atol=2e-3)


@pytest.mark.slow
def test_yuv_ingest_matches_bgr_ingest(extractor, rng):
    """YUV-ingest program == BGR-ingest program bit-for-bit in frames.

    The device I420->BGR conversion bit-matches the host converter, so
    feeding the same frames through either ingest must give the same
    features (the YUV path halves host->device transfer)."""
    from relaxtpu.ops.colorspace import bgr_to_yuv420, yuv420_to_bgr
    import jax.numpy as jnp

    chain = rng.integers(0, 256, (4, 96, 128, 3), dtype=np.uint8)
    fyuv = bgr_to_yuv420(chain)
    nyuv = bgr_to_yuv420(np.roll(chain, -1, axis=0)[:3])
    # the BGR path must see EXACTLY the frames the device converter makes
    frames = np.asarray(yuv420_to_bgr(*map(jnp.asarray, fyuv)))
    nxt = np.asarray(yuv420_to_bgr(*map(jnp.asarray, nyuv)))
    want = np.asarray(
        extractor.video_feature_async(frames, frames[:3], nxt, bucket=4)
    )
    got = np.asarray(extractor.video_feature_async_yuv(fyuv, nyuv, bucket=4))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_batched_videos_match_single(extractor, rng):
    """video_features_batch_i420 == per-video video_feature_async_i420."""
    from relaxtpu.ops.colorspace import bgr_to_yuv420, pack_i420

    h, w = 96, 128
    fbufs, nbufs = [], []
    for n in (3, 4):  # ragged counts exercise the per-video masking
        chain = rng.integers(0, 256, (n + 1, h, w, 3), dtype=np.uint8)
        fbufs.append(pack_i420(*bgr_to_yuv420(chain[:n])))
        nbufs.append(pack_i420(*bgr_to_yuv420(chain[1 : n + 1])))
    batch = np.asarray(
        extractor.video_features_batch_i420(fbufs, nbufs, h, w, bucket=4)
    )
    for i in range(2):
        single = np.asarray(
            extractor.video_feature_async_i420(fbufs[i], nbufs[i], h, w, bucket=4)
        )
        np.testing.assert_allclose(batch[i], single, rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_batched_videos_chunked_flow_matches_unchunked(extractor, rng):
    """The pair-chunked flow scan inside the batched program (the fix for
    batch mode's V*P concurrent-flow HBM blowup) is numerically identical to
    the unchunked vmap."""
    from relaxtpu.ops.colorspace import bgr_to_yuv420, pack_i420

    h, w = 96, 128
    fbufs, nbufs = [], []
    for n in (3, 4):
        chain = rng.integers(0, 256, (n + 1, h, w, 3), dtype=np.uint8)
        fbufs.append(pack_i420(*bgr_to_yuv420(chain[:n])))
        nbufs.append(pack_i420(*bgr_to_yuv420(chain[1 : n + 1])))
    fstack, nstack, nf, npair = extractor.stack_videos_i420(fbufs, nbufs, bucket=4)
    fn = extractor.videos_fn()
    args = (
        extractor.resnet_vars,
        extractor.vit_vars,
        jnp.asarray(fstack),
        jnp.asarray(nstack),
        jnp.asarray(nf),
        jnp.asarray(npair),
        h,
        w,
    )
    want = np.asarray(fn(*args, 0))  # unchunked
    got = np.asarray(fn(*args, 3))  # 8 flattened pairs -> 3 chunks (pad row)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
