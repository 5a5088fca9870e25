"""End-to-end 35,203-dim feature parity vs the independent torch+cv2 oracle.

The oracle (relaxtpu/oracle.py) implements the reference pipeline with the
reference's own stack — PIL resizes, torch backbones, cv2 Farneback, numpy
fragments — sharing NOTHING with the TPU pipeline but the (ported) weights.
This is the only test that exercises the full composition including the
PIL-vs-jax resize seam feeding every full-frame feature dimension
(VERDICT r2 item 1).  Accepted per-segment tolerances are documented in
docs/PARITY.md; tightening them requires re-measuring both columns there.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp  # noqa: E402

from relaxtpu.features.layout import TOTAL_FEATURE_DIM  # noqa: E402
from relaxtpu.oracle import (  # noqa: E402
    build_torch_resnet50,
    build_torch_vit,
    compare_segments,
    reference_video_feature,
)

# Accepted tolerances (docs/PARITY.md).  Measured 2026-08-17 on synthetic
# 120x160 content: resnet_stack mean rel 7.6e-5 (the PIL-vs-jax resize seam
# is near-exact), vit_pool 4.0e-4 (LANCZOS seam), frag_resnet 7.7e-7,
# frag_vit 3.8e-5.  Bounds carry ~10x headroom for content variation and
# rare score-tie patch swaps in the flow fragment.
TOLERANCES = {
    "resnet_stack": {"cosine": 0.9999, "mean_rel": 5e-3},
    "vit_pool": {"cosine": 0.9999, "mean_rel": 5e-3},
    "frag_resnet": {"cosine": 0.9999, "mean_rel": 5e-3},
    "frag_vit": {"cosine": 0.9999, "mean_rel": 5e-3},
}


# the one shared generator — PARITY.md tolerances were measured on it
from relaxtpu.parity import synthetic_correlated_video as _synthetic_video  # noqa: E402


@pytest.fixture(scope="module")
def models():
    """Shared weights: torch oracles + the ported Flax extractor (f32)."""
    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.models import port_torch_resnet50, port_torch_vit

    rn_oracle = build_torch_resnet50(seed=0)
    vit_oracle = build_torch_vit(seed=1)
    fx = FeatureExtractor(
        port_torch_resnet50(rn_oracle.state_dict()),
        port_torch_vit(vit_oracle.state_dict()),
        dtype=jnp.float32,
    )
    return rn_oracle, vit_oracle, fx


@pytest.mark.slow
@pytest.mark.parametrize("shape", [(3, 120, 160), (2, 224, 224)])
def test_e2e_vector_matches_reference_oracle(models, rng, shape):
    """Full 35,203-dim vector vs the oracle on two geometries: one exercising
    the resize seam (120x160 full frames), one bypassing it (224x224)."""
    rn_oracle, vit_oracle, fx = models
    n, h, w = shape
    frames, nxt = _synthetic_video(rng, n, h, w)

    ours = fx.video_feature(frames, frames[: len(nxt)], nxt)
    theirs = reference_video_feature(frames, nxt, rn_oracle, vit_oracle)
    assert ours.shape == theirs.shape == (TOTAL_FEATURE_DIM,)

    report = compare_segments(ours, theirs)
    for seg, tol in TOLERANCES.items():
        r = report[seg]
        assert r["cosine"] >= tol["cosine"], (seg, r)
        assert r["mean_abs_err_over_mean_abs"] <= tol["mean_rel"], (seg, r)


def test_e2e_vector_matches_oracle_fast(rng):
    """Per-commit tier of the e2e oracle check (VERDICT r3 item 8): the same
    full 35,203-dim composition — PIL-vs-jax resize seam, fragments, flow,
    both backbones — at depth-2 ViT / 2 frames / 120x160, cheap enough for
    ``-m "not slow"``.  The layout is depth-independent, so every dimension
    the slow full-depth test checks is exercised here too."""
    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.models import port_torch_resnet50, port_torch_vit

    rn_oracle = build_torch_resnet50(seed=0)
    vit_oracle = build_torch_vit(depth=2, seed=1)
    fx = FeatureExtractor(
        port_torch_resnet50(rn_oracle.state_dict()),
        port_torch_vit(vit_oracle.state_dict(), depth=2),
        dtype=jnp.float32,
        vit_depth=2,
    )
    frames, nxt = _synthetic_video(rng, 2, 120, 160)
    ours = fx.video_feature(frames, frames[: len(nxt)], nxt)
    theirs = reference_video_feature(frames, nxt, rn_oracle, vit_oracle)
    assert ours.shape == theirs.shape == (TOTAL_FEATURE_DIM,)

    report = compare_segments(ours, theirs)
    for seg, tol in TOLERANCES.items():
        r = report[seg]
        assert r["cosine"] >= tol["cosine"], (seg, r)
        assert r["mean_abs_err_over_mean_abs"] <= tol["mean_rel"], (seg, r)


@pytest.mark.slow
def test_fragment_images_bitexact_vs_oracle(models, rng):
    """The fragment IMAGES our device program feeds the backbones are
    bit-identical to the oracle's (residual, positions, flow image, merge):
    isolates the discrete selection seam from backbone float drift."""
    import jax

    from relaxtpu.oracle import (
        flow_to_bgr_ref,
        pack_fragment,
        patch_grid_scores,
        top_positions,
    )

    _, _, fx = models
    frames, nxt = _synthetic_video(rng, 2, 120, 160)
    prev = frames[0]

    ours_ori, ours_merged = jax.device_get(
        jax.vmap(fx._fragments)(frames[:1], nxt[:1])
    )

    residual = cv2.absdiff(nxt[0], prev)
    positions = top_positions(patch_grid_scores(residual))
    diff_frag = pack_fragment(residual, positions)
    ori_frag = pack_fragment(prev, positions)
    flow = cv2.calcOpticalFlowFarneback(
        cv2.cvtColor(prev, cv2.COLOR_BGR2GRAY),
        cv2.cvtColor(nxt[0], cv2.COLOR_BGR2GRAY),
        None, 0.5, 3, 15, 3, 5, 1.2, 0,
    )
    flow_img = flow_to_bgr_ref(flow)
    flow_frag = pack_fragment(flow_img, top_positions(patch_grid_scores(flow_img)))
    merged = cv2.addWeighted(diff_frag, 0.5, flow_frag, 0.5, 0)

    np.testing.assert_array_equal(np.asarray(ours_ori[0]), ori_frag)
    # the merged fragment depends on OUR flow field vs cv2's (<0.05 px): the
    # flow image quantizes to uint8, so allow tiny pixel-level differences
    # but require patch-selection agreement (identical non-zero layout)
    ours_m = np.asarray(ours_merged[0])
    diff_px = np.abs(ours_m.astype(int) - merged.astype(int))
    frac_exact = float((diff_px == 0).mean())
    assert frac_exact > 0.95, frac_exact
    assert diff_px.max() <= 130, diff_px.max()  # a swapped patch at worst
