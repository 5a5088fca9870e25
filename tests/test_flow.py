"""Farneback flow vs cv2.calcOpticalFlowFarneback (reference parameters)."""
import numpy as np
import pytest

import jax.numpy as jnp

from relaxtpu.ops import farneback_flow

cv2 = pytest.importorskip("cv2")

REF_PARAMS = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3, poly_n=5, poly_sigma=1.2)


def textured(rng, h, w, sigma=3.0):
    t = cv2.GaussianBlur(rng.normal(0, 1, (h, w)).astype(np.float32), (0, 0), sigma)
    return (t - t.mean()) / t.std() * 40 + 128


def shifted_pair(rng, h, w, dx, dy):
    """prev(p) == next(p + (dx, dy)) by integer slicing of one big texture."""
    big = textured(rng, h + 32, w + 32)
    prev = big[16 : 16 + h, 16 : 16 + w]
    nxt = big[16 - dy : 16 - dy + h, 16 - dx : 16 - dx + w]
    return (
        np.clip(prev, 0, 255).astype(np.uint8),
        np.clip(nxt, 0, 255).astype(np.uint8),
    )


def test_flow_recovers_known_shift(rng):
    prev, nxt = shifted_pair(rng, 120, 160, dx=2, dy=1)
    got = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(nxt), **REF_PARAMS))
    s = 30
    inner = got[s:-s, s:-s]
    assert abs(np.median(inner[..., 0]) - 2.0) < 0.2
    assert abs(np.median(inner[..., 1]) - 1.0) < 0.2


def test_flow_matches_cv2_interior(rng):
    prev, nxt = shifted_pair(rng, 120, 160, dx=2, dy=1)
    want = cv2.calcOpticalFlowFarneback(prev, nxt, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    got = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(nxt), **REF_PARAMS))
    s = 24
    err = np.abs(got[s:-s, s:-s] - want[s:-s, s:-s])
    assert err.mean() < 0.05, err.mean()
    assert np.percentile(err, 99) < 0.3


def test_flow_matches_cv2_noisy_pair(rng):
    # no true motion, pure noise differences — stresses the normal-equation solve
    prev = textured(rng, 120, 144, sigma=2.0)
    nxt = prev + rng.normal(0, 4, prev.shape).astype(np.float32)
    prev = np.clip(prev, 0, 255).astype(np.uint8)
    nxt = np.clip(nxt, 0, 255).astype(np.uint8)
    want = cv2.calcOpticalFlowFarneback(prev, nxt, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    got = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(nxt), **REF_PARAMS))
    s = 24
    err = np.abs(got[s:-s, s:-s] - want[s:-s, s:-s])
    assert err.mean() < 0.05, err.mean()


def test_flow_matches_cv2_fast_motion(rng):
    """Fast pan (40 px/frame on a 240x320 frame — beyond the static +-32 warp
    band): parity target is cv2's OUTPUT, whatever it is.  With the
    reference's fixed parameters cv2 itself loses lock at this speed (its
    per-level displacement estimate saturates near winsize/2; measured median
    dx ~0.6 on this content), and we must reproduce that near-zero field, not
    invent a different one.  The block-adaptive banded warp keeps the warp
    exact for whatever intermediate flow values arise (see
    test_warp.test_xla_banded_exact_for_large_uniform_motion for the
    warp-level guarantee beyond the band).  Guards the ADVICE finding that
    large displacements silently clamped to the band edge."""
    big = textured(rng, 240 + 96, 320 + 96)
    prev = np.clip(big[48 : 48 + 240, 48 : 48 + 320], 0, 255).astype(np.uint8)
    nxt = np.clip(big[48 : 48 + 240, 8 : 8 + 320], 0, 255).astype(np.uint8)  # dx=+40
    want = cv2.calcOpticalFlowFarneback(prev, nxt, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    got = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(nxt), **REF_PARAMS))
    s = 32
    err = np.abs(got[s:-s, s:-s] - want[s:-s, s:-s])
    assert err.mean() < 0.05, err.mean()
    assert np.percentile(err, 99) < 0.3


def test_flow_full_field_close_including_borders(rng):
    prev, nxt = shifted_pair(rng, 96, 128, dx=1, dy=0)
    want = cv2.calcOpticalFlowFarneback(prev, nxt, None, 0.5, 3, 15, 3, 5, 1.2, 0)
    got = np.asarray(farneback_flow(jnp.asarray(prev), jnp.asarray(nxt), **REF_PARAMS))
    err = np.abs(got - want)
    assert err.mean() < 0.1, err.mean()  # includes border taper region


def _realistic_m(rng, h, w):
    """Normal-equation planes the way production builds them: PSD by
    construction (det = (ab - c^2)^2 >= 0, as in _update_matrices), so the
    2x2 solve is as conditioned as on real video.  Random-sign planes make
    the determinant cross zero and amplify f32 summation-order noise by
    1000x, which tests the data, not the kernel."""
    from relaxtpu.ops.flow import _poly_expansion, _update_matrices

    g0 = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
    g1 = jnp.asarray(rng.integers(0, 256, (h, w)).astype(np.float32))
    r0 = _poly_expansion(g0, 5, 1.2)
    r1 = _poly_expansion(g1, 5, 1.2)
    return _update_matrices(r0, r1, jnp.zeros((2, h, w), jnp.float32), "exact")


def test_box_solve_pallas_interpret_matches_xla(rng):
    """Fused Pallas box-blur+solve == the XLA Toeplitz _update_flow (logic
    validated in interpret mode on CPU; compiled-mode agreement is asserted
    by the TPU-gated test below)."""
    import jax

    from relaxtpu.ops.boxsolve import box_blur_solve_pallas
    from relaxtpu.ops.flow import _update_flow

    # everything on host CPU: the axon plugin ignores JAX_PLATFORMS, and on a
    # TPU-attached host the fixture/reference would otherwise cold-compile
    # through the remote tunnel (minutes per shape)
    with jax.default_device(jax.devices("cpu")[0]):
        m = _realistic_m(rng, 120, 160)
        want = np.asarray(_update_flow(m, 15))
        got = np.asarray(box_blur_solve_pallas(m, 15, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_box_solve_pallas_non_tile_shapes(rng):
    """Odd H/W exercise the slab padding and the lane-pad slicing."""
    import jax

    from relaxtpu.ops.boxsolve import box_blur_solve_pallas
    from relaxtpu.ops.flow import _update_flow

    with jax.default_device(jax.devices("cpu")[0]):  # see test above
        m = _realistic_m(rng, 67, 131)
        want = np.asarray(_update_flow(m, 15))
        got = np.asarray(box_blur_solve_pallas(m, 15, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_box_solve_pallas_compiled_on_tpu(rng):
    """Compiled Mosaic kernel vs the XLA solve on real TPU numerics."""
    import jax

    try:
        jax.devices("tpu")
    except RuntimeError:
        pytest.skip("TPU-only: compiled Mosaic path")
    from relaxtpu.ops.boxsolve import box_blur_solve_pallas
    from relaxtpu.ops.flow import _update_flow

    m = _realistic_m(rng, 540, 960)
    want = np.asarray(_update_flow(m, 15))
    got = np.asarray(box_blur_solve_pallas(m, 15))
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
