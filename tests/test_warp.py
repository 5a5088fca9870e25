"""Banded one-hot MXU warp (relaxtpu.ops.warp) vs a numpy bilinear oracle.

The warp replaces the XLA-gather bilinear sample in the Farneback matrix
update (ref: warp inside cv2 FarnebackUpdateMatrices, driven from
``cv2.calcOpticalFlowFarneback``, main_fragment_layerstack.py:313-315).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from relaxtpu.ops.warp import (
    warp_planes_banded,
    warp_planes_banded_pallas,
    warp_planes_banded_xla,
)


def oracle(planes, flow):
    """Bilinear sample with corner clamp — matches ops.flow._warp_exact."""
    c, h, w = planes.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    fx = xs + flow[0]
    fy = ys + flow[1]
    x1 = np.floor(fx)
    y1 = np.floor(fy)
    tx = fx - x1
    ty = fy - y1
    xi = np.clip(x1.astype(np.int32), 0, w - 2)
    yi = np.clip(y1.astype(np.int32), 0, h - 2)
    out = np.empty_like(planes)
    for k in range(c):
        p = planes[k]
        out[k] = (
            (1 - tx) * (1 - ty) * p[yi, xi]
            + tx * (1 - ty) * p[yi, xi + 1]
            + (1 - tx) * ty * p[yi + 1, xi]
            + tx * ty * p[yi + 1, xi + 1]
        )
    return out


@pytest.mark.parametrize(
    "c,h,w", [(5, 120, 160), (5, 68, 120), (1, 64, 256), (3, 96, 130)]
)
def test_xla_banded_matches_oracle_in_band(rng, c, h, w):
    """iid flow clipped to the default contract: |dx| <= band (64), dy within
    the (window-8)//2 = 16-row margin of its row-block mean.  Real Farneback
    intermediate flows are box-blurred (winsize 15) and sit far inside this;
    unclipped iid noise at sigma=5 has 3-sigma outliers that clamp by design.
    """
    planes = rng.normal(0, 50, (c, h, w)).astype(np.float32)
    flow = rng.normal(0, 5, (2, h, w)).astype(np.float32)
    flow[1] = np.clip(flow[1], -12.0, 12.0)  # margin 16 minus bilinear corner
    want = oracle(planes, flow)
    got = np.asarray(warp_planes_banded_xla(jnp.asarray(planes), jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, atol=2e-2)


@pytest.mark.parametrize("window", [24, 40, 72])
def test_xla_banded_window_contract(rng, window):
    """Each window size is exact for dy deviations up to its own margin."""
    c, h, w = 3, 96, 160
    margin = (window - 8) // 2
    planes = rng.normal(0, 50, (c, h, w)).astype(np.float32)
    flow = rng.normal(0, 5, (2, h, w)).astype(np.float32)
    flow[1] = np.clip(flow[1], -(margin - 4), margin - 4) + 37.0  # big mean dy
    want = oracle(planes, flow)
    got = np.asarray(
        warp_planes_banded_xla(jnp.asarray(planes), jnp.asarray(flow), window=window)
    )
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_xla_banded_exact_for_large_uniform_motion(rng):
    """Fast pan beyond the old +-32 band: dx within the widened 64-px static
    band, dy beyond the 32-row margin but covered by the row-adaptive window
    base (centred on each row-block's mean vertical displacement)."""
    c, h, w = 5, 120, 320
    planes = rng.normal(0, 50, (c, h, w)).astype(np.float32)
    flow = np.empty((2, h, w), np.float32)
    flow[0] = -55.3  # dx: fast left pan, inside the 64-px band (with jitter)
    flow[1] = 47.8  # dy: beyond the (window-8)/2 = 32 row margin
    flow += rng.normal(0, 2, flow.shape).astype(np.float32)  # local jitter
    want = oracle(planes, flow)
    got = np.asarray(warp_planes_banded_xla(jnp.asarray(planes), jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_xla_banded_exact_for_large_zoom(rng):
    """Coherent spatially-varying motion (zoom: dy varies per row-block but
    is constant within one, dx up to ~57 px at the edges): row bases track
    the vertical part, the widened band covers the horizontal part."""
    c, h, w = 3, 128, 256
    planes = rng.normal(0, 50, (c, h, w)).astype(np.float32)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    flow = np.stack([0.45 * (xs - w / 2), 0.9 * (ys - h / 2)])  # zoom-out field
    want = oracle(planes, flow)
    got = np.asarray(warp_planes_banded_xla(jnp.asarray(planes), jnp.asarray(flow)))
    np.testing.assert_allclose(got, want, atol=2e-2)


def test_tent_m_form_matches_select(rng):
    """The tent construction (one fused f32 chain, no compares/selects) must
    match the select form up to one f32 rounding — including where the corner
    clamp engages (out-of-band columns, beyond-margin rows)."""
    c, h, w = 5, 96, 256
    planes = rng.normal(0, 50, (c, h, w)).astype(np.float32)
    for sigma, clip in ((5.0, 12.0), (40.0, None)):  # in-band and clamped
        flow = rng.normal(0, sigma, (2, h, w)).astype(np.float32)
        if clip is not None:
            flow[1] = np.clip(flow[1], -clip, clip)
        want = np.asarray(
            warp_planes_banded_xla(jnp.asarray(planes), jnp.asarray(flow))
        )
        got = np.asarray(
            warp_planes_banded_xla(
                jnp.asarray(planes), jnp.asarray(flow), m_form="tent"
            )
        )
        np.testing.assert_allclose(got, want, atol=5e-4)


def test_out_of_image_is_finite_everywhere(rng):
    planes = rng.normal(0, 50, (5, 64, 128)).astype(np.float32)
    flow = rng.normal(0, 200, (2, 64, 128)).astype(np.float32)  # mostly outside
    got = np.asarray(warp_planes_banded_xla(jnp.asarray(planes), jnp.asarray(flow)))
    assert np.isfinite(got).all()


def test_pallas_interpret_matches_xla(rng):
    c, h, w = 5, 120, 160
    planes = jnp.asarray(rng.normal(0, 50, (c, h, w)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 4, (2, h, w)).astype(np.float32))
    # window=72 pins the XLA margin to the Pallas kernel's own (its window
    # rounds to 8-row multiples; the XLA default is now 40)
    want = np.asarray(warp_planes_banded_xla(planes, flow, window=72))
    # interpret mode validates kernel LOGIC; pin it to CPU, where every op
    # keeps f32 semantics.  On TPU, XLA rewrites the kernel's final
    # sum(g*wv) reduce-multiply into a hardware-default (bf16-operand) MXU
    # dot — a compiler rewrite jax_default_matmul_precision can't reach —
    # which is not what the Mosaic path executes.
    with jax.default_device(jax.devices("cpu")[0]):
        got = np.asarray(warp_planes_banded_pallas(planes, flow, interpret=True))
    # rtol absorbs compile-variant rounding: the persistent XLA cache can load
    # an executable fused differently from a fresh compile (plane values ~200,
    # so pure atol=1e-3 flaked on a 6e-6 relative deviation in full-suite runs)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_pallas_interpret_vmap(rng):
    c, h, w = 2, 64, 128
    planes = jnp.asarray(rng.normal(0, 50, (3, c, h, w)).astype(np.float32))
    flow = jnp.asarray(rng.normal(0, 4, (3, 2, h, w)).astype(np.float32))
    with jax.default_device(jax.devices("cpu")[0]):  # see test above
        got = np.asarray(
            jax.vmap(lambda p, f: warp_planes_banded_pallas(p, f, interpret=True))(
                planes, flow
            )
        )
    want = np.stack(
        [
            np.asarray(warp_planes_banded_xla(planes[i], flow[i], window=72))
            for i in range(3)
        ]
    )
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_dispatcher_runs(rng):
    """warp_planes_banded picks a working implementation on any backend.

    dy is clipped inside the default window's row margin (see the in-band
    contract on test_xla_banded_matches_oracle_in_band): the session-scoped
    rng means unclipped 3-sigma outliers appear or not depending on which
    tests ran first."""
    planes = jnp.asarray(rng.normal(0, 50, (5, 120, 160)).astype(np.float32))
    flow = rng.normal(0, 4, (2, 120, 160)).astype(np.float32)
    flow[1] = np.clip(flow[1], -12.0, 12.0)
    flow = jnp.asarray(flow)
    got = np.asarray(warp_planes_banded(planes, flow))
    want = oracle(np.asarray(planes), np.asarray(flow))
    np.testing.assert_allclose(got, want, atol=2e-2)
