"""Pallas warp kernel vs the XLA bilinear warp (interpreter mode).

The environment's remote Mosaic compile helper rejects dynamic_gather, so
compiled-mode coverage is gated on ``available()``; interpreter mode
validates the kernel's semantics exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from relaxtpu.ops.warp_pallas import BLOCK_ROWS, WINDOW, warp_planes_pallas


def xla_warp(planes, flow):
    """Reference warp (same math as flow._update_matrices's gather)."""
    c, h, w = planes.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    fx = xs + np.asarray(flow[0])
    fy = ys + np.asarray(flow[1])
    x1 = np.floor(fx)
    y1 = np.floor(fy)
    tx = fx - x1
    ty = fy - y1
    xi = np.clip(x1.astype(np.int64), 0, w - 2)
    yi = np.clip(y1.astype(np.int64), 0, h - 2)
    p = np.asarray(planes)
    out = (
        (1 - tx) * (1 - ty) * p[:, yi, xi]
        + tx * (1 - ty) * p[:, yi, np.minimum(xi + 1, w - 1)]
        + (1 - tx) * ty * p[:, yi + 1, xi]
        + tx * ty * p[:, yi + 1, np.minimum(xi + 1, w - 1)]
    )
    return out


@pytest.fixture
def data(rng):
    c, h, w = 3, 64, 256
    planes = rng.normal(0, 1, (c, h, w)).astype(np.float32)
    flow = rng.normal(0, 4, (2, h, w)).astype(np.float32)  # |dy| well under clamp
    flow = np.clip(flow, -10, 10)
    return jnp.asarray(planes), jnp.asarray(flow)


def test_warp_kernel_interpret_matches_xla(data):
    planes, flow = data
    got = np.asarray(warp_planes_pallas(planes, flow, interpret=True))
    want = xla_warp(planes, flow)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_warp_kernel_zero_flow_identity(rng):
    c, h, w = 2, 64, 256
    planes = jnp.asarray(rng.normal(0, 1, (c, h, w)).astype(np.float32))
    flow = jnp.zeros((2, h, w), jnp.float32)
    got = np.asarray(warp_planes_pallas(planes, flow, interpret=True))
    # interior only: the last row/col hit the same index clamp as the XLA
    # path (those cells are masked by `inside` in the matrix update)
    np.testing.assert_allclose(
        got[:, : h - 1, : w - 1], np.asarray(planes)[:, : h - 1, : w - 1],
        rtol=1e-6, atol=1e-6,
    )


def test_warp_kernel_compiled_if_supported(data):
    from relaxtpu.ops.warp_pallas import available

    if not available():
        pytest.skip("Mosaic dynamic_gather unsupported by this compile service")
    planes, flow = data
    got = np.asarray(warp_planes_pallas(planes, flow))
    np.testing.assert_allclose(got, xla_warp(planes, flow), rtol=1e-5, atol=1e-5)
