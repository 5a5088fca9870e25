"""Sub-stage profile of the Farneback flow kernel on the real TPU.

Times each stage of the 16-pair 540p flow program with on-device scan
chaining (the axon relay makes ``block_until_ready`` a no-op — only a data
fetch syncs, so each timed region is a single jitted ``lax.scan`` whose
carry feeds the next iteration, and one scalar is fetched at the end).

Usage: python scripts/profile_flow.py [pairs] [iters]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from relaxtpu.ops import flow as F
from relaxtpu.ops.warp import warp_planes_banded

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
H, W = 540, 960


def timed(name, make_fn, *args):
    """make_fn(*args) -> (step_fn, init_args). step_fn must return a pytree
    whose first leaf participates in the carry chain."""
    fn = make_fn

    @jax.jit
    def chained(*xs):
        def body(c, _):
            perturbed = (xs[0] + c * 1e-30,) + xs[1:]
            out = fn(*perturbed)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.ravel()[0] * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    # compile + warm
    r = chained(*args)
    float(np.asarray(r))
    t0 = time.perf_counter()
    r = chained(*args)
    float(np.asarray(r))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:46s} {dt:8.2f} ms")
    return dt


def main():
    rng = np.random.default_rng(0)
    g0 = jnp.asarray(rng.integers(0, 256, (PAIRS, H, W)).astype(np.float32))
    g1 = jnp.asarray(rng.integers(0, 256, (PAIRS, H, W)).astype(np.float32))
    print(f"devices: {jax.devices()}  pairs={PAIRS} iters={ITERS}")

    # ---- full flow
    full = jax.vmap(lambda a, b: F.farneback_flow(a, b))
    t_full = timed("full farneback_flow (banded)", full, g0, g1)

    # ---- pyramid smoothing + resize for all levels, both images
    def pyr(a, b):
        outs = []
        for k in range(3, -1, -1):
            scale = 0.5 ** k
            hk = F._cvround(H * scale)
            wk = F._cvround(W * scale)
            sigma = (1.0 / scale - 1.0) * 0.5
            smooth_sz = max(F._cvround(sigma * 5) | 1, 3)
            gk = F._gaussian_kernel(smooth_sz, sigma)
            for base in (a, b):
                im = F._sep_correlate(base, gk, gk, "reflect")
                outs.append(F._resize_linear(im, (hk, wk)).ravel()[0])
        return jnp.stack(outs).sum()

    timed("pyramid smooth+resize (all levels, 2 imgs)", jax.vmap(pyr), g0, g1)

    # ---- poly expansion all levels, both images (on unsmoothed input: cost model)
    def poly_all(a, b):
        outs = []
        for k in range(3, -1, -1):
            scale = 0.5 ** k
            hk = F._cvround(H * scale)
            wk = F._cvround(W * scale)
            ia = F._resize_linear(a, (hk, wk))
            ib = F._resize_linear(b, (hk, wk))
            outs.append(F._poly_expansion(ia, 5, 1.2).ravel()[0])
            outs.append(F._poly_expansion(ib, 5, 1.2).ravel()[0])
        return jnp.stack(outs).sum()

    timed("poly expansion (all levels, 2 imgs)", jax.vmap(poly_all), g0, g1)

    # precomputed full-res expansions + a flow field for stage timings
    r0 = jax.vmap(lambda a: F._poly_expansion(a, 5, 1.2))(g0)
    r1 = jax.vmap(lambda a: F._poly_expansion(a, 5, 1.2))(g1)
    r0 = jax.device_put(np.asarray(r0))
    r1 = jax.device_put(np.asarray(r1))
    fl = jnp.asarray(rng.normal(0, 3, (PAIRS, 2, H, W)).astype(np.float32))

    # ---- banded warp alone (full res)
    timed(
        "banded warp (5 planes, full res)",
        jax.vmap(warp_planes_banded),
        r1,
        fl,
    )

    # ---- update_matrices (warp + elementwise M)
    timed(
        "update_matrices full res (warp+M)",
        jax.vmap(lambda a, b, f: F._update_matrices(a, b, f, "banded")),
        r0,
        r1,
        fl,
    )

    m = jax.device_put(np.asarray(jax.vmap(
        lambda a, b, f: F._update_matrices(a, b, f, "banded"))(r0, r1, fl)))

    # ---- update_flow (box blur + 2x2 solve)
    timed(
        "update_flow full res (box blur+solve)",
        jax.vmap(lambda mm: F._update_flow(mm, 15)),
        m,
    )

    # ---- box blur alone
    timed("box blur 15x15 alone (5 planes)", jax.vmap(lambda mm: F._box_blur(mm, 15)), m)

    # ---- one full-res level iteration: 3x (update_matrices + update_flow)
    def level0(a, b, f):
        mm = F._update_matrices(a, b, f, "banded")
        for i in range(3):
            f = F._update_flow(mm, 15)
            if i < 2:
                mm = F._update_matrices(a, b, f, "banded")
        return f

    timed("level-0 solve (3 iters, full res)", jax.vmap(level0), r0, r1, fl)

    print(f"\nfull flow per {PAIRS}-pair batch: {t_full:.1f} ms")


if __name__ == "__main__":
    main()
