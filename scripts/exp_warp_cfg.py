"""Warp config experiment: time (TPU) + accuracy vs exact gather per config.

Measures warp_planes_banded_xla across (window, band, col_adaptive) configs:
- on-device time per 16-pair 540p call (scan-chained, relay-safe timing)
- max/mean abs error vs the exact gather warp on a battery of flow fields
  (pan small/large, zoom, rotation, smooth random) at 540p

Usage: python scripts/exp_warp_cfg.py
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from relaxtpu.ops.flow import _warp_exact
from relaxtpu.ops.warp import warp_planes_banded_xla

H, W = 540, 960
PAIRS = 16
ITERS = 8

CONFIGS = [
    (72, 64, False),  # current default
    (48, 64, False),
    (40, 64, False),
    (40, 32, True),
    (32, 64, False),
]


def flow_fields(rng):
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    cy, cx = H / 2, W / 2
    fields = {}
    fields["pan5"] = np.stack([np.full((H, W), 5.3), np.full((H, W), -2.1)])
    fields["pan50"] = np.stack([np.full((H, W), 50.7), np.full((H, W), 21.4)])
    z = 0.05
    fields["zoom5pct"] = np.stack([(xs - cx) * z, (ys - cy) * z])
    th = np.deg2rad(2.0)
    fields["rot2deg"] = np.stack(
        [
            (xs - cx) * (np.cos(th) - 1) - (ys - cy) * np.sin(th),
            (xs - cx) * np.sin(th) + (ys - cy) * (np.cos(th) - 1),
        ]
    )
    import cv2

    r = rng.normal(0, 4, (2, H, W)).astype(np.float32)
    sm = np.stack([cv2.GaussianBlur(p, (0, 0), 25) for p in r]) * 6
    fields["smooth_rand"] = sm
    return {k: v.astype(np.float32) for k, v in fields.items()}


def main():
    rng = np.random.default_rng(0)
    planes = rng.normal(0, 50, (5, H, W)).astype(np.float32)
    planes_j = jnp.asarray(planes)
    fields = flow_fields(rng)
    exact = {
        k: np.asarray(_warp_exact(planes_j, jnp.asarray(v))) for k, v in fields.items()
    }

    # timing inputs: batch of smooth-random flows
    g = jnp.asarray(
        np.stack([rng.normal(0, 50, (5, H, W)) for _ in range(PAIRS)]).astype(
            np.float32
        )
    )
    fl = jnp.asarray(
        np.stack([fields["smooth_rand"] for _ in range(PAIRS)]).astype(np.float32)
    )

    for window, band, ca in CONFIGS:
        fn = lambda p, f: warp_planes_banded_xla(  # noqa: E731
            p, f, band=band, window=window, col_adaptive=ca
        )
        # accuracy battery (interior region: skip the 5 'inside'-masked border
        # pixels the caller masks anyway — use 64 to dodge edge-clamp effects
        # for the large-pan case, reported separately)
        errs = {}
        for k, v in fields.items():
            got = np.asarray(fn(planes_j, jnp.asarray(v)))
            s = 80
            e = np.abs(got - exact[k])[:, s:-s, s:-s]
            errs[k] = (e.mean(), e.max())
        # timing
        vf = jax.vmap(fn)

        @jax.jit
        def chained(p, f):
            def body(c, _):
                out = vf(p + c * 1e-30, f)
                return c + out.ravel()[0] * 1e-30, None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        r = chained(g, fl)
        float(np.asarray(r))
        t0 = time.perf_counter()
        float(np.asarray(chained(g, fl)))
        dt = (time.perf_counter() - t0) / ITERS * 1e3
        tag = f"w={window:3d} band={band:3d} ca={int(ca)}"
        print(f"{tag}  {dt:7.2f} ms   ", end="")
        print(
            "  ".join(
                f"{k}:{errs[k][0]:.1e}/{errs[k][1]:.1e}" for k in fields
            )
        )


if __name__ == "__main__":
    main()
