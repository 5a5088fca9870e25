"""Warp one-hot-construction experiment (the warp's measured bottleneck).

`warp_planes_banded_xla`'s runtime is bound by CONSTRUCTING the banded
interpolation matrix M on the VPU (~36G iota-compare/select elements per
16-pair 540p call), not matmul FLOPs or HBM.  This measures three ways to
build the same bilinear weights:

  current — two int compares + two selects + add, tx folded in (shipped).
  tent    — m = relu(1 - |u_iota - (xic + tx)|): recomposing the clipped
            corner index with the fraction makes the bilinear weight a tent
            function, ONE fused f32 elementwise chain (sub/abs/sub/max),
            no compares or selects.  Semantically identical to `current`
            (same clipped corner, same tx) up to one f32 rounding.
  e0split — build only the 0/1 one-hot E0 = [u == xic] (1 compare + 1
            select), contract the stacked [window; lane-shifted window]
            against it (2x matmul FLOPs), then G = G0 + tx*(G1 - G0) on
            the small output side.  Halves construction, doubles the dot —
            wins iff construction stays the bound (same trick the Pallas
            kernel uses).

Each variant is timed scan-chained at 16-pair 540p (K=40, band=64) and
diffed against `current` on a smooth random flow field.

Usage: python scripts/exp_warp_m.py [pairs] [iters]
"""
from __future__ import annotations

import functools
import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from relaxtpu.ops.warp import _B, _CB, warp_planes_banded_xla

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
H, W = 540, 960


@functools.partial(jax.jit, static_argnames=("band", "window", "variant"))
def warp_variant(planes, flow, band=64, window=40, variant="tent"):
    c, h, w = planes.shape
    k = max(_B, min(window, h))
    margin = (k - _B) // 2
    nb = math.ceil(h / _B)
    hp = nb * _B
    ncb = math.ceil(w / _CB)
    wp = ncb * _CB
    cbh = min(_CB + 2 * band, wp)

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fx = xs + flow[0]
    fy = ys + flow[1]
    x1 = jnp.floor(fx)
    y1 = jnp.floor(fy)
    tx = (fx - x1).astype(jnp.float32)
    ty = (fy - y1).astype(jnp.float32)
    xi = jnp.clip(x1.astype(jnp.int32), 0, w - 2)
    yi = jnp.clip(y1.astype(jnp.int32), 0, h - 2)

    def blocked(a):
        a = jnp.pad(a, ((0, hp - h), (0, wp - w)))
        return a.reshape(nb, _B, ncb, _CB)

    xi_b, yi_b, tx_b, ty_b = blocked(xi), blocked(yi), blocked(tx), blocked(ty)
    dy_pad = jnp.pad(jnp.nan_to_num(flow[1]), ((0, hp - h), (0, wp - w)), mode="edge")
    dy_base = jnp.round(jnp.mean(dy_pad.reshape(nb, _B * wp), axis=1)).astype(jnp.int32)
    wstarts = (np.arange(nb) * _B - margin).astype(np.int32)
    cstarts = np.clip(np.arange(ncb) * _CB - band, 0, wp - cbh)
    planes_p = jnp.pad(planes, ((0, 0), (0, 0), (0, wp - w)), mode="edge")

    u_iota_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cbh, 1), 2)
    u_iota_f = jax.lax.broadcasted_iota(jnp.float32, (1, 1, cbh, 1), 2)
    r_iota_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k, 1), 2)
    r_iota_f = jax.lax.broadcasted_iota(jnp.float32, (1, 1, k, 1), 2)
    cstart_arr = jnp.asarray(cstarts, jnp.int32)[None, :, None]

    def body(_, xs_blk):
        wstart, xi_k, yi_k, tx_k, ty_k, dyb = xs_blk
        rstart = jnp.clip(wstart + dyb, 0, h - k)
        win = jax.lax.dynamic_slice(planes_p, (0, rstart, 0), (c, k, wp))
        win_c = jnp.stack(
            [jax.lax.slice(win, (0, 0, cs), (c, k, cs + cbh)) for cs in cstarts]
        )  # (ncb, C, K, CBh)

        xi_loc = jnp.clip(xi_k - cstart_arr, 0, cbh - 2)[:, :, None, :]
        txe = tx_k[:, :, None, :]
        yl = jnp.clip(yi_k - rstart, 0, k - 2)[:, :, None, :]
        tye = ty_k[:, :, None, :]

        if variant == "e0split":
            e0 = (u_iota_i == xi_loc).astype(jnp.float32)  # (B, ncb, CBh, CB)
            win2 = jnp.concatenate(
                [win_c, jnp.concatenate([win_c[..., 1:], win_c[..., -1:]], -1)], axis=1
            )  # (ncb, 2C, K, CBh)
            g2 = jnp.einsum(
                "npru,inuj->inprj", win2, e0, preferred_element_type=jnp.float32
            )  # (B, ncb, 2C, K, CB)
            g0, g1 = g2[:, :, :c], g2[:, :, c:]
            g = g0 + txe[:, :, None, :, :] * (g1 - g0)
        else:
            if variant == "tent":
                fxe = xi_loc.astype(jnp.float32) + txe
                m = jnp.maximum(1.0 - jnp.abs(u_iota_f - fxe), 0.0)
            else:  # current
                m = jnp.where(u_iota_i == xi_loc, 1.0 - txe, 0.0) + jnp.where(
                    u_iota_i == xi_loc + 1, txe, 0.0
                )
            g = jnp.einsum(
                "npru,inuj->inprj", win_c, m, preferred_element_type=jnp.float32
            )

        if variant == "tent":
            fye = yl.astype(jnp.float32) + tye
            wv = jnp.maximum(1.0 - jnp.abs(r_iota_f - fye), 0.0)
        else:
            wv = jnp.where(r_iota_i == yl, 1.0 - tye, 0.0) + jnp.where(
                r_iota_i == yl + 1, tye, 0.0
            )
        out = jnp.einsum("inrj,inprj->inpj", wv, g)
        return None, out

    _, rows = jax.lax.scan(
        body, None, (jnp.asarray(wstarts), xi_b, yi_b, tx_b, ty_b, dy_base)
    )
    out = rows.transpose(3, 0, 1, 2, 4).reshape(c, hp, wp)
    return out[:, :h, :w]


def timed(name, fn, *args):
    @jax.jit
    def chained(*xs):
        def body(cc, _):
            out = fn(xs[0] + cc * 1e-30, *xs[1:])
            return cc + out.ravel()[0] * 1e-30, None

        cc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return cc

    float(np.asarray(chained(*args)))
    t0 = time.perf_counter()
    float(np.asarray(chained(*args)))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:34s} {dt:8.2f} ms / {PAIRS}-pair call", flush=True)
    return dt


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    planes = jnp.asarray(rng.random((PAIRS, 5, H, W), np.float32))
    import cv2

    r = rng.normal(0, 4, (2, H, W)).astype(np.float32)
    sm = np.stack([cv2.GaussianBlur(p, (0, 0), 25) for p in r]) * 6
    fl = jnp.asarray(np.broadcast_to(sm, (PAIRS, 2, H, W)).copy())

    ref = np.asarray(jax.vmap(lambda p, f: warp_planes_banded_xla(p, f))(planes, fl))
    for variant in ("current", "tent", "e0split"):
        v = np.asarray(
            jax.vmap(lambda p, f: warp_variant(p, f, variant=variant))(planes, fl)
        )
        err = np.abs(v - ref)
        print(f"{variant:10s} max|d|={err.max():.3e} mean|d|={err.mean():.3e}",
              flush=True)

    for variant in ("current", "tent", "e0split"):
        timed(
            f"warp m={variant}",
            jax.vmap(lambda p, f: warp_variant(p, f, variant=variant)),
            planes,
            fl,
        )
    timed("warp shipped (warp_planes_banded_xla)",
          jax.vmap(lambda p, f: warp_planes_banded_xla(p, f)), planes, fl)
    timed("warp shipped m_form=tent",
          jax.vmap(lambda p, f: warp_planes_banded_xla(p, f, m_form="tent")),
          planes, fl)


if __name__ == "__main__":
    main()
