"""Roofline decomposition of the Farneback flow program (VERDICT r4 item 3).

Locates the bound of each flow stage by (a) timing the stage with on-device
scan chaining, (b) timing the warp's internal phases in isolation
(one-hot construction only / construction + horizontal einsum / full), and
(c) pulling XLA cost_analysis FLOPs+bytes for each jitted piece to compare
achieved rates against v5e peaks (197 TF/s dense bf16 MXU, ~819 GB/s HBM,
~4 TOP/s f32 VPU elementwise).

The reference has no analog (its flow is one cv2 C++ call,
``main_fragment_layerstack.py:313-315``); this script exists to prove — or
disprove — that the rebuilt flow's ~90 ms / 16-pair 540p sits near a
hardware bound, per the round-3 verdict.

Usage: python scripts/flow_roofline.py [pairs] [iters]
"""
from __future__ import annotations

import math
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from relaxtpu.ops import flow as F  # noqa: E402
from relaxtpu.ops import warp as Wp  # noqa: E402

PAIRS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
ITERS = int(sys.argv[2]) if len(sys.argv) > 2 else 8
H, W = 540, 960

PEAK_MXU = 197e12  # v5e dense bf16 FLOP/s
PEAK_HBM = 819e9   # v5e HBM B/s
PEAK_VPU = 4e12    # v5e f32 elementwise op/s (8x128 lanes x 4 ALUs x ~1GHz)


def timed(name, fn, *args):
    """Scan-chained device timing (axon relay: only a fetch syncs).
    A stage that fails to lower prints the error and returns Nones."""
    try:
        return _timed(name, fn, *args)
    except Exception as e:
        print(f"{name:52s} FAILED: {str(e)[:140]}", flush=True)
        return None, None, None


_OVERHEAD_MS = None


def _call_overhead_ms() -> float:
    """One dispatch+scalar-fetch round trip (~the tunnel RTT), paid per
    TIMED CALL regardless of ITERS.  r4 numbers divided it across ITERS=8,
    inflating every stage by ~3 ms — measure once and subtract."""
    global _OVERHEAD_MS
    if _OVERHEAD_MS is None:
        f = jax.jit(lambda v: (v * 0).astype(jnp.float32))
        x = jnp.float32(1)
        float(f(x))
        _OVERHEAD_MS = min(_one_call(f, x) for _ in range(7))
        print(f"(per-call dispatch overhead: {_OVERHEAD_MS:.1f} ms — subtracted)",
              flush=True)
    return _OVERHEAD_MS


def _one_call(f, x) -> float:
    t0 = time.perf_counter()
    float(f(x))
    return (time.perf_counter() - t0) * 1e3


def _timed(name, fn, *args):
    @jax.jit
    def chained(*xs):
        def body(c, _):
            perturbed = (xs[0] + c * 1e-30,) + xs[1:]
            out = fn(*perturbed)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return c + leaf.ravel()[0].astype(jnp.float32) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    oh = _call_overhead_ms()
    lowered = chained.lower(*args)
    compiled = lowered.compile()
    float(np.asarray(compiled(*args)))  # warm
    t0 = time.perf_counter()
    float(np.asarray(compiled(*args)))
    dt = max((time.perf_counter() - t0) * 1e3 - oh, 0.0) / ITERS

    flops = bytes_ = None
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        if ca:
            flops = float(ca.get("flops", 0)) / ITERS
            bytes_ = float(ca.get("bytes accessed", 0)) / ITERS
    except Exception:
        pass
    line = f"{name:52s} {dt:8.2f} ms"
    if flops:
        mxu_ms = flops / PEAK_MXU * 1e3
        line += f"  flops={flops/1e9:7.1f}G (mxu-bound {mxu_ms:6.2f} ms)"
    if bytes_:
        hbm_ms = bytes_ / PEAK_HBM * 1e3
        line += f"  bytes={bytes_/1e9:6.2f}G (hbm-bound {hbm_ms:6.2f} ms)"
    print(line, flush=True)
    return dt, flops, bytes_


# ---------------------------------------------------------------- warp phases
def warp_construction_only(planes, flow, band=64, window=40):
    """The one-hot m + wv construction EXACTLY as warp_planes_banded_xla
    builds them, with the two einsums replaced by cheap reductions — times
    the VPU mask-construction phase alone."""
    c, h, w = planes.shape
    _B, _CB = Wp._B, Wp._CB
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
    cstart_arr = jnp.asarray(
        np.clip(np.arange(ncb) * _CB - band, 0, wp - cbh), jnp.int32
    )[None, :, None]
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cbh, 1), 2)
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, k, 1), 2)

    def body(_, xs_blk):
        wstart, xi_k, yi_k, tx_k, ty_k, dyb = xs_blk
        rstart = jnp.clip(wstart + dyb, 0, h - k)
        xi_loc = jnp.clip(xi_k - cstart_arr, 0, cbh - 2)[:, :, None, :]
        txe = tx_k[:, :, None, :]
        m = jnp.where(u_iota == xi_loc, 1.0 - txe, 0.0) + jnp.where(
            u_iota == xi_loc + 1, txe, 0.0
        )
        yl = jnp.clip(yi_k - rstart, 0, k - 2)[:, :, None, :]
        tye = ty_k[:, :, None, :]
        wv = jnp.where(r_iota == yl, 1.0 - tye, 0.0) + jnp.where(
            r_iota == yl + 1, tye, 0.0
        )
        # cheap consumers (fuse into the constructions; no matmuls)
        return None, jnp.sum(m, axis=(2, 3)) + jnp.sum(wv, axis=(2, 3))

    _, rows = jax.lax.scan(
        body, None, (jnp.asarray(wstarts), xi_b, yi_b, tx_b, ty_b, dy_base)
    )
    return rows


def warp_no_vertical(planes, flow, band=64, window=40):
    """Construction + window staging + the horizontal einsum; the vertical
    one-hot reduce replaced by a plain sum over the window axis."""
    c, h, w = planes.shape
    _B, _CB = Wp._B, Wp._CB
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
    tx = (fx - x1).astype(jnp.float32)
    xi = jnp.clip(x1.astype(jnp.int32), 0, w - 2)

    def blocked(a):
        a = jnp.pad(a, ((0, hp - h), (0, wp - w)))
        return a.reshape(nb, _B, ncb, _CB)

    xi_b, tx_b = blocked(xi), blocked(tx)
    dy_pad = jnp.pad(jnp.nan_to_num(flow[1]), ((0, hp - h), (0, wp - w)), mode="edge")
    dy_base = jnp.round(jnp.mean(dy_pad.reshape(nb, _B * wp), axis=1)).astype(jnp.int32)
    wstarts = (np.arange(nb) * _B - margin).astype(np.int32)
    cstarts = np.clip(np.arange(ncb) * _CB - band, 0, wp - cbh)
    cstart_arr = jnp.asarray(cstarts, jnp.int32)[None, :, None]
    planes_p = jnp.pad(planes, ((0, 0), (0, 0), (0, wp - w)), mode="edge")
    u_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cbh, 1), 2)

    def body(_, xs_blk):
        wstart, xi_k, tx_k, dyb = xs_blk
        rstart = jnp.clip(wstart + dyb, 0, h - k)
        win = jax.lax.dynamic_slice(planes_p, (0, rstart, 0), (c, k, wp))
        win_c = jnp.stack(
            [jax.lax.slice(win, (0, 0, cs), (c, k, cs + cbh)) for cs in cstarts]
        )
        xi_loc = jnp.clip(xi_k - cstart_arr, 0, cbh - 2)[:, :, None, :]
        txe = tx_k[:, :, None, :]
        m = jnp.where(u_iota == xi_loc, 1.0 - txe, 0.0) + jnp.where(
            u_iota == xi_loc + 1, txe, 0.0
        )
        g = jnp.einsum(
            "npru,inuj->inprj", win_c, m, preferred_element_type=jnp.float32
        )
        return None, jnp.sum(g, axis=3)  # plain window sum, no wv one-hot

    _, rows = jax.lax.scan(
        body, None, (jnp.asarray(wstarts), xi_b, tx_b, dy_base)
    )
    return rows


def main():
    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}  pairs={PAIRS} iters={ITERS}", flush=True)

    r1 = jax.device_put(
        rng.normal(0, 10, (PAIRS, 5, H, W)).astype(np.float32)
    )
    fl = jax.device_put(rng.normal(0, 3, (PAIRS, 2, H, W)).astype(np.float32))
    g0 = jax.device_put(rng.integers(0, 256, (PAIRS, H, W)).astype(np.float32))
    g1 = jax.device_put(rng.integers(0, 256, (PAIRS, H, W)).astype(np.float32))

    print("\n-- warp phase decomposition (full res, K=40, band=64) --", flush=True)
    timed("one-hot construction only (m + wv)",
          jax.vmap(warp_construction_only), r1, fl)
    timed("construction + horizontal einsum",
          jax.vmap(warp_no_vertical), r1, fl)
    timed("full banded warp",
          jax.vmap(Wp.warp_planes_banded), r1, fl)

    print("\n-- stage rooflines --", flush=True)
    m = jax.device_put(np.asarray(jax.vmap(
        lambda a, b, f: F._update_matrices(a, b, f, "banded"))(r1, r1, fl)))
    timed("box blur 15x15 (5 planes)",
          jax.vmap(lambda mm: F._box_blur(mm, 15)), m)
    timed("update_flow XLA (box blur + solve)",
          jax.vmap(lambda mm: F._update_flow(mm, 15)), m)
    from relaxtpu.ops.boxsolve import box_blur_solve_pallas
    timed("update_flow PALLAS fused (box blur + solve)",
          lambda mm: box_blur_solve_pallas(mm, 15), m)
    timed("poly expansion (1 img, full res)",
          jax.vmap(lambda a: F._poly_expansion(a, 5, 1.2)), g0)
    timed("poly expansion (2 imgs via inner vmap)",
          jax.vmap(lambda a, b: jax.vmap(
              lambda im: F._poly_expansion(im, 5, 1.2))(jnp.stack([a, b]))),
          g0, g1)
    timed("full farneback_flow",
          jax.vmap(lambda a, b: F.farneback_flow(a, b)), g0, g1)


if __name__ == "__main__":
    main()
