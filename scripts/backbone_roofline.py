"""Backbone roofline: where do the ResNet-50 / ViT-B forwards spend time?

VERDICT r4 weak-item #1: flow got a roofline proving it near its bound;
the backbones (ResNet ~16% MFU, ViT ~32% at 48 images bf16) did not.
This script decomposes both forwards on the real TPU and compares each
segment's measured time against its MXU/HBM bounds, then times candidate
optimizations, mirroring scripts/flow_roofline.py's method.

Run one section at a time through the tunnel (compiles dominate wall time):
  python scripts/backbone_roofline.py --section resnet
  python scripts/backbone_roofline.py --section stem
  python scripts/backbone_roofline.py --section vit

Timing uses the chained on-device ``lax.scan`` from bench.py's
``measure_stage_breakdown`` (through the axon relay ``block_until_ready``
is a no-op, so wall-per-iter of a scanned program is the only reliable
device timing).

Reference anchor: the batch=1, 15-hooked-forward pattern this replaces,
``/root/reference/src/extractor/visualise_resnet.py:24-36``.
"""

from __future__ import annotations

import argparse
import sys
import time
from typing import Any

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


_OVERHEAD_MS = None


def call_overhead_ms() -> float:
    """Wall cost of one dispatch+scalar-fetch round trip (the tunnel RTT).

    Every timed call pays this ONCE regardless of iters, so uncorrected
    per-iter figures carry a +RTT/iters error — at iters=3 that was ~9 ms of
    phantom time per stage in earlier stage_ms numbers."""
    global _OVERHEAD_MS
    if _OVERHEAD_MS is None:
        fn = jax.jit(lambda v: (v * 0).astype(jnp.float32))
        x = jnp.float32(1)
        float(fn(x))
        best = float("inf")
        for _ in range(7):
            t0 = time.perf_counter()
            float(fn(x))
            best = min(best, time.perf_counter() - t0)
        _OVERHEAD_MS = best * 1000
        print(f"(per-call dispatch overhead: {_OVERHEAD_MS:.1f} ms — subtracted)")
    return _OVERHEAD_MS


def device_ms(stage_fn, *args, iters: int = 16) -> float:
    def chained(*a):
        def body(c, _):
            out = stage_fn(c, *a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.sum(leaf).astype(jnp.float32) * 1e-12, None

        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return c

    oh = call_overhead_ms()
    fn = jax.jit(chained)
    float(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, (time.perf_counter() - t0) * 1000)
    return max(best - oh, 0.0) / iters


def flops_of(fn, *args) -> float:
    try:
        a = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(a, list):
            a = a[0]
        return float(a.get("flops", 0.0))
    except Exception:
        return 0.0


PEAK = 197e12  # v5e bf16 dense peak
HBM_BW = 819e9  # v5e HBM bandwidth


def report(name, ms, flops=0.0, bytes_moved=0.0):
    tf = flops / (ms / 1e3) / 1e12 if ms else 0.0
    mxu = tf * 1e12 / PEAK
    hbm_ms = bytes_moved / HBM_BW * 1e3
    mxu_ms = flops / PEAK * 1e3
    print(
        f"{name:42s} {ms:8.2f} ms  {tf:7.1f} TF/s  mxu {mxu*100:5.1f}%"
        + (f"  [mxu-bound {mxu_ms:.2f} ms, hbm-bound {hbm_ms:.2f} ms]" if bytes_moved else "")
    )
    return ms


def run_resnet(args, x, dtype):
    from relaxtpu.models.initutil import fast_init
    from relaxtpu.models.resnet import Bottleneck, ResNet50, _STAGES

    rn = ResNet50(dtype=dtype)
    rn_vars = fast_init(rn, jnp.zeros((1, 224, 224, 3)))

    full = lambda c, v, xx: rn.apply(v, xx + c.astype(dtype), reduce="mean")  # noqa: E731
    fl = flops_of(lambda v, xx: rn.apply(v, xx, reduce="mean"), rn_vars, x)
    report("resnet50 full (15 taps + avgpool)", device_ms(full, rn_vars, x), fl)

    # no taps: does emitting 15 channel-means cost anything?
    def no_taps(c, v, xx):
        taps = rn.apply(v, xx + c.astype(dtype), reduce="mean")
        return taps["avgpool"]

    report("resnet50 avgpool-only output", device_ms(no_taps, rn_vars, x), fl)

    class Prefix(nn.Module):
        n_stages: int

        @nn.compact
        def __call__(self, xx):
            y = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                        use_bias=False, dtype=dtype, name="conv1")(xx)
            y = nn.BatchNorm(use_running_average=True, epsilon=1e-5,
                             dtype=dtype, name="bn1")(y)
            y = nn.relu(y)
            y = nn.max_pool(y, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
            for si, (blocks, width, stride) in enumerate(_STAGES[: self.n_stages], start=1):
                for bi in range(blocks):
                    y = Bottleneck(width=width, stride=stride if bi == 0 else 1,
                                   project=(bi == 0), dtype=dtype,
                                   name=f"layer{si}_{bi}")(y)
            return jnp.mean(y.astype(jnp.float32), axis=(1, 2))

    prev_ms = 0.0
    for ns, label in ((0, "stem (conv7x7+bn+pool)"), (1, "+layer1"), (2, "+layer2"),
                      (3, "+layer3"), (4, "+layer4")):
        m = Prefix(n_stages=ns)
        v = fast_init(m, jnp.zeros((1, 224, 224, 3)))
        fl_p = flops_of(lambda vv, xx: m.apply(vv, xx), v, x)
        ms = device_ms(lambda c, vv, xx: m.apply(vv, xx + c.astype(dtype)), v, x)
        print(f"  prefix {label:28s} {ms:8.2f} ms  (delta {ms - prev_ms:6.2f} ms)"
              f"  {fl_p / (ms / 1e3) / 1e12:6.1f} TF/s")
        prev_ms = ms


def s2d_weights(ww):
    """Re-lay a (7,7,3,64) stride-2 stem kernel for a 2x2 space-to-depth
    input: (4,4,12,64), zero taps where 2d+a-1 falls outside [0,7)."""
    w2 = jnp.zeros((4, 4, 12, 64), ww.dtype)
    for dh in range(4):
        for a in range(2):
            u = 2 * dh + a - 1
            if not 0 <= u < 7:
                continue
            for dw in range(4):
                for bb in range(2):
                    vv = 2 * dw + bb - 1
                    if not 0 <= vv < 7:
                        continue
                    c0 = a * 6 + bb * 3
                    w2 = w2.at[dh, dw, c0 : c0 + 3].set(ww[u, vv])
    return w2


def stem_s2d(ww, xx):
    bq, hh, wwd, cc = xx.shape
    z = xx.reshape(bq, hh // 2, 2, wwd // 2, 2, cc)
    z = z.transpose(0, 1, 3, 2, 4, 5).reshape(bq, hh // 2, wwd // 2, 4 * cc)
    return jax.lax.conv_general_dilated(
        z, ww, (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run_stem(args, x, dtype, rng, b):
    w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 64)).astype(np.float32), dtype)

    def stem_conv(c, ww, xx):
        return jax.lax.conv_general_dilated(
            xx + c.astype(dtype), ww, (2, 2), [(3, 3), (3, 3)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    report("stem conv7x7 s2 alone", device_ms(stem_conv, w7, x),
           flops_of(lambda ww, xx: stem_conv(jnp.float32(0), ww, xx), w7, x))

    y112 = jnp.asarray(rng.normal(size=(b, 112, 112, 64)).astype(np.float32), dtype)

    def pool_only(c, yy):
        z = nn.relu(yy + c.astype(dtype))
        return nn.max_pool(z, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])

    report("stem relu+maxpool alone", device_ms(pool_only, y112),
           0.0, bytes_moved=b * 112 * 112 * 64 * 2 * 2)

    w2 = jax.jit(s2d_weights)(w7)
    report("stem conv as space-to-depth 2x2", device_ms(
        lambda c, ww, xx: stem_s2d(ww, xx + c.astype(dtype)), w2, x),
        flops_of(stem_s2d, w2, x))

    ref = jax.jit(lambda ww, xx: stem_conv(jnp.float32(0), ww, xx))(w7, x)
    got = jax.jit(stem_s2d)(w2, x)
    err = float(jnp.max(jnp.abs(ref.astype(jnp.float32) - got.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    print(f"  s2d max abs err vs direct conv: {err:.3e} (max |ref| {scale:.2f})")


def run_vit(args, x, dtype):
    from relaxtpu.models import vit as vitmod
    from relaxtpu.models.initutil import fast_init
    from relaxtpu.models.vit import ViT

    vit = ViT(dtype=dtype)
    vit_vars = fast_init(vit, jnp.zeros((1, 224, 224, 3)), key=jax.random.PRNGKey(1))
    fl_v = flops_of(lambda v, xx: vit.apply(v, xx, reduce="stats"), vit_vars, x)
    report("vit-b/16 full (stats)", device_ms(
        lambda c, v, xx: vit.apply(v, xx + c.astype(dtype), reduce="stats"),
        vit_vars, x), fl_v)

    if args.quick:
        return

    class MlpOnlyBlock(nn.Module):
        dim: int
        num_heads: int
        mlp_ratio: int = 4
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, xx, return_attention=False):
            ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)  # noqa: E731
            h = ln("norm2")(xx)
            h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype, name="mlp_fc1")(h)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(h)
            return xx + h

    class AttnOnlyBlock(nn.Module):
        dim: int
        num_heads: int
        mlp_ratio: int = 4
        dtype: Any = jnp.float32

        @nn.compact
        def __call__(self, xx, return_attention=False):
            ln = lambda name: nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name=name)  # noqa: E731
            y, _ = vitmod.Attention(self.dim, self.num_heads, dtype=self.dtype,
                                    name="attn")(ln("norm1")(xx))
            return xx + y

    orig_block = vitmod.Block
    try:
        for stub, label in ((MlpOnlyBlock, "vit blocks: MLP half only"),
                            (AttnOnlyBlock, "vit blocks: attention half only")):
            vitmod.Block = stub
            m = ViT(dtype=dtype)
            v = fast_init(m, jnp.zeros((1, 224, 224, 3)), key=jax.random.PRNGKey(1))
            flp = flops_of(lambda vv, xx: m.apply(vv, xx, reduce="stats"), v, x)
            report(label, device_ms(
                lambda c, vv, xx: m.apply(vv, xx + c.astype(dtype), reduce="stats"),
                v, x), flp)
    finally:
        vitmod.Block = orig_block


def run_attn(args, x, dtype):
    """Fused (Pallas single-tile) vs einsum attention, full ViT forward.

    The fused kernel (ops/attention.py) keeps each head's (256, 256) score
    tile in VMEM; the einsum path materializes the (B, 12, 197, 197) scores
    in HBM around the softmax.  Parity is asserted on the same weights
    before timing."""
    from relaxtpu.models.initutil import fast_init
    from relaxtpu.models.vit import ViT

    base = ViT(dtype=dtype)
    vit_vars = fast_init(base, jnp.zeros((1, 224, 224, 3)), key=jax.random.PRNGKey(1))
    fused = ViT(dtype=dtype, fused_attention=True)

    ref = jax.jit(lambda v, xx: base.apply(v, xx, reduce="stats"))(vit_vars, x)
    got = jax.jit(lambda v, xx: fused.apply(v, xx, reduce="stats"))(vit_vars, x)
    ref32, got32 = np.asarray(ref, np.float32), np.asarray(got, np.float32)
    cos = float(np.dot(ref32.ravel(), got32.ravel())
                / (np.linalg.norm(ref32) * np.linalg.norm(got32) + 1e-30))
    print(f"  fused-vs-einsum stats: max abs err "
          f"{np.max(np.abs(ref32 - got32)):.3e}, cosine {cos:.6f}")

    for m, label in ((base, "vit full, einsum attention"),
                     (fused, "vit full, fused attention")):
        fl = flops_of(lambda v, xx: m.apply(v, xx, reduce="stats"), vit_vars, x)
        report(label, device_ms(
            lambda c, v, xx: m.apply(v, xx + c.astype(dtype), reduce="stats"),
            vit_vars, x), fl)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--section", default="all",
                    choices=["all", "resnet", "stem", "vit", "attn"])
    args = ap.parse_args()

    from relaxtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    b = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, 224, 224, 3)).astype(np.float32)).astype(dtype)

    print(f"device={jax.devices()[0].device_kind}  batch={b}  dtype={args.dtype}")
    if args.section in ("all", "resnet"):
        run_resnet(args, x, dtype)
    if args.section in ("all", "stem"):
        run_stem(args, x, dtype, rng, b)
    if args.section in ("all", "vit"):
        run_vit(args, x, dtype)
    if args.section == "attn":
        run_attn(args, x, dtype)


if __name__ == "__main__":
    main()
