"""Virtual-mesh scaling curve for sharded dataset extraction.

Runs the video-axis-sharded batched feature program
(``ShardedVideoEvaluator.videos_batch_feature_i420``) at data-axis sizes
1/2/4/8 on the 8-virtual-device CPU mesh and records, per size:

- per-device FLOPs from XLA's compiled cost analysis — the partitioning
  evidence (FLOPs/device must halve as the axis doubles; this is what a real
  multi-chip TPU slice would execute per chip), and
- wall-clock videos/sec — for honesty only: this host has ONE physical CPU
  core, so all virtual devices serialize onto it and wall-clock cannot show
  the speedup (it shows partitioning overhead stays small instead).

Usage::

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_curve.py [out.json]

Writes the table as one JSON object (stdout + optional file).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


def main(out_path: str | None = None) -> dict:
    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.models import ResNet50, ViT
    from relaxtpu.models.initutil import fast_init
    from relaxtpu.ops.colorspace import bgr_to_yuv420, pack_i420
    from relaxtpu.parallel.eval import ShardedVideoEvaluator
    from relaxtpu.parallel.mesh import make_mesh

    cpus = jax.devices("cpu")
    assert len(cpus) >= 8, (
        "need XLA_FLAGS=--xla_force_host_platform_device_count=8"
    )

    rng = np.random.default_rng(0)
    h, w, n_frames = 64, 96, 2
    n_videos = 8  # one full batch at every mesh size

    rn = fast_init(ResNet50(), jnp.zeros((1, 224, 224, 3)))
    vit = fast_init(ViT(), jnp.zeros((1, 224, 224, 3)), key=jax.random.PRNGKey(1))

    videos = []
    for _ in range(n_videos):
        frames = rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8)
        nxt = rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8)
        videos.append((pack_i420(*bgr_to_yuv420(frames)), pack_i420(*bgr_to_yuv420(nxt))))
    fbufs = [v[0] for v in videos]
    nbufs = [v[1] for v in videos]

    table = []
    ref_vec = None
    for n_data in (1, 2, 4, 8):
        # fresh extractor per size: its jit cache must not alias shardings
        fx = FeatureExtractor(rn, vit)
        mesh = make_mesh(n_data=n_data, n_model=1, devices=cpus[:n_data])
        ev = ShardedVideoEvaluator(fx, mesh)

        # per-device FLOPs of the compiled partitioned program (compile only
        # — the 1-core host pays ~150 s per actual execution)
        fstack, nstack, nf, npair = fx.stack_videos_i420(fbufs, nbufs)
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        lowered = fx.videos_fn().lower(
            jax.device_put(fx.resnet_vars, rep),
            jax.device_put(fx.vit_vars, rep),
            jax.device_put(fstack, sh),
            jax.device_put(nstack, sh),
            jax.device_put(nf, sh),
            jax.device_put(npair, sh),
            h,
            w,
        )
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns one dict per device
            cost = cost[0]
        row = {
            "n_devices": n_data,
            "videos_per_batch": n_videos,
            "flops_per_device": float(cost.get("flops", float("nan"))),
        }
        if n_data in (1, 8):  # execute + numeric cross-check at the endpoints
            out = np.asarray(ev.videos_batch_feature_i420(fbufs, nbufs, h, w))
            assert out.shape == (n_videos, 35203) and np.isfinite(out).all()
            if ref_vec is None:
                ref_vec = out
            else:
                np.testing.assert_allclose(out, ref_vec, rtol=2e-2, atol=1e-3)
            t0 = time.perf_counter()
            np.asarray(ev.videos_batch_feature_i420(fbufs, nbufs, h, w))
            dt = time.perf_counter() - t0
            row["wallclock_vps_1core_host"] = round(n_videos / dt, 3)
        table.append(row)
        print(json.dumps(table[-1]), flush=True)

    base = table[0]["flops_per_device"]
    for row in table:
        row["flops_fraction_of_1dev"] = round(row["flops_per_device"] / base, 4)
    result = {
        "program": "videos_batch_feature_i420 (video axis sharded over 'data')",
        "shape": {"h": h, "w": w, "frames": n_frames, "videos": n_videos},
        "note": (
            "flops_per_device is XLA compiled cost per partition (what each "
            "chip of a real slice executes); wall-clock is bounded by this "
            "host's single physical core and shows overhead, not speedup"
        ),
        "curve": table,
    }
    text = json.dumps(result, indent=2)
    print(text)
    if out_path:
        with open(out_path, "w") as f:
            f.write(text + "\n")
    return result


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
