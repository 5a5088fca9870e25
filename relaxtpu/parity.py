"""Strict-parity readiness: one command that diffs this framework against the
reference's shipped artifacts the moment the blobs are available.

Two independent checks (this environment carries neither datasets nor
weights, so both are gated on the artifact files existing):

- ``head_parity``: given the reference's per-dataset features ``.mat``,
  metadata csv, results ``.mat`` (median split), median-model ``.pth`` and
  fitted imputer/scaler ``.pkl``s, recompute the median model's test-set
  predictions with the ported MLP and diff them against the shipped
  ``log/predict_score/{dataset}_relaxvqa_byrmse.csv`` (columns
  MOS, y_test_pred, y_test_pred_logistic).  Exercises L4->L6 exactly.

- ``demo_parity``: given a video + ``.pth`` + ``.pkl``s (+ torchvision
  ResNet-50 / DINO ViT-B weights), run the FULL f32 pipeline end-to-end and
  report the predicted MOS (optionally diffed against an expected value) —
  exercises L0->L6.

Documented tolerance: |Δ y_test_pred| <= 0.05 on the 0-100 scale for the
head path (f32 MXU matmul vs torch CPU/GPU; the MLP is 3 layers).  The
end-to-end demo tolerance is 0.1 MOS (decode + resize + flow accumulation
differences; see docs/PARITY.md for the per-op accepted divergences).
"""

from __future__ import annotations

import dataclasses
import json
import logging

import numpy as np

log = logging.getLogger("relaxtpu.parity")

HEAD_TOL = 0.05   # |Δ prediction| on the reference's own test split
DEMO_TOL = 0.1    # |Δ MOS| end-to-end


@dataclasses.dataclass
class ParityReport:
    n: int
    max_abs_diff: float
    mean_abs_diff: float
    tolerance: float

    @property
    def ok(self) -> bool:
        return self.max_abs_diff <= self.tolerance

    def to_json(self) -> str:
        return json.dumps(
            {
                "n": self.n,
                "max_abs_diff": self.max_abs_diff,
                "mean_abs_diff": self.mean_abs_diff,
                "tolerance": self.tolerance,
                "ok": self.ok,
            }
        )


def _median_test_vids(result_mat: str) -> list[str]:
    """Test-vid list of the median model from a results .mat
    (ref ``recover_median_train_test.py:5-22``)."""
    import scipy.io

    data = scipy.io.loadmat(result_mat, squeeze_me=True)
    raw = data["Test_videos_Median_model"]

    def flat(v):
        """Recursively flatten MATLAB cell nesting (object arrays of arrays of
        strings); normalize integral floats so '3000.0' matches '3000'."""
        if isinstance(v, bytes):
            yield v.decode().strip()
        elif isinstance(v, str):
            yield v.strip()
        elif isinstance(v, (int, np.integer)):
            yield str(int(v))
        elif isinstance(v, (float, np.floating)):
            yield str(int(v)) if float(v).is_integer() else str(v)
        else:
            for x in np.asarray(v).ravel():
                yield from flat(x)

    return list(flat(raw))


def head_parity(
    dataset: str,
    features_mat: str,
    metadata_csv: str,
    result_mat: str,
    model_pth: str,
    imputer_pkl: str,
    scaler_pkl: str,
    expected_csv: str,
    greyscale_report: str | None = None,
    use_bn: bool = True,
) -> ParityReport:
    """Recompute the median model's test predictions; diff vs the shipped CSV."""
    import pandas as pd

    from relaxtpu.data.greyscale import load_grey_indices
    from relaxtpu.data.recover import recover_median_split
    from relaxtpu.data.store import load_mat_features
    from relaxtpu.model.mlp import Mlp, port_torch_mlp
    from relaxtpu.model.scalers import FeatureScaler
    from relaxtpu.models.porters import load_torch_checkpoint

    df = pd.read_csv(metadata_csv)
    features = load_mat_features(features_mat, dataset)
    if greyscale_report:
        grey = load_grey_indices(greyscale_report)
        if grey:
            df = df.drop(index=grey).reset_index(drop=True)
            features = np.delete(features, grey, axis=0)
    test_vids = _median_test_vids(result_mat)
    _, _, x_test, _ = recover_median_split(df, features, test_vids)

    scaler = FeatureScaler.load_reference_pkls(imputer_pkl, scaler_pkl)
    x = scaler.transform(x_test).astype(np.float32)

    import jax
    import jax.numpy as jnp

    variables = port_torch_mlp(load_torch_checkpoint(model_pth))
    mlp = Mlp(use_bn=use_bn)
    with jax.default_matmul_precision("highest"):
        y_pred = np.asarray(
            mlp.apply(variables, jnp.asarray(x), train=False)
        ).reshape(-1)

    expected = pd.read_csv(expected_csv)["y_test_pred"].to_numpy(float)
    if len(expected) != len(y_pred):
        raise ValueError(
            f"row-count mismatch: recovered split has {len(y_pred)} test videos, "
            f"expected csv has {len(expected)} — check metadata/greyscale inputs"
        )
    diff = np.abs(y_pred - expected)
    return ParityReport(len(diff), float(diff.max()), float(diff.mean()), HEAD_TOL)


def synthetic_correlated_video(rng, n_frames: int, h: int, w: int):
    """Temporally-correlated (frames, next) so flow/fragments do real work.

    The ONE generator behind both ``feature_parity`` and
    tests/test_e2e_parity.py — docs/PARITY.md's accepted tolerances were
    measured on exactly this content, so the CLI check and the test must
    not drift apart.
    """
    import cv2

    base = cv2.GaussianBlur(
        rng.integers(0, 256, (h + 24, w + 24, 3), dtype=np.uint8).astype(np.float32),
        (0, 0), 2,
    )
    chain = []
    for i in range(2 * n_frames):
        ox, oy = int(8 + 6 * np.sin(i / 3)), int(8 + 5 * np.cos(i / 4))
        chain.append(np.clip(
            base[oy : oy + h, ox : ox + w] + rng.normal(0, 6, (h, w, 3)), 0, 255
        ).astype(np.uint8))
    chain = np.stack(chain)
    return np.ascontiguousarray(chain[0::2]), np.ascontiguousarray(chain[1::2])


def feature_parity(
    video: str | None,
    resnet_weights: str | None = None,
    vit_weights: str | None = None,
    n_frames: int = 3,
) -> dict:
    """Full 35,203-dim vector vs the independent torch+cv2 oracle.

    Runs the f32 pipeline AND the reference-stack oracle
    (``relaxtpu.oracle``) on the same frames — a real video when ``video``
    is given, synthetic frames otherwise — with the SAME weights (pretrained
    .pths when provided, seeded random otherwise), and reports per-segment
    cosine / relative-error against the accepted tolerances of
    docs/PARITY.md.  Needs no reference blobs: this is the strongest
    correctness check available before the pretrained weights land.
    """
    import jax
    import jax.numpy as jnp

    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.models.porters import (
        load_torch_checkpoint,
        port_torch_resnet50,
        port_torch_vit,
    )
    from relaxtpu.oracle import (
        build_torch_resnet50,
        build_torch_vit,
        compare_segments,
        reference_video_feature,
    )

    rn_sd = load_torch_checkpoint(resnet_weights) if resnet_weights else None
    vit_sd = load_torch_checkpoint(vit_weights) if vit_weights else None
    rn_oracle = build_torch_resnet50(rn_sd, seed=0)
    vit_oracle = build_torch_vit(vit_sd, seed=1)
    fx = FeatureExtractor(
        port_torch_resnet50(rn_oracle.state_dict()),
        port_torch_vit(vit_oracle.state_dict()),
        dtype=jnp.float32,
    )

    if video:
        from relaxtpu.io.video import decode_video_inputs

        frames, prev, nxt = decode_video_inputs(video)
        frames, nxt = frames[:n_frames], nxt[:n_frames]
        prev = frames[: len(nxt)]
    else:
        frames, nxt = synthetic_correlated_video(
            np.random.default_rng(0), n_frames, 120, 160
        )
        prev = frames[: len(nxt)]

    # STRICT-parity mode: the oracle side is exact-f32 torch+cv2 on CPU, so
    # our side must not let the MXU run f32 matmuls at its default
    # (bf16-pass) precision — on a TPU host that alone is a ~5e-3 relative
    # error on the ViT segments, an order above the accepted f32 tolerances.
    # head_parity (:128) already pins this; the production-precision story
    # lives in production_numerics, not here.
    with jax.default_matmul_precision("highest"):
        ours = fx.video_feature(frames, prev, nxt)
    theirs = reference_video_feature(frames, nxt, rn_oracle, vit_oracle)
    report = compare_segments(ours, theirs)
    # docs/PARITY.md accepted tolerances (measured deltas ~7.6e-5 .. 4e-4)
    tol = {
        "resnet_stack": (0.9999, 5e-3), "vit_pool": (0.9999, 5e-3),
        "frag_resnet": (0.9999, 5e-3), "frag_vit": (0.9999, 5e-3),
    }
    ok = all(
        report[s]["cosine"] >= c and report[s]["mean_abs_err_over_mean_abs"] <= m
        for s, (c, m) in tol.items()
    )
    return {
        "video": video or "<synthetic>",
        "n_frames": int(len(frames)),
        "weights": "pretrained" if resnet_weights else "seeded-random",
        "segments": report,
        "ok": ok,
    }


def demo_parity(
    video: str,
    video_type: str,
    model_pth: str,
    imputer_pkl: str,
    scaler_pkl: str,
    resnet_weights: str,
    vit_weights: str,
    expected_mos: float | None = None,
) -> dict:
    """Full f32 end-to-end prediction (ref demo_test.py); optional MOS diff."""
    import jax.numpy as jnp

    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.model.mlp import port_torch_mlp
    from relaxtpu.model.scalers import FeatureScaler
    from relaxtpu.models.porters import (
        load_torch_checkpoint,
        port_torch_resnet50,
        port_torch_vit,
    )
    from relaxtpu.predict import VideoQualityPredictor

    fx = FeatureExtractor(
        port_torch_resnet50(load_torch_checkpoint(resnet_weights)),
        port_torch_vit(load_torch_checkpoint(vit_weights)),
        dtype=jnp.float32,
    )
    predictor = VideoQualityPredictor(
        fx,
        port_torch_mlp(load_torch_checkpoint(model_pth)),
        FeatureScaler.load_reference_pkls(imputer_pkl, scaler_pkl),
        video_type=video_type,
    )
    mos = predictor.predict_file(video)
    out = {"video": video, "predicted_mos": mos, "tolerance": DEMO_TOL}
    if expected_mos is not None:
        out["expected_mos"] = expected_mos
        out["abs_diff"] = abs(mos - expected_mos)
        out["ok"] = out["abs_diff"] <= DEMO_TOL
    return out


def production_numerics(seed: int = 0) -> dict:
    """Measure the SHIPPED TPU configuration's numerics on-chip.

    Two figures, both at DEFAULT matmul precision (the production setting;
    every parity test elsewhere pins "highest"):

    - Farneback flow vs cv2 (mean + p99 interior error, px) — the bf16
      Toeplitz box-blur and warp matmuls inside the flow are the precision-
      sensitive ops (ref cv2 call:
      /root/reference/src/main_fragment_layerstack.py:313-315);
    - bf16 vs f32 backbones over the full 35,203-dim feature vector
      (cosine + median relative error).

    Bounds mirror docs/MIGRATION.md's measured figures with margin (flow
    mean <= 5e-3 px measured ~9.5e-4; cosine >= 0.9999 measured 0.99998).
    ``tests/test_production_numerics.py`` asserts through THIS function, and
    bench.py records its output per round, so the per-round artifact carries
    the production-numerics state (VERDICT r4 item 6).
    """
    import jax
    import jax.numpy as jnp

    try:
        jax.devices("tpu")
    except RuntimeError:
        return {"skipped": "no TPU attached (production precision is TPU-only)"}

    out: dict = {}
    rng = np.random.default_rng(seed)

    try:
        import cv2
        from scipy.ndimage import gaussian_filter

        from relaxtpu.ops.flow import farneback_flow

        big = gaussian_filter(rng.normal(0, 60, (140, 180)).astype(np.float32), 1.5) + 128
        prev = np.clip(big[8:-12, 8:-12], 0, 255).astype(np.uint8)
        nxt = np.clip(big[7:-13, 6:-14], 0, 255).astype(np.uint8)
        want = cv2.calcOpticalFlowFarneback(prev, nxt, None, 0.5, 3, 15, 3, 5, 1.2, 0)
        with jax.default_matmul_precision("default"):
            got = np.asarray(
                farneback_flow(
                    jnp.asarray(prev), jnp.asarray(nxt),
                    pyr_scale=0.5, levels=3, winsize=15, iterations=3,
                    poly_n=5, poly_sigma=1.2,
                )
            )
        s = 24  # interior: cv2's own border handling differs at the edge
        err = np.abs(got[s:-s, s:-s] - want[s:-s, s:-s])
        out["flow_mean_err_px"] = float(err.mean())
        out["flow_p99_err_px"] = float(np.percentile(err, 99))
        out["flow_ok"] = (
            out["flow_mean_err_px"] <= 5e-3 and out["flow_p99_err_px"] <= 5e-2
        )
    except ImportError as e:
        out["flow_skipped"] = f"cv2 unavailable: {e}"

    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.models import ResNet50, ViT
    from relaxtpu.models.initutil import fast_init

    rn_vars = fast_init(ResNet50(), jnp.zeros((1, 224, 224, 3)))
    vit_vars = fast_init(ViT(), jnp.zeros((1, 224, 224, 3)))
    h, w, n = 120, 160, 5
    frames = rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)
    nxt_f = np.roll(frames[: n - 1], (2, -3), axis=(1, 2))
    prev_f = frames[: n - 1]
    vecs = {}
    with jax.default_matmul_precision("default"):
        for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
            fx = FeatureExtractor(rn_vars, vit_vars, dtype=dtype)
            vecs[name] = np.asarray(
                fx.video_feature_async(frames, prev_f, nxt_f)
            ).astype(np.float64)
    a, b = vecs["f32"], vecs["bf16"]
    out["bf16_cosine"] = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    denom = np.maximum(np.abs(a), 1e-3)
    out["bf16_median_rel"] = float(np.median(np.abs(a - b) / denom))
    out["bf16_ok"] = out["bf16_cosine"] >= 0.9999 and out["bf16_median_rel"] <= 5e-2
    out["ok"] = out.get("flow_ok", True) and out["bf16_ok"]
    return out


def all_parity(args) -> dict:
    """One-command readiness surface: run EVERY parity check whose inputs are
    present and emit a single JSON verdict (VERDICT r3 item 9).

    - ``features`` always runs (needs no reference blobs; synthetic frames
      and seeded weights stand in when --video / --*-weights are absent).
    - ``head`` runs when the artifact sextet is present (--features-mat,
      --metadata-csv, --result-mat, --model, --imputer, --scaler,
      --expected-csv); skipped otherwise with the missing flags named.
    - ``demo`` runs when --video, --model, --imputer, --scaler and both
      backbone weights are present.

    The day the reference's datasets/weights land, one invocation produces
    every BASELINE.md comparison input; ``ok`` aggregates over the checks
    that ran.
    """
    out: dict = {"checks": {}}

    feats = feature_parity(args.video, args.resnet_weights, args.vit_weights)
    out["checks"]["features"] = feats

    head_flags = {
        "--features-mat": args.features_mat,
        "--metadata-csv": args.metadata_csv,
        "--result-mat": args.result_mat,
        "--model": args.model,
        "--imputer": args.imputer,
        "--scaler": args.scaler,
        "--expected-csv": args.expected_csv,
    }
    missing = sorted(k for k, v in head_flags.items() if not v)
    if missing:
        out["checks"]["head"] = {"skipped": f"missing {' '.join(missing)}"}
    else:
        report = head_parity(
            args.dataset, args.features_mat, args.metadata_csv,
            args.result_mat, args.model, args.imputer, args.scaler,
            args.expected_csv, greyscale_report=args.greyscale_report,
            use_bn=not args.no_bn,
        )
        out["checks"]["head"] = json.loads(report.to_json())

    demo_flags = {
        "--video": args.video,
        "--model": args.model,
        "--imputer": args.imputer,
        "--scaler": args.scaler,
        "--resnet-weights": args.resnet_weights,
        "--vit-weights": args.vit_weights,
    }
    missing = sorted(k for k, v in demo_flags.items() if not v)
    if missing:
        out["checks"]["demo"] = {"skipped": f"missing {' '.join(missing)}"}
    else:
        out["checks"]["demo"] = demo_parity(
            args.video, args.video_type, args.model, args.imputer,
            args.scaler, args.resnet_weights, args.vit_weights,
            expected_mos=args.expected_mos,
        )

    out["checks"]["production"] = production_numerics()

    ran = [c for c in out["checks"].values() if "skipped" not in c]
    out["ran"] = len(ran)
    out["ok"] = all(c.get("ok", True) for c in ran)
    return out
