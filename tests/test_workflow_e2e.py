"""End-to-end user workflow: extract -> train -> predict on a toy dataset.

Drives the CLI entry points in-process (same code path as the console) with
tiny synthetic videos and a reduced protocol.
"""
import json
import os

import numpy as np
import pandas as pd
import pytest

cv2 = pytest.importorskip("cv2")


def _write_video(path, rng, n=30, w=128, h=96, fps=24):
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    base = cv2.GaussianBlur(
        rng.integers(0, 256, (h + 20, w + 20, 3), dtype=np.uint8).astype(np.float32), (0, 0), 2
    )
    for i in range(n):
        ox, oy = int(8 + 6 * np.sin(i / 5)), int(8 + 5 * np.cos(i / 7))
        frame = np.clip(base[oy : oy + h, ox : ox + w] + rng.normal(0, 5, (h, w, 3)), 0, 255)
        vw.write(frame.astype(np.uint8))
    vw.release()


@pytest.mark.slow
def test_extract_train_predict_workflow(tmp_path, rng, capsys):
    from relaxtpu.cli.__main__ import main

    # --- toy dataset: 4 videos + metadata
    vids = []
    data_root = tmp_path / "konvid"
    (data_root / "KoNViD_1k_videos").mkdir(parents=True)
    for i in range(4):
        vid = f"100{i}"
        _write_video(str(data_root / "KoNViD_1k_videos" / f"{vid}.mp4"), rng)
        vids.append(vid)
    meta = pd.DataFrame(
        {"vid": vids, "mos": [2.1, 3.3, 4.0, 2.8], "framerate": 24.0,
         "width": 128, "height": 96, "pixfmt": "yuv420p"}
    )
    meta_csv = str(tmp_path / "meta.csv")
    meta.to_csv(meta_csv, index=False)

    # --- extract
    # ingest pinned to bgr so the CLI decodes with the SAME cv2 path as the
    # direct video_feature comparison below: the default (auto -> native
    # decoder + device I420->BGR) differs from cv2's swscale rounding by
    # +-1 LSB, which flips near-tie top-k patches — ingest equivalence is
    # covered separately (test_extract_yuv_ingest_consistent, cosine-level);
    # THIS test guards aggregation-path equality and must be like-for-like.
    # --f32 for the same reason: on a TPU-attached host the CLI defaults to
    # bf16 backbones (production), while the direct comparison below builds
    # an f32 extractor — precision equivalence is covered separately by
    # parity --check production.
    out_dir = str(tmp_path / "features")
    main([
        "extract", "--dataset", "konvid_1k", "--root", str(data_root),
        "--metadata-csv", meta_csv, "--output", out_dir, "--ingest", "bgr",
        "--f32",
    ])
    feats = np.load(f"{out_dir}/konvid_1k_features.npy")
    assert feats.shape == (4, 35203)
    assert np.isfinite(feats).all()

    # CLI extract must equal FeatureExtractor.video_feature for the same
    # video: full-frame segments meaned over n_frames, fragment segments over
    # n_pairs (ref demo_test.py:171-175) — NOT a shared truncated count.
    import jax
    import jax.numpy as jnp

    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.io.video import decode_video_inputs
    from relaxtpu.models import ResNet50, ViT
    from relaxtpu.models.initutil import fast_init

    rn_vars = fast_init(ResNet50(), jnp.zeros((1, 224, 224, 3)))
    vit_vars = fast_init(ViT(), jnp.zeros((1, 224, 224, 3)), key=jax.random.PRNGKey(1))
    fx = FeatureExtractor(rn_vars, vit_vars)
    frames, prev, nxt = decode_video_inputs(
        str(data_root / "KoNViD_1k_videos" / "1000.mp4"), 24.0, 128, 96
    )
    direct = fx.video_feature(frames, prev, nxt)
    # the CLI's fused whole-video program and the two-program path reduce in
    # different orders (XLA fusion), so allow small f32 drift; the aggregation
    # bug this guards against (shared truncated frame/pair count) is O(1) off
    np.testing.assert_allclose(feats[0], direct, rtol=2e-2, atol=1e-3)

    # --- train (tiny protocol) with the reference-style run artifacts
    model_path = str(tmp_path / "mlp.npz")
    art_dir = str(tmp_path / "artifacts")
    main([
        "train", "--metadata-csv", meta_csv, "--features", f"{out_dir}/konvid_1k_features.npy",
        "--output", model_path, "--n-repeats", "2", "--n-splits", "2",
        "--epochs", "2", "--batch-size", "4", "--artifacts-dir", art_dir,
    ])
    assert os.path.exists(model_path)
    run_log = open(os.path.join(art_dir, "train.log")).read()
    assert "config:" in run_log and "repeat 2/2" in run_log
    assert os.path.exists(os.path.join(art_dir, "losses_repeat_01.png"))
    assert os.path.exists(os.path.join(art_dir, "median_scatter.png"))

    # --- predict on one of the videos
    import joblib
    from sklearn.impute import SimpleImputer
    from sklearn.preprocessing import MinMaxScaler

    imp = SimpleImputer(strategy="mean").fit(feats)
    sc = MinMaxScaler().fit(feats)
    joblib.dump(imp, str(tmp_path / "imp.pkl"))
    joblib.dump(sc, str(tmp_path / "sc.pkl"))
    main([
        "predict", "--video", str(data_root / "KoNViD_1k_videos" / "1000.mp4"),
        "--video-type", "konvid_1k", "--model", model_path,
        "--imputer", str(tmp_path / "imp.pkl"), "--scaler", str(tmp_path / "sc.pkl"),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    pred = json.loads(out[-1])
    assert "predicted_mos" in pred and np.isfinite(pred["predicted_mos"])


@pytest.mark.slow
def test_extract_yuv_ingest_consistent(tmp_path, rng, capsys):
    """extract --ingest yuv ~= --ingest bgr (frames differ only by the sws
    vs closed-form colorspace rounding, <=3 LSB)."""
    from relaxtpu.cli.__main__ import main
    from relaxtpu.io import native

    if not native.available():
        pytest.skip("native decoder not built")

    data_root = tmp_path / "konvid"
    (data_root / "KoNViD_1k_videos").mkdir(parents=True)
    _write_video(str(data_root / "KoNViD_1k_videos" / "1000.mp4"), rng)
    meta = pd.DataFrame(
        {"vid": ["1000"], "mos": [3.0], "framerate": 24.0,
         "width": 128, "height": 96, "pixfmt": "yuv420p"}
    )
    meta_csv = str(tmp_path / "meta.csv")
    meta.to_csv(meta_csv, index=False)

    feats = {}
    for ingest in ("bgr", "yuv"):
        out = str(tmp_path / f"f_{ingest}")
        main([
            "extract", "--dataset", "konvid_1k", "--root", str(data_root),
            "--metadata-csv", meta_csv, "--output", out, "--ingest", ingest,
        ])
        capsys.readouterr()
        feats[ingest] = np.load(os.path.join(out, "konvid_1k_features.npy"))
    a, b = feats["bgr"][0], feats["yuv"][0]
    assert a.shape == b.shape == (35203,)
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))
    assert cos > 0.995, cos


@pytest.mark.slow
def test_extract_mesh_cli(tmp_path, rng, capsys):
    """extract --n-data 2 routes through the mesh-sharded evaluator and
    produces the same features as the single-device path."""
    from relaxtpu.cli.__main__ import main

    data_root = tmp_path / "konvid"
    (data_root / "KoNViD_1k_videos").mkdir(parents=True)
    vids = []
    for i in range(3):
        vid = f"200{i}"
        _write_video(str(data_root / "KoNViD_1k_videos" / f"{vid}.mp4"), rng, n=24)
        vids.append(vid)
    meta = pd.DataFrame(
        {"vid": vids, "mos": [2.0, 3.0, 4.0], "framerate": 24.0,
         "width": 128, "height": 96, "pixfmt": "yuv420p"}
    )
    meta_csv = str(tmp_path / "meta.csv")
    meta.to_csv(meta_csv, index=False)

    feats = {}
    # --f32 on both: on a single-TPU host the mesh path falls back to the
    # virtual CPU devices while the single path stays on the TPU (bf16
    # production default) — the comparison must be same-precision.
    for tag, extra in (("mesh", ["--n-data", "2"]), ("single", [])):
        out = str(tmp_path / f"f_{tag}")
        main([
            "extract", "--dataset", "konvid_1k", "--root", str(data_root),
            "--metadata-csv", meta_csv, "--output", out, "--f32", *extra,
        ])
        capsys.readouterr()
        feats[tag] = np.load(os.path.join(out, "konvid_1k_features.npy"))
    assert feats["mesh"].shape == (3, 35203)
    np.testing.assert_allclose(feats["mesh"], feats["single"], rtol=2e-2, atol=1e-3)


@pytest.mark.slow
def test_predict_batch_cli(tmp_path, rng, capsys):
    """predict-batch: many videos -> per-video MOS lines + CSV, batched
    grouping by resolution; values match single-video predict."""
    import jax
    import jax.numpy as jnp

    from relaxtpu.cli.__main__ import main
    from relaxtpu.model.mlp import Mlp
    from relaxtpu.model.train import ModelSnapshot
    from relaxtpu.utils.checkpoint import save_snapshot

    vdir = tmp_path / "vids"
    vdir.mkdir()
    for i in range(3):
        _write_video(str(vdir / f"v{i}.mp4"), rng, n=24)

    v = Mlp().init(jax.random.PRNGKey(0), jnp.zeros((2, 35203)), train=False)
    model = str(tmp_path / "mlp.npz")
    save_snapshot(model, ModelSnapshot(v["params"], v.get("batch_stats", {})))

    ref_scaler = "/root/reference/model/scaler"
    if not os.path.exists(f"{ref_scaler}/konvid_1k_imputer.pkl"):
        pytest.skip("reference scaler pkls not mounted")
    csv_out = str(tmp_path / "scores.csv")
    main([
        "predict-batch", "--videos", str(vdir), "--model", model,
        "--imputer", f"{ref_scaler}/konvid_1k_imputer.pkl",
        "--scaler", f"{ref_scaler}/konvid_1k_scaler.pkl",
        "--output-csv", csv_out, "--batch", "2",
    ])
    lines = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3 and all(np.isfinite(r["predicted_mos"]) for r in lines)
    df = pd.read_csv(csv_out)
    assert list(df.columns) == ["video", "predicted_mos"] and len(df) == 3

    # single-video predict agrees with the batched value
    main([
        "predict", "--video", str(vdir / "v0.mp4"), "--model", model,
        "--imputer", f"{ref_scaler}/konvid_1k_imputer.pkl",
        "--scaler", f"{ref_scaler}/konvid_1k_scaler.pkl", "--ingest", "yuv",
    ])
    single = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    batched = next(r for r in lines if r["video"].endswith("v0.mp4"))
    assert abs(single["predicted_mos"] - batched["predicted_mos"]) < 1e-3


@pytest.mark.slow
def test_serve_cli(tmp_path, rng, capsys, monkeypatch):
    """serve: JSON-lines requests on stdin -> ordered JSON-lines responses,
    with per-request error isolation (a bad path or malformed request gets
    an error line; the server keeps scoring subsequent requests) and values
    matching single-video predict."""
    import io
    import sys

    import jax
    import jax.numpy as jnp

    from relaxtpu.cli.__main__ import main
    from relaxtpu.model.mlp import Mlp
    from relaxtpu.model.train import ModelSnapshot
    from relaxtpu.utils.checkpoint import save_snapshot

    vdir = tmp_path / "vids"
    vdir.mkdir()
    for i in range(2):
        _write_video(str(vdir / f"v{i}.mp4"), rng, n=24)

    v = Mlp().init(jax.random.PRNGKey(0), jnp.zeros((2, 35203)), train=False)
    model = str(tmp_path / "mlp.npz")
    save_snapshot(model, ModelSnapshot(v["params"], v.get("batch_stats", {})))

    ref_scaler = "/root/reference/model/scaler"
    if not os.path.exists(f"{ref_scaler}/konvid_1k_imputer.pkl"):
        pytest.skip("reference scaler pkls not mounted")

    requests = "\n".join([
        json.dumps({"video": str(vdir / "v0.mp4")}),
        str(vdir / "v1.mp4"),  # bare-path request form
        json.dumps({"video": str(vdir / "missing.mp4")}),  # decode error
        json.dumps({"wrong_key": 1}),  # malformed request
    ])
    monkeypatch.setattr(sys, "stdin", io.StringIO(requests + "\n"))
    main([
        "serve", "--model", model,
        "--imputer", f"{ref_scaler}/konvid_1k_imputer.pkl",
        "--scaler", f"{ref_scaler}/konvid_1k_scaler.pkl",
        "--in-flight", "1",
    ])
    lines = [json.loads(line) for line in capsys.readouterr().out.strip().splitlines()]
    assert lines[0] == {"status": "ready"}
    resp = lines[1:]
    assert len(resp) == 4
    assert resp[0]["video"].endswith("v0.mp4") and np.isfinite(resp[0]["predicted_mos"])
    assert resp[1]["video"].endswith("v1.mp4") and np.isfinite(resp[1]["predicted_mos"])
    assert resp[2]["video"].endswith("missing.mp4") and "error" in resp[2]
    assert "error" in resp[3]

    # the warm serving path scores exactly like one-shot predict
    main([
        "predict", "--video", str(vdir / "v0.mp4"), "--model", model,
        "--imputer", f"{ref_scaler}/konvid_1k_imputer.pkl",
        "--scaler", f"{ref_scaler}/konvid_1k_scaler.pkl",
    ])
    single = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert abs(single["predicted_mos"] - resp[0]["predicted_mos"]) < 1e-3
