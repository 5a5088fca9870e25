"""CLI protocol wiring: --config consumption, greyscale report + drop,
LSVQ fixed-split command, metadata command (ref split_train_test.py,
check_greyscale.py, extract_metadata_NR.py, model_regression_simple.py)."""
import json
import os

import numpy as np
import pandas as pd
import pytest


def _toy_features(rng, n, d=64, w=None):
    """Linear-in-y toy features.  Pass the SAME ``w`` for train and test:
    with independent projections the learned direction's alignment with the
    test projection has arbitrary sign (test SRCC can be -0.97 while train
    SRCC is +0.999)."""
    y = rng.uniform(1, 5, n)
    if w is None:
        w = rng.normal(size=d)
    x = np.outer(y, w) + rng.normal(0, 0.1, (n, d))
    return x.astype(np.float32), y, w


def test_train_lsvq_command(tmp_path, capsys):
    from relaxtpu.cli.__main__ import main

    # Local rng: the session-scoped fixture's state depends on test order, and
    # with near-rank-1 toy features an undertrained head can predict an
    # order-dependent *inverted* monotone function of y (SRCC ~ -0.9).
    rng = np.random.default_rng(7)
    x_tr, y_tr, w = _toy_features(rng, 48)
    x_te, y_te, _ = _toy_features(rng, 16, w=w)
    tr_csv, te_csv = str(tmp_path / "tr.csv"), str(tmp_path / "te.csv")
    pd.DataFrame({"vid": [f"v{i}" for i in range(48)], "mos": y_tr}).to_csv(tr_csv, index=False)
    pd.DataFrame({"vid": [f"t{i}" for i in range(16)], "mos": y_te}).to_csv(te_csv, index=False)
    # chunked .mat train features (the reference ships LSVQ-train in 3 chunks)
    import scipy.io

    chunks = []
    for k, sl in enumerate((slice(0, 20), slice(20, 40), slice(40, 48))):
        p = str(tmp_path / f"chunk{k}.mat")
        scipy.io.savemat(p, {"lsvq_train": x_tr[sl]})
        chunks.append(p)
    te_npy = str(tmp_path / "te.npy")
    np.save(te_npy, x_te)

    out = str(tmp_path / "lsvq.npz")
    main([
        "train-lsvq", "--train-metadata", tr_csv, "--test-metadata", te_csv,
        "--train-features", *chunks, "--test-features", te_npy,
        "--output", out, "--epochs", "30", "--batch-size", "16",
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert os.path.exists(out)
    assert np.isfinite(res["srcc"]) and res["srcc"] > 0  # learnable toy data


def test_greyscale_report_and_train_drop(tmp_path, capsys):
    cv2 = pytest.importorskip("cv2")
    from relaxtpu.cli.__main__ import main

    # toy youtube_ugc layout: one greyscale video among three
    root = tmp_path / "ugc"
    vdir = root / "youtube_ugc"  # must match DatasetSpec.video_dir
    vdir.mkdir(parents=True)
    # SMOOTH frames: mp4v is lossy 4:2:0 — random noise always picks up
    # inter-channel compression artifacts > the detector's <=3 tolerance,
    # but smooth gradients keep chroma error ~0 for grey content while the
    # color videos' channel split stays >> 3.
    ygrad = np.linspace(64, 192, 48, dtype=np.uint8)[:, None]
    xgrad = np.linspace(0, 96, 64, dtype=np.uint8)[None, :]
    vids = []
    for i, grey in enumerate([False, True, False]):
        vid = f"ugc{i}"
        path = str(vdir / f"{vid}.mkv")
        vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 48))
        for t in range(8):
            base = np.broadcast_to(ygrad + t, (48, 64)).astype(np.uint8)
            if grey:
                f = np.repeat(base[:, :, None], 3, axis=2)
            else:
                f = np.stack(
                    [base, np.broadcast_to(xgrad, (48, 64)).astype(np.uint8),
                     255 - base], axis=2,
                )
            vw.write(np.ascontiguousarray(f))
        vw.release()
        vids.append(vid)
    meta = pd.DataFrame({"vid": vids, "mos": [3.0, 2.0, 4.0], "framerate": 24.0})
    meta_csv = str(tmp_path / "meta.csv")
    meta.to_csv(meta_csv, index=False)

    report_csv = str(tmp_path / "grey.csv")
    main([
        "greyscale", "--dataset", "youtube_ugc", "--root", str(root),
        "--metadata-csv", meta_csv, "--output", report_csv,
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # mp4v is lossy: chroma noise can stay within the <=3 tolerance or not;
    # the written greyscale video MUST be flagged, color ones must not
    report = pd.read_csv(report_csv)
    assert list(report["vid"]) == ["ugc1"]
    assert list(report["Index"]) == [1]

    from relaxtpu.data.greyscale import load_grey_indices

    assert load_grey_indices(report_csv) == [1]
    assert load_grey_indices(str(tmp_path / "missing.csv")) == []


def test_config_defaults_feed_cli(tmp_path):
    """--config values become argparse defaults; explicit flags still win."""
    from relaxtpu.cli import __main__ as cli
    from relaxtpu.config import RunConfig

    cfg = RunConfig()
    cfg.extract.dataset = "live_vqc"
    cfg.extract.output_dir = str(tmp_path / "feats")
    cfg.runtime.decode_workers = 7
    cfg.train.n_repeats = 3
    cfg.train.use_bn = False
    cfg_path = str(tmp_path / "run.json")
    cfg.save(cfg_path)

    p, submap = cli.build_parser()
    argv = ["--config", cfg_path, "extract", "--decode-workers", "2"]
    cli._apply_config(argv, submap)
    args = p.parse_args(argv)
    assert args.dataset == "live_vqc"        # from config
    assert args.output == str(tmp_path / "feats")
    assert args.decode_workers == 2          # explicit flag wins

    p2, submap2 = cli.build_parser()
    argv_t = [
        "--config", cfg_path, "train",
        "--metadata-csv", "m.csv", "--features", "f.npy",
    ]
    cli._apply_config(argv_t, submap2)
    args_t = p2.parse_args(argv_t)
    assert args_t.n_repeats == 3 and args_t.no_bn is True


def test_config_defaults_feed_all_subcommands(tmp_path):
    """Every runtime-consuming subcommand honors --config (VERDICT r2 item 8:
    predict/predict-batch/finetune/train-lsvq ignored it)."""
    from relaxtpu.cli import __main__ as cli
    from relaxtpu.config import RunConfig

    cfg = RunConfig()
    cfg.extract.dataset = "youtube_ugc"
    cfg.extract.ingest = "bgr"
    cfg.runtime.decode_workers = 9
    cfg.runtime.n_data = 2
    cfg.train.epochs = 7
    cfg.train.n_repeats = 5
    cfg_path = str(tmp_path / "run.json")
    cfg.save(cfg_path)

    def parse(argv):
        p, submap = cli.build_parser()
        cli._apply_config(argv, submap)
        return p.parse_args(argv)

    a = parse(["--config", cfg_path, "predict", "--video", "v.mp4",
               "--model", "m.npz", "--imputer", "i.pkl", "--scaler", "s.pkl"])
    assert a.video_type == "youtube_ugc" and a.ingest == "bgr"

    a = parse(["--config", cfg_path, "predict-batch", "--videos", "d",
               "--model", "m.npz", "--imputer", "i.pkl", "--scaler", "s.pkl"])
    assert a.decode_workers == 9 and a.n_data == 2 and a.ingest == "bgr"

    a = parse(["--config", cfg_path, "extract"])
    assert a.n_data == 2

    a = parse(["--config", cfg_path, "train-lsvq",
               "--train-metadata", "a.csv", "--test-metadata", "b.csv",
               "--train-features", "a.npy", "--test-features", "b.npy"])
    assert a.epochs == 7

    a = parse(["--config", cfg_path, "finetune", "--dataset", "konvid_1k",
               "--metadata-csv", "m.csv", "--features", "f.npy",
               "--base-model", "b.npz"])
    assert a.epochs == 7 and a.n_repeats == 5


def test_config_rejects_unknown_keys(tmp_path):
    import json as _json

    import pytest as _pytest

    from relaxtpu.config import RunConfig

    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as f:
        _json.dump({"extract": {}, "typo_section": {}}, f)
    with _pytest.raises(ValueError, match="unknown config sections"):
        RunConfig.load(bad)
    bad2 = str(tmp_path / "bad2.json")
    with open(bad2, "w") as f:
        _json.dump({"extract": {"no_such_knob": 1}}, f)
    with _pytest.raises(TypeError):
        RunConfig.load(bad2)


def test_report_command(tmp_path, capsys):
    """report CLI: reference-format log + VSFA npy + published baseline rows
    into one table (ref reported_result.ipynb)."""
    from relaxtpu.cli.__main__ import main

    log = "/root/reference/reported_results/konvid_1k_brisque_svr.log"
    vsfa = "/root/reference/reported_results/VSFA-KoNViD_1k-EXP0.npy"
    if not (os.path.exists(log) and os.path.exists(vsfa)):
        pytest.skip("reference artifacts unavailable")
    out_csv = str(tmp_path / "table.csv")
    main([
        "report", "--log", f"brisque=konvid_1k={log}",
        "--vsfa-npy", f"konvid_1k={vsfa}", "--with-baseline",
        "--output-csv", out_csv,
    ])
    text = capsys.readouterr().out
    assert "brisque" in text and "VSFA" in text and "reference (published)" in text
    df = pd.read_csv(out_csv)
    assert set(df["method"]) == {"brisque", "VSFA", "reference (published)"}
    assert np.isfinite(df["SRCC"]).all()


def test_finetune_zero_shot(tmp_path, capsys):
    """finetune --zero-shot scores the base model on the 21 test splits with
    no adaptation and writes no model (ref fine_tune.py:216-258)."""
    import jax
    import jax.numpy as jnp

    from relaxtpu.cli.__main__ import main
    from relaxtpu.model.mlp import Mlp
    from relaxtpu.model.train import ModelSnapshot
    from relaxtpu.utils.checkpoint import save_snapshot

    rng = np.random.default_rng(3)
    x, y, _ = _toy_features(rng, 40, d=32)
    feats = str(tmp_path / "f.npy")
    np.save(feats, x)
    meta = str(tmp_path / "m.csv")
    pd.DataFrame({"vid": [f"v{i}" for i in range(40)], "mos": y}).to_csv(meta, index=False)
    v = Mlp().init(jax.random.PRNGKey(0), jnp.zeros((2, 32)), train=False)
    base = str(tmp_path / "base.npz")
    save_snapshot(base, ModelSnapshot(v["params"], v.get("batch_stats", {})))

    out = str(tmp_path / "never_written.npz")
    main([
        "finetune", "--dataset", "konvid_1k", "--metadata-csv", meta,
        "--features", feats, "--base-model", base, "--output", out,
        "--n-repeats", "3", "--zero-shot",
    ])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["zero_shot"] is True and np.isfinite(res["median_srcc"])
    assert not os.path.exists(out)


def test_metadata_command(tmp_path, rng, capsys):
    cv2 = pytest.importorskip("cv2")
    from relaxtpu.cli.__main__ import main

    vdir = tmp_path / "vids"
    vdir.mkdir()
    vw = cv2.VideoWriter(str(vdir / "a.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 48))
    for _ in range(12):
        vw.write(rng.integers(0, 256, (48, 64, 3), dtype=np.uint8))
    vw.release()
    out = str(tmp_path / "meta.csv")
    main(["metadata", "--video-dir", str(vdir), "--output", out])
    res = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["n_videos"] == 1
    df = pd.read_csv(out)
    row = df.iloc[0]
    assert row["vid"] == "a"
    assert row["width"] == 64 and row["height"] == 48
    assert row["nb_frames"] == 12
    assert row["pixfmt"] == "yuv420p"
    assert row["bitdepth"] == 8


def test_config_covers_every_subcommand(tmp_path):
    """Every subparser in build_parser is either fed by _apply_config or in
    the documented CONFIG_EXCLUDED list (VERDICT r3 item 7)."""
    from relaxtpu.cli import __main__ as cli
    from relaxtpu.config import RunConfig

    cfg_path = str(tmp_path / "run.json")
    RunConfig().save(cfg_path)
    _, submap = cli.build_parser()

    class Spy(dict):
        def __init__(self, base):
            super().__init__(base)
            self.seen = set()

        def __getitem__(self, k):
            self.seen.add(k)
            return super().__getitem__(k)

    spy = Spy(submap)
    cli._apply_config(["--config", cfg_path, "extract"], spy)
    assert spy.seen | cli.CONFIG_EXCLUDED == set(submap), (
        f"subcommands ignoring --config and not excluded: "
        f"{set(submap) - spy.seen - cli.CONFIG_EXCLUDED}"
    )
    assert not (spy.seen & cli.CONFIG_EXCLUDED)


def test_config_defaults_feed_aux_subcommands(tmp_path):
    """greyscale/parity/warmup/train-cross/visualize honor --config."""
    from relaxtpu.cli import __main__ as cli
    from relaxtpu.config import RunConfig

    cfg = RunConfig()
    cfg.extract.dataset = "live_vqc"
    cfg.extract.data_root = "/data"
    cfg.extract.frame_bucket = 4
    cfg.extract.ingest = "bgr"
    cfg.extract.backbone_dtype = "float32"
    cfg.train.epochs = 9
    cfg.train.use_bn = False
    cfg_path = str(tmp_path / "run.json")
    cfg.save(cfg_path)

    def parse(argv):
        p, submap = cli.build_parser()
        cli._apply_config(argv, submap)
        return p.parse_args(argv)

    a = parse(["--config", cfg_path, "greyscale"])
    assert a.dataset == "live_vqc" and a.root == "/data"

    a = parse(["--config", cfg_path, "parity"])
    assert a.dataset == "live_vqc" and a.bf16 is False

    a = parse(["--config", cfg_path, "warmup"])
    assert a.bucket == 4 and a.ingest == "bgr"

    a = parse(["--config", cfg_path, "train-cross",
               "--train-metadata", "a.csv", "--test-metadata", "b.csv",
               "--train-features", "a.mat", "--test-features", "b.mat"])
    assert a.epochs == 9 and a.no_bn is True

    a = parse(["--config", cfg_path, "visualize",
               "--frame", "f.png", "--next-frame", "n.png"])
    assert a.bf16 is False


def test_warmup_covers_mixed_frame_pair_shapes():
    """_warm_programs warms (c, c) AND (c+bucket, c): a video whose last
    sampled frame has no successor (F frames, F-1 pairs) pads to a MIXED
    program shape when F = 1 mod bucket — e.g. 33 frames / 32 pairs pads to
    (40, 32), which round-3 warmup never compiled (VERDICT r3 item 6)."""
    from relaxtpu.cli.__main__ import _warm_programs

    calls = []

    class FakeExtractor:
        def video_feature_async_i420(self, fbuf, nbuf, h, w, bucket=8):
            calls.append((len(fbuf), len(nbuf)))
            return np.zeros(3)

    recs = list(_warm_programs(
        FakeExtractor(), ["16x16"], counts=[8, 16, 32], bucket=8,
        ingest="yuv",
    ))
    # I420 buffers hold one row per frame/pair, so the call shapes ARE the
    # padded program shapes
    warmed = set(calls)
    for c in (8, 16, 32):
        assert (c, c) in warmed and (c + 8, c) in warmed
    assert {(r["frames"], r["pairs"]) for r in recs} == warmed

    # any real video with padded pair count in the warmed set hits a warm
    # program: check the 33f/32p case explicitly
    f, p = 33, 32
    shape = (-(-f // 8) * 8, -(-p // 8) * 8)
    assert shape == (40, 32) and shape in warmed
