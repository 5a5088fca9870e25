"""relaxtpu CLI.

Subcommands (reference CLI parity, SURVEY.md §7):

- ``predict``  — single video -> MOS (``src/demo_test.py`` equivalent)
- ``extract``  — dataset feature extraction (``src/main_fragment_layerstack.py``
  + ``main_layer_stack.py`` + ``extract_npy2mat.py`` equivalent)
- ``train``    — repeated-holdout MLP training (``src/model_regression.py``)
- ``finetune`` — cross-dataset adaptation (``src/fine_tune.py``)

Example::

    python -m relaxtpu.cli predict --video v.mp4 --video-type konvid_1k \
        --model model/mlp.npz --imputer model/konvid_1k_imputer.pkl \
        --scaler model/konvid_1k_scaler.pkl
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np


def _build_extractor(args):
    import jax
    import jax.numpy as jnp

    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.models import ResNet50, ViT, port_torch_resnet50, port_torch_vit, load_torch_checkpoint

    # bf16 is the PRODUCTION default on TPU (accuracy pinned on-chip each
    # round: parity --check production / tests/test_production_numerics.py);
    # f32 everywhere else and under explicit --f32 (strict-parity mode).
    use_bf16 = args.bf16
    if use_bf16 is None:
        use_bf16 = any(d.platform == "tpu" for d in jax.devices())
    dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    if args.resnet_weights:
        rn_vars = port_torch_resnet50(load_torch_checkpoint(args.resnet_weights))
    else:
        logging.warning("no --resnet-weights: using random ResNet-50 weights")
        from relaxtpu.models.initutil import fast_init
        rn_vars = fast_init(ResNet50(), jnp.zeros((1, 224, 224, 3)))
    if args.vit_weights:
        vit_vars = port_torch_vit(load_torch_checkpoint(args.vit_weights))
    else:
        logging.warning("no --vit-weights: using random ViT weights")
        from relaxtpu.models.initutil import fast_init
        vit_vars = fast_init(ViT(), jnp.zeros((1, 224, 224, 3)), key=jax.random.PRNGKey(1))
    return FeatureExtractor(rn_vars, vit_vars, dtype=dtype)


def _load_predictor(args, extractor):
    """Regression head + scalers -> VideoQualityPredictor (shared by
    predict / predict-batch / serve)."""
    from relaxtpu.model.mlp import port_torch_mlp
    from relaxtpu.model.scalers import FeatureScaler
    from relaxtpu.predict import VideoQualityPredictor

    if args.model.endswith(".npz"):
        from relaxtpu.utils.checkpoint import load_snapshot

        snap = load_snapshot(args.model)
        variables = {"params": snap.params, "batch_stats": snap.batch_stats}
    else:  # reference .pth
        from relaxtpu.models.porters import load_torch_checkpoint

        variables = port_torch_mlp(load_torch_checkpoint(args.model))
    scaler = FeatureScaler.load_reference_pkls(args.imputer, args.scaler)
    return VideoQualityPredictor(
        extractor, variables, scaler, video_type=args.video_type,
        is_finetune=args.finetuned,
    )


def cmd_predict(args):
    extractor = _build_extractor(args)
    predictor = _load_predictor(args, extractor)
    mos = predictor.predict_file(args.video, framerate=args.framerate,
                                 width=args.width, height=args.height,
                                 ingest=args.ingest)
    print(json.dumps({"video": args.video, "predicted_mos": mos}))


def cmd_warmup(args):
    """Pre-compile the video programs for the given resolutions into the
    persistent compilation cache, so production predict/extract runs start
    at full speed (a cold compile costs minutes per resolution on remote
    compile services).  Resolutions as HxW strings, e.g. 540x960.

    Real videos pad their frame/pair counts up to a multiple of ``--bucket``,
    so each distinct padded count is its own program shape: ``--counts``
    lists the padded counts to warm (default 8 16 32 covers clips up to ~16 s
    at 30 fps; counts are rounded up to the bucket).
    """
    for rec in _warm_programs(
        _build_extractor(args), args.resolutions, args.counts, args.bucket,
        args.ingest,
    ):
        print(json.dumps(rec))


def _warm_programs(extractor, resolutions, counts, bucket, ingest):
    """Compile the whole-video programs for every (resolution, padded frame
    count, padded pair count) shape; yields one record per shape (shared by
    ``warmup`` and ``serve``).

    Frame and pair counts pad independently, so a clip whose last sampled
    frame has no successor (F frames, F-1 pairs) lands on a MIXED shape when
    F ≡ 1 (mod bucket) — e.g. 33 frames / 32 pairs pads to (40, 32).  For
    each padded count c this therefore warms BOTH (c, c) and
    (c + bucket, c); any real video whose padded pair count is in the warmed
    set then hits a warm program regardless of its frame count.
    """
    import time

    from relaxtpu.ops.colorspace import bgr_to_yuv420, pack_i420

    padded = sorted({-(-int(c) // bucket) * bucket for c in counts})
    shapes = []
    for c in padded:
        shapes += [(c, c), (c + bucket, c)]
    for res in resolutions:
        h, w = (int(v) for v in res.lower().split("x"))
        rng = np.random.default_rng(0)
        for n_frames, n_pairs in shapes:
            frames = rng.integers(0, 256, (n_frames, h, w, 3), dtype=np.uint8)
            nxt = rng.integers(0, 256, (n_pairs, h, w, 3), dtype=np.uint8)
            t0 = time.perf_counter()
            if ingest in ("yuv", "auto") and h % 2 == 0 and w % 2 == 0:
                fbuf = pack_i420(*bgr_to_yuv420(frames))
                nbuf = pack_i420(*bgr_to_yuv420(nxt))
                np.asarray(
                    extractor.video_feature_async_i420(fbuf, nbuf, h, w, bucket=bucket)
                )
            if ingest in ("bgr", "auto"):
                np.asarray(
                    extractor.video_feature_async(
                        frames, frames[: len(nxt)], nxt, bucket=bucket
                    )
                )
            yield {
                "resolution": res, "frames": n_frames, "pairs": n_pairs,
                "bucket": bucket,
                "compile_s": round(time.perf_counter() - t0, 1),
            }


def cmd_predict_batch(args):
    """Serving mode: MOS for every video in a directory/list, batched.

    Decode runs on host threads; same-resolution videos go through the
    batched multi-video device program (``video_features_batch_i420``) when
    YUV ingest applies, otherwise through the async streaming path.  Output:
    one JSON line per video plus an optional CSV (reference
    ``log/predict_score/*.csv`` shape: video, predicted MOS).
    """
    import concurrent.futures as cf
    import glob
    import os

    paths = []
    for v in args.videos:
        if os.path.isdir(v):
            for ext in ("*.mp4", "*.mkv", "*.avi", "*.webm"):
                paths.extend(sorted(glob.glob(os.path.join(v, ext))))
        else:
            paths.append(v)
    if not paths:
        raise SystemExit("no videos found")

    extractor = _build_extractor(args)
    predictor = _load_predictor(args, extractor)

    def decode(path):
        if args.ingest in ("yuv", "auto") and not path.endswith(".yuv"):
            try:
                from relaxtpu.io.video import decode_video_inputs_i420

                return ("i420", *decode_video_inputs_i420(path))
            except Exception:
                if args.ingest == "yuv":
                    raise
        from relaxtpu.io.video import decode_video_inputs

        return decode_video_inputs(path)

    evaluator = None
    n_data = getattr(args, "n_data", None)
    n_model = getattr(args, "n_model", 1) or 1
    if ((n_data or 1) * n_model) > 1:
        from relaxtpu.parallel.eval import ShardedVideoEvaluator
        from relaxtpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data, n_model)
        evaluator = ShardedVideoEvaluator(extractor, mesh)
        logging.info("mesh serving: %s", dict(mesh.shape))

    rows = []
    with cf.ThreadPoolExecutor(max_workers=args.decode_workers) as pool:
        decoded = list(pool.map(decode, paths))
    # group same-resolution i420 videos into device batches
    groups: dict = {}
    order = []
    for path, res in zip(paths, decoded):
        if isinstance(res[0], str) and res[0] == "i420":
            key = (res[3], res[4])
            groups.setdefault(key, []).append((path, res[1], res[2]))
        else:
            order.append((path, res))
    if args.batch == "auto":
        # probe the link and pick the predicted-faster mode: batch when
        # dispatch-bound, stream when transfer-bound (the winner flips with
        # link conditions — measured both ways across rounds)
        from relaxtpu.utils.linkprobe import measure_link, pick_serving_mode

        if groups:
            (h0, w0), items0 = next(iter(groups.items()))
            bytes_per_video = items0[0][1].size + items0[0][2].size
            args.batch, reason = pick_serving_mode(
                bytes_per_video, measure_link(n_mb=16, reps=1)
            )
            logging.info("serving-mode auto-select: %s", reason)
        else:
            args.batch = 1
    if args.batch <= 1 and evaluator is None:
        # Streaming default: per-video async programs, 3 in flight — the
        # fast path when host->device bandwidth dominates (tunneled links,
        # measured 1.40 vs 0.98 vps at 540p).  --batch N>1 amortizes the
        # per-dispatch round-trip instead; prefer it on PCIe-attached hosts
        # serving many same-resolution videos.
        pending: list = []

        def drain_stream(limit: int):
            while len(pending) > limit:
                p, dev = pending.pop(0)
                rows.append((p, predictor.predict_feature(np.asarray(dev))))

        for (h, w), items in groups.items():
            for path, fbuf, nbuf in items:
                pending.append(
                    (path, extractor.video_feature_async_i420(fbuf, nbuf, h, w))
                )
                drain_stream(2)
        drain_stream(0)
    else:
        # A mesh batch shards videos over the data axis: dispatching fewer
        # than n_data videos pads with duplicates that every device computes
        # and a slice discards, so the mesh path floors its dispatch size.
        step = max(args.batch, 1, (n_data or 1) if evaluator is not None else 1)
        for (h, w), items in groups.items():
            for i in range(0, len(items), step):
                chunk = items[i : i + step]
                batch_fn = (
                    evaluator.videos_batch_feature_i420
                    if evaluator is not None
                    else extractor.video_features_batch_i420
                )
                vecs = np.asarray(
                    batch_fn([c[1] for c in chunk], [c[2] for c in chunk], h, w)
                )
                for (path, _, _), vec in zip(chunk, vecs):
                    rows.append((path, predictor.predict_feature(vec)))
    for path, (frames, prev, nxt) in order:
        rows.append((path, predictor.predict_arrays(frames, prev, nxt)))

    order_of = {}
    for i, p in enumerate(paths):
        order_of.setdefault(p, i)
    rows.sort(key=lambda r: order_of[r[0]])
    for path, mos in rows:
        print(json.dumps({"video": path, "predicted_mos": mos}))
    if args.output_csv:
        import pandas as pd

        pd.DataFrame(rows, columns=["video", "predicted_mos"]).to_csv(
            args.output_csv, index=False
        )


def cmd_serve(args):
    """Persistent scoring server: JSON-lines requests on stdin, JSON-lines
    responses on stdout (stderr carries logs).  Keeps the compiled device
    programs, backbone weights, and regression head warm across requests —
    the production-serving surface the reference's one-shot ``demo_test.py``
    lacks (each invocation there pays model load + compile from scratch).

    Request: ``{"video": path}`` with optional ``framerate``/``width``/
    ``height`` (forwarded to the decoder, e.g. for raw ``.yuv``), or a bare
    path.  Response (same order as requests): ``{"video", "predicted_mos"}``
    or ``{"video", "error"}``.  Up to ``--in-flight`` videos stay enqueued on
    the device while later requests decode on the host, so decode/transfer
    of request N+1 overlaps compute of request N.  ``--warm HxW`` resolutions
    pre-compile at startup (cold compiles cost minutes on remote-compile
    backends).
    """
    import sys as _sys

    extractor = _build_extractor(args)
    predictor = _load_predictor(args, extractor)

    if args.warm:
        # each bucketed frame count is its own program shape (see cmd_warmup)
        for rec in _warm_programs(
            extractor, args.warm, args.warm_counts, 8, args.ingest
        ):
            logging.info("warmed %s", rec)

    pending: list = []  # (request dict, device vec | None, error | None)

    def emit(req, vec, err):
        if err is None:
            try:
                mos = predictor.predict_feature(np.asarray(vec))
                out = {"video": req["video"], "predicted_mos": mos}
            except Exception as e:  # device-side failure surfaces here
                out = {"video": req["video"], "error": str(e)}
        else:
            out = {"video": req.get("video"), "error": err}
        print(json.dumps(out), flush=True)

    def drain(limit: int):
        while len(pending) > limit:
            emit(*pending.pop(0))

    print(json.dumps({"status": "ready"}), flush=True)
    for line in _sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line) if line.startswith("{") else {"video": line}
            if not isinstance(req, dict) or "video" not in req:
                raise ValueError("request must be a path or {'video': path, ...}")
        except Exception as e:
            pending.append(({"video": None}, None, f"bad request: {e}"))
            drain(args.in_flight)
            continue
        try:
            vec = predictor.enqueue_file(
                req["video"], framerate=req.get("framerate"),
                width=req.get("width"), height=req.get("height"),
                ingest=args.ingest,
            )
            pending.append((req, vec, None))
        except Exception as e:
            pending.append((req, None, str(e)))
        drain(args.in_flight)
    drain(0)


def _extract_one(extractor, ablation, mode, network, layer, frames, prev, nxt):
    """Per-video features for one extraction mode.

    Returns the stored array: the reduced (35203,) vector for the full model
    (each segment meaned over its OWN frame/pair count — ref
    ``demo_test.py:171-175``), or the per-frame/per-pair matrix for the
    reference's ablation drivers (``main_residual.py:226-268``,
    ``main_residual_fragment.py:273-317``, ``main_layer.py:81-113``,
    ``main_layer_stack.py:115-151``, ``main_fragment_pool.py:310-327``).
    """
    if mode == "full":
        return extractor.video_feature(frames, prev, nxt)
    if mode in ("layer_stack", "layer"):  # full frames, one network
        stack, vit_stats = extractor.frame_features(frames)
        if network == "vit":
            return vit_stats
        if mode == "layer_stack":
            return stack
        # single-layer full-frame taps (main_layer.py): pool / last_layer
        return _single_layer_frames(extractor, ablation, network, layer, frames)
    if mode == "fragment_layerstack":
        return extractor.pair_features(prev, nxt)[0]
    if mode == "fragment_pool":
        return extractor.pair_features(prev, nxt)[1]
    # residual ablation variants over pairs
    bmax = extractor.max_pair_batch(prev.shape[1], prev.shape[2])
    outs = [
        ablation.pair_features(mode, network, layer, prev[i : i + bmax], nxt[i : i + bmax])
        for i in range(0, len(prev), bmax)
    ]
    return np.concatenate(outs)


def _single_layer_frames(extractor, ablation, network, layer, frames):
    """Full-frame single-tap features (ref main_layer.py) via the ablation
    feature program with a zero residual path replaced by the frame itself."""
    import jax
    import jax.numpy as jnp

    key = ("__frames__", network, layer)
    if key not in ablation._fns:
        def fn(rv, vv, imgs):
            return ablation._features_from_images(network, layer, rv, vv, imgs)

        ablation._fns[key] = jax.jit(fn)
    out = ablation._fns[key](
        extractor.resnet_vars, extractor.vit_vars, jnp.asarray(frames)
    )
    return np.asarray(out)


def cmd_extract(args):
    import concurrent.futures as cf
    import contextlib

    import pandas as pd

    from relaxtpu.data.store import FeatureStore
    from relaxtpu.features.ablation import AblationExtractor
    from relaxtpu.io.datasets import data_root, get_dataset, load_metadata
    from relaxtpu.io.video import decode_video_inputs

    spec = get_dataset(args.dataset)
    df = load_metadata(spec, args.metadata_dir) if args.metadata_csv is None else pd.read_csv(args.metadata_csv)
    store = FeatureStore(args.output)
    extractor = _build_extractor(args)
    ablation = AblationExtractor(extractor)
    root = data_root(args.root)
    tag = args.dataset if args.mode == "full" else f"{args.dataset}_{args.mode}"

    todo = [(i, row) for i, row in df.iterrows() if not store.has(tag, i)]
    pending: list = []  # (index, device array) — dispatch-ahead queue

    def drain(limit: int):
        while len(pending) > limit:
            j, dev = pending.pop(0)
            store.put(tag, j, np.asarray(dev))
            logging.info("extracted video %d [%d todo]", j + 1, len(pending))

    ingest = getattr(args, "ingest", "auto")

    def decode(row):
        path = spec.video_path(root, str(row["vid"]))
        if ingest in ("yuv", "auto") and args.mode == "full" and not path.endswith(".yuv"):
            try:
                from relaxtpu.io.video import decode_video_inputs_i420

                return (
                    "i420",
                    *decode_video_inputs_i420(
                        path, row.get("framerate"), row.get("width"), row.get("height")
                    ),
                )
            except Exception:
                if ingest == "yuv":
                    raise
        return decode_video_inputs(
            path, row.get("framerate"), row.get("width"), row.get("height"),
        )

    mesh = None
    n_data = getattr(args, "n_data", None)
    n_model = getattr(args, "n_model", 1) or 1
    if ((n_data or 1) * n_model) > 1:
        if args.mode != "full":
            logging.warning(
                "--n-data/--n-model: mesh extraction supports --mode full only; "
                "running single-device for mode=%s", args.mode,
            )
        else:
            from relaxtpu.parallel.mesh import make_mesh

            mesh = make_mesh(n_data, n_model)
            logging.info("mesh extraction: %s", dict(mesh.shape))

    profile = contextlib.nullcontext()
    if getattr(args, "profile_dir", None):
        from relaxtpu.utils.profiling import trace_to

        profile = trace_to(args.profile_dir)
    if mesh is not None:
        from relaxtpu.parallel.eval import ShardedVideoEvaluator

        evaluator = ShardedVideoEvaluator(
            extractor, mesh, decode_workers=args.decode_workers
        )
        with profile:
            vecs = evaluator.run(
                [row for _, row in todo],
                decode,
                on_result=lambda j, v: logging.info("extracted video #%d", j + 1),
            )
        for (i, _), vec in zip(todo, vecs):
            store.put(tag, i, vec)
        mat = store.assemble(tag, len(df))
        np.save(f"{args.output}/{tag}_features.npy", mat)
        if args.save_mat:
            store.save_mat(tag, len(df), args.save_mat, key=args.dataset)
        print(json.dumps({
            "dataset": args.dataset, "mode": args.mode, "shape": list(mat.shape),
            "mesh": dict(mesh.shape),
        }))
        return
    with profile, cf.ThreadPoolExecutor(max_workers=args.decode_workers) as pool:
        futures = [pool.submit(decode, row) for _, row in todo]
        for (i, row), fut in zip(todo, futures):
            res = fut.result()
            if isinstance(res[0], str) and res[0] == "i420":
                _, fbuf, nbuf, h, w = res
                pending.append((i, extractor.video_feature_async_i420(fbuf, nbuf, h, w)))
                drain(args.dispatch_ahead)
                continue
            frames, prev, nxt = res
            if args.mode == "full":
                # async dispatch: decode || transfer || compute pipelining
                pending.append((i, extractor.video_feature_async(frames, prev, nxt)))
                drain(args.dispatch_ahead)
            else:
                feat = _extract_one(
                    extractor, ablation, args.mode, args.network, args.layer,
                    frames, prev, nxt,
                )
                store.put(tag, i, feat)
                logging.info("extracted %s [%d/%d]", row["vid"], i + 1, len(df))
        drain(0)
    mat = store.assemble(tag, len(df))
    np.save(f"{args.output}/{tag}_features.npy", mat)
    if args.save_mat:
        store.save_mat(tag, len(df), args.save_mat, key=args.dataset)
    print(json.dumps({"dataset": args.dataset, "mode": args.mode, "shape": list(mat.shape)}))


def _grey_indices_for(args, dataset: str):
    """Greyscale rows to drop: explicit report path, else the conventional
    location for youtube_ugc (ref ``split_train_test.py:113-117`` drops them
    only for that dataset)."""
    import os

    from relaxtpu.data.greyscale import load_grey_indices

    report = getattr(args, "greyscale_report", None)
    if report is None and dataset == "youtube_ugc":
        report = os.path.join(
            args.metadata_dir, "greyscale_report",
            f"{dataset.upper()}_greyscale_metadata.csv",
        )
        if not os.path.exists(report):
            logging.warning(
                "youtube_ugc: no greyscale report at %s — greyscale videos "
                "will NOT be dropped (run `relaxtpu greyscale` first)", report,
            )
            return None
    return load_grey_indices(report) if report else None


def cmd_train(args):
    import pandas as pd

    from relaxtpu.model.protocol import run_repeated_holdout
    from relaxtpu.model.train import TrainConfig
    from relaxtpu.utils.checkpoint import save_snapshot

    df = pd.read_csv(args.metadata_csv)
    features = np.load(args.features)
    cfg = TrainConfig(
        n_repeats=args.n_repeats,
        n_splits=args.n_splits,
        batch_size=args.batch_size,
        epochs=args.epochs,
        initial_lr=args.lr,
        weight_decay=args.weight_decay,
        select_criteria=args.select_criteria,
        use_bn=not args.no_bn,
        kfold=not args.no_kfold,
    )
    grey = _grey_indices_for(args, args.dataset)
    if grey:
        logging.info("dropping %d greyscale videos", len(grey))
    progress = print
    if args.artifacts_dir:
        # reference-style run log: hyperparameters + per-repeat results into
        # a file (ref model_regression.py:240-259 writes ../log/*_mlp.log)
        from relaxtpu.utils.logging import setup_logger

        os.makedirs(args.artifacts_dir, exist_ok=True)
        run_log = setup_logger(
            "relaxtpu.train", os.path.join(args.artifacts_dir, "train.log")
        )
        run_log.info("config: %s", cfg)

        def progress(msg):  # noqa: F811 — tee to stdout and the run log
            print(msg)
            run_log.info(msg)

    median, median_val, results = run_repeated_holdout(
        df, features, cfg, grey_indices=grey, progress=progress,
        resume_dir=args.resume_dir, artifacts_dir=args.artifacts_dir,
    )
    save_snapshot(args.output, median.snapshot)
    print(json.dumps({
        "median_srcc": float(np.median([r.srcc for r in results])),
        "median_krcc": float(np.median([r.krcc for r in results])),
        "median_plcc": float(np.median([r.plcc for r in results])),
        "median_rmse": float(np.median([r.rmse for r in results])),
        "model": args.output,
    }))


def cmd_train_lsvq(args):
    """LSVQ fixed-split protocol (ref ``split_train_test.process_lsvq`` +
    ``model_regression_simple.py``: single split, kfold off, no BN)."""
    import pandas as pd

    from relaxtpu.data.splits import split_lsvq
    from relaxtpu.data.store import load_chunked_features, load_mat_features
    from relaxtpu.model.protocol import run_fixed_split
    from relaxtpu.model.train import TrainConfig
    from relaxtpu.utils.checkpoint import save_snapshot

    train_df = pd.read_csv(args.train_metadata)
    test_df = pd.read_csv(args.test_metadata)

    def load_feats(paths, key):
        if len(paths) == 1 and paths[0].endswith(".npy"):
            return np.load(paths[0])
        if len(paths) == 1:
            return load_mat_features(paths[0], key)
        return load_chunked_features(paths, key)

    x_tr = load_feats(args.train_features, args.train_key)
    x_te = load_feats(args.test_features, args.test_key)
    x_tr, y_tr, x_te, y_te, _ = split_lsvq(train_df, test_df, x_tr, x_te)
    cfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        initial_lr=args.lr,
        weight_decay=args.weight_decay,
        select_criteria=args.select_criteria,
        use_bn=False,
        kfold=False,
    )
    result, _ = run_fixed_split(x_tr, y_tr, x_te, y_te, cfg, progress=print)
    save_snapshot(args.output, result.snapshot)
    print(json.dumps({
        "srcc": result.srcc, "krcc": result.krcc,
        "plcc": result.plcc, "rmse": result.rmse, "model": args.output,
    }))


def cmd_greyscale(args):
    """Greyscale-video report (ref ``src/data_processing/check_greyscale.py``)."""
    import os

    import pandas as pd

    from relaxtpu.data.greyscale import greyscale_report
    from relaxtpu.io.datasets import data_root, get_dataset, load_metadata

    spec = get_dataset(args.dataset)
    df = load_metadata(spec, args.metadata_dir) if args.metadata_csv is None else pd.read_csv(args.metadata_csv)
    root = data_root(args.root)
    report = greyscale_report(
        df, lambda row: spec.video_path(root, str(row["vid"])), progress=logging.info
    )
    out = args.output or os.path.join(
        args.metadata_dir, "greyscale_report",
        f"{args.dataset.upper()}_greyscale_metadata.csv",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    report.to_csv(out, index=False)
    print(json.dumps({"output": out, "n_greyscale": len(report)}))


def cmd_finetune(args):
    import pandas as pd

    from relaxtpu.model.protocol import FineTuneConfig, fine_tune, zero_shot_eval
    from relaxtpu.model.train import MlpTrainer, TrainConfig
    from relaxtpu.utils.checkpoint import load_snapshot, save_snapshot

    df = pd.read_csv(args.metadata_csv)
    features = np.load(args.features)
    y = df["mos"].to_numpy(float)
    base = load_snapshot(args.base_model)
    trainer = MlpTrainer(TrainConfig(use_bn=not args.no_bn), features.shape[1])
    ft = FineTuneConfig(n_repeats=args.n_repeats, epochs=args.epochs)
    mos_is_1_5 = args.dataset in ("konvid_1k", "youtube_ugc")
    if args.zero_shot:
        # w/o-fine-tune evaluation (ref fine_tune.py:216-258): score the base
        # model on the target's 21 test splits, no adaptation, no new model
        median, results = zero_shot_eval(
            base, trainer, features, y, ft, mos_is_1_5=mos_is_1_5, progress=print
        )
        print(json.dumps({
            "median_srcc": float(np.median([r.srcc for r in results])),
            "median_rmse": float(np.median([r.rmse for r in results])),
            "zero_shot": True,
        }))
        return
    median, results = fine_tune(
        base, trainer, features, y, ft, mos_is_1_5=mos_is_1_5, progress=print,
    )
    save_snapshot(args.output, median.snapshot)
    print(json.dumps({
        "median_srcc": float(np.median([r.srcc for r in results])),
        "median_rmse": float(np.median([r.rmse for r in results])),
        "model": args.output,
    }))


def cmd_report(args):
    """Cross-method results table from reference-format training logs and
    VSFA ``.npy`` results, optionally side-by-side with the reference's
    published numbers (ref ``reported_result.ipynb``)."""
    import pandas as pd

    from relaxtpu.utils.report import (
        REFERENCE_INTRA_DATASET,
        against_baseline,
        competitor_table,
        parse_vsfa_npy,
    )

    log_paths: dict = {}
    for spec in args.log:
        try:
            method, ds, path = spec.split("=", 2)
        except ValueError:
            raise SystemExit(f"--log wants METHOD=DATASET=PATH, got: {spec}")
        log_paths.setdefault(method, {})[ds] = path
    df = competitor_table(log_paths) if log_paths else pd.DataFrame(
        columns=["method", "dataset"]
    )
    vsfa_rows = []
    for spec in args.vsfa_npy:
        try:
            ds, path = spec.split("=", 1)
        except ValueError:
            raise SystemExit(f"--vsfa-npy wants DATASET=PATH, got: {spec}")
        vsfa_rows.append({"method": "VSFA", "dataset": ds, **{
            k: v for k, v in parse_vsfa_npy(path).items() if k != "n_test"
        }})
    if vsfa_rows:
        df = pd.concat([df, pd.DataFrame(vsfa_rows)], ignore_index=True)
    if args.with_baseline:
        df = against_baseline(df, REFERENCE_INTRA_DATASET)
    if df.empty:
        raise SystemExit("nothing to report: pass --log/--vsfa-npy/--with-baseline")
    print(df.to_string(index=False))
    if args.output_csv:
        df.to_csv(args.output_csv, index=False)


def cmd_visualize(args):
    """Fragment attention overlay (ref ``src/demo_visual.py``)."""
    import cv2
    import jax.numpy as jnp

    from relaxtpu.ops import fragment_pair
    from relaxtpu.visualize import (
        cls_patch_attention,
        fragment_positions,
        last_selfattention,
        map_attention_to_original,
    )

    extractor = _build_extractor(args)
    prev = cv2.imread(args.frame)
    nxt = cv2.imread(args.next_frame)
    residual = np.abs(prev.astype(np.int32) - nxt.astype(np.int32)).astype(np.uint8)
    diff_frag, ori_frag = fragment_pair(jnp.asarray(residual), jnp.asarray(prev))
    positions = fragment_positions(residual)
    attn = last_selfattention(
        extractor.vit, extractor.vit_vars, np.asarray(ori_frag)[..., ::-1] / 255.0
    )
    patch_att = cls_patch_attention(attn).reshape(-1)
    overlay = map_attention_to_original(prev, patch_att, positions)
    out = args.output
    if not os.path.splitext(out)[1]:  # bare name/dir -> a PNG inside it
        out = os.path.join(out, "attention_overlay.png")
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    if not cv2.imwrite(out, overlay):
        raise SystemExit(f"could not write overlay image: {out}")
    print(json.dumps({"overlay": out, "n_patches": len(positions)}))


def cmd_parity(args):
    """Strict-parity readiness vs the reference's shipped artifacts
    (see relaxtpu/parity.py; runs the moment the blobs land)."""
    if args.check in ("head", "demo") and not (
        args.model and args.imputer and args.scaler
    ):
        raise SystemExit("--model/--imputer/--scaler are required for this check")
    if args.check == "all":
        from relaxtpu.parity import all_parity

        out = all_parity(args)
        print(json.dumps(out, indent=2))
        return 0 if out["ok"] else 1
    if args.check == "production":
        from relaxtpu.parity import production_numerics

        out = production_numerics()
        print(json.dumps(out, indent=2))
        return 0 if out.get("ok", True) else 1
    if args.check == "head":
        from relaxtpu.parity import head_parity

        report = head_parity(
            args.dataset, args.features_mat, args.metadata_csv, args.result_mat,
            args.model, args.imputer, args.scaler, args.expected_csv,
            greyscale_report=args.greyscale_report, use_bn=not args.no_bn,
        )
        print(report.to_json())
        return 0 if report.ok else 1
    if args.check == "features":
        from relaxtpu.parity import feature_parity

        out = feature_parity(
            args.video, args.resnet_weights, args.vit_weights,
        )
        print(json.dumps(out, indent=2))
        return 0 if out["ok"] else 1
    from relaxtpu.parity import demo_parity

    out = demo_parity(
        args.video, args.video_type, args.model, args.imputer, args.scaler,
        args.resnet_weights, args.vit_weights, expected_mos=args.expected_mos,
    )
    print(json.dumps(out))
    return 0 if out.get("ok", True) else 1


def cmd_metadata(args):
    """Dataset metadata CSV (ref ``src/data_processing/extract_metadata_NR.py``)."""
    from relaxtpu.io.metadata import (
        extract_metadata,
        metadata_from_csv,
        metadata_from_info_mat,
    )

    if args.info_mat:
        df = metadata_from_info_mat(
            args.info_mat, args.video_dir, video_type=args.video_type,
            framerate_hint=args.framerate,
        )
    elif args.csv:
        df = metadata_from_csv(args.csv, args.video_dir, video_type=args.video_type)
    else:
        df = extract_metadata(args.video_dir)
    df.to_csv(args.output, index=False)
    print(json.dumps({"output": args.output, "n_videos": len(df)}))


def cmd_train_cross(args):
    """Cross-dataset protocol: train on one dataset, test on another
    (ref ``split_train_test.process_cross_dataset`` + model_regression)."""
    import pandas as pd

    from relaxtpu.data.splits import split_cross_dataset
    from relaxtpu.model.protocol import run_fixed_split
    from relaxtpu.model.train import TrainConfig
    from relaxtpu.utils.checkpoint import save_snapshot

    train_df = pd.read_csv(args.train_metadata)
    test_df = pd.read_csv(args.test_metadata)
    x_tr, y_tr, x_te, y_te, _ = split_cross_dataset(
        train_df, test_df, np.load(args.train_features), np.load(args.test_features),
        train_name=args.train_dataset, test_name=args.test_dataset,
    )
    cfg = TrainConfig(use_bn=not args.no_bn, epochs=args.epochs)
    result, _ = run_fixed_split(x_tr, y_tr, x_te, y_te, cfg, progress=print)
    save_snapshot(args.output, result.snapshot)
    print(json.dumps({"srcc": result.srcc, "plcc": result.plcc, "rmse": result.rmse}))


# Subcommands --config intentionally does NOT feed: they consume no RunConfig
# field.  ``metadata`` is a pure ffprobe utility (its --video-type enumerates
# container conventions, not RunConfig datasets) and ``report`` parses
# external training logs.  Every other subcommand in build_parser must appear
# in _apply_config (asserted by tests/test_cli_protocols.py).
CONFIG_EXCLUDED = {"metadata", "report"}


def _apply_config(argv, subparsers) -> str | None:
    """Pre-scan for ``--config``; its RunConfig values become the DEFAULTS of
    every subcommand (explicit flags still win).  Returns the cache dir."""
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None)
    known, _ = pre.parse_known_args(argv)
    if not known.config:
        return None
    from relaxtpu.config import RunConfig

    cfg = RunConfig.load(known.config)
    ex, tr, rt = cfg.extract, cfg.train, cfg.runtime

    def set_defaults(sp, **values):
        sp.set_defaults(**values)
        for a in sp._actions:  # a config-supplied value satisfies a required flag
            if a.required and a.dest in values and values[a.dest] is not None:
                a.required = False

    backbone = dict(
        resnet_weights=ex.resnet_weights, vit_weights=ex.vit_weights,
        bf16=(ex.backbone_dtype == "bfloat16"),
    )
    set_defaults(
        subparsers["extract"],
        dataset=ex.dataset, root=ex.data_root, metadata_dir=ex.metadata_dir,
        output=ex.output_dir, decode_workers=rt.decode_workers,
        dispatch_ahead=rt.dispatch_ahead, profile_dir=rt.profile_dir,
        ingest=ex.ingest, n_data=rt.n_data, n_model=rt.n_model, **backbone,
    )
    set_defaults(
        subparsers["predict"],
        video_type=ex.dataset, ingest=ex.ingest, **backbone,
    )
    set_defaults(
        subparsers["predict-batch"],
        video_type=ex.dataset, ingest=ex.ingest,
        decode_workers=rt.decode_workers, n_data=rt.n_data, n_model=rt.n_model,
        **backbone,
    )
    set_defaults(
        subparsers["serve"],
        video_type=ex.dataset, ingest=ex.ingest, **backbone,
    )
    set_defaults(
        subparsers["train"],
        dataset=ex.dataset, metadata_dir=ex.metadata_dir,
        n_repeats=tr.n_repeats, n_splits=tr.n_splits, batch_size=tr.batch_size,
        epochs=tr.epochs, lr=tr.initial_lr, weight_decay=tr.weight_decay,
        select_criteria=tr.select_criteria, no_bn=not tr.use_bn,
        no_kfold=not tr.kfold,
    )
    set_defaults(
        subparsers["train-lsvq"],
        epochs=tr.epochs, batch_size=tr.batch_size, lr=tr.initial_lr,
        weight_decay=tr.weight_decay, select_criteria=tr.select_criteria,
    )
    set_defaults(
        subparsers["finetune"],
        dataset=ex.dataset, n_repeats=tr.n_repeats, epochs=tr.epochs,
        no_bn=not tr.use_bn,
    )
    set_defaults(
        subparsers["greyscale"],
        dataset=ex.dataset, root=ex.data_root, metadata_dir=ex.metadata_dir,
    )
    set_defaults(subparsers["visualize"], **backbone)
    set_defaults(subparsers["parity"], dataset=ex.dataset, **backbone)
    set_defaults(
        subparsers["warmup"],
        bucket=ex.frame_bucket, ingest=ex.ingest, **backbone,
    )
    set_defaults(
        subparsers["train-cross"], epochs=tr.epochs, no_bn=not tr.use_bn,
    )
    return rt.compilation_cache


def build_parser():
    """(parser, {name: subparser}) — exposed so tests drive the real parser."""
    p = argparse.ArgumentParser(prog="relaxtpu")
    p.add_argument("--config", default=None, help="RunConfig JSON (defaults for all flags)")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_backbone_flags(sp):
        sp.add_argument("--resnet-weights", default=None, help="torchvision resnet50 .pth")
        sp.add_argument("--vit-weights", default=None, help="DINO ViT-B/16 .pth")
        grp = sp.add_mutually_exclusive_group()
        grp.add_argument("--bf16", dest="bf16", action="store_true", default=None,
                         help="bfloat16 backbones (the default on TPU; numerics "
                         "pinned by `parity --check production`)")
        grp.add_argument("--f32", dest="bf16", action="store_false",
                         help="float32 backbones (strict-parity mode; the "
                         "default off-TPU)")

    sp = sub.add_parser("predict")
    sp.add_argument("--video", required=True)
    sp.add_argument("--video-type", default="konvid_1k")
    sp.add_argument("--model", required=True, help=".npz snapshot or reference .pth")
    sp.add_argument("--imputer", required=True)
    sp.add_argument("--scaler", required=True)
    sp.add_argument("--finetuned", action="store_true")
    sp.add_argument("--framerate", type=float, default=None)
    sp.add_argument("--width", type=int, default=None)
    sp.add_argument("--height", type=int, default=None)
    sp.add_argument("--ingest", default="auto", choices=["bgr", "yuv", "auto"],
                    help="auto (default): decoder-native I420 upload + device "
                    "colorspace when available (the fast path; features match "
                    "bgr to <=3 LSB of colorspace rounding); bgr: host "
                    "conversion (strict reference-decode parity)")
    add_backbone_flags(sp)
    sp.set_defaults(fn=cmd_predict)
    subparser_map = {"predict": sp}

    sp = sub.add_parser("predict-batch", help="MOS for many videos, batched dispatch")
    sp.add_argument("--videos", nargs="+", required=True,
                    help="video files and/or directories")
    sp.add_argument("--video-type", default="konvid_1k")
    sp.add_argument("--model", required=True)
    sp.add_argument("--imputer", required=True)
    sp.add_argument("--scaler", required=True)
    sp.add_argument("--finetuned", action="store_true")
    sp.add_argument("--batch", type=lambda v: v if v == "auto" else int(v),
                    default=1,
                    help="videos per device dispatch; 1 (default) = async "
                    "streaming (fastest when transfer bandwidth dominates), "
                    ">1 = batched multi-video program (amortizes dispatch "
                    "round-trips on PCIe-attached hosts); 'auto' probes the "
                    "link at startup and picks the predicted-faster mode")
    sp.add_argument("--decode-workers", type=int, default=4)
    sp.add_argument("--ingest", default="auto", choices=["bgr", "yuv", "auto"])
    sp.add_argument("--output-csv", default=None,
                    help="also write video,predicted_mos CSV (ref log/predict_score shape)")
    sp.add_argument("--n-data", type=int, default=None,
                    help="mesh data-axis size (>1: shard video batches over devices)")
    sp.add_argument("--n-model", type=int, default=1)
    add_backbone_flags(sp)
    sp.set_defaults(fn=cmd_predict_batch)
    subparser_map["predict-batch"] = sp

    sp = sub.add_parser(
        "serve",
        help="persistent scoring server: JSON-lines on stdin -> stdout, "
        "programs/weights stay warm across requests",
    )
    sp.add_argument("--video-type", default="konvid_1k")
    sp.add_argument("--model", required=True, help=".npz snapshot or reference .pth")
    sp.add_argument("--imputer", required=True)
    sp.add_argument("--scaler", required=True)
    sp.add_argument("--finetuned", action="store_true")
    sp.add_argument("--ingest", default="auto", choices=["bgr", "yuv", "auto"])
    sp.add_argument("--in-flight", type=int, default=2,
                    help="videos left enqueued on device while later requests decode")
    sp.add_argument("--warm", nargs="*", default=None, metavar="HxW",
                    help="resolutions to pre-compile at startup, e.g. 540x960")
    sp.add_argument("--warm-counts", nargs="*", type=int, default=(8, 16, 32),
                    help="padded frame/pair counts to pre-compile per "
                    "resolution (each bucketed count is a distinct program)")
    add_backbone_flags(sp)
    sp.set_defaults(fn=cmd_serve)
    subparser_map["serve"] = sp

    sp = sub.add_parser("extract")
    sp.add_argument("--dataset", required=True)
    sp.add_argument("--root", default=None)
    sp.add_argument("--metadata-dir", default="metadata")
    sp.add_argument("--metadata-csv", default=None)
    sp.add_argument("--output", default="features_out")
    sp.add_argument(
        "--mode",
        default="full",
        choices=[
            "full",              # final 35,203 model features (demo_test.py)
            "layer_stack",       # full frames, multi-tap (main_layer_stack.py)
            "layer",             # full frames, single tap (main_layer.py)
            "fragment_layerstack",  # ori+merged fragments (main_fragment_layerstack.py)
            "fragment_pool",        # ViT fragment pool (main_fragment_pool.py)
            "frame_diff",           # whole residual (main_residual.py)
            "optical_flow",         # whole flow image (main_residual.py of)
            "frame_diff_frag",      # residual fragment (main_residual_fragment.py)
            "optical_flow_frag",    # flow fragment (main_residual_fragment.py of)
        ],
    )
    sp.add_argument("--network", default="resnet50", choices=["resnet50", "vit"])
    sp.add_argument("--layer", default="pool", choices=["pool", "last_layer", "layer_stack"])
    sp.add_argument("--save-mat", default=None, help="also export reference-format .mat")
    sp.add_argument("--decode-workers", type=int, default=4)
    sp.add_argument("--dispatch-ahead", type=int, default=2)
    sp.add_argument("--profile-dir", default=None, help="jax profiler trace dir")
    sp.add_argument("--ingest", default="auto", choices=["bgr", "yuv", "auto"],
                    help="auto (default): decoder-native I420 upload + device "
                    "colorspace when available (mode=full; the fast path); "
                    "bgr: host conversion (strict reference-decode parity)")
    sp.add_argument("--n-data", type=int, default=None,
                    help="mesh data-axis size (>1: shard extraction over devices)")
    sp.add_argument("--n-model", type=int, default=1)
    add_backbone_flags(sp)
    sp.set_defaults(fn=cmd_extract)
    subparser_map["extract"] = sp

    sp = sub.add_parser("train")
    sp.add_argument("--dataset", default="konvid_1k")
    sp.add_argument("--metadata-csv", required=True)
    sp.add_argument("--metadata-dir", default="metadata")
    sp.add_argument("--features", required=True, help=".npy (n_videos, 35203)")
    sp.add_argument("--output", default="model/mlp.npz")
    sp.add_argument("--n-repeats", type=int, default=21)
    sp.add_argument("--n-splits", type=int, default=10)
    sp.add_argument("--batch-size", type=int, default=256)
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--lr", type=float, default=0.1)
    sp.add_argument("--weight-decay", type=float, default=0.005)
    sp.add_argument("--select-criteria", default="byrmse")
    sp.add_argument("--no-bn", action="store_true")
    sp.add_argument("--no-kfold", action="store_true")
    sp.add_argument("--greyscale-report", default=None,
                    help="greyscale report csv (auto-located for youtube_ugc)")
    sp.add_argument("--resume-dir", default=None, help="per-repeat checkpoint dir")
    sp.add_argument("--artifacts-dir", default=None,
                    help="write the reference's run artifacts here: train.log "
                    "(hyperparams + per-repeat results), per-repeat loss "
                    "curves, median-repeat logistic-fit scatter")
    sp.set_defaults(fn=cmd_train)
    subparser_map["train"] = sp

    sp = sub.add_parser("train-lsvq")
    sp.add_argument("--train-metadata", required=True)
    sp.add_argument("--test-metadata", required=True)
    sp.add_argument("--train-features", nargs="+", required=True,
                    help=".npy or chunked .mat files (ref ships 3 LSVQ chunks)")
    sp.add_argument("--test-features", nargs="+", required=True)
    sp.add_argument("--train-key", default="lsvq_train")
    sp.add_argument("--test-key", default="lsvq_test")
    sp.add_argument("--output", default="model/mlp_lsvq.npz")
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--batch-size", type=int, default=256)
    sp.add_argument("--lr", type=float, default=1e-2)
    sp.add_argument("--weight-decay", type=float, default=5e-4)
    sp.add_argument("--select-criteria", default="bykrcc")
    sp.set_defaults(fn=cmd_train_lsvq)
    subparser_map["train-lsvq"] = sp

    sp = sub.add_parser("greyscale")
    sp.add_argument("--dataset", required=True)
    sp.add_argument("--root", default=None)
    sp.add_argument("--metadata-dir", default="metadata")
    sp.add_argument("--metadata-csv", default=None)
    sp.add_argument("--output", default=None)
    sp.set_defaults(fn=cmd_greyscale)
    subparser_map["greyscale"] = sp

    sp = sub.add_parser("finetune")
    sp.add_argument("--dataset", required=True)
    sp.add_argument("--metadata-csv", required=True)
    sp.add_argument("--features", required=True)
    sp.add_argument("--base-model", required=True)
    sp.add_argument("--output", default="model/mlp_ft.npz")
    sp.add_argument("--n-repeats", type=int, default=21)
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--no-bn", action="store_true")
    sp.add_argument("--zero-shot", action="store_true",
                    help="evaluate the base model on the target's 21 test "
                    "splits WITHOUT fine-tuning (ref fine_tune.py:216-258)")
    sp.set_defaults(fn=cmd_finetune)
    subparser_map["finetune"] = sp

    sp = sub.add_parser(
        "report",
        help="results tables from run logs (ref reported_result.ipynb)",
    )
    sp.add_argument("--log", action="append", default=[], metavar="METHOD=DATASET=PATH",
                    help="reference-format training log to parse (repeatable)")
    sp.add_argument("--vsfa-npy", action="append", default=[], metavar="DATASET=PATH",
                    help="VSFA results .npy to parse (repeatable)")
    sp.add_argument("--with-baseline", action="store_true",
                    help="append the reference's published intra-dataset rows")
    sp.add_argument("--output-csv", default=None)
    sp.set_defaults(fn=cmd_report)
    subparser_map["report"] = sp

    sp = sub.add_parser("visualize")
    sp.add_argument("--frame", required=True, help="original frame PNG")
    sp.add_argument("--next-frame", required=True, help="successor frame PNG")
    sp.add_argument("--output", default="attention_overlay.png")
    add_backbone_flags(sp)
    sp.set_defaults(fn=cmd_visualize)
    subparser_map["visualize"] = sp

    sp = sub.add_parser("parity")
    sp.add_argument("--check",
                    choices=["head", "demo", "features", "production", "all"],
                    default="head",
                    help="features: diff the full 35,203-dim vector against "
                    "the independent torch+cv2 oracle (no blobs needed); "
                    "production: measure the shipped TPU numerics (DEFAULT-"
                    "precision flow vs cv2, bf16 vs f32 features) on-chip; "
                    "all: run every check whose inputs are present, one "
                    "JSON verdict (the blob-day readiness command)")
    sp.add_argument("--dataset", default="konvid_1k")
    sp.add_argument("--features-mat", default=None)
    sp.add_argument("--metadata-csv", default=None)
    sp.add_argument("--result-mat", default=None)
    sp.add_argument("--expected-csv", default=None, help="log/predict_score/*.csv")
    sp.add_argument("--greyscale-report", default=None)
    sp.add_argument("--model", default=None,
                    help="reference .pth (required for head/demo checks)")
    sp.add_argument("--imputer", default=None)
    sp.add_argument("--scaler", default=None)
    sp.add_argument("--no-bn", action="store_true")
    sp.add_argument("--video", default=None)
    sp.add_argument("--video-type", default="konvid_1k")
    sp.add_argument("--expected-mos", type=float, default=None)
    add_backbone_flags(sp)
    sp.set_defaults(fn=cmd_parity)
    subparser_map["parity"] = sp

    sp = sub.add_parser("warmup", help="pre-compile video programs for resolutions")
    sp.add_argument("--resolutions", nargs="+", default=["540x960", "1080x1920"],
                    help="HxW list, e.g. 540x960 720x1280")
    sp.add_argument("--bucket", type=int, default=8, help="frame-count bucket")
    sp.add_argument("--counts", nargs="+", type=int, default=[8, 16, 32],
                    help="padded frame/pair counts to warm (rounded up to bucket)")
    sp.add_argument("--ingest", default="auto", choices=["bgr", "yuv", "auto"])
    add_backbone_flags(sp)
    sp.set_defaults(fn=cmd_warmup)
    subparser_map["warmup"] = sp

    sp = sub.add_parser("metadata")
    sp.add_argument("--video-dir", required=True)
    sp.add_argument("--output", default="metadata.csv")
    sp.add_argument("--video-type", default="generic",
                    choices=["generic", "lsvq", "live_vqc", "cvd_2014", "live_qualcomm"])
    sp.add_argument("--info-mat", default=None, help="CVD2014/LIVE-Qualcomm info .mat")
    sp.add_argument("--csv", default=None, help="LSVQ/LIVE-VQC source csv")
    sp.add_argument("--framerate", type=float, default=None, help=".yuv framerate hint")
    sp.set_defaults(fn=cmd_metadata)
    subparser_map["metadata"] = sp

    sp = sub.add_parser("train-cross")
    sp.add_argument("--train-dataset", default="youtube_ugc")
    sp.add_argument("--test-dataset", default="cvd_2014")
    sp.add_argument("--train-metadata", required=True)
    sp.add_argument("--test-metadata", required=True)
    sp.add_argument("--train-features", required=True)
    sp.add_argument("--test-features", required=True)
    sp.add_argument("--output", default="model/mlp_cross.npz")
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--no-bn", action="store_true")
    sp.set_defaults(fn=cmd_train_cross)
    subparser_map["train-cross"] = sp

    return p, subparser_map


def main(argv=None):
    import sys as _sys

    logging.basicConfig(level=logging.INFO)
    argv = argv if argv is not None else _sys.argv[1:]
    p, subparser_map = build_parser()
    cache_dir = _apply_config(argv, subparser_map)
    from relaxtpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache(cache_dir)
    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
