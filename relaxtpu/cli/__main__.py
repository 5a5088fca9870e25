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
import sys

import numpy as np


def _build_extractor(args):
    import jax
    import jax.numpy as jnp

    from relaxtpu.features.pipeline import FeatureExtractor
    from relaxtpu.models import ResNet50, ViT, port_torch_resnet50, port_torch_vit, load_torch_checkpoint

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
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


def cmd_predict(args):
    from relaxtpu.model.mlp import port_torch_mlp
    from relaxtpu.model.scalers import FeatureScaler
    from relaxtpu.predict import VideoQualityPredictor

    extractor = _build_extractor(args)
    if args.model.endswith(".npz"):
        from relaxtpu.utils.checkpoint import load_snapshot

        snap = load_snapshot(args.model)
        variables = {"params": snap.params, "batch_stats": snap.batch_stats}
    else:  # reference .pth
        from relaxtpu.models.porters import load_torch_checkpoint

        variables = port_torch_mlp(load_torch_checkpoint(args.model))
    scaler = FeatureScaler.load_reference_pkls(args.imputer, args.scaler)
    predictor = VideoQualityPredictor(
        extractor, variables, scaler, video_type=args.video_type, is_finetune=args.finetuned
    )
    mos = predictor.predict_file(args.video, framerate=args.framerate,
                                 width=args.width, height=args.height)
    print(json.dumps({"video": args.video, "predicted_mos": mos}))


def cmd_extract(args):
    import pandas as pd

    from relaxtpu.data.store import FeatureStore
    from relaxtpu.io.datasets import data_root, get_dataset, load_metadata
    from relaxtpu.io.video import decode_video_inputs

    spec = get_dataset(args.dataset)
    df = load_metadata(spec, args.metadata_dir) if args.metadata_csv is None else pd.read_csv(args.metadata_csv)
    store = FeatureStore(args.output)
    extractor = _build_extractor(args)
    root = data_root(args.root)

    for i, row in df.iterrows():
        if store.has(args.dataset, i):
            continue
        path = spec.video_path(root, str(row["vid"]))
        frames, prev, nxt = decode_video_inputs(
            path, row.get("framerate"), row.get("width"), row.get("height")
        )
        stack, vit_stats = extractor.frame_features(frames)
        frag_rn, frag_vit = extractor.pair_features(prev, nxt)
        n = min(len(stack), len(frag_rn))
        per_frame = np.concatenate(
            [stack[:n], vit_stats[:n], frag_rn[:n], frag_vit[:n]], axis=-1
        )
        store.put(args.dataset, i, per_frame)
        logging.info("extracted %s [%d/%d]", row["vid"], i + 1, len(df))
    mat = store.assemble(args.dataset, len(df))
    np.save(f"{args.output}/{args.dataset}_features.npy", mat)
    print(json.dumps({"dataset": args.dataset, "shape": list(mat.shape)}))


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
    median, median_val, results = run_repeated_holdout(df, features, cfg, progress=print)
    save_snapshot(args.output, median.snapshot)
    print(json.dumps({
        "median_srcc": float(np.median([r.srcc for r in results])),
        "median_krcc": float(np.median([r.krcc for r in results])),
        "median_plcc": float(np.median([r.plcc for r in results])),
        "median_rmse": float(np.median([r.rmse for r in results])),
        "model": args.output,
    }))


def cmd_finetune(args):
    import pandas as pd

    from relaxtpu.model.protocol import FineTuneConfig, fine_tune
    from relaxtpu.model.train import MlpTrainer, TrainConfig
    from relaxtpu.utils.checkpoint import load_snapshot, save_snapshot

    df = pd.read_csv(args.metadata_csv)
    features = np.load(args.features)
    y = df["mos"].to_numpy(float)
    base = load_snapshot(args.base_model)
    trainer = MlpTrainer(TrainConfig(use_bn=not args.no_bn), features.shape[1])
    ft = FineTuneConfig(n_repeats=args.n_repeats, epochs=args.epochs)
    median, results = fine_tune(
        base, trainer, features, y, ft,
        mos_is_1_5=args.dataset in ("konvid_1k", "youtube_ugc"), progress=print,
    )
    save_snapshot(args.output, median.snapshot)
    print(json.dumps({
        "median_srcc": float(np.median([r.srcc for r in results])),
        "median_rmse": float(np.median([r.rmse for r in results])),
        "model": args.output,
    }))


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
    cv2.imwrite(args.output, overlay)
    print(json.dumps({"overlay": args.output, "n_patches": len(positions)}))


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


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    from relaxtpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser(prog="relaxtpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add_backbone_flags(sp):
        sp.add_argument("--resnet-weights", default=None, help="torchvision resnet50 .pth")
        sp.add_argument("--vit-weights", default=None, help="DINO ViT-B/16 .pth")
        sp.add_argument("--bf16", action="store_true", help="bfloat16 backbones")

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
    add_backbone_flags(sp)
    sp.set_defaults(fn=cmd_predict)

    sp = sub.add_parser("extract")
    sp.add_argument("--dataset", required=True)
    sp.add_argument("--root", default=None)
    sp.add_argument("--metadata-dir", default="metadata")
    sp.add_argument("--metadata-csv", default=None)
    sp.add_argument("--output", default="features_out")
    add_backbone_flags(sp)
    sp.set_defaults(fn=cmd_extract)

    sp = sub.add_parser("train")
    sp.add_argument("--metadata-csv", required=True)
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
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("finetune")
    sp.add_argument("--dataset", required=True)
    sp.add_argument("--metadata-csv", required=True)
    sp.add_argument("--features", required=True)
    sp.add_argument("--base-model", required=True)
    sp.add_argument("--output", default="model/mlp_ft.npz")
    sp.add_argument("--n-repeats", type=int, default=21)
    sp.add_argument("--epochs", type=int, default=20)
    sp.add_argument("--no-bn", action="store_true")
    sp.set_defaults(fn=cmd_finetune)

    sp = sub.add_parser("visualize")
    sp.add_argument("--frame", required=True, help="original frame PNG")
    sp.add_argument("--next-frame", required=True, help="successor frame PNG")
    sp.add_argument("--output", default="attention_overlay.png")
    add_backbone_flags(sp)
    sp.set_defaults(fn=cmd_visualize)

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

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
