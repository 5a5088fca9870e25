"""Full evaluation protocols: repeated holdout (intra-dataset), LSVQ, and
cross-dataset fine-tuning (ref ``model_regression.py:492-716``,
``fine_tune.py``)."""

from __future__ import annotations

import dataclasses
import logging
import math
import time
from typing import Callable

import numpy as np
import pandas as pd
from sklearn.model_selection import train_test_split

from relaxtpu.data.mos import mos_1_100_to_1_5, mos_1_5_to_1_100
from relaxtpu.data.splits import split_other
from relaxtpu.model.metrics import compute_correlation_metrics
from relaxtpu.model.scalers import FeatureScaler
from relaxtpu.model.train import (
    MlpTrainer,
    ModelSnapshot,
    RepeatResult,
    TrainConfig,
    select_median_model,
    train_and_evaluate,
)

log = logging.getLogger("relaxtpu.protocol")


def preprocess_like_reference(x: np.ndarray, y: np.ndarray):
    """ref ``model_regression.py:122-135``: zero nan/inf, impute, minmax;
    NOTE the reference fits train and test scalers INDEPENDENTLY (ref
    :286-288) — reproduced."""
    fs = FeatureScaler.fit(x)
    return fs.fit_transform_like_reference(x).astype(np.float32), np.asarray(y, float), fs


def run_repeated_holdout(
    df: pd.DataFrame,
    features: np.ndarray,
    cfg: TrainConfig,
    grey_indices=None,
    progress: Callable[[str], None] = log.info,
    resume_dir: str | None = None,
    artifacts_dir: str | None = None,
) -> tuple[RepeatResult, float, list[RepeatResult]]:
    """21x {80/20 holdout -> 10-fold CV training -> test metrics}; median model.

    random_state = ceil(8.8 * i) per repeat (ref :555) keeps splits
    bit-identical to the reference.

    ``resume_dir``: persist each repeat's snapshot+metrics; completed repeats
    are skipped on restart (the reference restarts the whole 21x protocol on
    a crash — SURVEY §5 failure handling).

    ``artifacts_dir``: write the reference's run artifacts — per-repeat
    loss-curve figures and the median repeat's logistic-fit scatter
    (ref ``plot_and_save_losses``/``plot_results``,
    ``model_regression.py:163-238``).
    """
    import os

    results: list[RepeatResult] = []
    trainer: MlpTrainer | None = None
    if artifacts_dir:
        os.makedirs(artifacts_dir, exist_ok=True)
    for i in range(1, cfg.n_repeats + 1):
        if resume_dir:
            ck = os.path.join(resume_dir, f"repeat_{i:02d}.npz")
            if os.path.exists(ck):
                data = np.load(ck, allow_pickle=True)
                from relaxtpu.utils.checkpoint import load_snapshot

                results.append(
                    RepeatResult(
                        float(data["srcc"]), float(data["krcc"]), float(data["plcc"]),
                        float(data["rmse"]), list(data["test_vids"]),
                        data["y_test"], data["y_pred"],
                        load_snapshot(os.path.join(resume_dir, f"repeat_{i:02d}_model.npz")),
                    )
                )
                progress(f"repeat {i}: resumed from {ck}")
                continue
        t0 = time.time()
        random_state = math.ceil(8.8 * i)
        x_tr, y_tr, x_te, y_te, test_vids = split_other(
            df, features, test_size=0.2, random_state=random_state, grey_indices=grey_indices
        )
        x_tr, y_tr, _ = preprocess_like_reference(x_tr, y_tr)
        x_te, y_te, _ = preprocess_like_reference(x_te, y_te)

        snapshot, trainer, tr_losses, val_losses = train_and_evaluate(
            x_tr, y_tr, cfg, trainer=trainer
        )
        if artifacts_dir:
            from relaxtpu.utils.plots import plot_losses

            plot_losses(
                tr_losses, val_losses,
                os.path.join(artifacts_dir, f"losses_repeat_{i:02d}.png"),
                title=f"repeat {i}: mean fold losses",
            )
        y_pred = trainer.predict(snapshot, x_te)
        try:
            _, plcc, rmse, srcc, krcc = compute_correlation_metrics(y_te, y_pred)
        except Exception as e:  # curve_fit failure on a degenerate repeat
            progress(f"repeat {i}: metric fit failed ({e}); recording zeros")
            plcc = rmse = srcc = krcc = 0.0
        results.append(
            RepeatResult(srcc, krcc, plcc, rmse, list(test_vids), y_te, y_pred, snapshot)
        )
        if resume_dir:
            os.makedirs(resume_dir, exist_ok=True)
            from relaxtpu.utils.checkpoint import save_snapshot

            save_snapshot(os.path.join(resume_dir, f"repeat_{i:02d}_model.npz"), snapshot)
            np.savez(
                os.path.join(resume_dir, f"repeat_{i:02d}.npz"),
                srcc=srcc, krcc=krcc, plcc=plcc, rmse=rmse,
                test_vids=np.asarray(list(test_vids), dtype=object),
                y_test=y_te, y_pred=y_pred,
            )
        progress(
            f"repeat {i}/{cfg.n_repeats}: SRCC {srcc:.4f} KRCC {krcc:.4f} "
            f"PLCC {plcc:.4f} RMSE {rmse:.4f} ({time.time() - t0:.1f}s)"
        )

    median_result, median_val, _ = select_median_model(results, cfg.select_criteria)
    srccs = [r.srcc for r in results]
    progress(
        f"median test SRCC {np.median(srccs):.4f} "
        f"({cfg.select_criteria} median {median_val:.4f})"
    )
    if artifacts_dir and len(median_result.y_pred):
        from relaxtpu.utils.plots import plot_results

        plot_results(
            median_result.y_test, median_result.y_pred,
            os.path.join(artifacts_dir, "median_scatter.png"),
            title=f"median repeat ({cfg.select_criteria} {median_val:.4f})",
        )
    return median_result, median_val, results


def run_fixed_split(
    x_train: np.ndarray,
    y_train: np.ndarray,
    x_test: np.ndarray,
    y_test: np.ndarray,
    cfg: TrainConfig,
    progress: Callable[[str], None] = log.info,
):
    """LSVQ-style fixed train/test split (single 'repeat'); returns metrics +
    snapshot.  Use cfg.kfold=False/use_bn=False for the 'simple' LSVQ-scale
    variant (ref model_regression_simple.py)."""
    x_train, y_train, _ = preprocess_like_reference(x_train, y_train)
    x_test, y_test, _ = preprocess_like_reference(x_test, y_test)
    snapshot, trainer, _, _ = train_and_evaluate(x_train, y_train, cfg)
    y_pred = trainer.predict(snapshot, x_test)
    _, plcc, rmse, srcc, krcc = compute_correlation_metrics(y_test, y_pred)
    progress(f"fixed split: SRCC {srcc:.4f} KRCC {krcc:.4f} PLCC {plcc:.4f} RMSE {rmse:.4f}")
    return RepeatResult(srcc, krcc, plcc, rmse, [], y_test, y_pred, snapshot), trainer


@dataclasses.dataclass
class FineTuneConfig:
    n_repeats: int = 21
    epochs: int = 20
    batch_size: int = 256
    initial_lr: float = 1e-2
    weight_decay: float = 5e-4
    optimizer_type: str = "sgd"
    use_swa: bool = True
    swa_start_frac: float = 0.75
    l1_w: float = 0.6
    rank_w: float = 1.0
    select_criteria: str = "byrmse"
    seed: int = 0


def fine_tune(
    base_snapshot: ModelSnapshot,
    trainer: MlpTrainer,
    x: np.ndarray,
    y: np.ndarray,
    ft_cfg: FineTuneConfig,
    mos_is_1_5: bool,
    progress: Callable[[str], None] = log.info,
) -> tuple[RepeatResult, list[RepeatResult]]:
    """Cross-dataset adaptation (ref ``fine_tune.py:130-193,316-385``):
    21x {80/20 split of the target set; 20-epoch SGD fine-tune from the
    LSVQ-trained weights with SWA from 75%; eval}; median-by-criteria.

    MOS in 1-5 datasets (konvid/youtube) is mapped to 1-100 for training and
    predictions mapped back for metrics (ref :204-210).
    """
    results: list[RepeatResult] = []
    y100 = mos_1_5_to_1_100(y) if mos_is_1_5 else np.asarray(y, float)
    cfg = TrainConfig(
        epochs=ft_cfg.epochs,
        batch_size=ft_cfg.batch_size,
        initial_lr=ft_cfg.initial_lr,
        weight_decay=ft_cfg.weight_decay,
        optimizer_type=ft_cfg.optimizer_type,
        use_swa=ft_cfg.use_swa,
        swa_start_frac=ft_cfg.swa_start_frac,
        l1_w=ft_cfg.l1_w,
        rank_w=ft_cfg.rank_w,
        select_criteria=ft_cfg.select_criteria,
        use_bn=trainer.cfg.use_bn,
        hidden_features=trainer.cfg.hidden_features,
        drop_rate=trainer.cfg.drop_rate,
        kfold=False,
        seed=ft_cfg.seed,
    )
    ft_trainer = MlpTrainer(cfg, trainer.input_dim)

    for i in range(1, ft_cfg.n_repeats + 1):
        rs = math.ceil(8.8 * i)
        idx_tr, idx_te = train_test_split(np.arange(len(x)), test_size=0.2, random_state=rs)
        x_tr, y_tr = x[idx_tr], y100[idx_tr]
        x_te, y_te = x[idx_te], y100[idx_te]

        snapshot = _fine_tune_once(base_snapshot, ft_trainer, x_tr, y_tr, cfg, seed=rs)
        y_pred = ft_trainer.predict(snapshot, x_te)
        if mos_is_1_5:
            y_te_m = mos_1_100_to_1_5(y_te)
            y_pred_m = mos_1_100_to_1_5(y_pred)
        else:
            y_te_m, y_pred_m = y_te, y_pred
        _, plcc, rmse, srcc, krcc = compute_correlation_metrics(y_te_m, y_pred_m)
        results.append(RepeatResult(srcc, krcc, plcc, rmse, [], y_te_m, y_pred_m, snapshot))
        progress(f"ft repeat {i}: SRCC {srcc:.4f} KRCC {krcc:.4f} PLCC {plcc:.4f} RMSE {rmse:.4f}")

    median_result, _, _ = select_median_model(results, ft_cfg.select_criteria)
    return median_result, results


def zero_shot_eval(
    base_snapshot: ModelSnapshot,
    trainer: MlpTrainer,
    x: np.ndarray,
    y: np.ndarray,
    ft_cfg: FineTuneConfig,
    mos_is_1_5: bool,
    progress: Callable[[str], None] = log.info,
) -> tuple[RepeatResult, list[RepeatResult]]:
    """w/o-fine-tune evaluation (ref ``fine_tune.py:216-258``): the
    LSVQ-trained model scored on the 21 test splits of the target dataset
    without any adaptation."""
    results: list[RepeatResult] = []
    y100 = mos_1_5_to_1_100(y) if mos_is_1_5 else np.asarray(y, float)
    for i in range(1, ft_cfg.n_repeats + 1):
        rs = math.ceil(8.8 * i)
        _, idx_te = train_test_split(np.arange(len(x)), test_size=0.2, random_state=rs)
        y_pred = trainer.predict(base_snapshot, x[idx_te])
        y_te = y100[idx_te]
        if mos_is_1_5:
            y_te, y_pred = mos_1_100_to_1_5(y_te), mos_1_100_to_1_5(y_pred)
        _, plcc, rmse, srcc, krcc = compute_correlation_metrics(y_te, y_pred)
        results.append(RepeatResult(srcc, krcc, plcc, rmse, [], y_te, y_pred, base_snapshot))
        progress(f"zero-shot repeat {i}: SRCC {srcc:.4f} RMSE {rmse:.4f}")
    median_result, _, _ = select_median_model(results, ft_cfg.select_criteria)
    return median_result, results


def _fine_tune_once(base, trainer: MlpTrainer, x_tr, y_tr, cfg: TrainConfig, seed: int):
    """One fine-tune run: no kfold, no val-based selection — train the full
    epochs from the base weights, SWA-average the tail, update BN
    (ref fine_tune.py:130-193)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    params = jax.tree.map(jnp.asarray, base.params)
    batch_stats = jax.tree.map(jnp.asarray, base.batch_stats)
    opt_state = trainer.tx.init(params)
    x_tr_dev = jnp.asarray(x_tr, jnp.float32)
    y_tr_dev = jnp.asarray(y_tr, jnp.float32)
    swa_start = int(cfg.epochs * cfg.swa_start_frac) if cfg.use_swa else cfg.epochs
    swa_params, swa_n = None, 0
    key = jax.random.PRNGKey(seed)

    from relaxtpu.model.train import reference_lr_sequence

    epoch_lrs = reference_lr_sequence(cfg)
    # the reference fine-tune loader is shuffle=False (fine_tune.py:142) —
    # every epoch sees the SAME batch grouping (rank-loss pairs included)
    perm = np.arange(len(x_tr))
    for epoch in range(cfg.epochs):
        opt_state.hyperparams["lr"] = jnp.asarray(epoch_lrs[epoch], jnp.float32)
        # on-device epoch scan (same batch order + dropout key sequence as
        # the per-batch loop it replaces — see MlpTrainer.train_epoch)
        params, batch_stats, opt_state, _, key = trainer.train_epoch(
            params, batch_stats, opt_state, x_tr_dev, y_tr_dev, perm, key
        )
        if cfg.use_swa and epoch >= swa_start:
            if swa_params is None:
                swa_params, swa_n = jax.tree.map(lambda p: p, params), 1
            else:
                swa_n += 1
                swa_params = jax.tree.map(lambda a, p: a + (p - a) / swa_n, swa_params, params)

    snap = ModelSnapshot(swa_params if swa_params is not None else params, batch_stats)
    if cfg.use_swa:
        snap = trainer.update_bn(snap, x_tr_dev, rng)
    return snap
