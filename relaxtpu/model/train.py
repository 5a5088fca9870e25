"""Training protocol for the MOS-regression head, in optax.

Faithful port of the reference protocol semantics
(``/root/reference/src/model_regression.py:335-471,492-716``):

- per repeat: split -> preprocess -> k-fold CV (KFold shuffle rs=42, ref :357)
- per fold: fresh Mlp; SGD(momentum .9, weight decay as torch L2) +
  CosineAnnealing(T_max=epochs, eta_min=1e-5) or Adam + StepLR(2, 0.95);
  SWA from 70% of epochs (equal parameter average; the SWA eval model keeps
  its initial BN buffers, matching torch AveragedModel(use_buffers=False),
  ref :388) with SWALR cosine anneal toward swa_lr;
- best-model selection ACROSS folds per epoch by val RMSE or KRCC
  (ref ``update_best_model:324-333``); early stopping (patience on val loss)
  activates only once SWA engages and re-snapshots the RAW model (ref
  :440-452 — a reference quirk, reproduced);
- after each fold, ``update_bn`` recomputes BN buffers over the fold's train
  split with torch's cumulative-average semantics (ref :454-459);
- across repeats: the median model by test RMSE/KRCC is selected (ref
  :659-697).

Splits use sklearn (KFold / train_test_split) so they are bit-identical to
the reference for equal random states.  Batch shuffling is numpy-seeded and
therefore reproducible, though not bit-identical to torch's RNG — parity is
at the protocol/metric level.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from sklearn.model_selection import KFold, train_test_split

from relaxtpu.model.losses import mae_and_rank_loss
from relaxtpu.model.metrics import compute_correlation_metrics
from relaxtpu.model.mlp import Mlp


@dataclasses.dataclass
class TrainConfig:
    n_repeats: int = 21
    n_splits: int = 10
    batch_size: int = 256
    epochs: int = 20
    hidden_features: int = 256
    drop_rate: float = 0.1
    loss_type: str = "MAERankLoss"
    optimizer_type: str = "sgd"  # 'sgd' | 'adam' (torch L2-Adam) | 'adamw'
    select_criteria: str = "byrmse"  # 'byrmse' | 'bykrcc'
    initial_lr: float = 0.1
    weight_decay: float = 0.005
    patience: int = 5
    use_swa: bool = True
    l1_w: float = 0.6
    rank_w: float = 1.0
    use_bn: bool = True
    kfold: bool = True  # False: single 80/20 val split (model_regression_simple)
    swa_start_frac: float = 0.7
    swa_anneal_epochs: int = 10
    eta_min: float = 1e-5
    seed: int = 0


def reference_lr_sequence(cfg: TrainConfig, swa_start_frac: float | None = None) -> list[float]:
    """The lr actually used during each epoch by the reference loop.

    The reference steps its base scheduler (CosineAnnealingLR for sgd,
    StepLR(2, 0.95) otherwise) after EVERY epoch, and additionally steps
    SWALR(swa_lr=initial_lr, cos anneal) once SWA engages
    (``model_regression.py:408-416``, ``fine_tune.py:175-179`` — note the
    torch SWA recipe would use if/else; the reference runs BOTH).  torch
    schedulers are stateful recurrences over the CURRENT group lr, so the two
    couple: each SWALR step un-mixes its own previous interpolation from an
    lr the base scheduler has meanwhile moved.  The composite makes the
    SWA-phase lr dip before climbing back toward initial_lr — nothing like a
    clean anneal.  This simulates the exact recurrences (pinned step-for-step
    against real torch schedulers in tests/test_train_dynamics.py).
    """
    frac = cfg.swa_start_frac if swa_start_frac is None else swa_start_frac
    swa_start = int(cfg.epochs * frac) if cfg.use_swa else cfg.epochs
    k = max(1, cfg.swa_anneal_epochs)
    anneal = lambda t: (1 - math.cos(math.pi * min(max(t, 0.0), 1.0))) / 2  # noqa: E731
    lrs = []
    lr = cfg.initial_lr
    for e in range(cfg.epochs):
        lrs.append(lr)
        # base scheduler step (torch recurrence reading the current lr)
        if cfg.optimizer_type == "sgd":  # CosineAnnealingLR(T_max=epochs)
            num = 1 + math.cos(math.pi * (e + 1) / cfg.epochs)
            den = 1 + math.cos(math.pi * e / cfg.epochs)
            lr = num / den * (lr - cfg.eta_min) + cfg.eta_min
        elif (e + 1) % 2 == 0:  # StepLR(step_size=2, gamma=0.95)
            lr = lr * 0.95
        if cfg.use_swa and e >= swa_start:  # SWALR.step(), s = 1, 2, ...
            s = e - swa_start + 1
            swa_lr = cfg.initial_lr  # the reference passes swa_lr=initial_lr
            prev_alpha = anneal((s - 1) / k)
            base = swa_lr if prev_alpha == 1 else (lr - prev_alpha * swa_lr) / (1 - prev_alpha)
            alpha = anneal(s / k)
            lr = swa_lr * alpha + base * (1 - alpha)
    return lrs


def _make_tx(cfg: TrainConfig) -> optax.GradientTransformation:
    if cfg.optimizer_type == "sgd":
        inner = lambda lr: optax.chain(  # noqa: E731
            optax.add_decayed_weights(cfg.weight_decay),
            optax.sgd(lr, momentum=0.9),
        )
    elif cfg.optimizer_type == "adam":
        inner = lambda lr: optax.chain(  # noqa: E731
            optax.add_decayed_weights(cfg.weight_decay),
            optax.adam(lr),
        )
    else:  # adamw (used by fine-tune, ref fine_tune.py:155)
        inner = lambda lr: optax.adamw(lr, weight_decay=cfg.weight_decay)  # noqa: E731
    return optax.inject_hyperparams(inner)(lr=cfg.initial_lr)


@dataclasses.dataclass
class ModelSnapshot:
    """A selected model: parameters + BN buffers frozen at selection time."""

    params: Any
    batch_stats: Any


class MlpTrainer:
    """Holds the model and jitted train/eval programs for one input dim."""

    def __init__(self, cfg: TrainConfig, input_dim: int):
        self.cfg = cfg
        self.input_dim = input_dim
        self.model = Mlp(
            hidden_features=cfg.hidden_features,
            drop_rate=cfg.drop_rate,
            use_bn=cfg.use_bn,
        )
        self.tx = _make_tx(cfg)
        self._step = jax.jit(self._train_step)
        self._eval = jax.jit(self._eval_batch)
        self._epoch = jax.jit(self._epoch_scan)

    # ----------------------------------------------------------- jitted fns
    def _train_step(self, params, batch_stats, opt_state, x, y, key):
        def loss_fn(p):
            out, mut = self.model.apply(
                {"params": p, "batch_stats": batch_stats},
                x,
                train=True,
                rngs={"dropout": key},
                mutable=["batch_stats"],
            )
            loss = mae_and_rank_loss(out, y, self.cfg.l1_w, self.cfg.rank_w)
            return loss, mut["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    def _eval_batch(self, params, batch_stats, x, y):
        out = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=False
        ).reshape(-1)
        loss = mae_and_rank_loss(out, y, self.cfg.l1_w, self.cfg.rank_w)
        return out, loss

    def _epoch_scan(self, params, batch_stats, opt_state, xb_steps, yb_steps, keys):
        """All full-size batches of one epoch as ONE device program.

        A per-batch Python loop costs a dispatch round-trip plus a blocking
        loss fetch per ~0.1 ms of math — on a tunneled TPU that is ~1000x
        overhead.  Batches arrive PRE-PERMUTED as scan xs of shape
        (n_steps, batch, dim): scan slices xs natively per iteration, whereas
        gathering rows from the full feature matrix inside the body made XLA
        treat the multi-GB matrix as a loop operand (measured ~1.5 s/step).
        ``keys`` is the same per-step dropout key sequence as the loop this
        replaces; semantics are step-for-step identical, including BN batch
        statistics.  The ragged final batch (reference DataLoader keeps it)
        runs as a separate ``_step`` call.
        """

        def body(carry, inp):
            params, batch_stats, opt_state = carry
            xb, yb, key = inp
            params, batch_stats, opt_state, loss = self._train_step(
                params, batch_stats, opt_state, xb, yb, key
            )
            return (params, batch_stats, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), (xb_steps, yb_steps, keys)
        )
        return params, batch_stats, opt_state, losses

    def train_epoch(self, params, batch_stats, opt_state, x_dev, y_dev, perm, key):
        """One epoch over device-resident (x_dev, y_dev); returns the epoch's
        summed loss*count as a host float plus the advanced carry/key.

        The shuffle materializes one permuted copy of the fold on device
        (a single row-gather per epoch, freed at the next epoch) so the scan
        can consume contiguous slices."""
        bs = self.cfg.batch_size
        n = len(perm)
        n_full = n // bs
        keys = []
        for _ in range(n_full + (1 if n % bs else 0)):
            key, dk = jax.random.split(key)
            keys.append(dk)
        perm_dev = jnp.asarray(perm)
        x_perm = x_dev[perm_dev]
        y_perm = y_dev[perm_dev]
        total = 0.0
        if n_full:
            d = x_dev.shape[1]
            xb_steps = x_perm[: n_full * bs].reshape(n_full, bs, d)
            yb_steps = y_perm[: n_full * bs].reshape(n_full, bs)
            kstack = jnp.stack(keys[:n_full])
            params, batch_stats, opt_state, losses = self._epoch(
                params, batch_stats, opt_state, xb_steps, yb_steps, kstack
            )
            total += float(jnp.sum(losses)) * bs
        if n % bs:
            params, batch_stats, opt_state, loss = self._step(
                params, batch_stats, opt_state,
                x_perm[n_full * bs :], y_perm[n_full * bs :], keys[-1]
            )
            total += float(loss) * (n % bs)
        return params, batch_stats, opt_state, total, key

    # ------------------------------------------------------------- utilities
    def init_variables(self, key) -> dict:
        dummy = jnp.zeros((2, self.input_dim), jnp.float32)
        variables = self.model.init(key, dummy, train=False)
        return {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
        }

    def predict(self, snapshot: ModelSnapshot, x: np.ndarray, batch_size: int = 4096) -> np.ndarray:
        out = []
        for i in range(0, len(x), batch_size):
            xb = jnp.asarray(x[i : i + batch_size], jnp.float32)
            yb = jnp.zeros(xb.shape[0], jnp.float32)
            pred, _ = self._eval(snapshot.params, snapshot.batch_stats, xb, yb)
            out.append(np.asarray(pred))
        return np.concatenate(out)

    def evaluate_loss(self, snapshot: ModelSnapshot, x, y, batch_size: int) -> tuple[float, np.ndarray]:
        """Reference ``evaluate:308-322``: size-weighted mean of batch losses."""
        total, preds = 0.0, []
        for i in range(0, len(x), batch_size):
            xb = jnp.asarray(x[i : i + batch_size], jnp.float32)
            yb = jnp.asarray(y[i : i + batch_size], jnp.float32)
            pred, loss = self._eval(snapshot.params, snapshot.batch_stats, xb, yb)
            preds.append(np.asarray(pred))
            total += float(loss) * len(xb)
        return total / len(x), np.concatenate(preds)

    def update_bn(self, snapshot: ModelSnapshot, x: np.ndarray, rng: np.random.Generator) -> ModelSnapshot:
        """torch swa_utils.update_bn: reset buffers, cumulative average of
        per-batch stats of the pre-BN activations (ref :454-459).

        Runs on device (``x`` may be a device array — train_and_evaluate
        passes the resident fold): the host-numpy version burned minutes of
        single-core matmul per protocol while the chip idled.  The ragged
        final batch keeps its own unbiased variance, matching torch."""
        if not self.cfg.use_bn:
            return snapshot
        idx = rng.permutation(len(x))
        fc1 = snapshot.params["fc1"]
        bs = self.cfg.batch_size
        x_dev = jnp.asarray(x, jnp.float32)
        idx_dev = jnp.asarray(idx)
        mean_acc = None
        var_acc = None
        n_seen = 0
        for i in range(0, len(x), bs):
            xb = jnp.take(x_dev, idx_dev[i : i + bs], axis=0)
            bmean, bvar = _bn_batch_stats(xb, fc1["kernel"], fc1["bias"])
            n_seen += 1
            if mean_acc is None:
                mean_acc, var_acc = bmean, bvar
            else:
                mean_acc = mean_acc + (bmean - mean_acc) / n_seen
                var_acc = var_acc + (bvar - var_acc) / n_seen
        new_stats = dict(snapshot.batch_stats)
        new_stats["bn1"] = {
            "mean": jnp.asarray(mean_acc, jnp.float32),
            "var": jnp.asarray(var_acc, jnp.float32),
        }
        return ModelSnapshot(params=snapshot.params, batch_stats=new_stats)


@jax.jit
def _bn_batch_stats(xb, kernel, bias):
    """Pre-BN activation batch mean + unbiased variance (device-side)."""
    h = xb @ kernel + bias
    n = xb.shape[0]
    bmean = h.mean(axis=0)
    bvar = h.var(axis=0) * (n / max(n - 1, 1))
    return bmean, bvar


def _is_better(criteria: str, best: float, cur: float) -> bool:
    return cur < best if criteria == "byrmse" else cur > best


def train_and_evaluate(
    x_train: np.ndarray,
    y_train: np.ndarray,
    cfg: TrainConfig,
    trainer: MlpTrainer | None = None,
    log: Callable[[str], None] = lambda s: None,
):
    """K-fold (or single-split) training; returns (best ModelSnapshot,
    per-fold train losses, per-fold val losses)."""
    trainer = trainer or MlpTrainer(cfg, x_train.shape[1])
    rng = np.random.default_rng(cfg.seed)

    if cfg.kfold:
        kf = KFold(n_splits=cfg.n_splits, shuffle=True, random_state=42)
        folds = list(kf.split(x_train))
    else:
        tr_idx, val_idx = train_test_split(
            np.arange(len(x_train)), test_size=0.2, random_state=42
        )
        folds = [(tr_idx, val_idx)]

    best_snapshot: ModelSnapshot | None = None
    best_metric = float("inf") if cfg.select_criteria == "byrmse" else float("-inf")
    all_train_losses: list[list[float]] = []
    all_val_losses: list[list[float]] = []
    swa_start = int(cfg.epochs * cfg.swa_start_frac) if cfg.use_swa else cfg.epochs

    # The feature matrix uploads ONCE (multi-GB at LSVQ scale; the transfer,
    # not the math, dominates MLP training) — folds are device-side gathers.
    x_all_dev = jnp.asarray(x_train, jnp.float32)
    y_all_dev = jnp.asarray(y_train, jnp.float32)

    for fold, (tr_idx, val_idx) in enumerate(folds):
        x_tr, y_tr = x_train[tr_idx], y_train[tr_idx]
        x_val, y_val = x_train[val_idx], y_train[val_idx]
        x_tr_dev = jnp.take(x_all_dev, jnp.asarray(tr_idx), axis=0)
        y_tr_dev = jnp.take(y_all_dev, jnp.asarray(tr_idx), axis=0)
        x_val_dev = jnp.take(x_all_dev, jnp.asarray(val_idx), axis=0)
        y_val_dev = jnp.take(y_all_dev, jnp.asarray(val_idx), axis=0)

        key = jax.random.PRNGKey(rng.integers(0, 2**31 - 1))
        key, init_key = jax.random.split(key)
        variables = trainer.init_variables(init_key)
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        init_stats = jax.tree.map(lambda a: a, batch_stats)  # SWA eval buffers
        opt_state = trainer.tx.init(params)

        swa_params = None
        swa_n = 0
        epoch_lrs = reference_lr_sequence(cfg)

        train_losses: list[float] = []
        val_losses: list[float] = []
        best_val_loss = float("inf")
        epochs_no_improve = 0
        early_stop_active = False

        for epoch in range(cfg.epochs):
            # ---- learning rate (the reference's coupled scheduler sequence)
            opt_state.hyperparams["lr"] = jnp.asarray(epoch_lrs[epoch], jnp.float32)

            # ---- one epoch (device-side scan over batches; same shuffle,
            # same per-step dropout key sequence as the loop it replaced)
            perm = rng.permutation(len(x_tr))
            params, batch_stats, opt_state, epoch_loss, key = trainer.train_epoch(
                params, batch_stats, opt_state, x_tr_dev, y_tr_dev, perm, key
            )
            train_losses.append(epoch_loss / len(x_tr))

            # ---- SWA parameter averaging (equal average, ref :409-411)
            if cfg.use_swa and epoch >= swa_start:
                if swa_params is None:
                    swa_params = jax.tree.map(lambda p: p, params)
                    swa_n = 1
                else:
                    swa_n += 1
                    swa_params = jax.tree.map(
                        lambda a, p: a + (p - a) / swa_n, swa_params, params
                    )
                early_stop_active = True

            # ---- evaluate current model (SWA model once engaged, ref :419)
            if cfg.use_swa and epoch >= swa_start:
                current = ModelSnapshot(swa_params, init_stats)
            else:
                current = ModelSnapshot(params, batch_stats)
            val_loss, y_val_pred = trainer.evaluate_loss(
                current, x_val_dev, y_val_dev, cfg.batch_size
            )
            val_losses.append(val_loss)

            try:
                _, _, rmse_val, _, krcc_val = compute_correlation_metrics(y_val, y_val_pred)
            except Exception:
                rmse_val, krcc_val = float("inf"), float("-inf")
            cur_metric = rmse_val if cfg.select_criteria == "byrmse" else krcc_val
            if _is_better(cfg.select_criteria, best_metric, cur_metric):
                best_metric = cur_metric
                best_snapshot = ModelSnapshot(
                    jax.tree.map(lambda a: a, current.params),
                    jax.tree.map(lambda a: a, current.batch_stats),
                )
                log(
                    f"fold {fold + 1} epoch {epoch + 1}: new best "
                    f"{cfg.select_criteria}={cur_metric:.4f} (val RMSE {rmse_val:.4f})"
                )

            # ---- early stopping (active only after SWA starts, ref :440-452)
            if early_stop_active:
                if val_loss < best_val_loss:
                    best_val_loss = val_loss
                    # reference quirk: snapshots the RAW model here (ref :445)
                    best_snapshot = ModelSnapshot(
                        jax.tree.map(lambda a: a, params),
                        jax.tree.map(lambda a: a, batch_stats),
                    )
                    epochs_no_improve = 0
                else:
                    epochs_no_improve += 1
                    if epochs_no_improve >= cfg.patience:
                        log(f"fold {fold + 1}: early stop after {epoch + 1} epochs")
                        break

        # degenerate folds (tiny val sets where every metric fit fails) would
        # otherwise leave no selection — fall back to the final raw model
        if best_snapshot is None:
            best_snapshot = ModelSnapshot(
                jax.tree.map(lambda a: a, params), jax.tree.map(lambda a: a, batch_stats)
            )

        # ---- SWA BN recalibration on this fold's train split (ref :454-459)
        if cfg.use_swa and best_snapshot is not None:
            best_snapshot = trainer.update_bn(best_snapshot, x_tr_dev, rng)

        all_train_losses.append(train_losses)
        all_val_losses.append(val_losses)
        pad = lambda ls: [x + [x[-1]] * (max(map(len, ls)) - len(x)) for x in ls]  # noqa: E731
        all_train_losses = pad(all_train_losses)
        all_val_losses = pad(all_val_losses)

    return best_snapshot, trainer, all_train_losses, all_val_losses


@dataclasses.dataclass
class RepeatResult:
    srcc: float
    krcc: float
    plcc: float
    rmse: float
    test_vids: list
    y_test: np.ndarray
    y_pred: np.ndarray
    snapshot: ModelSnapshot


def select_median_model(results: list[RepeatResult], criteria: str) -> tuple[RepeatResult, float, np.ndarray]:
    """Median-by-RMSE/KRCC model across repeats (ref :659-697)."""
    vals = np.nan_to_num(np.array([r.rmse if criteria == "byrmse" else r.krcc for r in results]))
    median = np.median(vals)
    idx = np.where(vals == median)[0]
    if len(idx) == 0:  # even count: median not attained; take closest
        idx = [int(np.argmin(np.abs(vals - median)))]
    return results[int(idx[0])], float(median), vals
