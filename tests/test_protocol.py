"""End-to-end training-protocol tests on synthetic learnable data."""
import numpy as np
import pandas as pd
import pytest

from relaxtpu.model.protocol import (
    FineTuneConfig,
    fine_tune,
    run_fixed_split,
    run_repeated_holdout,
)
from relaxtpu.model.train import MlpTrainer, TrainConfig


def synthetic_dataset(rng, n=150, d=48):
    """Features linearly + nonlinearly predictive of MOS."""
    w = rng.normal(0, 1, d)
    x = rng.normal(0, 1, (n, d))
    mos = 3 + 1.5 * np.tanh(x @ w / np.sqrt(d)) + rng.normal(0, 0.1, n)
    df = pd.DataFrame({"vid": [f"v{i}" for i in range(n)], "mos": mos, "framerate": 24})
    return df, x.astype(np.float32)


@pytest.mark.slow
def test_repeated_holdout_learns(rng):
    df, x = synthetic_dataset(rng)
    cfg = TrainConfig(
        n_repeats=3, n_splits=3, epochs=20, batch_size=32, initial_lr=0.1,
        hidden_features=32, use_swa=True, patience=5,
    )
    median, median_val, results = run_repeated_holdout(df, x, cfg, progress=lambda s: None)
    assert len(results) == 3
    # tiny synthetic set + 3 repeats: demonstrably learned (chance ~ 0)
    assert np.median([r.srcc for r in results]) > 0.6, [r.srcc for r in results]


@pytest.mark.slow
def test_fixed_split_simple_variant(rng):
    df, x = synthetic_dataset(rng, n=200)
    cfg = TrainConfig(
        epochs=30, batch_size=32, initial_lr=0.1, hidden_features=32,
        use_bn=False, kfold=False, use_swa=True,
    )
    result, trainer = run_fixed_split(
        x[:150], df["mos"].to_numpy()[:150], x[150:], df["mos"].to_numpy()[150:],
        cfg, progress=lambda s: None,
    )
    assert result.srcc > 0.7, result.srcc


@pytest.mark.slow
def test_fine_tune_improves_on_shifted_target(rng):
    df, x = synthetic_dataset(rng, n=160)
    y = df["mos"].to_numpy()
    cfg = TrainConfig(epochs=20, batch_size=32, initial_lr=0.1,
                      hidden_features=32, kfold=False, use_swa=True)
    base, trainer = run_fixed_split(x[:100], y[:100], x[100:], y[100:], cfg,
                                    progress=lambda s: None)
    ft = FineTuneConfig(n_repeats=2, epochs=4, batch_size=64)
    median, results = fine_tune(base.snapshot, trainer, x[100:], y[100:], ft,
                                mos_is_1_5=True, progress=lambda s: None)
    assert len(results) == 2
    assert np.isfinite(median.srcc)
