"""MLP head, loss, metrics, scaler tests (torch/sklearn oracles)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from relaxtpu.model import (
    FeatureScaler,
    Mlp,
    compute_correlation_metrics,
    mae_and_rank_loss,
    port_torch_mlp,
)

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402


class TorchMlp(tnn.Module):
    """Oracle mirroring the reference Mlp (model_regression.py:37-58)."""

    def __init__(self, d, hidden=256, drop=0.2):
        super().__init__()
        self.fc1 = tnn.Linear(d, hidden)
        self.bn1 = tnn.BatchNorm1d(hidden)
        self.act1 = tnn.GELU()
        self.drop1 = tnn.Dropout(drop)
        self.fc2 = tnn.Linear(hidden, hidden // 2)
        self.act2 = tnn.GELU()
        self.drop2 = tnn.Dropout(drop)
        self.fc3 = tnn.Linear(hidden // 2, 1)

    def forward(self, x):
        x = self.drop1(self.act1(self.bn1(self.fc1(x))))
        x = self.drop2(self.act2(self.fc2(x)))
        return self.fc3(x)


def torch_mae_rank(y_pred, y_true, l1_w=0.6, rank_w=1.0):
    """Literal reimplementation of MAEAndRankLoss.forward (ref :69-89)."""
    l_mae = tF.l1_loss(y_pred, y_true, reduction="mean") * l1_w
    n = y_pred.size(0)
    pred_diff = y_pred.unsqueeze(1) - y_pred.unsqueeze(0)
    true_diff = y_true.unsqueeze(1) - y_true.unsqueeze(0)
    masks = torch.sign(true_diff)
    l_rank = tF.relu(true_diff - masks * pred_diff)
    l_rank = l_rank.sum() / (n * (n - 1))
    return l_mae + l_rank * rank_w


def test_mae_rank_loss_matches_torch(rng):
    y_pred = rng.normal(50, 10, (32, 1)).astype(np.float32)
    y_true = rng.normal(50, 10, (32, 1)).astype(np.float32)
    want = torch_mae_rank(torch.tensor(y_pred), torch.tensor(y_true)).item()
    got = float(mae_and_rank_loss(jnp.asarray(y_pred), jnp.asarray(y_true)))
    assert abs(got - want) < 1e-4


def test_mae_rank_loss_mask_equivalence(rng):
    """Masked padded batch == unpadded batch."""
    y_pred = rng.normal(0, 1, (10,)).astype(np.float32)
    y_true = rng.normal(0, 1, (10,)).astype(np.float32)
    unpadded = float(mae_and_rank_loss(jnp.asarray(y_pred), jnp.asarray(y_true)))
    pad = np.zeros(6, np.float32)
    mask = np.concatenate([np.ones(10, np.float32), np.zeros(6, np.float32)])
    padded = float(
        mae_and_rank_loss(
            jnp.asarray(np.concatenate([y_pred, pad])),
            jnp.asarray(np.concatenate([y_true, pad])),
            mask=jnp.asarray(mask),
        )
    )
    assert abs(padded - unpadded) < 1e-5


def test_mlp_porter_parity(rng):
    d = 128
    oracle = TorchMlp(d).eval()
    with torch.no_grad():
        # randomize BN running stats so stats porting is exercised
        oracle.bn1.running_mean.copy_(torch.randn(256) * 0.3)
        oracle.bn1.running_var.copy_(torch.rand(256) + 0.5)
        x = torch.randn(8, d)
        want = oracle(x).numpy()

    variables = port_torch_mlp(oracle.state_dict())
    model = Mlp()
    got = np.asarray(model.apply(variables, jnp.asarray(x.numpy()), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_mlp_porter_strips_swa_prefix(rng):
    oracle = TorchMlp(64).eval()
    sd = {f"module.{k}": v for k, v in oracle.state_dict().items()}
    sd["n_averaged"] = torch.tensor(5)
    variables = port_torch_mlp(sd)
    x = np.random.default_rng(0).normal(size=(4, 64)).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.tensor(x)).numpy()
    got = np.asarray(Mlp().apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_metrics_on_noisy_monotone(rng):
    y_true = rng.uniform(1, 5, 200)
    y_pred = 2 * y_true + 1 + rng.normal(0, 0.3, 200)
    _, plcc, rmse, srcc, krcc = compute_correlation_metrics(y_true, y_pred)
    assert plcc > 0.9 and srcc > 0.9 and krcc > 0.75
    assert rmse < 0.5  # fitted back onto MOS scale


def test_metrics_match_scipy_definitions(rng):
    import scipy.stats

    y_true = rng.uniform(0, 100, 80)
    y_pred = y_true + rng.normal(0, 10, 80)
    _, _, _, srcc, krcc = compute_correlation_metrics(y_true, y_pred)
    assert abs(srcc - scipy.stats.spearmanr(y_true, y_pred)[0]) < 1e-12
    assert abs(krcc - scipy.stats.kendalltau(y_true, y_pred)[0]) < 1e-12


def test_feature_scaler_matches_sklearn(rng):
    from sklearn.impute import SimpleImputer
    from sklearn.preprocessing import MinMaxScaler

    x = rng.normal(0, 5, (50, 20))
    x[3, 4] = np.nan
    x[7, 2] = np.inf
    xz = x.copy()
    xz[np.isnan(xz)] = 0
    xz[np.isinf(xz)] = 0
    imp = SimpleImputer(strategy="mean").fit(xz)
    sc = MinMaxScaler().fit(imp.transform(xz))
    want = sc.transform(imp.transform(xz))

    ours = FeatureScaler.fit(x)
    got = ours.fit_transform_like_reference(x)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)

    # from_sklearn wrap agrees too
    wrapped = FeatureScaler.from_sklearn(imp, sc)
    np.testing.assert_allclose(wrapped.transform(xz), want, rtol=1e-10, atol=1e-12)


def test_reference_scaler_pkls_load():
    import os

    path = "/root/reference/model/scaler"
    if not os.path.isdir(path):
        pytest.skip("reference artifacts unavailable")
    fs = FeatureScaler.load_reference_pkls(
        f"{path}/konvid_1k_imputer.pkl", f"{path}/konvid_1k_scaler.pkl"
    )
    assert fs.fill.shape == (35203,)
    assert fs.scale.shape == (35203,)
    v = fs.transform(fs.fill.reshape(1, -1))
    assert np.isfinite(v).all()
