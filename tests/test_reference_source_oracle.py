"""Protocol oracles that EXECUTE the reference's own training source.

Every other protocol test pins relaxtpu against torch mirrors written by the
same builder — a shared misreading of ``model_regression.py`` would pass.
These tests import ``/root/reference/src/model_regression.py``,
``model_regression_simple.py`` and ``fine_tune.py`` and run their actual
functions (including the full ``main()`` protocol with its own
``split_train_test.process_other`` splits and median-model selection) on
tiny synthetic features + MOS, then run relaxtpu on byte-identical inputs.

Asserted (calibrated against 3 torch seeds — see the per-test docstrings):
- per-repeat test-split membership is IDENTICAL (hard assertion);
- per-repeat RMSE agrees within 2x the reference's own seed-to-seed spread;
- the median-repeat index (first-index-of-median, ref :659-697) agrees;
- zero-shot predictions agree to float tolerance (pure forward parity
  through the reference's own ``wo_fine_tune_model``);
- the reference's trained median ``.pth`` ports through ``port_torch_mlp``
  and reproduces the reference's own saved prediction CSV.

Synthetic data uses heteroscedastic label noise (a quarter of the videos get
sigma 1.2, the rest 0.02) so per-repeat RMSE is driven by SPLIT COMPOSITION
— which both implementations share bit-exactly — rather than training noise.
Numeric vids (KoNViD-style flickr IDs) double as a workaround: pandas>=3
arrow-backed string columns break sklearn indexing inside the reference's
own ``process_other`` (``split_train_test.py:123``).
"""

from __future__ import annotations

import math
import os
import shutil
import sys
import tempfile

import numpy as np
import pandas as pd
import pytest
import scipy.io

REF_SRC = "/root/reference/src"

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not os.path.isdir(REF_SRC), reason="reference tree not present"),
]

DATA = "konvid_1k"


@pytest.fixture(scope="module")
def refmods():
    """Import the reference training modules, runnable headless.

    ``device`` lives under ``__main__`` in model_regression*, so it is
    injected; plotting/logging writers (which write ``../figs`` relative to
    CWD) are stubbed — they do not touch the math.
    """
    os.environ.setdefault("MPLBACKEND", "Agg")
    import torch

    if REF_SRC not in sys.path:
        sys.path.append(REF_SRC)
    import fine_tune as ft  # noqa: F401  (imports model_regression itself)
    import model_regression as mr
    import model_regression_simple as mrs

    noop = lambda *a, **k: None  # noqa: E731
    for m in (mr, mrs):
        m.device = torch.device("cpu")
        m.plot_results = noop
        m.plot_and_save_losses = noop
        m.configure_logging = noop
    ft.device = torch.device("cpu")
    return mr, mrs, ft


def make_data(seed=7, n=120, dim=48):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, (n, dim))
    w = rng.normal(0, 1, dim)
    score = x @ w
    score = 1 + 4 * (score - score.min()) / (score.max() - score.min())
    noise = rng.normal(0, 0.02, n)
    noisy = rng.permutation(n)[: n // 4]
    noise[noisy] = rng.normal(0, 1.2, len(noisy))
    mos = np.clip(score + noise, 1.0, 5.0)
    vids = np.array([2000000000 + 7 * i for i in range(n)], dtype=np.int64)
    return vids, mos, x.astype(np.float64)


def build_reference_layout(tmp, vids, mos, feats):
    """The on-disk dataset layout the reference's ``main()`` expects
    (``model_regression.py:261-290``, ``split_train_test.process_other``)."""
    meta = os.path.join(tmp, "metadata")
    feat = os.path.join(tmp, "features_merged_frag")
    os.makedirs(os.path.join(meta, "mos_files"))
    os.makedirs(os.path.join(feat, "pool", "original_features"))
    pd.DataFrame({"vid": vids, "framerate": 30.0, "mos": mos}).to_csv(
        os.path.join(meta, f"{DATA.upper()}_metadata.csv"), index=False
    )
    scipy.io.savemat(
        os.path.join(feat, "pool", "original_features",
                     f"relaxvqa_{DATA}_original_features.mat"),
        {DATA: feats},
    )
    for d in ("model", "log", "log/predict_score", "log/result"):
        os.makedirs(os.path.join(tmp, d), exist_ok=True)
    return meta + "/", feat + "/"


REF_TRAIN_KW = dict(
    n_repeats=3, n_splits=3, batch_size=32, epochs=20,
    hidden_features=32, drop_rate=0.0,
    loss_type="MAERankLoss", optimizer_type="sgd",
    initial_lr=0.1, weight_decay=0.005, patience=5, use_swa=True,
    l1_w=0.6, rank_w=1.0, select_criteria="byrmse",
)


def our_train_config():
    from relaxtpu.model.train import TrainConfig

    kw = {k: v for k, v in REF_TRAIN_KW.items() if k != "loss_type"}
    return TrainConfig(**kw, seed=0)


def test_repeated_holdout_protocol_vs_reference_main(refmods, tmp_path):
    """Full ``model_regression.main()`` vs ``run_repeated_holdout``.

    Calibration (torch seeds 0/1/2 vs relaxtpu seed 0, this data): split
    membership identical everywhere; per-repeat |dRMSE| <= 0.071 against a
    reference self-spread (across seeds) of ~0.05; RMSE ranking of repeats —
    and hence the median index — identical in all runs; |dSRCC| <= 0.15
    except the noisy-split repeat (<= 0.40).  Thresholds are ~2x those.
    """
    mr, _, _ = refmods
    import torch

    vids, mos, feats = make_data()

    # ---------------------------------------------- reference's own main()
    tmp = str(tmp_path)
    meta, feat = build_reference_layout(tmp, vids, mos, feats)
    config = dict(
        model_name="Mlp", compressed_type="original", data_name=DATA,
        network_name="relaxvqa", layer_name="pool",
        save_path=os.path.join(tmp, "model") + "/",
        metadata_path=meta, is_residual=False, residual_name="",
        feature_path=feat, log_path=os.path.join(tmp, "log") + "/",
        score_path=os.path.join(tmp, "log", "predict_score") + "/",
        result_path=os.path.join(tmp, "log", "result") + "/",
        **REF_TRAIN_KW,
    )
    torch.manual_seed(0)
    mr.main(config)
    mat = scipy.io.loadmat(
        os.path.join(tmp, "log", "result", f"{DATA}_relaxvqa_pool_Mlp_corr_byrmse.mat")
    )
    ref_rmse = mat["RMSE_test"].ravel()
    ref_srcc = mat["SRCC_test"].ravel()
    ref_vid_rows = [set(int(v) for v in row) for row in mat["Test_Videos_list"]]
    ref_median_idx = int(np.where(ref_rmse == np.median(ref_rmse))[0][0])

    # ------------------------------------------------------------ relaxtpu
    from relaxtpu.model.protocol import run_repeated_holdout

    df = pd.DataFrame({"vid": vids, "mos": mos, "framerate": 30.0})
    median, median_val, results = run_repeated_holdout(
        df, feats, our_train_config(), progress=lambda s: None
    )
    our_rmse = np.array([r.rmse for r in results])
    our_srcc = np.array([r.srcc for r in results])
    our_median_idx = int(np.where(our_rmse == np.median(our_rmse))[0][0])

    # 1. split membership per repeat: bit-identical protocol
    for i in range(3):
        assert set(int(v) for v in results[i].test_vids) == ref_vid_rows[i], (
            f"repeat {i}: test-split membership diverged from the reference's "
            f"own process_other"
        )

    # 2. per-repeat metrics within calibrated noise bounds
    np.testing.assert_allclose(our_rmse, ref_rmse, atol=0.15)
    np.testing.assert_allclose(our_srcc, ref_srcc, atol=0.45)

    # 3. median-model selection picks the same repeat
    assert our_median_idx == ref_median_idx

    # 4. the reference's OWN trained median .pth ports through our porter and
    #    reproduces the reference's own saved prediction CSV (forward parity
    #    against reference-trained weights, not builder-written mirrors)
    import jax.numpy as jnp

    from relaxtpu.model.mlp import Mlp, port_torch_mlp
    from relaxtpu.model.protocol import preprocess_like_reference

    sd = torch.load(
        os.path.join(tmp, "model",
                     f"{DATA}_relaxvqa_pool_Mlp_byrmse_trained_median_model_param.pth"),
        map_location="cpu",
    )
    variables = port_torch_mlp(sd)
    pred_csv = pd.read_csv(
        os.path.join(tmp, "log", "predict_score",
                     f"{DATA}_relaxvqa_pool_Mlp_Predicted_Score_byrmse.csv")
    )
    # rebuild the median repeat's preprocessed test matrix (split + scaler are
    # pinned identical by assertions 1 and the scaler tests)
    from relaxtpu.data.splits import split_other

    rs = math.ceil(8.8 * (ref_median_idx + 1))
    _, _, x_te, y_te, _ = split_other(df, feats, test_size=0.2, random_state=rs)
    x_te, y_te, _ = preprocess_like_reference(x_te, y_te)
    model = Mlp(hidden_features=32, drop_rate=0.0, use_bn=True)
    ours = np.asarray(
        model.apply(variables, jnp.asarray(x_te, jnp.float32), train=False)
    ).reshape(-1)
    np.testing.assert_allclose(ours, pred_csv["y_test_pred"].to_numpy(), atol=2e-4)
    np.testing.assert_allclose(y_te, pred_csv["MOS"].to_numpy(), atol=1e-9)


def test_simple_lsvq_path_vs_reference_source(refmods):
    """``model_regression_simple.train_and_evaluate`` (single 80/20 val split
    rs=42, no BatchNorm — the LSVQ-scale variant) vs relaxtpu
    ``kfold=False/use_bn=False`` on identical preprocessed inputs.

    Both sides see features preprocessed by the REFERENCE's own
    ``preprocess_data`` so any divergence is the training loop itself.
    """
    mr, mrs, _ = refmods
    import torch

    vids, mos, feats = make_data(seed=11)
    n_tr = 96
    x_tr, y_tr = feats[:n_tr], mos[:n_tr]
    x_te, y_te = feats[n_tr:], mos[n_tr:]
    x_tr, y_tr, _, _ = mr.preprocess_data(x_tr.copy(), y_tr.copy())
    x_te, y_te, _, _ = mr.preprocess_data(x_te.copy(), y_te.copy())

    config = {k: v for k, v in REF_TRAIN_KW.items() if k != "n_splits"}
    torch.manual_seed(0)
    best_model, _, _ = mrs.train_and_evaluate(x_tr, y_tr, config)
    ref_pred = np.array(mrs.model_test(best_model, x_te, y_te), dtype=float)
    _, ref_plcc, ref_rmse, ref_srcc, ref_krcc = mr.compute_correlation_metrics(
        y_te, ref_pred
    )

    import dataclasses

    from relaxtpu.model.metrics import compute_correlation_metrics
    from relaxtpu.model.train import train_and_evaluate

    cfg = dataclasses.replace(our_train_config(), kfold=False, use_bn=False)
    snapshot, trainer, _, _ = train_and_evaluate(
        x_tr.astype(np.float32), y_tr, cfg
    )
    our_pred = trainer.predict(snapshot, x_te.astype(np.float32))
    _, plcc, rmse, srcc, krcc = compute_correlation_metrics(y_te, our_pred)

    assert abs(rmse - ref_rmse) < 0.2, (rmse, ref_rmse)
    assert abs(srcc - ref_srcc) < 0.4, (srcc, ref_srcc)


def test_fine_tune_and_zero_shot_vs_reference_source(refmods, tmp_path):
    """``fine_tune.fine_tune_model`` / ``wo_fine_tune_model`` (ref
    ``fine_tune.py:130-258``) vs relaxtpu ``protocol.fine_tune`` /
    ``zero_shot_eval`` from BYTE-IDENTICAL base weights (a torch ``.pth``
    ported via ``port_torch_mlp``).

    Zero-shot is deterministic — predictions must agree to float tolerance.
    Fine-tuned metrics agree within training-noise bounds; the 80/20 repeat
    splits (rs = ceil(8.8 i)) are shared bit-exactly by both sides.
    """
    mr, _, ft = refmods
    import torch
    import torch.nn as nn

    vids, mos, feats = make_data(seed=23)
    x, y, _, _ = mr.preprocess_data(feats.copy(), mos.copy())

    # base "LSVQ-trained" weights: a seeded torch Mlp briefly trained on a
    # shifted objective so fine-tuning has something real to adapt
    torch.manual_seed(3)
    base = mr.Mlp(input_features=x.shape[1], hidden_features=32, drop_rate=0.0)
    opt = torch.optim.SGD(base.parameters(), lr=0.05, momentum=0.9)
    xb = torch.FloatTensor(x)
    yb = torch.FloatTensor((y - 3.0) * 20.0 + 50.0).view(-1, 1)  # 1-100-ish scale
    base.train()
    for _ in range(30):
        opt.zero_grad()
        loss = nn.functional.l1_loss(base(xb), yb)
        loss.backward()
        opt.step()
    base.eval()
    model_path = os.path.join(str(tmp_path), "base.pth")
    torch.save(base.state_dict(), model_path)

    # MOS 1-5 -> 1-100 (ref process_test_set maps konvid/youtube this way)
    y100 = (np.asarray(y) - 1.0) * (99.0 / 4.0) + 1.0

    # ------------------------------------------------- reference zero-shot
    ft.test_data_name = DATA
    ft.model_path = model_path
    torch.manual_seed(0)
    _, y_conv, _, ref0_plcc, ref0_rmse, ref0_srcc, ref0_krcc = ft.wo_fine_tune_model(
        mr.Mlp(input_features=x.shape[1], hidden_features=32, drop_rate=0.0),
        torch.device("cpu"), model_path, x, y100, "MAERankLoss",
    )

    # -------------------------------------------------- relaxtpu zero-shot
    from relaxtpu.model.mlp import port_torch_mlp
    from relaxtpu.model.protocol import FineTuneConfig, fine_tune, zero_shot_eval
    from relaxtpu.model.train import ModelSnapshot, MlpTrainer, TrainConfig

    variables = port_torch_mlp(torch.load(model_path, map_location="cpu"))
    snapshot = ModelSnapshot(variables["params"], variables.get("batch_stats", {}))
    trainer = MlpTrainer(
        TrainConfig(hidden_features=32, drop_rate=0.0, use_bn=True), x.shape[1]
    )
    our0_pred100 = trainer.predict(snapshot, x.astype(np.float32))
    ref0_pred100 = np.array(ft.model_test(base, x, y100), dtype=float)
    np.testing.assert_allclose(our0_pred100, ref0_pred100, atol=2e-4)

    ft_cfg = FineTuneConfig(n_repeats=3, epochs=20, batch_size=32,
                            initial_lr=1e-2, weight_decay=5e-4, seed=0)
    _, zs_results = zero_shot_eval(
        snapshot, trainer, x.astype(np.float32), np.asarray(y),
        ft_cfg, mos_is_1_5=True, progress=lambda s: None,
    )
    # reference zero-shot scores the FULL set; check our full-set numbers too
    y5 = (np.asarray(y100) - 1.0) / (99.0 / 4.0) + 1.0
    p5 = (our0_pred100 - 1.0) / (99.0 / 4.0) + 1.0
    from relaxtpu.model.metrics import compute_correlation_metrics

    _, plcc0, rmse0, srcc0, krcc0 = compute_correlation_metrics(y5, p5)
    assert abs(srcc0 - ref0_srcc) < 1e-6
    assert abs(rmse0 - ref0_rmse) < 1e-5

    # ------------------------------------------------- reference fine-tune
    from sklearn.model_selection import train_test_split

    ref_ft = []
    for i in range(1, 4):
        rs = math.ceil(8.8 * i)
        x_ft, x_final, y_ft, y_final = train_test_split(
            x, y100, test_size=0.2, random_state=rs
        )
        torch.manual_seed(i)
        model = mr.Mlp(input_features=x.shape[1], hidden_features=32, drop_rate=0.0)
        tuned = ft.fine_tune_model(
            model, torch.device("cpu"), model_path, x_ft, y_ft, str(tmp_path),
            batch_size=32, epochs=20, loss_type="MAERankLoss",
            optimizer_type="sgd", initial_lr=1e-2, weight_decay=5e-4,
            use_swa=True, l1_w=0.6, rank_w=1.0,
        )
        _, _, _, plcc_t, rmse_t, srcc_t, krcc_t = ft.fine_tuned_model_test(
            tuned, torch.device("cpu"), x_final, y_final, DATA
        )
        ref_ft.append((srcc_t, rmse_t))

    # -------------------------------------------------- relaxtpu fine-tune
    _, our_results = fine_tune(
        snapshot, trainer, x.astype(np.float32), np.asarray(y),
        ft_cfg, mos_is_1_5=True, progress=lambda s: None,
    )
    for i, ((ref_srcc_i, ref_rmse_i), r) in enumerate(zip(ref_ft, our_results)):
        assert abs(r.rmse - ref_rmse_i) < 0.25, (i, r.rmse, ref_rmse_i)
        assert abs(r.srcc - ref_srcc_i) < 0.4, (i, r.srcc, ref_srcc_i)
