"""Host-side utility tests: config, store, report, recover, mos maps, splits."""
import numpy as np
import pandas as pd
import pytest

from relaxtpu.config import RunConfig
from relaxtpu.data.mos import mos_1_100_to_1_5, mos_1_5_to_1_100, pred_0_100_to_1_5
from relaxtpu.data.recover import export_predictions_csv, export_results_mat, recover_median_split
from relaxtpu.data.splits import split_cross_dataset, split_other
from relaxtpu.data.store import FeatureStore, load_chunked_features
from relaxtpu.model.train import RepeatResult
from relaxtpu.utils.report import REFERENCE_INTRA_DATASET, comparison_table, summarize_repeats


def test_config_roundtrip(tmp_path):
    cfg = RunConfig()
    cfg.train.n_repeats = 7
    cfg.extract.dataset = "live_vqc"
    p = str(tmp_path / "cfg.json")
    cfg.save(p)
    loaded = RunConfig.load(p)
    assert loaded.train.n_repeats == 7
    assert loaded.extract.dataset == "live_vqc"
    assert loaded.train.batch_size == 256


def test_mos_maps_roundtrip():
    mos5 = np.array([1.0, 2.5, 5.0])
    mos100 = mos_1_5_to_1_100(mos5)
    np.testing.assert_allclose(mos100, [1.0, 38.125, 100.0])
    np.testing.assert_allclose(mos_1_100_to_1_5(mos100), mos5)
    np.testing.assert_allclose(pred_0_100_to_1_5(np.array([0.0, 50.0, 100.0])), [1.0, 3.0, 5.0])


def test_feature_store_roundtrip(tmp_path, rng):
    store = FeatureStore(str(tmp_path))
    for i in range(3):
        store.put("ds", i, rng.normal(0, 1, (4 + i, 16)))
    assert store.has("ds", 1) and not store.has("ds", 9)
    mat = store.assemble("ds", 3)
    assert mat.shape == (3, 16)
    np.testing.assert_allclose(mat[0], store.get("ds", 0).mean(axis=0))

    p = str(tmp_path / "ds.mat")
    store.save_mat("ds", 3, p)
    import scipy.io

    loaded = scipy.io.loadmat(p)["ds"]
    np.testing.assert_allclose(loaded, mat)


def test_load_chunked_features(tmp_path, rng):
    import scipy.io

    paths = []
    for i in range(3):
        p = str(tmp_path / f"chunk{i}.mat")
        scipy.io.savemat(p, {"lsvq_train": rng.normal(0, 1, (5, 8))})
        paths.append(p)
    out = load_chunked_features(paths, "lsvq_train")
    assert out.shape == (15, 8)


def _fake_results(rng, n=5):
    return [
        RepeatResult(
            srcc=0.8 + 0.01 * i, krcc=0.6, plcc=0.82, rmse=0.4 - 0.01 * i,
            test_vids=[f"v{i}"], y_test=rng.uniform(1, 5, 10),
            y_pred=rng.uniform(1, 5, 10), snapshot=None,
        )
        for i in range(n)
    ]


def test_summarize_and_compare(rng):
    results = _fake_results(rng)
    s = summarize_repeats(results)
    assert abs(s["SRCC"] - 0.82) < 1e-9
    df = comparison_table({"relaxtpu": {"konvid_1k": results}})
    assert set(df.columns) >= {"method", "dataset", "SRCC", "RMSE"}
    assert REFERENCE_INTRA_DATASET["konvid_1k"]["SRCC"] == 0.8535


def test_export_results_and_predictions(tmp_path, rng):
    results = _fake_results(rng)
    mat_path = str(tmp_path / "res.mat")
    export_results_mat(mat_path, results, "byrmse", 0.38)
    import scipy.io

    loaded = scipy.io.loadmat(mat_path)
    assert loaded["SRCC_test"].size == 5
    assert "Median_RMSE" in loaded

    # predictions need a fittable monotone relation
    r = results[0]
    r.y_pred = r.y_test + rng.normal(0, 0.1, 10)
    csv_path = str(tmp_path / "pred.csv")
    export_predictions_csv(csv_path, r)
    df = pd.read_csv(csv_path)
    assert list(df.columns) == ["MOS", "y_test_pred", "y_test_pred_logistic"]


def test_recover_median_split(rng):
    df = pd.DataFrame({"vid": [f"v{i}" for i in range(10)], "mos": rng.uniform(1, 5, 10)})
    feats = rng.normal(0, 1, (10, 4))
    x_tr, y_tr, x_te, y_te = recover_median_split(df, feats, ["v1", "v5"])
    assert x_te.shape == (2, 4) and x_tr.shape == (8, 4)
    np.testing.assert_allclose(x_te[0], feats[1])


def test_split_cross_dataset_mos_map(rng):
    tr = pd.DataFrame({"vid": ["a", "b"], "mos": [1.0, 5.0]})
    te = pd.DataFrame({"vid": ["c"], "mos": [50.0]})
    xtr = rng.normal(0, 1, (2, 4))
    xte = rng.normal(0, 1, (1, 4))
    x1, y1, x2, y2, vids = split_cross_dataset(tr, te, xtr, xte, "youtube_ugc", "cvd_2014")
    np.testing.assert_allclose(y1, [1.0, 100.0])  # 1-5 -> 1-100
    np.testing.assert_allclose(y2, [50.0])  # cvd stays raw


def test_parse_training_log_blocks():
    from relaxtpu.utils.report import parse_training_log

    text = (
        "some preamble\n"
        "Median RMSE: 0.4719\n"
        "======\n"
        "Average training results among all repeated 80-20 holdouts:\n"
        "SRCC Train: 0.7068 (std: 0.0212)\n"
        "KRCC Train: 0.5207 (std: 0.0217)\n"
        "PLCC Train: 0.7107 (std: 0.0221)\n"
        "RMSE Train: 0.4503 (std: 0.0147)\n"
        "======\n"
        "Average testing results among all repeated 80-20 holdouts:\n"
        "SRCC Test: 0.6781 (std: 0.0083)\n"
        "KRCC Test: 0.4935 (std: 0.0091)\n"
        "PLCC Test: 0.6746 (std: 0.0069)\n"
        "RMSE Test: 0.4753 (std: 0.0040)\n"
    )
    p = parse_training_log(text)
    assert p["test"]["SRCC"] == (0.6781, 0.0083)
    assert p["train"]["RMSE"][0] == 0.4503
    assert p["median"]["RMSE"] == 0.4719


def test_competitor_table_and_reference_logs(tmp_path):
    """Round-trip via files; also parse a real reference log when present."""
    import os

    from relaxtpu.utils.report import competitor_table, parse_training_log

    log = tmp_path / "toy_svr.log"
    log.write_text(
        "Average testing results among all repeated 80-20 holdouts:\n"
        "SRCC Test: 0.5 (std: 0.01)\nRMSE Test: 0.9 (std: 0.02)\n"
    )
    df = competitor_table({"brisque": {"toy": str(log)}})
    assert df.loc[0, "SRCC"] == 0.5 and df.loc[0, "RMSE"] == 0.9

    ref = "/root/reference/reported_results/konvid_1k_brisque_svr.log"
    if os.path.exists(ref):
        with open(ref) as f:
            parsed = parse_training_log(f.read())
        assert 0.5 < parsed["test"]["SRCC"][0] < 0.9  # BRISQUE-on-KoNViD range


def test_parse_vsfa_npy_real():
    import os

    from relaxtpu.utils.report import parse_vsfa_npy

    path = "/root/reference/reported_results/VSFA-KoNViD_1k-EXP0.npy"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference VSFA npy not mounted")
    m = parse_vsfa_npy(path)
    assert 0.5 < m["SRCC"] < 1.0 and m["n_test"] > 100
