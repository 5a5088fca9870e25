"""Results reporting: comparison tables across datasets/methods.

Reimplements what ``reported_result.ipynb`` derives from the reference's
training logs (median SRCC/KRCC/PLCC/RMSE blocks), as a library: collect
:class:`relaxtpu.model.train.RepeatResult` lists per dataset/method and
render the cross-method comparison table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

METRICS = ("SRCC", "KRCC", "PLCC", "RMSE")


def summarize_repeats(results) -> dict:
    """Median (std) over repeats — the reference's headline statistic
    (ref model_regression.py:644-656)."""
    arr = {
        "SRCC": np.array([r.srcc for r in results]),
        "KRCC": np.array([r.krcc for r in results]),
        "PLCC": np.array([r.plcc for r in results]),
        "RMSE": np.array([r.rmse for r in results]),
    }
    out = {}
    for k, v in arr.items():
        v = np.nan_to_num(v)
        out[k] = float(np.median(v))
        out[f"{k}_std"] = float(np.std(v))
    return out


def comparison_table(per_method: dict[str, dict[str, list]]) -> pd.DataFrame:
    """{method: {dataset: [RepeatResult, ...]}} -> tidy comparison table."""
    rows = []
    for method, per_ds in per_method.items():
        for ds, results in per_ds.items():
            row = {"method": method, "dataset": ds}
            row.update({k: v for k, v in summarize_repeats(results).items() if not k.endswith("_std")})
            rows.append(row)
    return pd.DataFrame(rows).sort_values(["dataset", "method"]).reset_index(drop=True)


def against_baseline(df: pd.DataFrame, baseline: dict[str, dict[str, float]]) -> pd.DataFrame:
    """Append reference-published numbers (BASELINE.md) for side-by-side
    comparison; ``baseline`` = {dataset: {metric: value}}."""
    rows = []
    for ds, metrics in baseline.items():
        row = {"method": "reference (published)", "dataset": ds}
        row.update(metrics)
        rows.append(row)
    return pd.concat([df, pd.DataFrame(rows)], ignore_index=True).sort_values(
        ["dataset", "method"]
    ).reset_index(drop=True)


REFERENCE_INTRA_DATASET = {
    # log/{dataset}_relaxvqa_mlp.log "Average testing results" (BASELINE.md)
    "konvid_1k": {"SRCC": 0.8535, "KRCC": 0.6594, "PLCC": 0.8473, "RMSE": 0.3370},
    "cvd_2014": {"SRCC": 0.8643, "KRCC": 0.6960, "PLCC": 0.8895, "RMSE": 9.8185},
    "live_vqc": {"SRCC": 0.7655, "KRCC": 0.5785, "PLCC": 0.8079, "RMSE": 9.8596},
    "youtube_ugc": {"SRCC": 0.8014, "KRCC": 0.6167, "PLCC": 0.8204, "RMSE": 0.3801},
    "lsvq_train": {"SRCC": 0.8686, "KRCC": 0.6825, "PLCC": 0.8687, "RMSE": 5.1917},
}

REFERENCE_FINETUNED = {
    "konvid_1k": {"SRCC": 0.8720, "KRCC": 0.6881, "PLCC": 0.8668, "RMSE": 0.3211},
    "cvd_2014": {"SRCC": 0.8974, "KRCC": 0.7299, "PLCC": 0.9294, "RMSE": 8.1812},
    "live_vqc": {"SRCC": 0.8468, "KRCC": 0.6649, "PLCC": 0.8876, "RMSE": 7.9869},
    "youtube_ugc": {"SRCC": 0.8469, "KRCC": 0.6623, "PLCC": 0.8652, "RMSE": 0.3437},
}


def parse_training_log(text: str) -> dict:
    """Parse a reference-format training log into metric blocks.

    The reference's logs (``reported_results/*_{svr,mlp}.log``, parsed by
    ``reported_result.ipynb``) end with::

        Average training results among all repeated 80-20 holdouts:
        SRCC Train: <v> (std: <v>)
        ...
        Average testing results among all repeated 80-20 holdouts:
        SRCC Test: <v> (std: <v>)
        ...

    Returns {"train": {metric: (value, std)}, "test": {...}} with whatever
    blocks are present (competitor SVR logs and our own logs share the
    format).
    """
    import re

    out: dict = {"train": {}, "test": {}}
    for m in re.finditer(
        r"(SRCC|KRCC|PLCC|RMSE)\s+(Train|Test):\s*([-\d.eE]+)\s*\(std:\s*([-\d.eE]+)\)",
        text,
    ):
        metric, split, val, std = m.groups()
        out[split.lower()][metric] = (float(val), float(std))
    # median block variants ("Median SRCC: <v>")
    for m in re.finditer(r"Median\s+(SRCC|KRCC|PLCC|RMSE):\s*([-\d.eE]+)", text):
        out.setdefault("median", {})[m.group(1)] = float(m.group(2))
    return out


def competitor_table(log_paths: dict[str, dict[str, str]]) -> pd.DataFrame:
    """{method: {dataset: log_path}} -> comparison rows from reference-format
    logs (BRISQUE/TLVQM/VIDEVAL/RAPIQUE/V-BLIINDS SVR logs and relaxvqa MLP
    logs all share the block format)."""
    rows = []
    for method, per_ds in log_paths.items():
        for ds, path in per_ds.items():
            with open(path) as f:
                parsed = parse_training_log(f.read())
            row = {"method": method, "dataset": ds}
            row.update({k: v[0] for k, v in parsed.get("test", {}).items()})
            rows.append(row)
    return pd.DataFrame(rows).sort_values(["dataset", "method"]).reset_index(drop=True)


def parse_vsfa_npy(path: str) -> dict:
    """VSFA result ``.npy`` (object array: y_pred, y_test, loss, SRCC, KRCC,
    PLCC, RMSE, test_index — ``reported_results/VSFA-*.npy``) -> metrics."""
    d = np.load(path, allow_pickle=True)
    return {
        "SRCC": float(d[3]),
        "KRCC": float(d[4]),
        "PLCC": float(d[5]),
        "RMSE": float(d[6]),
        "n_test": int(len(d[1])),
    }
