"""Median-model split recovery + results export.

- ``recover_median_split``: reconstruct the exact train/test feature split of
  a saved median model from the results file's test-video list
  (ref ``src/recover_median_train_test.py:5-76``).
- ``export_results_mat``: all-repeat metrics + test-video lists, in the
  reference's .mat schema (ref ``model_regression.py:699-712``).
- ``export_predictions_csv``: the median model's per-video predictions
  (ref :685).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def recover_median_split(df: pd.DataFrame, features: np.ndarray, median_test_vids) -> tuple:
    """Split (df, features) into train/test by the recorded test-vid list."""
    test_set = set(map(str, median_test_vids))
    is_test = df["vid"].astype(str).isin(test_set).to_numpy()
    return (
        features[~is_test],
        df.loc[~is_test, "mos"].to_numpy(float),
        features[is_test],
        df.loc[is_test, "mos"].to_numpy(float),
    )


def export_results_mat(path: str, results, select_criteria: str, median_value: float) -> None:
    import scipy.io

    crit = select_criteria.replace("by", "").upper()
    scipy.io.savemat(
        path,
        {
            "SRCC_test": np.asarray([r.srcc for r in results], float),
            "KRCC_test": np.asarray([r.krcc for r in results], float),
            "PLCC_test": np.asarray([r.plcc for r in results], float),
            "RMSE_test": np.asarray([r.rmse for r in results], float),
            f"Median_{crit}": median_value,
            "Test_Videos_list": np.asarray(
                [np.asarray(r.test_vids, dtype=object) for r in results], dtype=object
            ),
        },
    )


def export_predictions_csv(path: str, result) -> None:
    from relaxtpu.model.metrics import fit_logistic

    y_fit, _, _ = fit_logistic(result.y_pred, result.y_test)
    pd.DataFrame(
        {"MOS": result.y_test, "y_test_pred": result.y_pred, "y_test_pred_logistic": y_fit}
    ).to_csv(path, index=False)
