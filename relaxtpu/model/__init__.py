"""Quality-regression head: MLP, losses, metrics, scalers, training protocol."""

from relaxtpu.model.mlp import Mlp, port_torch_mlp
from relaxtpu.model.losses import mae_and_rank_loss
from relaxtpu.model.metrics import (
    logistic_func,
    fit_logistic,
    compute_correlation_metrics,
)
from relaxtpu.model.scalers import FeatureScaler

__all__ = [
    "Mlp",
    "port_torch_mlp",
    "mae_and_rank_loss",
    "logistic_func",
    "fit_logistic",
    "compute_correlation_metrics",
    "FeatureScaler",
]
