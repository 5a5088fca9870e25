"""The MOS-regression MLP head.

Architecture per the reference (``/root/reference/src/model_regression.py:37-58``):
Linear(D->256) -> BatchNorm1d -> GELU -> Dropout -> Linear(256->128) -> GELU
-> Dropout -> Linear(128->1).  ``model_regression_simple.py:37-58`` is the
same module without BatchNorm (used at LSVQ scale); toggle with
``use_bn=False``.

``port_torch_mlp`` consumes the shipped ``.pth`` checkpoints, stripping the
SWA ``module.`` prefix / ``n_averaged`` key exactly like the reference's
``fix_state_dict`` (``src/demo_test.py:25-35``).
"""

from __future__ import annotations

from typing import Any, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class TorchBatchNorm(nn.Module):
    """BatchNorm1d with torch semantics: running stats updated with momentum
    0.1 and the UNBIASED batch variance (flax's nn.BatchNorm uses the biased
    one), normalization with the biased variance."""

    momentum: float = 0.1
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        d = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros(d, jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones(d, jnp.float32))
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=0)
            var = jnp.var(x32, axis=0)
            n = x.shape[0]
            unbiased = var * (n / max(n - 1, 1))
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.epsilon)
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(self.dtype)


class Mlp(nn.Module):
    hidden_features: int = 256
    out_features: int = 1
    drop_rate: float = 0.2
    use_bn: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1")(x)
        if self.use_bn:
            x = TorchBatchNorm(dtype=self.dtype, name="bn1")(x, use_running_average=not train)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop_rate, deterministic=not train, name="drop1")(x)
        x = nn.Dense(self.hidden_features // 2, dtype=self.dtype, name="fc2")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.drop_rate, deterministic=not train, name="drop2")(x)
        return nn.Dense(self.out_features, dtype=self.dtype, name="fc3")(x)


def fix_state_dict(sd: Mapping[str, Any]) -> dict[str, Any]:
    """Strip the SWA AveragedModel wrapper (ref demo_test.py:25-35)."""
    out = {}
    for k, v in sd.items():
        if k == "n_averaged":
            continue
        out[k[7:] if k.startswith("module.") else k] = v
    return out


def port_torch_mlp(sd: Mapping[str, Any]) -> dict:
    """torch Mlp state_dict -> Flax variables ({'params', 'batch_stats'})."""
    sd = fix_state_dict(sd)
    arr = lambda k: np.asarray(sd[k].detach().cpu().numpy() if hasattr(sd[k], "detach") else sd[k])  # noqa: E731
    params: dict[str, Any] = {}
    for name in ("fc1", "fc2", "fc3"):
        params[name] = {"kernel": arr(f"{name}.weight").T, "bias": arr(f"{name}.bias")}
    variables: dict[str, Any] = {"params": params}
    if "bn1.weight" in sd:
        params["bn1"] = {"scale": arr("bn1.weight"), "bias": arr("bn1.bias")}
        variables["batch_stats"] = {
            "bn1": {"mean": arr("bn1.running_mean"), "var": arr("bn1.running_var")}
        }
    return variables
