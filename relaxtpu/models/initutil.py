"""Fast model init without compiling the forward pass.

``module.init`` traces AND compiles the whole forward program just to
materialize parameters — minutes of host time for ResNet-50/ViT on a small
host CPU.  ``fast_init`` gets the variable SHAPES via ``jax.eval_shape``
(pure tracing, no compile) and materializes values host-side with numpy:
normal(0, 0.02) for weights, ones for scales/vars, zeros for biases/means.
Only used where real values don't matter (bench, entry smoke, CLI fallback
when no pretrained checkpoint is given); production weights come from the
porters.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _materialize(path_key: str, sds) -> np.ndarray:
    shape = tuple(sds.shape)
    dtype = sds.dtype
    leaf = path_key.rsplit("/", 1)[-1]
    if leaf in ("scale", "var"):
        return np.ones(shape, dtype)
    if leaf in ("bias", "mean", "cls_token", "pos_embed"):
        return np.zeros(shape, dtype)
    rng = np.random.default_rng(abs(hash(path_key)) % (2**31))
    return (rng.standard_normal(shape) * 0.02).astype(dtype)


def fast_init(module, *args, key=None, **kwargs):
    key = key if key is not None else jax.random.PRNGKey(0)
    shapes = jax.eval_shape(lambda k: module.init(k, *args, **kwargs), key)

    def mat(path, sds):
        pk = "/".join(str(getattr(p, "key", p)) for p in path)
        return jnp.asarray(_materialize(pk, sds))

    return jax.tree_util.tree_map_with_path(mat, shapes)


def init_on_cpu(module, *args, key=None, **kwargs):
    """True flax init on the host CPU backend (exact initializers, slower)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        return module.init(key, *args, **kwargs)
