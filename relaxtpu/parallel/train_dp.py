"""Distributed MLP training step: DP over batch, optional TP over fc1.

Expressed with ``jax.jit`` + NamedSharding constraints: XLA inserts the
gradient ``psum`` (data axis) and fc1 activation collectives (model axis)
automatically.  The MLP is tiny (~9M params), so DP is the useful axis; TP of
the (35,203 x 256) fc1 kernel demonstrates the full tp+dp sharding surface
and keeps per-device HBM flat at scale.

35,203 is odd, so the fc1 input dim is ZERO-PADDED up to a multiple of the
'model' axis before sharding (NamedSharding requires divisibility).  The pad
is exact, not approximate: pad columns of x are zero, so pad rows of the
kernel never contribute to the forward, receive zero gradient, and zero
weight decay keeps them zero forever.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from relaxtpu.model.losses import mae_and_rank_loss
from relaxtpu.model.mlp import Mlp


class DistributedMlpTrainStep:
    """jitted (params, opt_state, x, y, key) -> (params, opt_state, loss)
    with batch sharded over 'data' and fc1 sharded over 'model'."""

    def __init__(
        self,
        mesh: Mesh,
        input_dim: int,
        cfg: Any = None,
        hidden: int = 256,
        drop_rate: float = 0.1,
        use_bn: bool = False,
        l1_w: float = 0.6,
        rank_w: float = 1.0,
        lr: float = 0.1,
        weight_decay: float = 0.005,
    ):
        self.mesh = mesh
        self.model = Mlp(hidden_features=hidden, drop_rate=drop_rate, use_bn=use_bn)
        self.l1_w, self.rank_w = l1_w, rank_w
        self.tx = optax.chain(
            optax.add_decayed_weights(weight_decay), optax.sgd(lr, momentum=0.9)
        )
        self.input_dim = input_dim
        model_axis = mesh.shape.get("model", 1)
        self.padded_dim = input_dim + (-input_dim) % model_axis

        self.param_sharding_rules = {
            # fc1 kernel: shard the wide input dim over 'model'
            ("fc1", "kernel"): P("model", None),
            ("fc2", "kernel"): P(None, None),
            ("fc3", "kernel"): P(None, None),
        }
        self._step = jax.jit(self._train_step, donate_argnums=(0, 1))

    # -------------------------------------------------------------- sharding
    def _sharding_for_path(self, path) -> NamedSharding:
        names = tuple(p.key for p in path if hasattr(p, "key"))
        for (mod, leaf), spec in self.param_sharding_rules.items():
            if mod in names and leaf in names:
                return NamedSharding(self.mesh, spec)
        return NamedSharding(self.mesh, P())

    def _global_put(self, x, sharding):
        """Host value -> (possibly multi-host) global array.

        In a multi-process run, plain device_put can't target non-addressable
        devices; each process materializes its addressable shards from the
        same full host value instead."""
        import numpy as np

        if jax.process_count() > 1:
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])
        return jax.device_put(x, sharding)

    def shard_params(self, params):
        return jax.tree_util.tree_map_with_path(
            lambda path, x: self._global_put(x, self._sharding_for_path(path)), params
        )

    def init(self, key):
        # init at the TRUE dim (identical weights to a single-device run),
        # then zero-pad fc1 rows up to the 'model'-divisible padded dim
        dummy = jnp.zeros((2, self.input_dim), jnp.float32)
        variables = self.model.init(key, dummy, train=False)
        params = variables["params"]
        if self.padded_dim != self.input_dim:
            pad = self.padded_dim - self.input_dim
            params = dict(params)
            fc1 = dict(params["fc1"])
            fc1["kernel"] = jnp.pad(fc1["kernel"], ((0, pad), (0, 0)))
            params["fc1"] = fc1
        params = self.shard_params(params)
        opt_state = self.tx.init(params)
        return params, opt_state

    def _pad_x(self, x):
        if self.padded_dim != x.shape[-1]:
            import numpy as np

            x = np.concatenate(
                [np.asarray(x),
                 np.zeros((*x.shape[:-1], self.padded_dim - x.shape[-1]), x.dtype)],
                axis=-1,
            )
        return x

    # ------------------------------------------------------------------ step
    def _train_step(self, params, opt_state, x, y, key):
        def loss_fn(p):
            out = self.model.apply(
                {"params": p, "batch_stats": {}},
                x,
                train=True,
                rngs={"dropout": key},
            )
            return mae_and_rank_loss(out, y, self.l1_w, self.rank_w)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(self, params, opt_state, x, y, key):
        """x/y are this PROCESS's local batch chunk: on a multi-host mesh the
        global batch is the concatenation of every host's chunk along 'data'
        (DCN-sharded feeding — each host loads only its own videos)."""
        x = self._pad_x(x)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            x = multihost_utils.host_local_array_to_global_array(x, self.mesh, P("data"))
            y = multihost_utils.host_local_array_to_global_array(y, self.mesh, P("data"))
        else:
            x = jax.device_put(x, NamedSharding(self.mesh, P("data")))
            y = jax.device_put(y, NamedSharding(self.mesh, P("data")))
        return self._step(params, opt_state, x, y, key)
