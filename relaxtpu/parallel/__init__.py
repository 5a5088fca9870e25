"""Parallelism: device mesh, sharded feature extraction, DP/TP training.

The reference has no distributed code at all (single GPU, serial Python video
loop — ``/root/reference/src/model_regression.py:757-759``,
``main_fragment_layerstack.py:269``).  This layer is a new, first-class
capability: data parallelism over frame pairs/videos via
``jax.sharding.Mesh`` + NamedSharding (collectives ride ICI), and optional
tensor parallelism over the 35,203-wide MLP input layer.  Parity with the
reference is defined at the numbers level (same features/scores), per
SURVEY.md §2.3.
"""

from relaxtpu.parallel.mesh import make_mesh, data_sharding, replicate
from relaxtpu.parallel.train_dp import DistributedMlpTrainStep

__all__ = ["make_mesh", "data_sharding", "replicate", "DistributedMlpTrainStep"]
