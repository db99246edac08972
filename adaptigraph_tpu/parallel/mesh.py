"""Device-mesh and sharding helpers.

The reference has no distributed layer at all (SURVEY.md §2.8) — its only
parallelism is sequential MPPI chunks on one GPU. Here the batch/sample axis
is sharded over a 1-D ``jax.sharding.Mesh`` ("data"): training batches and
MPPI sample blocks split across chips with XLA inserting the collectives
(psum for gradient/softmax reductions) over ICI.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="data"):
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def shard_batch(batch, mesh, axis="data", batch_axis=0):
    """Place a host batch with dim ``batch_axis`` sharded across the mesh
    (``batch_axis=1`` for ``(K, B, ...)`` superbatches — the scan axis stays
    replicated, the per-step batch axis splits)."""
    sharding = NamedSharding(mesh, P(*([None] * batch_axis + [axis])))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
