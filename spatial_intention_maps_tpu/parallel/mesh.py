"""Device-mesh utilities.

The reference's parallelism (torch DataParallel over GPUs + an 8-process env
worker pool, SURVEY §2.2) maps onto one SPMD program: environments are a
batch axis sharded over the ``dp`` mesh axis, parameters are replicated, and
gradient reduction is an XLA psum inserted by sharding propagation over ICI.
"""

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape=None, axis_names=("dp",)):
    """A mesh over all available devices; default 1-D data-parallel.

    ``shape`` may be an int (1-D dp mesh over the first N devices) or a
    tuple.  This is the mesh constructor used by FusedTrainer's multi-chip
    path (train.py --num-devices N).
    """
    if shape is None:
        shape = (jax.device_count(),)
    if isinstance(shape, int):
        shape = (shape,)
    devices = mesh_utils.create_device_mesh(shape)
    return Mesh(devices, axis_names)


def shard_batch(mesh, tree, axis_name="dp"):
    """Place a pytree with a leading batch axis sharded over the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)


def replicate(mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_spec(mesh, axis_name="dp"):
    return NamedSharding(mesh, P(axis_name))


def replicated_spec(mesh):
    return NamedSharding(mesh, P())
