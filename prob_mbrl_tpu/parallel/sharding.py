"""Mesh construction and sharding helpers.

One 1-D mesh over all available devices; the axis is named ``particles``
because that is what shards across it. On multi-host slices the same code
runs under ``jax.distributed.initialize`` with the global device list —
particles shard over (hosts x chips), parameters replicate, and the psum
collectives ride ICI within a host and DCN across hosts.
"""
import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PARTICLE_AXIS = 'particles'


def make_mesh(n_devices=None, axis_name=PARTICLE_AXIS, devices=None):
    """1-D device mesh over ``n_devices`` (default: all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def particle_sharding(mesh, axis_name=PARTICLE_AXIS):
    """Shard the leading (particle/batch) axis across the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh):
    return NamedSharding(mesh, P())


def shard_particles(tree, mesh, axis_name=PARTICLE_AXIS):
    """Place every leaf with its leading axis sharded across the mesh."""
    s = particle_sharding(mesh, axis_name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(tree, mesh):
    """Replicate every leaf across the mesh."""
    s = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
