"""Multi-chip scaling: device meshes, sharded particle rollouts, distributed
moment matching, data-parallel training.

The reference has no distributed backend at all (SURVEY §2.7: no
torch.distributed / NCCL / MPI anywhere — per-tensor ``.cuda()`` is the whole
device story). The TPU-native scaling design:

  * mesh axis = **particles** (the natural data-parallel axis of Deep-PILCO:
    imagined particles are embarrassingly parallel between MM steps),
  * policy/dynamics parameters replicated, particle states + noise pytrees
    sharded,
  * the mean-over-particles loss and the cross-device moment-matching
    mean/covariance ride ICI ``psum`` collectives,
  * ``mm_groups`` maps exactly onto per-device particle groups, making
    grouped MM collective-free (`prob_mbrl/utils/rollout.py:125-145`).
"""
from .sharding import (make_mesh, particle_sharding, replicated_sharding,
                       shard_particles, replicate)
from .mm import mm_resample_psum, particle_moments_psum
from .rollout import make_sharded_loss_fn, make_sharded_mc_pilco_fn

__all__ = [
    'make_mesh', 'particle_sharding', 'replicated_sharding',
    'shard_particles', 'replicate', 'mm_resample_psum',
    'particle_moments_psum', 'make_sharded_loss_fn',
    'make_sharded_mc_pilco_fn',
]
