"""Sharded particle rollouts and the multi-chip MC-PILCO optimizer.

Two complementary paths:

  * ``make_sharded_mc_pilco_fn`` — the production path. Reuses the fused
    MC-PILCO program (`algorithms.mc_pilco.make_mc_pilco_fn`) with GSPMD
    sharding constraints pinning every per-particle tensor to the mesh's
    particle axis; XLA inserts the psum collectives for the mean-loss
    reduction, the gradient reduction onto the replicated policy parameters,
    and the cross-shard moment-matching contractions automatically.

  * ``make_sharded_loss_fn`` — an explicit ``shard_map`` rollout loss with
    hand-placed ``psum`` collectives (``parallel.mm.mm_resample_psum``) for
    global moment matching. Serves as the ground-truth layout for tests and
    as the fallback if GSPMD propagation ever regresses: per-device code is
    plain single-device code over the local particle shard.

PEGASUS noise is derived from the SAME keys regardless of device count (keys
split on the host from a scalar key; particle index -> noise row is a pure
function of the global batch layout), so results are device-count invariant
up to reduction order.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..algorithms.mc_pilco import (MCPILCOConfig, discount_weights,
                                   make_mc_pilco_fn)
from .mm import mm_resample_psum
from .sharding import PARTICLE_AXIS, particle_sharding, replicate


def make_sharded_mc_pilco_fn(dyn, pol, config, optimizer, mesh,
                             value_spec=None, axis_name=PARTICLE_AXIS):
    """Multi-chip MC-PILCO: the fused optimizer with particle-axis sharding.

    Same call signature/returns as ``make_mc_pilco_fn``'s ``opt``.
    ``config.n_particles`` must be divisible by the mesh size.
    """
    n_dev = mesh.devices.size
    assert config.n_particles % n_dev == 0, (
        f'n_particles={config.n_particles} must divide over '
        f'{n_dev} devices')
    return make_mc_pilco_fn(dyn, pol, config, optimizer,
                            value_spec=value_spec, mesh=mesh,
                            particle_axis=axis_name)


def make_sharded_loss_fn(dyn, pol, steps, mesh, mm_states=False,
                         mm_rewards=False, discount=None, maximize=True,
                         axis_name=PARTICLE_AXIS):
    """Explicit shard_map rollout loss with psum'd global moment matching.

    Returns ``loss(pol_params, x0, dyn_params, dyn_stats, dyn_noise,
    pol_noise, z_mm, z_rr) -> scalar`` where x0 / noise / z_* have global
    particle batch leading axes (sharded by the caller or by jit). The scalar
    loss is identical on every device (psum-reduced), so ``jax.grad`` w.r.t.
    the replicated ``pol_params`` yields correctly psum-reduced gradients via
    shard_map's transpose rules.
    """
    w_t, _ = discount_weights(discount, steps)

    def local_rollout_loss(pol_params, x0, dyn_params, dyn_stats, dyn_noise,
                           pol_noise, z_mm_t, z_rr_t):
        # everything below operates on this device's particle shard;
        # z_*_t carry the per-step cyclic shift ([T, B_local, D]) prepared
        # on the global batch before sharding (`rollout.py:53-59` get_z_rnd)
        def step(states, zs):
            z1, z2 = zs
            actions = pol.apply(pol_params, states, pol_noise,
                                return_samples=True)
            next_states, rewards = dyn.apply(
                dyn_params, dyn_stats, states, actions, dyn_noise,
                return_samples=True, separate_outputs=True, deltas=False)
            if mm_states:
                next_states = mm_resample_psum(next_states, z1, axis_name)
            if mm_rewards:
                rewards = mm_resample_psum(rewards, z2, axis_name)
            return next_states, rewards

        _, rewards = jax.lax.scan(step, x0, (z_mm_t, z_rr_t))
        # mean over the GLOBAL particle axis: local sum, psum, divide
        n_local = rewards.shape[1]
        n = jax.lax.psum(jnp.asarray(n_local, rewards.dtype), axis_name)
        disc_sum = jnp.sum(jnp.sum(rewards[..., 0] * w_t[:, None], 0))
        ret = jax.lax.psum(disc_sum, axis_name) / n
        return -ret if maximize else ret

    p = P(axis_name)
    tp = P(None, axis_name)
    r = P()
    sharded = shard_map(
        local_rollout_loss, mesh=mesh,
        in_specs=(r, p, r, r, p, p, tp, tp),
        out_specs=r)

    def loss(pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
             z_mm, z_rr):
        # per-step cyclically shifted fixed noise (get_z_rnd semantics)
        z_mm_t = jnp.stack([jnp.roll(z_mm, -t, 0) for t in range(steps)])
        z_rr_t = jnp.stack([jnp.roll(z_rr, -t, 0) for t in range(steps)])
        return sharded(pol_params, x0, dyn_params, dyn_stats,
                       dyn_noise, pol_noise, z_mm_t, z_rr_t)

    return loss
