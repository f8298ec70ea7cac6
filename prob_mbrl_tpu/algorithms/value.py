"""Fitted value / Q-function TD(H) updates with target networks.

TPU-first redesign of the critic-update hooks in
`examples/deep_pilco_no_mm_with_value.py:14-121`. The reference implements
these as `on_rollout` callbacks mutating a torch module + a Polyak-averaged
deep copy; here they are jitted pure functions over (params, target_params,
opt_state).

TD(H) semantics (`deep_pilco_no_mm_with_value.py:31-54`):
  ``targets = sum_j gamma(j) r_j  +  gamma(H) V_tgt(s_H)`` (detached), with
  V0 and VH evaluated under *seed-matched* dropout masks — here simply the
  same noise pytree for both evaluations.

Divergence from the reference (documented, not replicated): with a density
head the reference minimizes ``+log_prob(targets | pV0)``
(`deep_pilco_no_mm_with_value.py:55`), i.e. it *descends* the likelihood —
a sign bug that anti-learns. This implementation minimizes the negative
log-likelihood.
"""
from functools import partial

import jax
import jax.numpy as jnp
import optax

from ..utils.core import polyak_averaging
from .mc_pilco import discount_weights


def make_value_update_fn(V, optimizer, H, discount=None, reg_weight=1e-4,
                         polyak=0.005, use_density=True):
    """Build a jitted TD(H) fitted-value update.

    Args:
      V: ``models.Regressor`` spec for the critic (static). ``use_density``
        selects the NLL loss (density head) vs MSE (plain head).
      optimizer: optax transformation for the critic.
      H: bootstrap horizon (static).
      discount: None (uniform 1/H) / float gamma / callable, as in mc_pilco.
      reg_weight: dropout-regularizer weight.
      polyak: target-network soft-update coefficient tau.

    Returns:
      ``update(params, target_params, opt_state, stats, states, rewards,
      key=None, noise=None)`` -> (params, target_params, opt_state, loss)
      where states is [T+1, B, D] and rewards [T, B, 1] from a rollout
      (T >= H). Exactly one of ``key``/``noise`` must be given: ``key``
      draws fresh critic dropout masks for this update; ``noise`` (a noise
      pytree from ``V.sample_noise``) evaluates under caller-provided
      masks — pass the PEGASUS per-epoch pytree for the reference's
      frozen-mask semantics, where the critic update and the terminal
      bootstrap share the cached masks
      (`deep_pilco_no_mm_with_value.py:24,39-40`).

    Note on ``polyak``: the reference's default driver never passes
    ``V_target``, so its bootstrap is the live critic itself
    (`deep_pilco_no_mm_with_value.py:26,332`) — ``polyak=1.0`` reproduces
    that (target == params after every update); ``polyak<1`` adds the soft
    target network the reference implements but does not enable.
    """
    w_t, w_H = discount_weights(discount, H)

    def loss_fn(params, target_params, stats, s0, sH, returns, noise):
        if use_density:
            pV0 = V.apply(params, stats, s0, noise, return_samples=False)
            VH = V.apply(target_params, stats, sH, noise,
                         return_samples=True)
            targets = returns + w_H * jax.lax.stop_gradient(VH)
            loss = -V.output_density.log_prob(targets, *pV0).mean()
        else:
            V0 = V.apply(params, stats, s0, noise, return_samples=False)
            VH = V.apply(target_params, stats, sH, noise,
                         return_samples=False)
            targets = returns + w_H * jax.lax.stop_gradient(VH)
            loss = jnp.mean((V0 - targets) ** 2)
        return loss + reg_weight * V.regularization_loss(params)

    def core(params, target_params, opt_state, stats, s0, sH, returns,
             noise):
        """One TD(H) update from precomputed (s0, sH, returns).

        Pure-jnp core shared by :func:`update` (which slices them out of a
        trajectory stack) and the fused Pallas rollout kernel (which has
        s0/sH/returns in registers already and traces this exact update
        INSIDE the kernel body — `ops/pallas/fused_rollout.py`).
        """
        loss, grads = jax.value_and_grad(loss_fn)(
            params, target_params, stats, s0, sH, returns, noise)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        target_params = polyak_averaging(params, target_params, polyak)
        return params, target_params, opt_state, loss

    @jax.jit
    def update(params, target_params, opt_state, stats, states, rewards,
               key=None, noise=None):
        returns = jnp.sum(rewards[:H] * w_t[:, None, None], 0)
        returns = jax.lax.stop_gradient(returns)
        s0 = jax.lax.stop_gradient(states[0])
        sH = jax.lax.stop_gradient(states[H])
        # seed-matched masks for V0 and VH: one noise pytree, used twice
        # (`deep_pilco_no_mm_with_value.py:36-38`). Callers in a PEGASUS
        # loop pass the per-epoch noise pytree directly (the reference
        # evaluates the critic with resample=False, i.e. masks stay FIXED
        # across the whole policy optimization — per-iteration fresh masks
        # inject bootstrap-gradient noise that measurably destabilizes the
        # variant, see RESULTS.md round 3).
        if noise is None:
            if key is None:
                raise ValueError(
                    'make_value_update_fn: pass either key= (fresh masks '
                    'per update) or noise= (caller-provided frozen masks); '
                    'both were None')
            noise = V.sample_noise(key, (s0.shape[0],))
        return core(params, target_params, opt_state, stats, s0, sH,
                    returns, noise)

    # attributes the fused rollout kernel needs to trace the SAME update
    # in-kernel (see ops/pallas/fused_rollout.py): the pure core, the
    # critic spec, and the TD(H) discount weights for the returns sum
    update.core = core
    update.spec = V
    update.H = H
    update.w_t = w_t
    update.w_H = w_H
    return update


def make_q_update_fn(Q, pol, optimizer, H, discount=None, reg_weight=1e-4,
                     polyak=0.005, use_density=False):
    """Jitted TD(H) Q-function update (`deep_pilco_no_mm_with_value.py:71-121`).

    ``targets = sum_j gamma(j) r_j + gamma(H) Q_tgt(s_H, pi(s_H))``.
    Returns ``update(params, target_params, opt_state, stats, pol_params,
    states, actions, rewards, key)`` -> (params, target_params, opt_state,
    loss).
    """
    w_t, w_H = discount_weights(discount, H)

    def loss_fn(params, target_params, stats, s0a0, sHaH, returns, noise):
        if use_density:
            pQ0 = Q.apply(params, stats, s0a0, noise, return_samples=False)
            QH = Q.apply(target_params, stats, sHaH, noise,
                         return_samples=True)
            targets = returns + w_H * jax.lax.stop_gradient(QH)
            loss = -Q.output_density.log_prob(targets, *pQ0).mean()
        else:
            Q0 = Q.apply(params, stats, s0a0, noise, return_samples=False)
            QH = Q.apply(target_params, stats, sHaH, noise,
                         return_samples=False)
            targets = returns + w_H * jax.lax.stop_gradient(QH)
            loss = jnp.mean((Q0 - targets) ** 2)
        N = returns.shape[0]
        return loss + reg_weight * Q.regularization_loss(params) / N

    @jax.jit
    def update(params, target_params, opt_state, stats, pol_params, states,
               actions, rewards, key):
        returns = jnp.sum(rewards[:H] * w_t[:, None, None], 0)
        returns = jax.lax.stop_gradient(returns)
        kq, kp = jax.random.split(key)
        B = states.shape[1]
        s0a0 = jnp.concatenate([states[0], actions[0]], -1)
        pol_noise = pol.sample_noise(kp, (B,))
        aH = pol.apply(pol_params, states[H], pol_noise, return_samples=True)
        sHaH = jnp.concatenate([states[H], aH], -1)
        s0a0 = jax.lax.stop_gradient(s0a0)
        sHaH = jax.lax.stop_gradient(sHaH)
        noise = Q.sample_noise(kq, (B,))
        loss, grads = jax.value_and_grad(loss_fn)(
            params, target_params, stats, s0a0, sHaH, returns, noise)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        target_params = polyak_averaging(params, target_params, polyak)
        return params, target_params, opt_state, loss

    return update
