"""Imagined-trajectory rollout engine: ``lax.scan`` over time, particles in
lockstep.

TPU-first redesign of the reference rollout (`prob_mbrl/utils/rollout.py:62-163`).
The reference runs a Python loop over time with mutable mask buffers and
try/except around Cholesky failures; here the whole horizon is one
``lax.scan`` under jit, PEGASUS noise is an explicit pytree argument, and
Cholesky failures are handled by in-graph jitter escalation
(``ops.math.safe_cholesky``).

Per step (matching `rollout.py:93-153`):
  1. policy eval: actions = pol(states) (sampled, tanh-squashed)
  2. dynamics eval: next_states, rewards = dyn(states, actions) (sampled)
  3. optional moment-matching resample of next_states and rewards against the
     cyclically-indexed fixed noise z_mm / z_rr (PEGASUS,
     `rollout.py:53-59,96-97`)

Outputs are stacked arrays: states [T+1, B, D], actions [T, B, U],
rewards [T, B, 1] — the reference returns lists with the same layout.

Non-PEGASUS mode (fresh state/action noise each step) pre-samples a
[T, ...]-leading noise pytree and feeds it through the scan's xs, so the
compiled program stays shape-static.
"""
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import moment_matching as mm


def get_z_rnd(z, i, batch):
    """Cyclic indexing of fixed noise (`rollout.py:53-59`).

    Matches the reference quirk: indices wrap modulo the *batch size*, not the
    noise buffer length, so only the first ``batch`` rows are ever used.
    """
    idxs = (i + jnp.arange(batch)) % batch
    return z[idxs]


def _mm_step(x, z, mm_groups, infer_noise_variables, jitter=1e-12,
             mm_method='cholesky'):
    if mm_method == 'mix' and not infer_noise_variables:
        if mm_groups is not None:
            return mm.grouped_mix(x, z, mm_groups)
        return mm.mm_resample_mix(x, z)
    fn = (mm.mm_resample_infer_ns if infer_noise_variables
          else mm.mm_resample)
    if mm_groups is not None:
        return mm.grouped(fn, x, z, mm_groups, jitter)
    return fn(x, z, jitter)


def _mm_mix_rolled(x, U, t, mm_groups):
    """Mixing MM with the step-indexed cyclic permutation composed in.

    The reference decorrelates consecutive MM steps by cycling its fixed-noise
    rows (`rollout.py:53-59`); for mixing matrices the equivalent is composing
    ``Π^t U`` — implemented as a cheap roll of the [M, D] *output* rows, so
    the in-scan fixed noise stays one [M, M] matrix instead of a per-step
    [T, M, M] stack.
    """
    if mm_groups is not None:
        out = mm.grouped_mix(x, U, mm_groups)
        D = x.shape[-1]
        out = out.reshape(mm_groups, -1, D)
        out = jnp.roll(out, t, axis=-2)
        return out.reshape(-1, D)
    return jnp.roll(mm.mm_resample_mix(x, U), t, axis=-2)


def rollout(x0, dyn, pol, steps, dyn_params, dyn_stats, pol_params,
            dyn_noise, pol_noise,
            mm_states=False, mm_rewards=False, infer_noise_variables=False,
            z_mm=None, z_rr=None, mm_groups=None, mm_method='cholesky',
            resample_state_noise=False, resample_action_noise=False,
            key=None, value_fn=None, q_fn=None, action_eps=None,
            unroll=1):
    """Roll imagined particles through the learned dynamics under the policy.

    Args:
      x0: [B, D] initial particle states.
      dyn: ``models.DynamicsModel`` spec.
      pol: ``models.Policy`` spec.
      steps: horizon T (static).
      dyn_params/dyn_stats: dynamics parameters and normalization stats.
      pol_params: policy parameters.
      dyn_noise/pol_noise: PEGASUS noise pytrees with batch dim B (dropout
        masks + density noise). Reuse across calls = fixed random numbers.
      mm_states/mm_rewards: moment-matching resample toggles.
      infer_noise_variables: use the particle-identity-preserving MM kernel.
      z_mm: fixed MM noise for states; required if mm_states. Shape [>=B, D]
        for ``mm_method='cholesky'``, or a [B, B] (grouped:
        [G, B/G, B/G]) orthogonal mixing from ``ops.sample_mm_mixing`` for
        ``mm_method='mix'``.
      z_rr: fixed MM noise for rewards (shapes as above with D=1); required
        if mm_rewards.
      mm_groups: number of independent MM groups (None = all particles).
      mm_method: 'cholesky' = reference-exact ``m + z @ chol(S)^T``
        (`rollout.py:20-29`); 'mix' = TPU-native orthogonal particle mixing
        ``m + U @ (x - m)`` (exact moments, single MXU matmul, no Cholesky
        in the hot loop — see ``ops.moment_matching``).
      resample_state_noise / resample_action_noise: draw fresh *density* noise
        each step (non-PEGASUS propagation). Requires ``key``.
      key: PRNG key for per-step noise when resampling.
      value_fn: optional jittable closure ``states [B, D] -> values [B, 1]``
        (a Regressor.apply partial-ed with its params/stats/noise). When
        given, per-step V(s) samples are returned too, matching
        ``rollout_with_values`` (`rollout.py:166-227`).
      q_fn: optional jittable closure ``(states, actions) -> q [B, 1]``;
        per-step Q(s, a) samples are appended, matching
        ``rollout_with_Qvalues`` (`rollout.py:230-295`). The terminal entry
        evaluates Q at the last state with a fresh policy action.
      action_eps: optional [T, B, U] perturbation added to the actions each
        step. Pass zeros and differentiate the loss w.r.t. it to read off
        per-step action gradients — the jit-native replacement for the
        reference's backward hooks on actions (`mc_pilco.py:156-188`), used
        for prioritized-replay gradient-norm priorities.

    Returns:
      (states [T+1, B, D], actions [T, B, U], rewards [T, B, 1]) and, when
      ``value_fn`` is given, values [T+1, B, 1] appended as a 4th element.
    """
    B = x0.shape[0]

    # pre-sample per-step density noise for non-PEGASUS propagation
    def per_step_density(sample_fn, subkey):
        keys = jax.random.split(subkey, steps)
        return jax.vmap(lambda k: sample_fn(k, (B,))['density'])(keys)

    xs = {'t': jnp.arange(steps)}
    if resample_state_noise or resample_action_noise:
        assert key is not None, 'key required when resampling noise per step'
        kd, kp = jax.random.split(key)
        if resample_state_noise:
            xs['dyn_density'] = per_step_density(dyn.sample_noise, kd)
        if resample_action_noise and 'density' in pol_noise:
            xs['pol_density'] = per_step_density(pol.sample_noise, kp)
    if action_eps is not None:
        xs['action_eps'] = action_eps

    # Pre-roll the cyclic PEGASUS noise for every step OUTSIDE the scan:
    # one [T, B, D] gather at trace time instead of a per-step dynamic
    # gather (whose backward is a scatter) inside the hot loop.
    use_mix = mm_method == 'mix' and not infer_noise_variables
    if use_mix:
        pass  # the mixing matrices are closed over; Π^t composed per step
    else:
        if mm_states:
            tb = (jnp.arange(steps)[:, None] + jnp.arange(B)[None, :]) % B
            xs['z_mm'] = z_mm[tb]
        if mm_rewards:
            tb = (jnp.arange(steps)[:, None] + jnp.arange(B)[None, :]) % B
            xs['z_rr'] = z_rr[tb]

    def step(states, step_xs):
        t = step_xs['t']
        d_noise = dict(dyn_noise)
        p_noise = dict(pol_noise)
        if 'dyn_density' in step_xs:
            d_noise['density'] = step_xs['dyn_density']
        if 'pol_density' in step_xs:
            p_noise['density'] = step_xs['pol_density']

        actions = pol.apply(pol_params, states, p_noise, return_samples=True)
        if 'action_eps' in step_xs:
            actions = actions + step_xs['action_eps']
        next_states, rewards = dyn.apply(
            dyn_params, dyn_stats, states, actions, d_noise,
            return_samples=True, separate_outputs=True, deltas=False)

        if mm_states:
            if use_mix:
                next_states = _mm_mix_rolled(next_states, z_mm, t, mm_groups)
            else:
                next_states = _mm_step(next_states, step_xs['z_mm'],
                                       mm_groups, infer_noise_variables,
                                       mm_method=mm_method)
        if mm_rewards:
            if use_mix:
                rewards = _mm_mix_rolled(rewards, z_rr, t, mm_groups)
            else:
                rewards = _mm_step(rewards, step_xs['z_rr'], mm_groups,
                                   infer_noise_variables,
                                   mm_method=mm_method)

        out = {'states': states, 'actions': actions, 'rewards': rewards}
        if value_fn is not None:
            out['values'] = value_fn(jax.lax.stop_gradient(states))
        if q_fn is not None:
            out['qvalues'] = q_fn(jax.lax.stop_gradient(states),
                                  jax.lax.stop_gradient(actions))
        return next_states, out

    last_states, traj = jax.lax.scan(step, x0, xs, unroll=unroll)
    states = jnp.concatenate([traj['states'], last_states[None]], 0)
    result = [states, traj['actions'], traj['rewards']]
    if value_fn is not None:
        v_last = value_fn(last_states)
        result.append(jnp.concatenate([traj['values'], v_last[None]], 0))
    if q_fn is not None:
        last_actions = pol.apply(pol_params, last_states, pol_noise,
                                 return_samples=True)
        q_last = q_fn(jax.lax.stop_gradient(last_states),
                      jax.lax.stop_gradient(last_actions))
        result.append(jnp.concatenate([traj['qvalues'], q_last[None]], 0))
    return tuple(result)


def rollout_with_values(x0, dyn, pol, steps, V, dyn_params, dyn_stats,
                        pol_params, dyn_noise, pol_noise, value_params,
                        value_stats, value_noise=None, **kwargs):
    """Rollout + per-step V(s) samples (`rollout.py:166-227`).

    Returns (states [T+1, B, D], actions, rewards, values [T+1, B, 1]).
    """
    def value_fn(states):
        return V.apply(value_params, value_stats, states, value_noise,
                       return_samples=True)

    return rollout(x0, dyn, pol, steps, dyn_params, dyn_stats, pol_params,
                   dyn_noise, pol_noise, value_fn=value_fn, **kwargs)


def rollout_with_Qvalues(x0, dyn, pol, steps, Q, dyn_params, dyn_stats,
                         pol_params, dyn_noise, pol_noise, q_params, q_stats,
                         q_noise=None, **kwargs):
    """Rollout + per-step Q(s, a) samples (`rollout.py:230-295`).

    Returns (states, actions, rewards, qvalues [T+1, B, 1]); the terminal
    Q evaluates a fresh policy action at the last state.
    """
    def q_fn(states, actions):
        sa = jnp.concatenate([states, actions], -1)
        return Q.apply(q_params, q_stats, sa, q_noise, return_samples=True)

    return rollout(x0, dyn, pol, steps, dyn_params, dyn_stats, pol_params,
                   dyn_noise, pol_noise, q_fn=q_fn, **kwargs)


def make_rollout_fn(dyn, pol, steps, mm_states=False, mm_rewards=False,
                    infer_noise_variables=False, mm_groups=None,
                    mm_method='cholesky',
                    resample_state_noise=False, resample_action_noise=False):
    """Build a jittable rollout closure with static config baked in."""

    def fn(x0, dyn_params, dyn_stats, pol_params, dyn_noise, pol_noise,
           z_mm=None, z_rr=None, key=None):
        return rollout(x0, dyn, pol, steps, dyn_params, dyn_stats, pol_params,
                       dyn_noise, pol_noise, mm_states=mm_states,
                       mm_rewards=mm_rewards,
                       infer_noise_variables=infer_noise_variables,
                       z_mm=z_mm, z_rr=z_rr, mm_groups=mm_groups,
                       mm_method=mm_method,
                       resample_state_noise=resample_state_noise,
                       resample_action_noise=resample_action_noise, key=key)

    return fn
