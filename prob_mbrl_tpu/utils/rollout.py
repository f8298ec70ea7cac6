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
import numpy as np

from ..ops import moment_matching as mm

# Static (shape-derived) index constants below are numpy on purpose: a
# `jnp.arange` on static inputs executes eagerly on the default device even
# mid-trace, which on a remote-attached TPU costs a network round-trip per
# line per trace (and another when lowering embeds the constant).


def get_z_rnd(z, i, batch):
    """Cyclic indexing of fixed noise (`rollout.py:53-59`).

    Matches the reference quirk: indices wrap modulo the *batch size*, not the
    noise buffer length, so only the first ``batch`` rows are ever used.
    """
    idxs = (i + np.arange(batch)) % batch
    return z[idxs]


def _mm_step(x, z, mm_groups, infer_noise_variables, jitter=1e-12,
             mm_method='cholesky', standardized=False):
    if mm_method == 'mix' and not infer_noise_variables:
        if mm_groups is not None:
            return mm.grouped_mix(x, z, mm_groups)
        return mm.mm_resample_mix(x, z)
    if infer_noise_variables:
        fn = mm.mm_resample_infer_ns
    elif standardized:
        fn = partial(mm.mm_resample, standardized=True)
    else:
        fn = mm.mm_resample
    if mm_groups is not None:
        return mm.grouped(mm.mm_resample_infer_ns if infer_noise_variables
                          else mm.mm_resample, x, z, mm_groups, jitter)
    return fn(x, z, jitter)


def _mix_is_per_step(U, steps, mm_groups):
    """True if a mixing-matrix buffer carries a leading per-step axis."""
    base_ndim = 3 if mm_groups is not None else 2
    return U.ndim == base_ndim + 1 and U.shape[0] == steps


def pre_roll_mixing(U, steps):
    """Compose the step-indexed cyclic permutation into a mixing matrix.

    The reference decorrelates consecutive MM steps by cycling its fixed-noise
    rows (`rollout.py:53-59`); for mixing matrices the equivalent is ``Π^t U``
    — a static roll of U's rows per step. Build this ONCE per PEGASUS noise
    epoch (outside all hot loops: a dynamic in-scan roll would lower to a
    gather whose backward is a TPU-hostile scatter) and feed the [T, ..., M,
    M] stack through the scan's xs.
    """
    return jax.vmap(lambda t: jnp.roll(U, t, axis=-2))(np.arange(steps))


def _mm_mix(x, U, mm_groups, shift=None):
    if mm_groups is not None:
        return mm.grouped_mix(x, U, mm_groups, shift=shift)
    return mm.mm_resample_mix(x, U, shift=shift)


def _mm_rewards_batched(rewards, z_rr, steps, B, mm_groups,
                        infer_noise_variables, mm_method, mean_only=False):
    """Reward moment matching vectorized over the whole horizon.

    Rewards never re-enter the state recursion, so their per-step MM resample
    (`rollout.py:146-150`) has no sequential dependency — apply it to the
    full [T, B, 1] stack at once with the per-step fixed noise.

    ``mean_only``: analytic shortcut for consumers that only ever reduce the
    resampled rewards with a plain particle mean (the MC-PILCO loss with CVaR
    off and no TD critic refit). The resample is ``m + z @ chol(S)^T`` with
    ``z`` standardized to EXACT zero particle-mean, so its particle mean is
    ``m`` and the loss gradient through the ``chol(S)`` branch is scaled by
    ``mean(z) = 0`` — value and gradients of any particle-mean functional are
    unchanged (to float rounding) if the resample is replaced by its per-step
    (per-group) mean broadcast. The full [T, B, 1] resample chain is pure
    per-op overhead at large B (measured 30% of device busy time at B=4096
    cholesky — ``results/profile_b4096_chol_digest.md``); the shortcut
    measured 33.1M -> 40.2M particle-steps/s there. Callers gate it on the
    loss actually being a plain mean (`algorithms/mc_pilco.py`); the mix
    method preserves particle means exactly as well (U @ 1 = 1), so the
    shortcut is valid for every mm_method, but it is skipped under
    ``infer_noise_variables`` (identity-preserving semantics are the point
    of that variant).
    """
    if mean_only and not infer_noise_variables:
        if mm_groups is not None:
            D = rewards.shape[-1]
            g = rewards.reshape(steps, mm_groups, -1, D)
            m = jnp.mean(g, -2, keepdims=True)
            return jnp.broadcast_to(m, g.shape).reshape(rewards.shape)
        m = jnp.mean(rewards, -2, keepdims=True)
        return jnp.broadcast_to(m, rewards.shape)
    if mm_method == 'mix' and not infer_noise_variables:
        if _mix_is_per_step(z_rr, steps, mm_groups):
            # batched matmul over the whole horizon
            return jax.vmap(lambda r, U: _mm_mix(r, U, mm_groups))(
                rewards, z_rr)
        # single shared matrix: per-step cyclic roll of the mixed cloud
        # decorrelates consecutive steps (== Pi^t U, see mm_resample_mix)
        return jax.vmap(lambda r, t: _mm_mix(r, z_rr, mm_groups, shift=t))(
            rewards, np.arange(steps))

    if mm_groups is None and not infer_noise_variables:
        # standardization commutes with the cyclic roll: do it once on the
        # bank instead of per [T] slice (see ops.standardize_noise)
        z_rr = mm.standardize_noise(z_rr)
        tb = (np.arange(steps)[:, None] + np.arange(B)[None, :]) % B
        return mm.mm_resample(rewards, z_rr[tb], 1e-12, standardized=True)
    tb = (np.arange(steps)[:, None] + np.arange(B)[None, :]) % B
    z = z_rr[tb]                                               # [T, B, zD]
    fn = (mm.mm_resample_infer_ns if infer_noise_variables
          else mm.mm_resample)
    if mm_groups is not None:
        D = rewards.shape[-1]
        zD = z.shape[-1]
        out = fn(rewards.reshape(steps, mm_groups, -1, D),
                 z.reshape(steps, mm_groups, -1, zD), 1e-12)
        return out.reshape(steps, -1, D)
    return fn(rewards, z, 1e-12)


def rollout(x0, dyn, pol, steps, dyn_params, dyn_stats, pol_params,
            dyn_noise, pol_noise,
            mm_states=False, mm_rewards=False, infer_noise_variables=False,
            z_mm=None, z_rr=None, mm_groups=None, mm_method='cholesky',
            resample_state_noise=False, resample_action_noise=False,
            key=None, value_fn=None, q_fn=None, action_eps=None,
            unroll=1, mm_rewards_mean_only=False):
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
      mm_rewards_mean_only: replace the reward MM resample with its exact
        per-step (per-group) particle mean — valid ONLY when every consumer
        reduces rewards with a plain particle mean (see
        ``_mm_rewards_batched``; `algorithms/mc_pilco.py` gates this on CVaR
        and the TD critic refit being off).
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

    xs = {'t': np.arange(steps)}
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
        # Per-step mixing matrices ([T, ..., M, M], e.g. from
        # ``pre_roll_mixing``) stream through xs; a single matrix is closed
        # over and decorrelated per step by an in-scan cyclic roll of the
        # mixed cloud (== Pi^t U) — so one [M, M] matrix per PEGASUS epoch
        # is ever materialized, not a [T, M, M] stack.
        if mm_states and _mix_is_per_step(z_mm, steps, mm_groups):
            xs['z_mm'] = z_mm
    z_standardized = False
    if not use_mix and mm_states:
        # the cholesky z-buffers are cyclically pre-rolled into per-step xs;
        # ungrouped noise is standardized ONCE here (commutes with the roll)
        # instead of inside each of the T in-scan MM calls
        if mm_groups is None and not infer_noise_variables:
            z_mm = mm.standardize_noise(z_mm)
            z_standardized = True
        tb = (np.arange(steps)[:, None] + np.arange(B)[None, :]) % B
        xs['z_mm'] = z_mm[tb]

    # The reward pipeline never feeds back into the state recursion, so it is
    # hoisted OUT of the sequential time scan entirely: the scan carries only
    # the state recursion (policy -> dynamics -> state MM), and rewards —
    # analytic reward evaluation for known-reward models, plus the reward
    # moment-matching resample — are computed afterwards, batched over the
    # whole [T, B] trajectory in a handful of large ops. Matches the
    # reference per-step semantics (`rollout.py:93-153`): rewards are
    # evaluated on the PRE-state-MM next states.
    known_reward = dyn.reward_func is not None

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
        if known_reward:
            next_states = dyn.apply(
                dyn_params, dyn_stats, states, actions, d_noise,
                return_samples=True, separate_outputs=True, deltas=False,
                with_rewards=False)
            rewards = None
        else:
            next_states, rewards = dyn.apply(
                dyn_params, dyn_stats, states, actions, d_noise,
                return_samples=True, separate_outputs=True, deltas=False)

        raw_next_states = next_states
        if mm_states:
            if use_mix:
                if 'z_mm' in step_xs:  # pre-rolled per-step matrices
                    next_states = _mm_mix(next_states, step_xs['z_mm'],
                                          mm_groups)
                else:  # shared matrix + in-scan cyclic decorrelation
                    next_states = _mm_mix(next_states, z_mm, mm_groups,
                                          shift=t)
            else:
                next_states = _mm_step(next_states, step_xs['z_mm'],
                                       mm_groups, infer_noise_variables,
                                       mm_method=mm_method,
                                       standardized=z_standardized)

        out = {'states': states, 'actions': actions}
        if known_reward:
            if mm_states:
                out['raw_next_states'] = raw_next_states
        else:
            out['rewards'] = rewards
        if value_fn is not None:
            out['values'] = value_fn(jax.lax.stop_gradient(states))
        if q_fn is not None:
            out['qvalues'] = q_fn(jax.lax.stop_gradient(states),
                                  jax.lax.stop_gradient(actions))
        return next_states, out

    last_states, traj = jax.lax.scan(step, x0, xs, unroll=unroll)
    states = jnp.concatenate([traj['states'], last_states[None]], 0)

    # -- hoisted reward pipeline, batched over [T, B] -----------------------
    if known_reward:
        if mm_states:
            raw_next = traj['raw_next_states']
        else:
            raw_next = jnp.concatenate([traj['states'][1:],
                                        last_states[None]], 0)
        rewards = dyn.reward_func(raw_next, traj['actions'])
    else:
        rewards = traj['rewards']
    if mm_rewards:
        rewards = _mm_rewards_batched(rewards, z_rr, steps, B, mm_groups,
                                      infer_noise_variables, mm_method,
                                      mean_only=mm_rewards_mean_only)

    result = [states, traj['actions'], rewards]
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
