"""MC-PILCO / Deep-PILCO policy optimization.

TPU-first redesign of `prob_mbrl/algorithms/mc_pilco.py:13-267`. The reference
runs 1000 host-dispatched optimizer iterations per episode, each doing a
Python-loop rollout with mutable mask buffers and try/except Cholesky
recovery. Here the *entire policy optimization* — PEGASUS noise epochs,
initial-state sampling, `lax.scan` particle rollouts, CVaR filtering, policy
gradients, clipping and optax updates — compiles to one XLA program
(``make_mc_pilco_fn``), so an episode's policy update is a single device
launch.

Semantics mirrored from the reference:
  * default discount = uniform ``1/steps`` (`mc_pilco.py:47-50`), or
    ``gamma**t`` when a float is given;
  * PEGASUS: dropout masks, density noise and the MM noise buffers are all
    derived from an epoch key ``fold_in(key, n_opt_steps // period)`` —
    "resample every ``resampling_period`` steps, atomically"
    (`mc_pilco.py:64-91`). The global step counter is threaded through calls,
    matching the reference's ``policy_update_counter``;
  * non-PEGASUS: fresh noise every iteration + fresh density noise every
    rollout step (`rollout.py:101-104` resample flags);
  * value bootstrap: ``discount(H) * V(s_H)`` appended to the discounted
    reward stack (`mc_pilco.py:136-140`);
  * CVaR filtering on per-particle returns (`mc_pilco.py:146-154`):
    ``cvar_eps > 0`` keeps the lowest-``eps`` quantile of (possibly negated)
    returns, ``cvar_eps < 0`` the highest. Implemented with a static-k
    ``lax.top_k`` instead of a data-dependent boolean mask;
  * gradient-norm prioritized initial-state replay (`mc_pilco.py:156-188`):
    the reference reads per-step action gradients through backward hooks; here
    a zero action-perturbation input is differentiated instead (see
    ``utils.rollout`` ``action_eps``), which is hook-free and jit-native. The
    SumTree itself stays host-side (``mc_pilco`` loop mode).
"""
import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops.math import clip_grad_norm
from ..ops.moment_matching import sample_mm_mixing
from ..utils.rollout import rollout as rollout_fn
from ..utils.experience import SumTree
from ..utils.core import tile


def discount_weights(discount, steps, dtype=jnp.float32):
    """[T] per-step discount weights + the terminal discount(H) scalar.

    ``discount=None`` -> uniform 1/steps (`mc_pilco.py:47-48`);
    float -> gamma**t; callable -> [discount(t) for t in range(T)].
    """
    if discount is None:
        w = np.full((steps,), 1.0 / steps)
        wH = 1.0 / steps
    elif callable(discount):
        w = np.array([discount(t) for t in range(steps)])
        wH = discount(steps)
    else:
        w = discount ** np.arange(steps)
        wH = discount ** steps
    # numpy on purpose: called at trace time in every training jit; a device
    # constant here costs remote round-trips per trace (see ops/math.py note)
    dtype = np.dtype(dtype)
    return np.asarray(w, dtype), dtype.type(wH)


def cvar_filter(returns, cvar_eps):
    """Static-shape CVaR quantile filter (`mc_pilco.py:146-154`).

    Returns (selected_returns, k): for ``cvar_eps`` in (0, 1) the k lowest
    returns, for (-1, 0) the k highest; otherwise all returns.
    """
    B = returns.shape[0]
    if not (-1.0 < cvar_eps < 1.0) or cvar_eps == 0.0:
        return returns, B
    k = max(1, int(round(abs(cvar_eps) * B)))
    if cvar_eps > 0:  # keep lowest-eps quantile
        vals, _ = jax.lax.top_k(-returns, k)
        return -vals, k
    vals, _ = jax.lax.top_k(returns, k)
    return vals, k


@dataclasses.dataclass(frozen=True)
class MCPILCOConfig:
    """Static configuration of the jitted MC-PILCO policy optimizer."""
    n_particles: int = 100
    steps: int = 15
    pegasus: bool = True
    mm_states: bool = False
    mm_rewards: bool = False
    mm_groups: Optional[int] = None
    # 'cholesky' = reference-exact m + z @ chol(S)^T resampling to a Gaussian
    # (`rollout.py:20-29`) — the default, matching ``utils.rollout``;
    # 'mix' = EXPERIMENTAL orthogonal particle mixing (exact empirical
    # moments, one MXU matmul per MM step). It does NOT re-Gaussianize the
    # particle cloud (only CLT-asymptotically): heavy-tailed clouds from a
    # poor dynamics model persist across the horizon and can kill learning
    # on some seeds (reproduced full-scale and at compressed scale —
    # RESULTS.md round 3). Keep 'cholesky' unless you know your clouds stay
    # well-behaved.
    mm_method: str = 'cholesky'
    infer_noise_variables: bool = False
    maximize: bool = True
    clip_grad: Optional[float] = 1.0
    cvar_eps: float = 0.0
    reg_weight: float = 0.0
    discount: Union[None, float, Callable] = None
    init_state_noise: float = 0.0
    resampling_period: int = 499
    with_priorities: bool = False
    # lax.scan unroll factor for the 15-step rollout inside the optimizer
    # scan. The horizon is short and static, so unrolling lets XLA fuse
    # across consecutive steps' small VPU ops (the MM chain especially) at
    # the cost of a larger program; measured A/B in BASELINE.md (cholesky-MM
    # headline: 2.1M -> 2.9M particle-steps/s at full unroll). None = auto:
    # fully unroll horizons up to 16 steps, keep the scan beyond that.
    rollout_unroll: Optional[int] = None
    # unroll factor for the outer optimizer-iteration scan (sequential
    # params dependence limits cross-iteration ILP; measured A/B in
    # BASELINE.md before keeping the default at 1)
    iteration_unroll: int = 1
    # Fuse the whole rollout + loss (fwd AND bwd) into single Pallas
    # mega-kernels (`ops/pallas/fused_rollout.py`). The headline iteration
    # otherwise lowers to ~1600 leaf HLO ops whose per-op overhead dominates
    # at small particle counts. Covers cholesky-MM / no-MM / grouped MM /
    # learned rewards / the TD(H) value bootstrap / shard_map meshes
    # (see fused_rollout.fused_mode); mid-size MM batches ride a
    # grid-pipelined tier (grid=(T,), VMEM-scratch carry), while
    # compute-bound large batches and bf16 configs deliberately take the
    # XLA path, which measures faster there (BASELINE.md round-5
    # section). None = auto (on when the configuration is
    # supported and the backend is a TPU); True forces it (interpret-mode on
    # CPU — slow, for tests); False disables.
    fused_rollout: Optional[bool] = None
    # critic dropout-mask schedule for the in-scan TD(H) refit:
    # 'epoch' = the reference semantics — the critic update reuses the SAME
    # per-epoch noise pytree as the terminal-bootstrap evaluation (the
    # reference evaluates V with resample=False, so the cached masks set by
    # value_func.resample() at PEGASUS epoch boundaries are shared between
    # update_value_function and the policy-loss Vend,
    # `deep_pilco_no_mm_with_value.py:24,39-40` + `mc_pilco.py:64-68,137`);
    # 'iter' = fresh masks per update iteration (round-3 experiment).
    val_mask_mode: str = 'epoch'


_FN_CACHE = {}
_FN_CACHE_MAX = 64

# Largest ungrouped orthogonal-mixing matrix before 'mix' moment matching
# auto-partitions particles into independent groups (see make_mc_pilco_fn).
MIX_AUTO_GROUP_SIZE = 256


def make_mc_pilco_fn(dyn, pol, config, optimizer, value_spec=None,
                     value_update=None, mesh=None,
                     particle_axis='particles'):
    """Build the jitted MC-PILCO policy-optimization function.

    Results are cached on (specs, config, optimizer) identity so repeated
    calls across episodes reuse the same jitted program (and its XLA
    compilation cache) instead of re-tracing every episode.

    Args:
      dyn: ``models.DynamicsModel`` spec (static).
      pol: ``models.Policy`` spec (static).
      config: ``MCPILCOConfig``.
      optimizer: optax GradientTransformation for the policy parameters.
      value_spec: optional ``models.Regressor`` spec for the terminal value
        bootstrap (its params/stats are call-time arguments).
      value_update: optional jittable TD(H) critic update (from
        ``algorithms.value.make_value_update_fn``) with signature
        ``(params, target, opt_state, stats, states, rewards, key) ->
        (params, target, opt_state, loss)``. When given, the critic is
        refit INSIDE the iteration scan on every iteration — from the same
        (stop-gradient) imagined trajectory used for the policy loss, with
        the terminal bootstrap evaluated under the freshly-updated critic —
        exactly the reference's ``on_rollout`` cadence
        (`deep_pilco_no_mm_with_value.py:380-400`, `mc_pilco.py:120-140`).
        ``opt`` then also takes/returns ``value_target``/``value_opt_state``.
      mesh: optional ``jax.sharding.Mesh``. When given, the particle batch is
        sharding-constrained to the ``particle_axis`` mesh axis so GSPMD
        keeps every per-particle tensor of the rollout sharded across
        devices (params replicate; mean-loss and MM moments become psum
        collectives). ``n_particles`` must divide by the mesh size.

    Returns:
      ``opt(pol_params, opt_state, dyn_params, dyn_stats, x0_pool, key,
      n_opt_steps, iters, value_params=None, value_stats=None,
      value_target=None, value_opt_state=None, init_state_noise=None)`` ->
      ``(pol_params, opt_state, metrics, n_opt_steps')`` — or, when
      ``value_update`` is given, ``(pol_params, opt_state, metrics,
      n_opt_steps', value_state)`` with ``value_state = (value_params,
      value_target, value_opt_state)``. ``x0_pool`` is a [N0, D] on-device
      pool of candidate initial states (from experience), ``n_opt_steps``
      the carried global PEGASUS counter, ``iters`` static.
      ``init_state_noise`` is an optional scalar or per-dim [D] array of
      Gaussian noise scales added to sampled initial states each iteration
      (the reference passes ``1e-2 * x0.std(0)`` / ``1e-1 * x0.std(0)``,
      `deep_pilco_mm.py:261` / `deep_pilco_no_mm.py:261`); it is a runtime
      argument so per-episode std changes don't retrigger compilation.
      ``metrics`` holds per-iteration ``loss`` and ``mean_return`` (plus
      ``v_loss`` with ``value_update``); with ``config.with_priorities`` it
      also holds per-iteration per-group mean action-gradient norms
      (`mc_pilco.py:166-181`).
    """
    cache_key = (id(dyn), id(pol), config, id(optimizer), id(value_spec),
                 id(value_update), id(mesh), particle_axis)
    hit = _FN_CACHE.get(cache_key)
    if hit is not None and (hit[0] is dyn and hit[1] is pol
                            and hit[2] is optimizer
                            and hit[3] is value_spec
                            and hit[4] is value_update and hit[5] is mesh):
        return hit[6]
    cfg = config
    B = cfg.n_particles
    G = cfg.mm_groups if cfg.mm_groups else B
    w_t, w_H = discount_weights(cfg.discount, cfg.steps)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        _p_sharding = NamedSharding(mesh, P(particle_axis))
        _tp_sharding = NamedSharding(mesh, P(None, particle_axis))

        def constrain_particles(x):
            return jax.lax.with_sharding_constraint(x, _p_sharding)

        def constrain_time_particles(x):
            return jax.lax.with_sharding_constraint(x, _tp_sharding)
    else:
        def constrain_particles(x):
            return x

        def constrain_time_particles(x):
            return x

    # ---- fused Pallas rollout (see MCPILCOConfig.fused_rollout) ----------
    from ..ops.pallas import fused_rollout as _fr
    _fused_mode = _fr.fused_mode(cfg, dyn, pol, value_update, mesh,
                                 value_spec)
    _fused_ok = _fused_mode is not None
    _dev0 = jax.devices()[0]
    _on_tpu = ('tpu' in _dev0.platform.lower()
               or 'TPU' in getattr(_dev0, 'device_kind', ''))
    if cfg.fused_rollout is None:
        _use_fused = _fused_ok and _on_tpu
    else:
        _use_fused = bool(cfg.fused_rollout) and _fused_ok
        if cfg.fused_rollout and not _fused_ok:
            import warnings
            warnings.warn('fused_rollout=True but the configuration is not '
                          'supported by the fused kernel (see '
                          'ops.pallas.fused_rollout.supports); falling back '
                          'to the XLA rollout path.', stacklevel=2)
    # The only consumers of PER-PARTICLE resampled rewards in this loss are
    # the CVaR filter and the TD(H) critic refit's targets; with both off the
    # loss reduces rewards with a plain particle mean, which the MM resample
    # leaves invariant (standardized z has exact zero particle-mean), so both
    # the XLA path and the fused kernel take the analytic mean-only shortcut
    # — see utils.rollout._mm_rewards_batched (30% of device busy time at
    # B=4096 cholesky; +8% on the fused B=100 headline).
    _cvar_active = (-1.0 < cfg.cvar_eps < 1.0) and cfg.cvar_eps != 0.0
    _mr_mean_only = (cfg.mm_rewards and value_update is None
                     and not _cvar_active and not cfg.infer_noise_variables)
    _fr_kwargs = dict(mm_groups=cfg.mm_groups,
                      value_update=value_update, w_H=w_H,
                      mode=_fused_mode,
                      interpret=not _on_tpu,
                      mm_rewards_mean_only=_mr_mean_only)
    fused_loss = (_fr.make_fused_loss(dyn, pol, cfg.steps, w_t,
                                      cfg.mm_states, cfg.mm_rewards,
                                      cfg.maximize, **_fr_kwargs)
                  if _use_fused and mesh is None else None)
    # the optimizer iteration consumes loss+grads directly, so it uses the
    # single-kernel value-and-grad variant (no separate forward launch);
    # under a mesh the same kernel runs per-shard via shard_map with
    # shard-local MM groups (make_fused_sharded_value_and_grad)
    if _use_fused and mesh is not None:
        fused_vg = _fr.make_fused_sharded_value_and_grad(
            dyn, pol, cfg.steps, w_t, cfg.mm_states, cfg.mm_rewards,
            cfg.maximize, mesh=mesh, particle_axis=particle_axis,
            mm_groups=cfg.mm_groups, mode=_fused_mode,
            interpret=not _on_tpu,
            mm_rewards_mean_only=_mr_mean_only)
    elif _use_fused:
        fused_vg = _fr.make_fused_value_and_grad(
            dyn, pol, cfg.steps, w_t, cfg.mm_states, cfg.mm_rewards,
            cfg.maximize, **_fr_kwargs)
    else:
        fused_vg = None

    use_mix = (cfg.mm_method == 'mix' and not cfg.infer_noise_variables)
    # Mixing matrices are [M, M] per group: at large B an ungrouped matrix is
    # an O(B^2) memory / O(B^3) QR hazard (the PEGASUS bank holds n_epochs of
    # them), so above MIX_AUTO_GROUP_SIZE particles the mixing is
    # auto-partitioned into independent groups of <= that size. Per-group
    # moment matching is the `mm_groups` semantics (`rollout.py:125-145`)
    # applied at a size where the CLT-Gaussianization is already saturated;
    # on a sharded particle axis groups also align with device shards (no
    # cross-device matmul). Explicit ``mm_groups`` always wins.
    mix_groups = cfg.mm_groups
    if use_mix and mix_groups is None and B > MIX_AUTO_GROUP_SIZE:
        # smallest group count that DIVIDES B with group size <= the cap
        # (B // cap can fail to divide B, e.g. B=1000 -> 3)
        mix_groups = next(g for g in range(
            -(-B // MIX_AUTO_GROUP_SIZE), B + 1) if B % g == 0)
        import warnings
        warnings.warn(
            f'mm_method="mix" with {B} particles: auto-grouping the mixing '
            f'into {mix_groups} groups of {B // mix_groups} (per-group '
            'moment matching) to avoid a [B, B] mixing matrix; pass '
            'mm_groups explicitly to override.', stacklevel=2)

    def sample_all_noise(epoch_key, D):
        kd, kp, kv, kz1, kz2 = jax.random.split(epoch_key, 5)
        dyn_noise = dyn.sample_noise(kd, (B,))
        pol_noise = pol.sample_noise(kp, (B,))
        if use_mix:
            # fixed noise = ONE orthogonal particle-mixing matrix per epoch
            # (PEGASUS); the per-step cyclic decorrelation (`rollout.py:
            # 53-59`) is an in-scan roll of the mixed cloud (== Pi^t U), so
            # no [T, M, M] stack is ever materialized.
            z_mm = sample_mm_mixing(kz1, B, mix_groups)
            z_rr = sample_mm_mixing(kz2, B, mix_groups)
        else:
            z_mm = jax.random.normal(kz1, (B, D))
            z_rr = jax.random.normal(kz2, (B, 1))
            if _use_fused:
                # per-epoch hoisting for the fused kernel: standardize
                # (per group when grouped) + cyclically pre-roll ONCE per
                # noise epoch instead of per iteration
                # (`utils/rollout.py:213-221` hoisting, moved one level out)
                z_mm = (_fr.prepare_mm_noise(z_mm, cfg.steps, B,
                                             cfg.mm_groups)
                        if cfg.mm_states
                        else jnp.zeros((cfg.steps, B, D), z_mm.dtype))
                z_rr = (_fr.prepare_mm_noise(z_rr, cfg.steps, B,
                                             cfg.mm_groups)
                        if cfg.mm_rewards
                        else jnp.zeros((cfg.steps, B, 1), z_rr.dtype))
        value_noise = (value_spec.sample_noise(kv, (B,))
                       if value_spec is not None else None)
        return (dyn_noise, pol_noise, value_noise, z_mm, z_rr)

    def constrain_noise(noise):
        # every per-particle noise leaf (leading axis B) gets sharded; the
        # mixing matrices stay replicated (GSPMD shards the MM matmul itself)
        dyn_noise, pol_noise, value_noise, z_mm, z_rr = noise
        dyn_noise, pol_noise, value_noise = jax.tree_util.tree_map(
            constrain_particles, (dyn_noise, pol_noise, value_noise))
        if not use_mix:
            z_mm = constrain_particles(z_mm)
            z_rr = constrain_particles(z_rr)
        return (dyn_noise, pol_noise, value_noise, z_mm, z_rr)

    def loss_fn(pol_params, action_eps, x0, dyn_params, dyn_stats, noise,
                step_key, value_params, value_stats, value_carry):
        dyn_noise, pol_noise, value_noise, z_mm, z_rr = noise

        if fused_loss is not None:
            # single-kernel fwd + single-kernel bwd; z_mm/z_rr arrive as the
            # per-epoch-hoisted [T, B, zD] standardized+rolled stacks (see
            # sample_all_noise)
            extras = ()
            if value_update is not None:
                v_p, v_t, v_o = value_carry
                extras = (v_p, v_t, v_o, value_stats, value_noise)
            loss, mean_return, v_aux = fused_loss(
                pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
                z_mm, z_rr, action_eps, extras)
            if value_update is not None:
                value_carry = v_aux[:3]
                return loss, (mean_return, value_carry, v_aux[3])
            return loss, (mean_return, value_carry, jnp.zeros(()))

        traj = rollout_fn(
            x0, dyn, pol, cfg.steps, dyn_params, dyn_stats, pol_params,
            dyn_noise, pol_noise,
            mm_states=cfg.mm_states, mm_rewards=cfg.mm_rewards,
            infer_noise_variables=cfg.infer_noise_variables,
            z_mm=z_mm, z_rr=z_rr,
            mm_groups=(mix_groups if use_mix else cfg.mm_groups),
            mm_method=cfg.mm_method,
            resample_state_noise=not cfg.pegasus,
            resample_action_noise=not cfg.pegasus,
            key=step_key, action_eps=action_eps,
            unroll=(cfg.rollout_unroll if cfg.rollout_unroll is not None
                    else (cfg.steps if cfg.steps <= 16 else 1)),
            mm_rewards_mean_only=_mr_mean_only)
        states, actions, rewards = traj[:3]
        sg = jax.lax.stop_gradient

        # in-scan critic refit from the SAME (detached) trajectory, before
        # the bootstrap — the reference's on_rollout ordering
        # (`mc_pilco.py:120-121` then `:137-140`)
        v_loss = jnp.zeros(())
        if value_update is not None:
            v_params, v_tgt, v_opt = value_carry
            # critic mask schedule (cfg.val_mask_mode):
            #   'epoch' — reference semantics: the update reuses the per-
            #   PEGASUS-epoch noise pytree (value_noise), the same masks the
            #   terminal bootstrap below evaluates under (the reference's
            #   resample=False cached-mask sharing,
            #   `deep_pilco_no_mm_with_value.py:24,39-40`, `mc_pilco.py:137`);
            #   'iter' — fresh masks each update iteration.
            if cfg.val_mask_mode == 'epoch':
                v_params, v_tgt, v_opt, v_loss = value_update(
                    v_params, v_tgt, v_opt, value_stats, sg(states),
                    sg(rewards), noise=value_noise)
            else:
                k_v = jax.random.fold_in(step_key, 0x7A1)
                v_params, v_tgt, v_opt, v_loss = value_update(
                    v_params, v_tgt, v_opt, value_stats, sg(states),
                    sg(rewards), k_v)
            value_carry = (v_params, v_tgt, v_opt)
            bootstrap_params = jax.tree_util.tree_map(sg, v_params)
        else:
            bootstrap_params = value_params

        # [T, B] discounted rewards; sum over time -> per-particle returns
        disc = (rewards[..., 0] * w_t[:, None])
        returns = jnp.sum(disc, 0)
        if value_spec is not None and bootstrap_params is not None:
            v_end = value_spec.apply(bootstrap_params, value_stats,
                                     states[-1], value_noise,
                                     return_samples=True)
            returns = returns + w_H * v_end[..., 0]
        if cfg.maximize:
            returns = -returns

        selected, _ = cvar_filter(returns, cfg.cvar_eps)
        loss = jnp.mean(selected)
        if cfg.reg_weight > 0:
            loss = loss + cfg.reg_weight * pol.regularization_loss(pol_params)
        mean_return = jnp.mean(jnp.sum(rewards[..., 0], 0))
        return loss, (mean_return, value_carry, v_loss)

    def iteration(pol_params, opt_state, dyn_params, dyn_stats, x0_pool,
                  noise, iter_key, value_params, value_stats, value_carry,
                  init_noise):
        noise = constrain_noise(noise)

        kx, kn, ks = jax.random.split(iter_key, 3)
        # sample initial states from the pool (`mc_pilco.py:247-260`)
        idx = jax.random.randint(kx, (G,), 0, x0_pool.shape[0])
        x0 = x0_pool[idx]
        if cfg.mm_groups:
            x0 = tile(x0, B // cfg.mm_groups)  # (`mc_pilco.py:98-100`)
        if init_noise is not None:
            # per-dim scales, e.g. 1e-2 * x0.std(0) (`deep_pilco_mm.py:261`)
            x0 = x0 + init_noise * jax.random.normal(kn, x0.shape)
        elif cfg.init_state_noise > 0:
            x0 = x0 + cfg.init_state_noise * jax.random.normal(kn, x0.shape)
        x0 = constrain_particles(x0)

        action_eps = constrain_time_particles(
            jnp.zeros((cfg.steps, B) + (pol_action_dims,)))
        if fused_vg is not None:
            # single kernel: loss + mean_return + grads (+ TD(H) critic
            # refit when value_update) in one launch
            dyn_noise, pol_noise, value_noise, z_mm_t, z_rr_t = noise
            extras = ()
            if value_update is not None:
                v_p, v_t, v_o = value_carry
                extras = (v_p, v_t, v_o, value_stats, value_noise)
            loss, mean_return, g_pol, v_aux = fused_vg(
                pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
                z_mm_t, z_rr_t, action_eps, extras)
            if value_update is not None:
                value_carry = v_aux[:3]
                v_loss = v_aux[3]
            else:
                v_loss = jnp.zeros(())
            aux = (mean_return, value_carry, v_loss)
            scores = jnp.zeros((G,))
        elif cfg.with_priorities:
            (loss, aux), (g_pol, g_eps) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(
                    pol_params, action_eps, x0, dyn_params, dyn_stats, noise,
                    ks, value_params, value_stats, value_carry)
            # per-step per-particle action-grad norms -> per-group scores
            norms = jnp.linalg.norm(g_eps, axis=-1)          # [T, B]
            norms = norms.reshape(cfg.steps, G, B // G).mean(-1)  # [T, G]
            scores = norms.mean(0)                           # [G]
        else:
            (loss, aux), g_pol = jax.value_and_grad(
                loss_fn, has_aux=True)(
                    pol_params, action_eps, x0, dyn_params, dyn_stats, noise,
                    ks, value_params, value_stats, value_carry)
            scores = jnp.zeros((G,))  # traced context: stays a splat const
        mean_return, value_carry, v_loss = aux

        if cfg.clip_grad is not None:
            g_pol = clip_grad_norm(g_pol, cfg.clip_grad)
        updates, opt_state = optimizer.update(g_pol, opt_state, pol_params)
        pol_params = optax.apply_updates(pol_params, updates)
        metrics = {'loss': loss, 'mean_return': mean_return}
        if value_update is not None:
            metrics['v_loss'] = v_loss
        if cfg.with_priorities:
            metrics['priority_scores'] = scores
        return pol_params, opt_state, value_carry, metrics

    pol_action_dims = len(pol.max_u)

    @partial(jax.jit, static_argnames=('iters',))
    def opt(pol_params, opt_state, dyn_params, dyn_stats, x0_pool, key,
            n_opt_steps, iters, value_params=None, value_stats=None,
            value_target=None, value_opt_state=None, init_state_noise=None):
        # `pegasus_key` is deliberately NOT folded with the per-call iteration
        # offset: the noise epoch depends only on the global opt-step counter,
        # so masks stay pinned across chunked calls exactly like the
        # reference's `policy_update_counter` bookkeeping (`mc_pilco.py:78,91`).
        pegasus_key = jax.random.fold_in(key, 0x5EED)
        D = x0_pool.shape[-1]

        if cfg.pegasus:
            # PEGASUS noise only changes every `resampling_period` steps, so
            # sample a bank of per-epoch noise pytrees ONCE, outside the scan
            # (the QR for the MM mixing matrices and the dropout-mask draws
            # would otherwise re-run every iteration inside the hot loop).
            # Epochs touched by [n0, n0+iters) fit in a static-size bank.
            n_epochs = iters // cfg.resampling_period + 2
            first_epoch = n_opt_steps // cfg.resampling_period
            epoch_keys = jax.vmap(
                lambda e: jax.random.fold_in(pegasus_key, first_epoch + e))(
                    np.arange(n_epochs))
            noise_bank = jax.vmap(
                lambda k: sample_all_noise(k, D))(epoch_keys)

        value_carry0 = ((value_params, value_target, value_opt_state)
                        if value_update is not None else None)

        def step(carry, i):
            del i
            pol_params, opt_state, n, v_carry = carry
            # keys are a function of the global counter, so chunked host
            # loops reproduce the single-launch stream exactly
            iter_key = jax.random.fold_in(key, n)
            if cfg.pegasus:
                e = n // cfg.resampling_period - first_epoch
                noise = jax.tree_util.tree_map(
                    lambda a: jax.lax.dynamic_index_in_dim(
                        a, e, keepdims=False), noise_bank)
            else:
                noise = sample_all_noise(iter_key, D)
            v_params_in = (v_carry[0] if value_update is not None
                           else value_params)
            pol_params, opt_state, v_carry, metrics = iteration(
                pol_params, opt_state, dyn_params, dyn_stats, x0_pool,
                noise, iter_key, v_params_in, value_stats, v_carry,
                init_state_noise)
            return (pol_params, opt_state, n + 1, v_carry), metrics

        (pol_params, opt_state, n_opt_steps, value_carry), metrics = \
            jax.lax.scan(step,
                         (pol_params, opt_state, n_opt_steps, value_carry0),
                         np.arange(iters), unroll=cfg.iteration_unroll)
        if value_update is not None:
            return pol_params, opt_state, metrics, n_opt_steps, value_carry
        return pol_params, opt_state, metrics, n_opt_steps

    if len(_FN_CACHE) >= _FN_CACHE_MAX:
        _FN_CACHE.pop(next(iter(_FN_CACHE)))
    _FN_CACHE[cache_key] = (dyn, pol, optimizer, value_spec, value_update,
                            mesh, opt)
    return opt


def mc_pilco(x0_pool, dyn, pol, steps, dyn_params, dyn_stats, pol_params,
             opt_state=None, optimizer=None, exp=None, opt_iters=1000,
             value_spec=None, value_params=None, value_stats=None,
             value_update_fn=None, value_state=None, val_mask_mode='epoch',
             fused_rollout=None,
             pegasus=True, mm_states=False, mm_rewards=False, mm_groups=None,
             mm_method='cholesky',
             maximize=True, clip_grad=1.0, cvar_eps=0.0, reg_weight=0.0,
             discount=None, init_state_noise=0.0, resampling_period=499,
             n_particles=100, key=None, n_opt_steps=0, on_iteration=None,
             prioritized_replay=False, priority_alpha=0.6, priority_eps=1e-8,
             init_priority_beta=1.0, chunk=None, writer=None,
             writer_scope='mc_pilco', verbose=False, mesh=None):
    """Host-level MC-PILCO loop (`mc_pilco.py:13-267` feature-complete path).

    Runs the jitted optimizer in chunks so host-side features — prioritized
    initial-state replay through a SumTree, per-iteration callbacks, live
    metric streaming — can interleave. Without those features one chunk =
    the whole optimization = one device launch.

    Args beyond ``make_mc_pilco_fn``'s:
      init_state_noise: scalar or per-dim [D] array of Gaussian noise added
        to sampled initial states each iteration (runtime, no recompiles).
      value_update_fn: jittable TD(H) critic update; when given together
        with ``value_state`` (a dict with 'params', 'target', 'opt_state'),
        the critic refits every iteration inside the scan and
        ``value_state`` is updated IN PLACE with the final critic.
      writer: optional tensorboardX SummaryWriter; per-chunk mean loss /
        mean_return / v_loss stream under ``writer_scope`` with the global
        opt-step as x-axis (`train_regressor.py:148-158` namespacing).
      verbose: print a one-line progress summary per chunk (the jit-native
        stand-in for the reference's tqdm bar, `mc_pilco.py:56`).

    Returns (pol_params, opt_state, metrics_dict, n_opt_steps).
    """
    if optimizer is None:
        optimizer = optax.adam(1e-3)
    if opt_state is None:
        opt_state = optimizer.init(pol_params)
    if key is None:
        key = jax.random.PRNGKey(np.random.randint(2 ** 31))

    cfg = MCPILCOConfig(
        n_particles=n_particles, steps=steps, pegasus=pegasus,
        mm_states=mm_states, mm_rewards=mm_rewards, mm_groups=mm_groups,
        mm_method=mm_method,
        maximize=maximize, clip_grad=clip_grad, cvar_eps=cvar_eps,
        reg_weight=reg_weight, discount=discount,
        resampling_period=resampling_period,
        with_priorities=prioritized_replay, val_mask_mode=val_mask_mode,
        fused_rollout=fused_rollout)
    use_value_scan = (value_update_fn is not None and value_state is not None)
    opt_fn = make_mc_pilco_fn(
        dyn, pol, cfg, optimizer, value_spec,
        value_update=value_update_fn if use_value_scan else None, mesh=mesh)
    init_noise = (jnp.asarray(init_state_noise)
                  if np.any(np.asarray(init_state_noise) > 0) else None)

    if chunk is None:
        chunk = opt_iters if (on_iteration is None and
                              not prioritized_replay and writer is None and
                              not verbose) else 100

    tree = None
    beta = init_priority_beta
    if prioritized_replay:
        # C++-backed tree when the native toolchain is available
        # (`native.make_sum_tree`), Python SumTree otherwise
        from ..native import make_sum_tree
        tree = make_sum_tree(2 ** 20)
        for row in np.asarray(x0_pool):
            tree.append(row, tree.max_p)
        tree.renormalize()

    all_metrics = []
    done = 0
    import time as _time
    t_start = _time.perf_counter()
    pool = jnp.asarray(x0_pool)
    G = mm_groups if mm_groups else n_particles
    while done < opt_iters:
        n = min(chunk, opt_iters - done)
        if prioritized_replay:
            samples, idxs, _w = tree.sample(max(G, 2), beta=beta)
            pool = jnp.asarray(np.stack(samples), jnp.float32)
        if use_value_scan:
            (pol_params, opt_state, metrics, n_opt_steps,
             (v_p, v_t, v_o)) = opt_fn(
                pol_params, opt_state, dyn_params, dyn_stats, pool,
                key, n_opt_steps, n, value_state['params'], value_stats,
                value_state['target'], value_state['opt_state'],
                init_state_noise=init_noise)
            value_state.update(params=v_p, target=v_t, opt_state=v_o)
        else:
            pol_params, opt_state, metrics, n_opt_steps = opt_fn(
                pol_params, opt_state, dyn_params, dyn_stats, pool,
                key, n_opt_steps, n, value_params, value_stats,
                init_state_noise=init_noise)
        metrics = jax.tree_util.tree_map(np.asarray, metrics)
        all_metrics.append(metrics)
        if writer is not None:
            writer.add_scalar('%s/training loss' % writer_scope,
                              float(metrics['loss'].mean()), done + n)
            writer.add_scalar('%s/mean_return' % writer_scope,
                              float(metrics['mean_return'].mean()), done + n)
            if 'v_loss' in metrics:
                writer.add_scalar('%s/value loss' % writer_scope,
                                  float(metrics['v_loss'].mean()), done + n)
        if verbose:
            rate = (done + n) / (_time.perf_counter() - t_start)
            msg = ('Pred. Cumm. rewards: %f' if maximize
                   else 'Pred. Cumm. costs: %f')
            print(('[mc_pilco] iter %d/%d (%.0f it/s) ' + msg)
                  % (done + n, opt_iters, rate,
                     float(metrics['mean_return'][-1])), flush=True)
        if prioritized_replay:
            scores = metrics['priority_scores'].mean(0)
            counts = tree.counts[np.asarray(idxs) - tree.max_size + 1]
            counts = counts[:len(scores)]
            pr = (scores / np.maximum(counts, 1) + priority_eps
                  ) ** priority_alpha
            for ti, p in zip(np.asarray(idxs)[:len(pr)], pr):
                tree.update(int(ti), float(p))
            tree.renormalize()
        if callable(on_iteration):
            # hooks that accept the live policy params (e.g. the TD(H)
            # critic refit, `deep_pilco_no_mm_with_value.py:380-400`) get
            # them; two-arg hooks keep working
            import inspect
            try:
                n_hook_args = len(inspect.signature(
                    on_iteration).parameters)
            except (TypeError, ValueError):
                n_hook_args = 2
            if n_hook_args >= 3:
                on_iteration(done + n, metrics, pol_params)
            else:
                on_iteration(done + n, metrics)
        done += n

    merged = {k: np.concatenate([m[k] for m in all_metrics])
              for k in all_metrics[0]}
    return pol_params, opt_state, merged, n_opt_steps


class MCPILCOAgent:
    """Utility class bundling policy/dynamics specs, params, dataset and
    optimizers (`mc_pilco.py:270-456`).

    The reference's ``fit_dynamics`` is an empty stub (`mc_pilco.py:449-451`);
    here it is functional (delegates to the jitted regressor trainer).
    """

    def __init__(self, policy, dynamics, dataset, pol_optimizer=None,
                 dyn_optimizer=None, seed=0):
        self.pol = policy
        self.dyn = dynamics
        self.exp = dataset
        self.pol_optimizer = pol_optimizer or optax.adam(1e-3)
        self.dyn_optimizer = dyn_optimizer or optax.adam(1e-4)
        key = jax.random.PRNGKey(seed)
        kd, kp, self._key = jax.random.split(key, 3)
        self.dyn_params = self.dyn.init(kd)
        self.dyn_stats = self.dyn.init_stats()
        self.pol_params = self.pol.init(kp)
        self.pol_opt_state = self.pol_optimizer.init(self.pol_params)
        self.dyn_opt_state = self.dyn_optimizer.init(self.dyn_params)
        self.policy_update_counter = 0

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def sample_initial_states(self, batch_size, step_idx_to_sample=None,
                              init_state_noise=0.0):
        """(`mc_pilco.py:288-295`)"""
        x0 = self.exp.sample_states(batch_size, timestep=step_idx_to_sample)
        x0 = np.asarray(x0, np.float32)
        if init_state_noise > 0:
            x0 = x0 + init_state_noise * np.random.randn(*x0.shape)
        return jnp.asarray(x0)

    def fit_dynamics(self, iters=2000, batchsize=100, reg_weight=1.0):
        """Fit the dynamics model to the dataset (functional, unlike the
        reference stub)."""
        from ..utils.train_regressor import train_regressor
        learn_reward = self.dyn.reward_func is None
        X, Y = self.exp.get_dynmodel_dataset(deltas=True,
                                             return_costs=learn_reward)
        X, Y = jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)
        self.dyn_stats = self.dyn.fit_stats(X, Y)
        self.dyn_params, self.dyn_opt_state, metrics = train_regressor(
            self.dyn.regressor, self.dyn_params, self.dyn_stats, X, Y,
            self._next_key(), iters=iters, batchsize=batchsize,
            optimizer=self.dyn_optimizer, opt_state=self.dyn_opt_state,
            reg_weight=reg_weight)
        return metrics

    def train(self, steps, batch_size=100, opt_iters=1000, pegasus=True,
              mm_states=False, mm_rewards=False, maximize=True,
              clip_grad=1.0, cvar_eps=0.0, reg_weight=0.0, discount=None,
              on_iteration=None, step_idx_to_sample=None,
              init_state_noise=0.0, resampling_period=500, **kwargs):
        """Policy optimization on the learned model (`mc_pilco.py:297-456`)."""
        x0_pool = self.sample_initial_states(2 * batch_size,
                                             step_idx_to_sample)
        (self.pol_params, self.pol_opt_state, metrics,
         self.policy_update_counter) = mc_pilco(
            x0_pool, self.dyn, self.pol, steps, self.dyn_params,
            self.dyn_stats, self.pol_params, opt_state=self.pol_opt_state,
            optimizer=self.pol_optimizer, opt_iters=opt_iters,
            pegasus=pegasus, mm_states=mm_states, mm_rewards=mm_rewards,
            maximize=maximize, clip_grad=clip_grad, cvar_eps=cvar_eps,
            reg_weight=reg_weight, discount=discount,
            init_state_noise=init_state_noise,
            resampling_period=resampling_period, key=self._next_key(),
            n_opt_steps=self.policy_update_counter,
            on_iteration=on_iteration, **kwargs)
        return metrics

    def __call__(self, state, deterministic=True):
        """Greedy (mean) action for a single host-side state."""
        s = jnp.asarray(state, jnp.float32).reshape(1, -1)
        u = self.pol.apply(self.pol_params, s, noise=None,
                           return_samples=not deterministic)
        return np.asarray(u).flatten()
