"""Shared Deep-PILCO / MC-PILCO experiment driver.

The TPU-native equivalent of the reference's `examples/deep_pilco_mm.py` /
`deep_pilco_no_mm.py` / `deep_pilco_no_mm_with_value.py` trio (which differ
only in moment-matching flags, learning rates, init-state noise and the
critic hook): one parameterized loop, three thin entry points.

Flow per episode, in the reference's order (`deep_pilco_mm.py:196-270`):
  real-env rollout with the stochastic exploration policy -> experience ->
  dynamics fit (jitted scan) -> MC-PILCO policy optimization (jitted scan)
  -> checkpoint + metrics.

Reference-faithful details:
  * initial states for imagined rollouts are sampled from experience at
    ``--timesteps_to_sample`` (default 0 = episode starts,
    `deep_pilco_mm.py:233-236,260`);
  * per-iteration init-state jitter ``init_state_noise_mult * x0.std(0)``
    (1e-2 for the MM variant, 1e-1 for no-MM, `deep_pilco_*.py:261`);
  * real-env actions are SAMPLED from the stochastic policy (fresh dropout
    masks + density noise each step, `models/core.py:221-243`) plus optional
    uniform exploration noise, clipped to the action bounds
    (`deep_pilco_mm.py:196-198`).
"""
import atexit
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from prob_mbrl_tpu import models  # noqa: E402
from prob_mbrl_tpu.algorithms.mc_pilco import mc_pilco as run_mc_pilco  # noqa: E402
from prob_mbrl_tpu.algorithms.value import make_value_update_fn  # noqa: E402
from prob_mbrl_tpu.utils import (ExperienceDataset, apply_controller,
                                 train_regressor)  # noqa: E402
from prob_mbrl_tpu.utils.experiments import (get_argument_parser, init_env,
                                             init_output_folder)  # noqa: E402
from prob_mbrl_tpu.utils.checkpoint import (save_checkpoint,
                                            load_checkpoint)  # noqa: E402


def build_models(D, U, maxU, minU, args, learn_reward, reward_func):
    """Dynamics + policy specs from flags (`deep_pilco_mm.py:116-151`).

    ``--dtype bfloat16`` routes the MLP matmuls through bf16 on the MXU
    (params, reductions and density heads stay float32).
    """
    compute_dtype = (jnp.bfloat16 if getattr(args, 'dtype', 'float32') ==
                     'bfloat16' else None)
    dynE = D + 1 if learn_reward else D
    if args.dyn_components > 1:
        output_density = models.GaussianMixtureDensity(
            dynE, args.dyn_components)
    else:
        output_density = models.DiagGaussianDensity(dynE)
    dyn_mlp = models.MLPSpec(
        D + U, output_density.n_inputs, tuple(args.dyn_shape),
        dropout=(models.cdropout(args.dyn_drop_rate)
                 if args.dyn_drop_rate > 0 else None),
        compute_dtype=compute_dtype)
    dyn = models.DynamicsModel(
        regressor=models.Regressor(mlp=dyn_mlp,
                                   output_density=output_density),
        reward_func=None if learn_reward else reward_func)

    pol_density = models.DiagGaussianDensity(U)
    pol_mlp = models.MLPSpec(
        D, pol_density.n_inputs, tuple(args.pol_shape),
        dropout=(models.bdropout(args.pol_drop_rate)
                 if args.pol_drop_rate > 0 else None),
        compute_dtype=compute_dtype)
    pol = models.Policy(mlp=pol_mlp, output_density=pol_density,
                        max_u=tuple(maxU), min_u=tuple(minU))
    return dyn, pol


def make_host_policy(pol, expl_noise=0.0, seed=0, minU=None, maxU=None,
                     stochastic=True):
    """Host-side policy callable for ``apply_controller``.

    Stochastic mode samples fresh dropout masks + density noise per real-env
    step — the reference's ``Policy.forward`` with ``resample=True`` defaults
    (`models/core.py:221-243`) — plus uniform exploration noise clipped to
    the action bounds (`deep_pilco_mm.py:196-198`).
    """
    rng = np.random.RandomState(seed)
    fwd_sample = jax.jit(lambda p, x, k: pol.apply(
        p, x, noise=pol.sample_noise(k, (1,)), return_samples=True))
    fwd_mean = jax.jit(lambda p, x: pol.apply(p, x, noise=None,
                                              return_samples=False))
    # Per-step keys come from a bank refilled in ONE device call: an eager
    # `jax.random.split` per control step costs a remote round-trip per step
    # on a tunnel-attached TPU (~10s per 40-step episode).
    split_bank = jax.jit(lambda k: jax.random.split(k, 257))
    key_state = {'key': jax.random.PRNGKey(rng.randint(2 ** 31)),
                 'bank': None, 'i': 0}

    def next_key():
        if key_state['bank'] is None or key_state['i'] >= 256:
            fresh = np.asarray(split_bank(key_state['key']))
            key_state['key'] = jnp.asarray(fresh[0])
            key_state['bank'] = fresh[1:]
            key_state['i'] = 0
        k = key_state['bank'][key_state['i']]
        key_state['i'] += 1
        return k

    def policy(params):
        def call(x, t=0):
            x = jnp.asarray(x, jnp.float32).reshape(1, -1)
            if stochastic:
                u = fwd_sample(params, x, next_key())
            else:
                u = fwd_mean(params, x)
            u = np.asarray(u).flatten()
            if expl_noise > 0:
                u = u + expl_noise * rng.uniform(minU, maxU)
                u = np.clip(u, minU, maxU)
            return u
        return call
    return policy


def run(args, mm_states=False, mm_rewards=False, use_value=False,
        init_state_noise_mult=1e-1, experiment_name='deep_pilco'):
    env = init_env(args.env, args.seed)
    D = env.observation_size
    U = env.action_size
    maxU = np.asarray(env.action_space.high).flatten()
    minU = np.asarray(env.action_space.low).flatten()
    learn_reward = args.learn_reward or not callable(
        getattr(env, 'reward_func', None))
    reward_func = getattr(env, 'reward_func', None)

    # discount: 'auto' -> (1/H)^(2/H), None -> uniform 1/H
    # (`deep_pilco_mm.py:103-114`)
    discount = args.discount_factor
    if isinstance(discount, str):
        discount = ((1.0 / args.control_H) ** (2.0 / args.control_H)
                    if discount == 'auto' else float(discount))

    dyn, pol = build_models(D, U, maxU, minU, args, learn_reward, reward_func)

    # --n_devices: shard the imagined particle batch over a device mesh.
    # GSPMD keeps every per-particle tensor of the rollout sharded; MM
    # moments and the mean loss become psum collectives (parallel/rollout.py)
    mesh = None
    if args.n_devices and args.n_devices > 1:
        from prob_mbrl_tpu import parallel
        if args.pol_batch_size % args.n_devices:
            raise SystemExit(
                f'--pol_batch_size {args.pol_batch_size} must divide by '
                f'--n_devices {args.n_devices}')
        if args.dyn_batch_size % args.n_devices:
            raise SystemExit(
                f'--dyn_batch_size {args.dyn_batch_size} must divide by '
                f'--n_devices {args.n_devices}')
        mesh = parallel.make_mesh(args.n_devices)
        print(f'[{experiment_name}] sharding {args.pol_batch_size} particles '
              f'over {args.n_devices} devices '
              f'({[d.platform for d in mesh.devices.flat][0]})', flush=True)

    key = jax.random.PRNGKey(args.seed)
    key, kd, kp = jax.random.split(key, 3)
    dyn_params = dyn.init(kd)
    pol_params = pol.init(kp)
    dyn_stats = dyn.init_stats()
    dyn_opt = optax.adam(args.dyn_lr)
    dyn_opt_state = dyn_opt.init(dyn_params)
    pol_opt = optax.adam(args.pol_lr)
    pol_opt_state = pol_opt.init(pol_params)

    value_spec = value_stats = value_update = value_state = None
    if use_value:
        # reference critic config (`deep_pilco_no_mm_with_value.py:269-278,
        # 299`): plain-output [val_shape] CDropout MLP — NO density head, so
        # the TD(H) update is the MSE branch (`:38-43`) — trained at val_lr;
        # --val_density switches to a diag-Gaussian head + NLL critic
        v_density = (models.DiagGaussianDensity(1) if args.val_density
                     else None)
        v_mlp = models.MLPSpec(
            D, v_density.n_inputs if v_density else 1, tuple(args.val_shape),
            dropout=(models.cdropout(args.val_drop_rate)
                     if args.val_drop_rate > 0 else None))
        value_spec = models.Regressor(mlp=v_mlp, output_density=v_density)
        key, kv = jax.random.split(key)
        value_params = value_spec.init(kv)
        value_stats = value_spec.init_stats()
        v_opt = optax.adam(args.val_lr)
        # critic refits inside the policy-opt scan on EVERY iteration, the
        # reference's on_rollout cadence (`deep_pilco_no_mm_with_value.py:
        # 380-400`); the bootstrap uses the live critic.
        value_update = make_value_update_fn(value_spec, v_opt, args.pred_H,
                                            discount=discount,
                                            use_density=args.val_density,
                                            polyak=args.val_polyak)
        value_state = dict(params=value_params, target=value_params,
                           opt_state=v_opt.init(value_params))

    results_folder = init_output_folder(env, args.output_folder,
                                        experiment_name)
    print(f'[{experiment_name}] results -> {results_folder}', flush=True)
    writer = None
    try:
        from tensorboardX import SummaryWriter
        writer = SummaryWriter(logdir=os.path.join(results_folder, 'tb'))
        atexit.register(writer.close)
    except Exception:
        pass

    exp = ExperienceDataset()
    if args.load_from:
        ck = load_checkpoint(os.path.expanduser(args.load_from), exp=exp)
        dyn_params = ck.get('dyn', dyn_params)
        pol_params = ck.get('pol', pol_params)

    host_policy = make_host_policy(pol, args.expl_noise, args.seed,
                                   minU, maxU, stochastic=True)
    render_cb = None
    if args.render:
        if getattr(type(env), '_scene_fn', None) is not None:
            # live matplotlib viewer with ghost trails (envs/rendering.py),
            # stepped through apply_controller's per-step callback — the
            # reference's render_fn wiring (`deep_pilco_mm.py:182`)
            def render_cb(*_):
                env.render()
        else:
            print(f'[{experiment_name}] --render: no renderer for '
                  f'{type(env).__name__}; flag ignored (use plot_level>0 '
                  'for trajectory figures)', flush=True)

    # initial random episodes (`deep_pilco_mm.py:184-209`; the reference
    # default n_initial_epi=0 collects none and relies on the episode
    # gathered with the untrained stochastic policy each iteration)
    rnd = np.random.RandomState(args.seed)
    for _ in range(max(0, args.n_initial_epi - exp.n_episodes())):
        def rnd_pol(x, t=0):
            return rnd.uniform(minU, maxU)
        ret = apply_controller(env, rnd_pol, args.control_H,
                               stop_when_done=args.stop_when_done)
        exp.append_episode(*ret)

    timestep_to_sample = args.timesteps_to_sample
    if isinstance(timestep_to_sample, list) and not timestep_to_sample:
        timestep_to_sample = 0

    n_opt_steps = 0
    eval_returns = []
    best = {'return': -np.inf, 'params': None, 'episode': -1}
    for ps_it in range(args.ps_iters):
        # ---- collect real experience with the current stochastic policy
        # (`deep_pilco_mm.py:199-210`) ----------------------------------
        ret = apply_controller(env, host_policy(pol_params), args.control_H,
                               stop_when_done=args.stop_when_done,
                               callback=render_cb)
        exp.append_episode(*ret, policy_params=jax.tree_util.tree_map(
            np.asarray, pol_params))
        ep_return = float(np.sum([np.sum(r) for r in ret[2]]))
        eval_returns.append(ep_return)
        if ep_return > best['return']:
            best['return'] = ep_return
            best['episode'] = ps_it
            if args.keep_best:
                best['params'] = jax.tree_util.tree_map(np.asarray,
                                                        pol_params)
        if writer:
            writer.add_scalar('robot/evaluation_loss', -ep_return, ps_it)

        # ---- fit dynamics (`deep_pilco_mm.py:212-229`) --------------------
        X, Y = exp.get_dynmodel_dataset(deltas=True,
                                        return_costs=learn_reward)
        X, Y = jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)
        dyn_stats = dyn.fit_stats(X, Y)
        key, kt = jax.random.split(key)
        # --n_devices also shards the dynamics fit: GSPMD data-parallelizes
        # each minibatch over the mesh (grads psum'd, params replicated) —
        # the multi-chip episode is sharded end-to-end, fit + policy opt
        dyn_params, dyn_opt_state, dyn_metrics = train_regressor(
            dyn.regressor, dyn_params, dyn_stats, X, Y, kt,
            iters=args.dyn_opt_iters, batchsize=args.dyn_batch_size,
            optimizer=dyn_opt, opt_state=dyn_opt_state, mesh=mesh)
        E_lml = float(np.asarray(dyn_metrics['E_lml'])[-50:].mean())
        if writer:
            # per-episode namespacing (`train_regressor.py:148-158`)
            writer.add_scalar(f'model_learning/episode_{ps_it}/E_lml',
                              E_lml, ps_it)

        # ---- policy optimization (`deep_pilco_mm.py:231-264`) -------------
        x0_pool = exp.sample_states(2 * args.pol_batch_size,
                                    timestep=timestep_to_sample,
                                    rng=np.random.RandomState(args.seed
                                                              + ps_it))
        init_noise = init_state_noise_mult * x0_pool.std(0)
        key, ko = jax.random.split(key)

        pol_params, pol_opt_state, pol_metrics, n_opt_steps = \
            run_mc_pilco(
                x0_pool, dyn, pol, args.pred_H, dyn_params, dyn_stats,
                pol_params, opt_state=pol_opt_state, optimizer=pol_opt,
                opt_iters=args.pol_opt_iters, mm_states=mm_states,
                mm_rewards=mm_rewards, mm_groups=args.mm_groups,
                mm_method=args.mm_method.replace('experimental_', ''),
                clip_grad=args.pol_clip, discount=discount,
                init_state_noise=init_noise,
                resampling_period=args.resampling_period,
                n_particles=args.pol_batch_size, key=ko,
                n_opt_steps=n_opt_steps,
                prioritized_replay=args.prioritized_replay,
                value_spec=value_spec,
                value_stats=value_stats,
                value_update_fn=value_update,
                value_state=value_state,
                val_mask_mode=args.val_mask_mode,
                fused_rollout={'auto': None, 'on': True,
                               'off': False}[args.fused_rollout],
                writer=writer,
                writer_scope=f'mc_pilco/episode_{ps_it}',
                verbose=args.debug, mesh=mesh)
        mean_ret = float(np.asarray(pol_metrics['mean_return'])[-20:].mean())

        print(f'[{experiment_name}] episode {ps_it}: E_lml={E_lml:.3f} '
              f'imagined_return={mean_ret:.3f} real_return={ep_return:.3f}',
              flush=True)
        if writer:
            writer.add_scalar('mc_pilco/mean_return', mean_ret, ps_it)

        if args.plot_level > 0:
            _save_rollout_plot(results_folder, ps_it, x0_pool, dyn, pol,
                               args, dyn_params, dyn_stats, pol_params)
        if args.debug:
            np.savez(os.path.join(results_folder,
                                  f'metrics_ep{ps_it}.npz'),
                     **{k: np.asarray(v) for k, v in pol_metrics.items()})

        save_checkpoint(results_folder, dyn_params=dyn_params,
                        pol_params=pol_params,
                        critic_params=(value_state['params']
                                       if use_value else None),
                        exp=exp, args=args)
        if args.keep_best and best['params'] is not None:
            from prob_mbrl_tpu.utils.checkpoint import save_pytree
            save_pytree(os.path.join(results_folder,
                                     'best_policy.pth.tar'), best['params'])

    print(f'[{experiment_name}] best real return {best["return"]:.3f} '
          f'at episode {best["episode"]}', flush=True)
    return eval_returns, results_folder


def _save_rollout_plot(results_folder, ps_it, x0_pool, dyn, pol, args,
                       dyn_params, dyn_stats, pol_params):
    """--plot_level: save imagined-rollout figures (`deep_pilco_mm.py:238`)."""
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from prob_mbrl_tpu.utils.plotting import plot_rollout
    figs = plot_rollout(jnp.asarray(x0_pool[:25]), dyn, pol,
                        args.pred_H * 2, dyn_params, dyn_stats, pol_params)
    for fig, name in zip(figs, ('states', 'actions', 'rewards')):
        fig.savefig(os.path.join(results_folder,
                                 f'rollout_ep{ps_it}_{name}.png'), dpi=80)
        plt.close(fig)


def main(mm_states, mm_rewards, use_value=False, name='deep_pilco',
         init_state_noise_mult=1e-1, arg_overrides=None):
    parser = get_argument_parser(name)
    args = parser.parse_args()
    for k, v in (arg_overrides or {}).items():
        if parser.get_default(k) == getattr(args, k):
            setattr(args, k, v)
    return run(args, mm_states=mm_states, mm_rewards=mm_rewards,
               use_value=use_value,
               init_state_noise_mult=init_state_noise_mult,
               experiment_name=name)
