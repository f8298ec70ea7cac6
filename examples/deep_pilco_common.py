"""Shared Deep-PILCO / MC-PILCO experiment driver.

The TPU-native equivalent of the reference's `examples/deep_pilco_mm.py` /
`deep_pilco_no_mm.py` / `deep_pilco_no_mm_with_value.py` trio (which differ
only in moment-matching flags, learning rates and the critic hook): one
parameterized loop, three thin entry points.

Flow per episode (`deep_pilco_mm.py:180-270`):
  real-env rollout -> experience -> dynamics fit (jitted scan) ->
  MC-PILCO policy optimization (jitted scan) -> checkpoint + metrics.
"""
import atexit
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from prob_mbrl_tpu import models, algorithms, envs  # noqa: E402
from prob_mbrl_tpu.algorithms.mc_pilco import mc_pilco as run_mc_pilco  # noqa: E402
from prob_mbrl_tpu.algorithms.value import make_value_update_fn  # noqa: E402
from prob_mbrl_tpu.utils import (ExperienceDataset, apply_controller,
                                 train_regressor)  # noqa: E402
from prob_mbrl_tpu.utils.experiments import (get_argument_parser, init_env,
                                             init_output_folder)  # noqa: E402
from prob_mbrl_tpu.utils.checkpoint import (save_checkpoint,
                                            load_checkpoint)  # noqa: E402
from prob_mbrl_tpu.utils.rollout import make_rollout_fn  # noqa: E402


def build_models(D, U, maxU, minU, args, learn_reward, reward_func):
    """Dynamics + policy specs from flags (`deep_pilco_mm.py:116-151`)."""
    dynE = D + 1 if learn_reward else D
    if args.dyn_components > 1:
        output_density = models.GaussianMixtureDensity(
            dynE, args.dyn_components)
    else:
        output_density = models.DiagGaussianDensity(dynE)
    dyn_mlp = models.MLPSpec(
        D + U, output_density.n_inputs, tuple(args.dyn_shape),
        dropout=(models.cdropout(args.dyn_drop_rate)
                 if args.dyn_drop_rate > 0 else None))
    dyn = models.DynamicsModel(
        regressor=models.Regressor(mlp=dyn_mlp,
                                   output_density=output_density),
        reward_func=None if learn_reward else reward_func)

    pol_density = models.DiagGaussianDensity(U)
    pol_mlp = models.MLPSpec(
        D, pol_density.n_inputs, tuple(args.pol_shape),
        dropout=(models.bdropout(args.pol_drop_rate)
                 if args.pol_drop_rate > 0 else None))
    pol = models.Policy(mlp=pol_mlp, output_density=pol_density,
                        max_u=tuple(maxU), min_u=tuple(minU))
    return dyn, pol


def make_host_policy(pol, expl_noise=0.0, rng=None):
    """Host-side policy callable for ``apply_controller``."""
    rng = rng or np.random.RandomState(0)
    fwd = jax.jit(lambda p, x: pol.apply(p, x, noise=None,
                                         return_samples=False))

    def policy(params):
        def call(x, t=0):
            u = fwd(params, jnp.asarray(x, jnp.float32).reshape(1, -1))
            u = np.asarray(u).flatten()
            if expl_noise > 0:
                u = u + expl_noise * rng.randn(*u.shape)
            return u
        return call
    return policy


def run(args, mm_states=False, mm_rewards=False, use_value=False,
        experiment_name='deep_pilco'):
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
    key = jax.random.PRNGKey(args.seed)
    key, kd, kp = jax.random.split(key, 3)
    dyn_params = dyn.init(kd)
    pol_params = pol.init(kp)
    dyn_stats = dyn.init_stats()
    dyn_opt = optax.adam(args.dyn_lr)
    dyn_opt_state = dyn_opt.init(dyn_params)
    pol_opt = optax.adam(args.pol_lr)
    pol_opt_state = pol_opt.init(pol_params)

    value_spec = value_params = value_target = value_stats = None
    value_opt_state = value_update = value_rollout = None
    if use_value:
        v_density = models.DiagGaussianDensity(1)
        v_mlp = models.MLPSpec(D, v_density.n_inputs, (64, 64),
                               dropout=models.cdropout(0.1))
        value_spec = models.Regressor(mlp=v_mlp, output_density=v_density)
        key, kv = jax.random.split(key)
        value_params = value_spec.init(kv)
        value_target = value_params
        value_stats = value_spec.init_stats()
        v_opt = optax.adam(1e-3)
        value_opt_state = v_opt.init(value_params)
        value_update = make_value_update_fn(value_spec, v_opt, args.pred_H,
                                            discount=discount)
        value_rollout = jax.jit(make_rollout_fn(dyn, pol, args.pred_H))

    results_folder = init_output_folder(env, args.output_folder,
                                        experiment_name)
    print(f'[{experiment_name}] results -> {results_folder}')
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

    host_policy = make_host_policy(pol, args.expl_noise,
                                   np.random.RandomState(args.seed))

    # initial random episodes (`deep_pilco_mm.py:184-209`)
    rnd = np.random.RandomState(args.seed)
    n_rnd = max(1, args.n_initial_epi + 1) - exp.n_episodes()
    for _ in range(max(0, n_rnd)):
        def rnd_pol(x, t=0):
            return rnd.uniform(minU, maxU)
        ret = apply_controller(env, rnd_pol, args.control_H,
                               stop_when_done=args.stop_when_done)
        exp.append_episode(*ret)

    n_opt_steps = 0
    eval_returns = []
    for ps_it in range(args.ps_iters):
        # ---- fit dynamics (`deep_pilco_mm.py:212-229`) --------------------
        X, Y = exp.get_dynmodel_dataset(deltas=True,
                                        return_costs=learn_reward)
        X, Y = jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)
        dyn_stats = dyn.fit_stats(X, Y)
        key, kt = jax.random.split(key)
        dyn_params, dyn_opt_state, dyn_metrics = train_regressor(
            dyn.regressor, dyn_params, dyn_stats, X, Y, kt,
            iters=args.dyn_opt_iters, batchsize=args.dyn_batch_size,
            optimizer=dyn_opt, opt_state=dyn_opt_state)
        E_lml = float(np.asarray(dyn_metrics['E_lml'])[-50:].mean())
        if writer:
            writer.add_scalar(f'dyn/episode_{ps_it}/E_lml', E_lml, ps_it)

        # ---- policy optimization (`deep_pilco_mm.py:245-264`) -------------
        x0_pool = exp.sample_states(2 * args.pol_batch_size,
                                    rng=np.random.RandomState(args.seed
                                                              + ps_it))
        key, ko = jax.random.split(key)

        on_iteration = None
        if use_value:
            vstate = dict(params=value_params, target=value_target,
                          opt_state=value_opt_state)

            def on_iteration(n, metrics, live_pol_params, vstate=vstate):
                # TD(H) critic fit on fresh imagined rollouts with the
                # policy as it currently stands
                # (`deep_pilco_no_mm_with_value.py:380-400`)
                nonlocal key
                key, kr, kn1, kn2, kv = jax.random.split(key, 5)
                B = args.pol_batch_size
                x0 = jnp.asarray(exp.sample_states(
                    B, rng=np.random.RandomState(n)))
                dnoise = dyn.sample_noise(kn1, (B,))
                pnoise = pol.sample_noise(kn2, (B,))
                states, actions, rewards = value_rollout(
                    x0, dyn_params, dyn_stats, live_pol_params, dnoise,
                    pnoise)
                vstate['params'], vstate['target'], vstate['opt_state'], _ = \
                    value_update(vstate['params'], vstate['target'],
                                 vstate['opt_state'], value_stats,
                                 states, rewards, kv)

        pol_params, pol_opt_state, pol_metrics, n_opt_steps = \
            run_mc_pilco(
                x0_pool, dyn, pol, args.pred_H, dyn_params, dyn_stats,
                pol_params, opt_state=pol_opt_state, optimizer=pol_opt,
                opt_iters=args.pol_opt_iters, mm_states=mm_states,
                mm_rewards=mm_rewards, mm_groups=args.mm_groups,
                clip_grad=args.pol_clip, discount=discount,
                resampling_period=args.resampling_period,
                n_particles=args.pol_batch_size, key=ko,
                n_opt_steps=n_opt_steps,
                prioritized_replay=args.prioritized_replay,
                value_spec=value_spec,
                value_params=(vstate['params'] if use_value else None),
                value_stats=value_stats,
                on_iteration=on_iteration)
        if use_value:
            value_params, value_target = vstate['params'], vstate['target']
            value_opt_state = vstate['opt_state']
        mean_ret = float(np.asarray(pol_metrics['mean_return'])[-20:].mean())

        # ---- evaluate on the real system (`deep_pilco_mm.py:184-210`) ----
        ret = apply_controller(env, host_policy(pol_params), args.control_H,
                               stop_when_done=args.stop_when_done)
        exp.append_episode(*ret, policy_params=jax.tree_util.tree_map(
            np.asarray, pol_params))
        ep_return = float(np.sum([np.sum(r) for r in ret[2]]))
        eval_returns.append(ep_return)
        print(f'[{experiment_name}] episode {ps_it}: E_lml={E_lml:.3f} '
              f'imagined_return={mean_ret:.3f} real_return={ep_return:.3f}')
        if writer:
            writer.add_scalar('robot/evaluation_loss', -ep_return, ps_it)
            writer.add_scalar('mc_pilco/mean_return', mean_ret, ps_it)

        save_checkpoint(results_folder, dyn_params=dyn_params,
                        pol_params=pol_params,
                        critic_params=value_params if use_value else None,
                        exp=exp, args=args)
    return eval_returns, results_folder


def main(mm_states, mm_rewards, use_value=False, name='deep_pilco',
         arg_overrides=None):
    parser = get_argument_parser(name)
    args = parser.parse_args()
    for k, v in (arg_overrides or {}).items():
        if parser.get_default(k) == getattr(args, k):
            setattr(args, k, v)
    return run(args, mm_states=mm_states, mm_rewards=mm_rewards,
               use_value=use_value, experiment_name=name)
