"""Diagnosis harness for the mix-MM seed-2 learning collapse (VERDICT r2 #2).

Reproduces the failure signature at minutes-scale on CPU: mix seed 2's
IMAGINED return never improved from the very first policy-opt epoch
(runs/tpu_mix_s2.log), so the pathology lives in the policy optimization
through the mixed rollout, not in the env loop. Here: fit a dynamics model
on one random episode (the episode-0 state), then run one policy-opt epoch
per (seed, mm_method) and compare imagined-return progress.
"""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax
jax.config.update('jax_platforms', 'cpu')
import jax.numpy as jnp
import numpy as np
import optax

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/examples')

from prob_mbrl_tpu import models, utils, envs
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn
from prob_mbrl_tpu.utils.experiments import get_argument_parser
from deep_pilco_common import build_models

B = 100
H = 15
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 500


def setup(seed):
    env = envs.make('Cartpole')
    env.seed(seed)
    parser = get_argument_parser('mix_diag')
    args = parser.parse_args([])
    D, U = env.observation_size, env.action_size
    maxU = np.asarray(env.action_space.high).flatten()
    minU = np.asarray(env.action_space.low).flatten()
    dyn, pol = build_models(D, U, maxU, minU, args, False, env.reward_func)
    rnd = np.random.RandomState(seed)
    exp = utils.ExperienceDataset()
    ret = utils.apply_controller(
        env, lambda x, t=0: rnd.uniform(minU, maxU), 40)
    exp.append_episode(*ret)
    X, Y = exp.get_dynmodel_dataset(deltas=True, return_costs=False)
    X, Y = jnp.asarray(X, jnp.float32), jnp.asarray(Y, jnp.float32)
    stats = dyn.fit_stats(X, Y)
    key = jax.random.PRNGKey(seed)
    kd, kp, kt = jax.random.split(key, 3)
    dyn_params, _, _ = utils.train_regressor(
        dyn.regressor, dyn.init(kd), stats, X, Y, kt, iters=800,
        batchsize=100, optimizer=optax.adam(1e-4))
    x0 = exp.sample_states(2 * B, timestep=0,
                           rng=np.random.RandomState(seed))
    return dyn, pol, dyn_params, stats, pol.init(kp), x0


def main():
    for seed in range(1, 9):
        dyn, pol, dyn_params, stats, pol_params, x0 = setup(seed)
        row = [f'seed {seed}:']
        for method in ('cholesky', 'mix'):
            cfg = MCPILCOConfig(n_particles=B, steps=H, mm_states=True,
                                mm_rewards=True, mm_method=method,
                                resampling_period=499)
            optzr = optax.adam(1e-3)
            opt = make_mc_pilco_fn(dyn, pol, cfg, optzr)
            _, _, m, _ = opt(pol_params, optzr.init(pol_params), dyn_params,
                             stats, jnp.asarray(x0), jax.random.PRNGKey(seed),
                             0, ITERS)
            r = np.asarray(m['mean_return'])
            row.append(f'{method}: r0={r[:10].mean():.3f} '
                       f'rend={r[-20:].mean():.3f}')
        print('  '.join(row), flush=True)


if __name__ == '__main__':
    main()
