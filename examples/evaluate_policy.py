"""Replay saved policy snapshots to build a learning curve.

TPU-native counterpart of `examples/evaluate_policy.py`: load a run folder's
args + experience, rebuild the policy architecture from flags, replay every
per-episode policy-parameter snapshot (stored inside the experience dataset,
`deep_pilco_mm.py:210`) in the real env ``n_evals`` times, and plot reward
vs cumulative experience.
"""
import argparse
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from prob_mbrl_tpu import models  # noqa: E402
from prob_mbrl_tpu.utils import ExperienceDataset, apply_controller  # noqa: E402
from prob_mbrl_tpu.utils.checkpoint import load_checkpoint  # noqa: E402
from prob_mbrl_tpu.utils.experiments import init_env  # noqa: E402


def main():
    parser = argparse.ArgumentParser('evaluate_policy')
    parser.add_argument('results_folder', type=str)
    parser.add_argument('--n_evals', type=int, default=5)
    parser.add_argument('--control_H', type=int, default=None)
    args = parser.parse_args()

    exp = ExperienceDataset()
    ck = load_checkpoint(os.path.expanduser(args.results_folder), exp=exp)
    run_args = ck.get('args', {})
    env = init_env(run_args.get('env', 'Cartpole'),
                   int(run_args.get('seed', 0)))
    control_H = args.control_H or int(run_args.get('control_H', 40))

    D, U = env.observation_size, env.action_size
    pol_density = models.DiagGaussianDensity(U)
    pol_mlp = models.MLPSpec(
        D, pol_density.n_inputs,
        tuple(run_args.get('pol_shape', [200, 200])),
        dropout=models.bdropout(float(run_args.get('pol_drop_rate', 0.1))))
    pol = models.Policy(
        mlp=pol_mlp, output_density=pol_density,
        max_u=tuple(np.asarray(env.action_space.high).flatten()),
        min_u=tuple(np.asarray(env.action_space.low).flatten()))
    fwd = jax.jit(lambda p, x: pol.apply(p, x, noise=None,
                                         return_samples=False))

    curve = []
    cumulative_steps = 0
    snapshots = [p for p in exp.policy_parameters if p]
    print(f'[evaluate_policy] {len(snapshots)} policy snapshots')
    for i, params in enumerate(snapshots):
        cumulative_steps += len(exp.states[min(i, exp.n_episodes() - 1)])

        def policy(x, t=0):
            u = fwd(params, jnp.asarray(x, jnp.float32).reshape(1, -1))
            return np.asarray(u).flatten()

        rets = []
        for _ in range(args.n_evals):
            _, _, costs, _, _ = apply_controller(env, policy, control_H)
            rets.append(float(np.sum([np.sum(c) for c in costs])))
        curve.append((cumulative_steps, np.mean(rets), np.std(rets)))
        print(f'  snapshot {i}: return {np.mean(rets):.3f} '
              f'+/- {np.std(rets):.3f}')

    if curve:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        steps, means, stds = map(np.asarray, zip(*curve))
        fig, ax = plt.subplots()
        ax.plot(steps, means, 'C0-o')
        ax.fill_between(steps, means - stds, means + stds, color='C0',
                        alpha=0.3)
        ax.set_xlabel('real-env steps of experience')
        ax.set_ylabel('episode return')
        out = os.path.join(os.path.expanduser(args.results_folder),
                           'learning_curve.png')
        fig.savefig(out, dpi=120)
        print(f'[evaluate_policy] curve -> {out}')


if __name__ == '__main__':
    main()
