"""Model-based DDPG on Cartpole.

TPU-native counterpart of `examples/mbddpg.py`: 10 random episodes, then per
episode ``fit(exp, horizon=40, iterations=120)`` (`mbddpg.py:16,96-104`).
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from prob_mbrl_tpu import algorithms  # noqa: E402
from prob_mbrl_tpu.utils import ExperienceDataset, apply_controller  # noqa: E402
from prob_mbrl_tpu.utils.experiments import (get_argument_parser, init_env,
                                             init_output_folder)  # noqa: E402
from prob_mbrl_tpu.utils.checkpoint import save_checkpoint  # noqa: E402


def main():
    parser = get_argument_parser('mbddpg')
    parser.set_defaults(control_H=40, ps_iters=100)
    parser.add_argument('--n_rnd_epi', type=int, default=10)
    parser.add_argument('--fit_iters', type=int, default=120)
    args = parser.parse_args()

    env = init_env(args.env, args.seed)
    D, U = env.observation_size, env.action_size
    maxU = float(np.asarray(env.action_space.high).flatten()[0])
    results_folder = init_output_folder(env, args.output_folder, 'mbddpg')
    print(f'[mbddpg] results -> {results_folder}')

    agent = algorithms.MBDDPG(state_dim=D, action_dim=U, max_action=maxU,
                              seed=args.seed)
    exp = ExperienceDataset()
    rnd = np.random.RandomState(args.seed)

    for _ in range(args.n_rnd_epi):
        def rnd_pol(x, t=0):
            return rnd.uniform(env.action_space.low, env.action_space.high)
        exp.append_episode(*apply_controller(env, rnd_pol, args.control_H))

    for ep in range(args.ps_iters):
        hist = agent.fit(exp, horizon=args.pred_H,
                         iterations=args.fit_iters,
                         model_fit_iters=args.dyn_opt_iters,
                         batch_size=args.dyn_batch_size)
        ret = apply_controller(env, lambda x, t=0: agent(x), args.control_H)
        exp.append_episode(*ret)
        ep_return = float(np.sum([np.sum(r) for r in ret[2]]))
        print(f'[mbddpg] episode {ep}: critic_loss='
              f'{hist[-1]["critic_loss"]:.4f} real_return={ep_return:.3f}')
        save_checkpoint(results_folder, dyn_params=agent.dyn_params,
                        pol_params=agent.actor_params,
                        critic_params=agent.critic_params, exp=exp, args=args)


if __name__ == '__main__':
    main()
