"""Compressed CPU A/B for the with-value variant (VERDICT r2 #5/#6).

Compares, at test_learning.py's compressed config: plain no-MM, the
reference-faithful MSE critic, and the density-NLL critic — to find which
critic configuration lets the TD(H) bootstrap help (or at least not hurt).
"""
import os
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np

sys.path.insert(0, '/root/repo')
sys.path.insert(0, '/root/repo/examples')

from prob_mbrl_tpu.utils.experiments import get_argument_parser
from deep_pilco_common import run

SEED = int(sys.argv[1]) if len(sys.argv) > 1 else 1


def compressed_args(name, extra=()):
    parser = get_argument_parser(name)
    args = parser.parse_args(list(extra))
    args.seed = SEED
    args.ps_iters = 8
    args.pol_opt_iters = 300
    args.dyn_opt_iters = 800
    args.pol_batch_size = 50
    args.output_folder = f'/root/repo/runs/value_diag_{name}_s{SEED}'
    return args


def main():
    for name, use_value, extra in (
            ('r2cfg_full_iters', True, ('--val_polyak', '0.005',
                                        '--val_density',
                                        '--val_shape', '64,64',
                                        '--val_lr', '1e-3')),
            ('r2cfg_mse_full_iters', True, ('--val_polyak', '0.005',
                                            '--val_shape', '64,64',
                                            '--val_lr', '1e-4'))):
        args = compressed_args(name, extra)
        if name.endswith('full_iters'):
            args.pol_opt_iters = 1000
            args.ps_iters = 5
        returns, _ = run(args, mm_states=False, mm_rewards=False,
                         use_value=use_value, init_state_noise_mult=1e-1,
                         experiment_name=name)
        r = np.asarray(returns)
        print(f'RESULT {name} s{SEED}: max={r.max():.2f} '
              f'last3={r[-3:].mean():.2f} all={np.round(r, 2).tolist()}',
              flush=True)


if __name__ == '__main__':
    main()
