"""Compressed CPU A/B for the with-value variant (VERDICT r3 #1).

Round-4 axis-isolation harness. Round 3's "reference-faithful" arm was
faithful on NO axis: it ran the density-NLL head (--val_density defaults
True; ADVICE r3), a polyak-0.005 target network (the reference driver never
passes V_target, so its bootstrap is the LIVE critic —
`deep_pilco_no_mm_with_value.py:26,332`), and per-iteration mask resampling
(the reference shares per-epoch cached masks between the critic update and
the terminal bootstrap via resample=False, `:24,39-40`). This harness
replicates the reference semantics exactly, then flips one axis at a time:

  novalue         plain no-MM baseline at the compressed scale (solve bar)
  faithful        MSE [200,200] lr 1e-4, no target, epoch-frozen shared masks
  faithful_rp99   + the reference's resampling_period=99 (repo default 499)
  ax_itermask     faithful but fresh critic masks per update iteration
  ax_target       faithful but polyak-0.005 target network
  r3best          round-3 best config (NLL [64,64] lr 1e-3, iter masks)

Usage: python tools/value_diag.py [seed] [arm ...]   (default: all arms)
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

FAITHFUL = ('--no-val_density', '--val_shape', '200,200',
            '--val_lr', '1e-4', '--val_polyak', '1.0',
            '--val_mask_mode', 'epoch')

ARMS = {
    'novalue': (False, ()),
    'faithful': (True, FAITHFUL),
    'faithful_rp99': (True, FAITHFUL + ('--resampling_period', '99')),
    'ax_itermask': (True, ('--no-val_density', '--val_shape', '200,200',
                           '--val_lr', '1e-4', '--val_polyak', '1.0',
                           '--val_mask_mode', 'iter')),
    'ax_target': (True, ('--no-val_density', '--val_shape', '200,200',
                         '--val_lr', '1e-4', '--val_polyak', '0.005',
                         '--val_mask_mode', 'epoch')),
    'r3best': (True, ('--val_density', '--val_shape', '64,64',
                      '--val_lr', '1e-3', '--val_mask_mode', 'iter')),
}


def compressed_args(name, extra=()):
    parser = get_argument_parser(name)
    args = parser.parse_args(list(extra))
    args.seed = SEED
    args.ps_iters = 5
    args.pol_opt_iters = 1000
    args.dyn_opt_iters = 800
    args.pol_batch_size = 50
    args.output_folder = f'/root/repo/runs/value_diag_{name}_s{SEED}'
    return args


def main():
    selected = sys.argv[2:] or list(ARMS)
    for name in selected:
        use_value, extra = ARMS[name]
        args = compressed_args(name, extra)
        returns, _ = run(args, mm_states=False, mm_rewards=False,
                         use_value=use_value, init_state_noise_mult=1e-1,
                         experiment_name=name)
        r = np.asarray(returns)
        print(f'RESULT {name} s{SEED}: max={r.max():.2f} '
              f'last3={r[-3:].mean():.2f} all={np.round(r, 2).tolist()}',
              flush=True)


if __name__ == '__main__':
    main()
