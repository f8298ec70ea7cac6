"""Replay per-episode policy snapshots to produce learning curves.

Produces the episodes-to-solve evidence for RESULTS.md: for every policy
snapshot stored in a run's experience dataset (one per real-env episode,
`deep_pilco_mm.py:210`), replay the stochastic policy ``n_evals`` times in a
fresh environment and record the returns — the reference's
`examples/evaluate_policy.py` protocol, applied identically to runs of this
framework (``--backend tpu``) and of the torch reference (``--backend ref``).

Usage::

    python tools/eval_curves.py --backend tpu \
        --run_dir runs/tpu_no_mm_s1/mc_pilco_no_mm/Cartpole/<ts> \
        --out runs/curves_tpu_no_mm_s1.json

Benchmark tooling only — no framework code imports this.
"""
import argparse
import glob
import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))


def resolve_run_dir(path):
    """Accept either the run dir itself or any ancestor with one run below."""
    if os.path.exists(os.path.join(path, 'experience.pkl')) or \
            os.path.exists(os.path.join(path, 'experience.pth.tar')):
        return path
    hits = sorted(glob.glob(os.path.join(path, '**', 'experience.p*'),
                            recursive=True))
    if not hits:
        raise FileNotFoundError(f'no experience checkpoint under {path}')
    return os.path.dirname(hits[-1])


def eval_tpu(run_dir, n_evals, eval_seed):
    import jax
    import jax.numpy as jnp
    from prob_mbrl_tpu import envs, models
    from prob_mbrl_tpu.utils import ExperienceDataset, apply_controller

    with open(os.path.join(run_dir, 'args.json')) as fh:
        args = json.load(fh)

    env = envs.make(args.get('env', 'Cartpole'))
    env.seed(eval_seed)
    D, U = env.observation_size, env.action_size
    maxU = np.asarray(env.action_space.high).flatten()
    minU = np.asarray(env.action_space.low).flatten()
    pol_density = models.DiagGaussianDensity(U)
    pol = models.Policy(
        mlp=models.MLPSpec(D, pol_density.n_inputs,
                           tuple(args.get('pol_shape', [200, 200])),
                           dropout=models.bdropout(
                               args.get('pol_drop_rate', 0.1))),
        output_density=pol_density, max_u=tuple(maxU), min_u=tuple(minU))

    exp = ExperienceDataset()
    exp.load(os.path.join(run_dir, 'experience.pkl'))

    fwd = jax.jit(lambda p, x, k: pol.apply(
        p, x, noise=pol.sample_noise(k, (1,)), return_samples=True))
    # key bank refilled in one device call (an eager split per control step
    # is a remote round-trip per step on a tunnel-attached TPU)
    split_bank = jax.jit(lambda k: jax.random.split(k, 257))
    key_state = {'k': jax.random.PRNGKey(eval_seed), 'bank': None, 'i': 256}

    def next_key():
        if key_state['i'] >= 256:
            fresh = np.asarray(split_bank(key_state['k']))
            key_state['k'] = jnp.asarray(fresh[0])
            key_state['bank'], key_state['i'] = fresh[1:], 0
        k = key_state['bank'][key_state['i']]
        key_state['i'] += 1
        return k

    def stochastic(params):
        def call(x, t=0):
            x = jnp.asarray(x, jnp.float32).reshape(1, -1)
            return np.asarray(fwd(params, x, next_key())).flatten()
        return call

    control_H = args.get('control_H', 40)
    curve = []
    for i, params in enumerate(exp.policy_parameters):
        if params is None or (isinstance(params, (list, tuple))
                              and not params):
            continue
        params = jax.tree_util.tree_map(jnp.asarray, params)
        rets = []
        for j in range(n_evals):
            ret = apply_controller(env, stochastic(params), control_H,
                                   stop_when_done=args.get('stop_when_done',
                                                           False))
            rets.append(float(np.sum([np.sum(r) for r in ret[2]])))
        curve.append(dict(episode=i, returns=rets))
        print(f'[tpu] snapshot {i}: mean {np.mean(rets):.2f}', flush=True)
    return curve


def eval_ref(run_dir, n_evals, eval_seed):
    from run_reference import setup_reference_path
    setup_reference_path()
    import torch
    from functools import partial
    torch.set_num_threads(int(os.environ.get('REF_NUM_THREADS', '1')))
    # the reference's ExperienceDataset.load predates torch's weights_only
    # default flip; these are checkpoints we generated ourselves
    _load = torch.load
    torch.load = lambda *a, **k: _load(
        *a, **{**k, 'weights_only': False})
    from prob_mbrl import envs as ref_envs, models, utils

    args = torch.load(os.path.join(run_dir, 'args.pth.tar'),
                      weights_only=False)
    torch.manual_seed(eval_seed)
    np.random.seed(eval_seed)
    env = ref_envs.__dict__[args.env]()
    env.seed(eval_seed)
    D = env.observation_space.shape[0]
    U = env.action_space.shape[0]
    pol_model = models.mlp(
        D, 2 * U, args.pol_shape,
        dropout_layers=[models.modules.BDropout(args.pol_drop_rate)
                        if args.pol_drop_rate > 0 else None
                        for _ in args.pol_shape],
        biases_initializer=None, nonlin=torch.nn.ReLU,
        output_nonlin=partial(models.DiagGaussianDensity, U))
    pol = models.Policy(pol_model, env.action_space.high,
                        env.action_space.low).float()

    exp = utils.ExperienceDataset()
    exp.load(os.path.join(run_dir, 'experience.pth.tar'))

    curve = []
    for i, params in enumerate(exp.policy_parameters):
        if params is None or len(params) == 0:
            continue
        pol.load(params)
        rets = []
        for j in range(n_evals):
            ret = utils.apply_controller(
                env, pol, args.control_H,
                stop_when_done=getattr(args, 'stop_when_done', False))
            rets.append(float(np.sum([np.sum(r) for r in ret[2]])))
        curve.append(dict(episode=i, returns=rets))
        print(f'[ref] snapshot {i}: mean {np.mean(rets):.2f}', flush=True)
    return curve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--backend', choices=['tpu', 'ref'], required=True)
    ap.add_argument('--run_dir', required=True)
    ap.add_argument('--n_evals', type=int, default=5)
    ap.add_argument('--eval_seed', type=int, default=1234)
    ap.add_argument('--out', required=True)
    ap.add_argument('--cpu', action='store_true',
                    help='force the local CPU backend (leave the TPU free '
                         'for concurrent training runs)')
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    run_dir = resolve_run_dir(args.run_dir)
    print(f'evaluating {run_dir}', flush=True)
    fn = eval_tpu if args.backend == 'tpu' else eval_ref
    curve = fn(run_dir, args.n_evals, args.eval_seed)
    means = [float(np.mean(c['returns'])) for c in curve]
    result = dict(backend=args.backend, run_dir=run_dir,
                  n_evals=args.n_evals, curve=curve,
                  best_mean=float(np.max(means)) if means else None)
    with open(args.out, 'w') as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != 'curve'}))


if __name__ == '__main__':
    main()
