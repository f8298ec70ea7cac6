"""Pin the BNN-regression NLL parity numbers (BASELINE.md / VERDICT r1 #8).

Trains the reference's `examples/bnn_regression.py` models (GaussianDN +
5-component GaussianMDN, CDropout 0.1, hhSinLU, [200]*4) with the reference
trainer on the reference's exact gap-riddled Fourier-sine dataset
(`bnn_regression.py:38-56`), then trains this framework's counterparts on the
IDENTICAL dataset/config, and reports final train-set NLLs side by side:

  * ``nll_expected``: -E_masks[mean log p(y|x, mask)] — the training
    objective both sides minimize (`train_regressor.py:130-133`);
  * ``nll_predictive``: -mean log(E_masks p(y|x, mask)) — the MC-dropout
    predictive mixture NLL (logsumexp over mask samples).

Usage::

    python tools/bnn_parity.py --iters 15000 --out runs/bnn_parity.json

Benchmark tooling only — no framework code imports this.
"""
import argparse
import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))

from run_reference import setup_reference_path  # noqa: E402


def make_dataset():
    """The reference's dataset, in numpy (`bnn_regression.py:38-56`, seed 0)."""
    def f(x):
        return 100 * sum(np.sin(-2 * np.pi * (2 * k - 1) * x) / (2 * k - 1)
                         for k in range(1, 3))

    xs = np.concatenate([np.arange(-0.6, -0.25, 0.01),
                         np.arange(0.1, 0.45, 0.005),
                         np.arange(0.7, 1.25, 0.01)]).astype(np.float32)
    rng = np.random.RandomState(0)
    ys = f(xs) + 0.01 * rng.randn(*xs.shape).astype(np.float32)
    return xs[:, None].astype(np.float32), ys[:, None].astype(np.float32)


def run_reference_side(X, Y, iters, hids, seed=0):
    hids = list(hids)
    setup_reference_path()
    import torch
    torch.manual_seed(seed)
    torch.set_num_threads(int(os.environ.get('REF_NUM_THREADS', '1')))
    from prob_mbrl import models  # noqa: F401

    Xt, Yt = torch.tensor(X), torch.tensor(Y)
    out = {}
    for name, build in [
            # NOTE: the reference example calls these factories with the
            # activation as the 5th/6th POSITIONAL arg
            # (`bnn_regression.py:70-73,88-92`), which lands in
            # `input_dropout` and crashes (`conditional_density.py:338-345`:
            # hhSinLU() takes no `name` kwarg) — a latent bug in the
            # reference example. Keyword args express its clear intent.
            ('GaussianDN', lambda: models.density_network_mlp(
                1, 1, models.GaussianDN, hids,
                dropout=[models.CDropout(0.1 * torch.ones(h)) for h in hids],
                activation=models.activations.hhSinLU)),
            ('GaussianMDN', lambda: models.mixture_density_network_mlp(
                1, 1, 5, models.GaussianMDN, hids,
                dropout=[models.CDropout(0.1 * torch.ones(h)) for h in hids],
                activation=models.activations.hhSinLU))]:
        model = build()
        model.set_scaling(Xt, Yt)
        opt = torch.optim.Adam(model.parameters(), lr=1e-3)
        t0 = time.perf_counter()
        # the reference's utils.train_model is broken against its own v2
        # forward (`utils/core.py:265` unpacks 2 values; `forward` returns
        # just the dist unless return_params=True) — run the identical loop
        # inline: shuffled minibatches, loss = -E[log p] + reg/N
        # (`utils/core.py:260-270`)
        N = Xt.shape[0]
        gen = torch.Generator().manual_seed(seed)
        model.train()
        for i in range(iters):
            idx = torch.randperm(N, generator=gen)[:100]
            opt.zero_grad()
            pygx = model(Xt[idx], resample=True)
            loss = -pygx.log_prob(Yt[idx]).mean() \
                + model.regularization_loss() / N
            loss.backward()
            opt.step()
        model.eval()
        dt = time.perf_counter() - t0
        lls = []
        with torch.no_grad():
            for _ in range(20):
                pygx = model(Xt, resample=True)
                lls.append(pygx.log_prob(Yt).numpy())
        lls = np.stack(lls)  # [S, N]
        out[name] = dict(
            nll_expected=float(-lls.mean()),
            nll_predictive=float(-np.mean(
                np.logaddexp.reduce(lls, 0) - np.log(lls.shape[0]))),
            train_seconds=dt)
        print(f'[ref {name}] {out[name]}', flush=True)
    return out


def run_tpu_side(X, Y, iters, hids, seed=0):
    import jax
    import jax.numpy as jnp
    import optax
    from prob_mbrl_tpu.models import (density_network_mlp,
                                      mixture_density_network_mlp)
    from prob_mbrl_tpu.utils.train_model import train_model

    Xj, Yj = jnp.asarray(X), jnp.asarray(Y)
    out = {}
    for name, build in [
            ('GaussianDN', lambda: density_network_mlp(
                1, 1, hids=hids, dropout=0.1, activation='hhsinlu')),
            ('GaussianMDN', lambda: mixture_density_network_mlp(
                1, 1, nc=5, hids=hids, dropout=0.1, activation='hhsinlu'))]:
        model = build()
        params = model.init(jax.random.PRNGKey(seed))
        scaling = model.fit_scaling(Xj, Yj)
        t0 = time.perf_counter()
        params, _, _ = train_model(model, params, scaling, Xj, Yj,
                                   jax.random.PRNGKey(seed + 1), iters=iters,
                                   batchsize=100, optimizer=optax.adam(1e-3))
        jax.block_until_ready(params)
        dt = time.perf_counter() - t0

        def one_ll(k):
            noise = model.sample_noise(k, (Xj.shape[0],))
            dist = model.apply(params, scaling, Xj, noise)
            return dist.log_prob(Yj)

        lls = np.asarray(jax.vmap(one_ll)(
            jax.random.split(jax.random.PRNGKey(7), 20)))
        lls = lls.reshape(20, -1)
        out[name] = dict(
            nll_expected=float(-lls.mean()),
            nll_predictive=float(-np.mean(
                np.logaddexp.reduce(lls, 0) - np.log(lls.shape[0]))),
            train_seconds=dt)
        print(f'[tpu {name}] {out[name]}', flush=True)
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--iters', type=int, default=15000)
    p.add_argument('--hids', type=str, default='200,200,200,200')
    p.add_argument('--out', type=str, default='runs/bnn_parity.json')
    p.add_argument('--side', choices=['both', 'ref', 'tpu'], default='both')
    p.add_argument('--seed', type=int, default=0)
    args = p.parse_args()
    hids = tuple(int(h) for h in args.hids.split(','))

    X, Y = make_dataset()
    print(f'dataset: {X.shape[0]} samples', flush=True)
    results = {'iters': args.iters, 'hids': list(hids),
               'n_samples': int(X.shape[0]), 'seed': args.seed}
    if args.side in ('both', 'tpu'):
        results['tpu'] = run_tpu_side(X, Y, args.iters, hids, seed=args.seed)
    if args.side in ('both', 'ref'):
        results['reference'] = run_reference_side(X, Y, args.iters, hids, seed=args.seed)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, 'w') as fh:
        json.dump(results, fh, indent=2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
