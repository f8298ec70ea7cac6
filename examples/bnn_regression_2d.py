"""2-D multimodal BNN regression with a mixture density network.

TPU-native counterpart of `examples/bnn_regression_2d.py`: the target is a
one-to-many mapping (points on circles, multimodal conditional p(y|x)); a
GaussianMDN captures the modes where a unimodal GaussianDN averages them.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from prob_mbrl_tpu.models import (density_network_mlp,
                                  mixture_density_network_mlp)  # noqa: E402
from prob_mbrl_tpu.utils.train_model import train_model  # noqa: E402


def make_dataset(n=2000, seed=0):
    """x=angle -> y = point on one of two concentric noisy circles."""
    rng = np.random.RandomState(seed)
    theta = rng.uniform(-np.pi, np.pi, n)
    radius = np.where(rng.rand(n) > 0.5, 1.0, 2.0)
    y = np.stack([radius * np.cos(theta), radius * np.sin(theta)], -1)
    y = y + 0.05 * rng.randn(n, 2)
    return (jnp.asarray(theta[:, None], jnp.float32),
            jnp.asarray(y, jnp.float32))


def main(iters=10000, plot=True):
    X, Y = make_dataset()
    results = {}
    for name, build in [
            ('GaussianDN', lambda: density_network_mlp(
                1, 2, hids=(200, 200), dropout=0.1, activation='hhsinlu')),
            ('GaussianMDN', lambda: mixture_density_network_mlp(
                1, 2, nc=5, hids=(200, 200), dropout=0.1,
                activation='hhsinlu'))]:
        model = build()
        params = model.init(jax.random.PRNGKey(0))
        scaling = model.fit_scaling(X, Y)
        params, _, metrics = train_model(
            model, params, scaling, X, Y, jax.random.PRNGKey(1), iters=iters,
            batchsize=100, optimizer=optax.adam(1e-4))
        nll = -float(np.asarray(metrics['E_lml'])[-100:].mean())
        print(f'[bnn_regression_2d] {name}: final NLL = {nll:.4f}')
        results[name] = (model, params, scaling, nll)

    if plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig, axs = plt.subplots(1, len(results), figsize=(12, 5))
        key = jax.random.PRNGKey(7)
        xg = jnp.asarray(
            np.random.RandomState(1).uniform(-np.pi, np.pi, 2000)[:, None],
            jnp.float32)
        for ax, (name, (model, params, scaling, nll)) in zip(
                np.atleast_1d(axs), results.items()):
            noise = model.sample_noise(key, (xg.shape[0],))
            dist = model.apply(params, scaling, xg, noise)
            s = np.asarray(dist.rsample(jax.random.fold_in(key, 1)))
            ax.plot(np.asarray(Y)[:, 0], np.asarray(Y)[:, 1], 'k.',
                    markersize=1, alpha=0.2, label='data')
            ax.plot(s[:, 0], s[:, 1], 'C1.', markersize=1.5, alpha=0.4,
                    label='samples')
            ax.set_title(f'{name} (NLL {nll:.3f})')
            ax.legend()
        out = os.path.join(os.path.dirname(__file__),
                           'bnn_regression_2d.png')
        fig.savefig(out, dpi=120)
        print(f'[bnn_regression_2d] plot -> {out}')
    return results


if __name__ == '__main__':
    main()
