"""1-D heteroscedastic BNN regression with full-covariance density networks.

TPU-native counterpart of `examples/bnn_regression.py`: fit a GaussianDN and
a 5-component GaussianMDN (concrete dropout, hhSinLU activations) to a
gap-riddled noisy sine, then visualize the posterior with per-particle
mean/std bands and temperature->0 noiseless samples.
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


def make_dataset(n=1000, seed=0):
    """Gap-riddled heteroscedastic sine (`bnn_regression.py:21-40`)."""
    rng = np.random.RandomState(seed)
    segments = [(-4.0, -3.0), (-2.0, -1.0), (0.5, 1.5), (2.5, 4.0)]
    xs = np.concatenate([rng.uniform(a, b, n // len(segments))
                         for a, b in segments])
    noise = (0.1 + 0.3 * np.abs(np.cos(0.5 * xs))) * rng.randn(len(xs))
    ys = np.sin(xs) + 1e-1 * xs ** 2 + noise
    return (jnp.asarray(xs[:, None], jnp.float32),
            jnp.asarray(ys[:, None], jnp.float32))


def posterior_particles(model, params, scaling, x_grid, n_particles=50,
                        temperature=1.0, key=None):
    """Per-dropout-sample predictions over a grid: [P, N, 1] samples."""
    key = key if key is not None else jax.random.PRNGKey(42)

    def one(k):
        kn, ks = jax.random.split(k)
        noise = model.sample_noise(kn, (x_grid.shape[0],))
        dist = model.apply(params, scaling, x_grid, noise,
                           temperature=temperature)
        return dist.rsample(ks)

    return jax.vmap(one)(jax.random.split(key, n_particles))


def main(iters=15000, plot=True):
    X, Y = make_dataset()

    results = {}
    for name, build in [
            ('GaussianDN', lambda: density_network_mlp(
                1, 1, hids=(200, 200), dropout=0.1, activation='hhsinlu')),
            ('GaussianMDN', lambda: mixture_density_network_mlp(
                1, 1, nc=5, hids=(200, 200), dropout=0.1,
                activation='hhsinlu'))]:
        model = build()
        params = model.init(jax.random.PRNGKey(0))
        scaling = model.fit_scaling(X, Y)
        params, _, metrics = train_model(
            model, params, scaling, X, Y, jax.random.PRNGKey(1), iters=iters,
            batchsize=100, optimizer=optax.adam(1e-4))
        nll = -float(np.asarray(metrics['E_lml'])[-100:].mean())
        print(f'[bnn_regression] {name}: final NLL = {nll:.4f}')
        results[name] = (model, params, scaling, nll)

    if plot:
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        x_grid = jnp.linspace(-5, 5, 400)[:, None]
        fig, axs = plt.subplots(1, len(results), figsize=(12, 5))
        for ax, (name, (model, params, scaling, nll)) in zip(
                np.atleast_1d(axs), results.items()):
            samples = np.asarray(posterior_particles(model, params, scaling,
                                                     x_grid))
            noiseless = np.asarray(posterior_particles(
                model, params, scaling, x_grid, temperature=1e-9))
            ax.plot(np.asarray(X)[:, 0], np.asarray(Y)[:, 0], 'k.',
                    markersize=1, alpha=0.3)
            for i in range(min(20, samples.shape[0])):
                ax.plot(np.asarray(x_grid)[:, 0], noiseless[i, :, 0],
                        'C0-', alpha=0.2, linewidth=0.5)
            m = samples.mean(0)[:, 0]
            s = samples.std(0)[:, 0]
            ax.plot(np.asarray(x_grid)[:, 0], m, 'C1-')
            ax.fill_between(np.asarray(x_grid)[:, 0], m - 2 * s, m + 2 * s,
                            color='C1', alpha=0.2)
            ax.set_title(f'{name} (NLL {nll:.3f})')
        out = os.path.join(os.path.dirname(__file__), 'bnn_regression.png')
        fig.savefig(out, dpi=120)
        print(f'[bnn_regression] plot -> {out}')
    return results


if __name__ == '__main__':
    main()
