"""Trajectory plotting helpers (`prob_mbrl/utils/core.py:18-120`).

Headless-safe (Agg backend unless a display is configured); figures are
returned so drivers can save or show them. ``plot_rollout`` runs a
no-moment-matching imagined rollout and plots the particle trajectories,
matching the reference's live-visualization behavior.
"""
import numpy as np

import matplotlib
if not matplotlib.get_backend().lower().startswith(('qt', 'tk', 'macosx')):
    matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402


def plot_sample(data, axarr, colors=None, **kwargs):
    """Per-dimension line plots of one trajectory sample (`core.py:18-30`)."""
    data = np.asarray(data)
    H, D = data.shape
    if colors is None:
        colors = [f'C{i % 10}' for i in range(D)]
    for d in range(D):
        axarr[d].plot(np.arange(H), data[:, d], color=colors[d], **kwargs)
    return axarr


def plot_mean_var(data, axarr, colors=None, k=2.0, **kwargs):
    """mean +/- k*sigma bands over the particle axis (`core.py:33-55`).

    data: [H, N_particles, D].
    """
    data = np.asarray(data)
    H, N, D = data.shape
    t = np.arange(H)
    if colors is None:
        colors = [f'C{i % 10}' for i in range(D)]
    mean = data.mean(1)
    std = data.std(1)
    for d in range(D):
        axarr[d].plot(t, mean[:, d], color=colors[d], **kwargs)
        axarr[d].fill_between(t, mean[:, d] - k * std[:, d],
                              mean[:, d] + k * std[:, d],
                              color=colors[d], alpha=0.3)
    return axarr


def plot_trajectories(states, actions, rewards, plot_samples=True,
                      fig_prefix=''):
    """3-figure (states/actions/rewards) display (`core.py:58-107`).

    states: [H+1, N, D] or [H+1, D]; actions: [H, N, U]; rewards: [H, N, 1].
    Returns the three figures.
    """
    figs = []
    for name, data in [('states', states), ('actions', actions),
                       ('rewards', rewards)]:
        data = np.asarray(data)
        if data.ndim == 2:
            data = data[:, None, :]
        D = data.shape[-1]
        fig, axarr = plt.subplots(D, 1, squeeze=False, sharex=True,
                                  num=f'{fig_prefix}{name}')
        axarr = [a[0] for a in axarr]
        for ax in axarr:
            ax.clear()
        if plot_samples and data.shape[1] > 1:
            for i in range(min(data.shape[1], 50)):
                plot_sample(data[:, i], axarr, alpha=0.3, linewidth=0.5)
        plot_mean_var(data, axarr)
        axarr[0].set_title(f'{fig_prefix}{name}')
        figs.append(fig)
    return figs


def plot_rollout(x0, dyn, pol, steps, dyn_params, dyn_stats, pol_params,
                 key=None, **kwargs):
    """Run a sampled-particle rollout and plot it (`core.py:110-120`)."""
    import jax
    from .rollout import rollout

    if key is None:
        key = jax.random.PRNGKey(0)
    kd, kp = jax.random.split(key)
    B = x0.shape[0]
    dyn_noise = dyn.sample_noise(kd, (B,))
    pol_noise = pol.sample_noise(kp, (B,))
    states, actions, rewards = rollout(x0, dyn, pol, steps, dyn_params,
                                       dyn_stats, pol_params, dyn_noise,
                                       pol_noise, **kwargs)
    return plot_trajectories(states, actions, rewards)
