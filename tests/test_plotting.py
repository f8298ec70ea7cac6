"""Tests for utils.plotting (headless Agg rendering of trajectory figures)."""
import numpy as np
import pytest

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt  # noqa: E402

import jax  # noqa: E402

from prob_mbrl_tpu.utils import plotting  # noqa: E402


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close('all')


def test_plot_sample_draws_per_dim_lines():
    fig, axarr = plt.subplots(3, 1, squeeze=False)
    axarr = [a[0] for a in axarr]
    data = np.random.RandomState(0).randn(10, 3)
    plotting.plot_sample(data, axarr)
    for d, ax in enumerate(axarr):
        assert len(ax.lines) == 1
        np.testing.assert_allclose(ax.lines[0].get_ydata(), data[:, d])


def test_plot_mean_var_bands():
    fig, axarr = plt.subplots(2, 1, squeeze=False)
    axarr = [a[0] for a in axarr]
    data = np.random.RandomState(1).randn(8, 30, 2)
    plotting.plot_mean_var(data, axarr, k=2.0)
    for d, ax in enumerate(axarr):
        np.testing.assert_allclose(ax.lines[0].get_ydata(), data.mean(1)[:, d],
                                   rtol=1e-6)
        assert len(ax.collections) == 1  # the fill_between band


def test_plot_trajectories_three_figures():
    rng = np.random.RandomState(2)
    figs = plotting.plot_trajectories(rng.randn(6, 20, 4), rng.randn(5, 20, 1),
                                      rng.randn(5, 20, 1))
    assert len(figs) == 3
    assert [len(f.axes) for f in figs] == [4, 1, 1]
    # figures are keyed by name for live-window reuse; close before reshaping
    plt.close('all')
    # 2-D input (single trajectory) must also work (`core.py:58-60` shape
    # tolerance)
    figs2 = plotting.plot_trajectories(rng.randn(6, 4), rng.randn(5, 1),
                                       rng.randn(5, 1))
    assert [len(f.axes) for f in figs2] == [4, 1, 1]


def test_plot_rollout_end_to_end(tmp_path):
    from test_algorithms import tiny_setup
    dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
    x0 = 0.05 * jax.random.normal(jax.random.PRNGKey(0), (8, 4))
    figs = plotting.plot_rollout(x0, dyn, pol, 3, dyn_params, dyn_stats,
                                 pol_params)
    assert len(figs) == 3
    out = tmp_path / 'states.png'
    figs[0].savefig(out, dpi=40)
    assert out.stat().st_size > 0
