"""Tests for the jitted regressor trainer's reference-parity features
(decoupled regularization, prioritized sampling — `train_regressor.py:86-127`)
and the working vmapped ModelEnsemble (`core.py:102-118` fixed)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from prob_mbrl_tpu import models
from prob_mbrl_tpu.utils.train_regressor import (make_train_fn,
                                                 train_regressor,
                                                 init_priority_state,
                                                 normalize_dataset)


def make_dataset(n=256, seed=0):
    rng = np.random.RandomState(seed)
    X = rng.uniform(-3, 3, (n, 1)).astype(np.float32)
    Y = (np.sin(X) + 0.1 * rng.randn(n, 1)).astype(np.float32)
    return jnp.asarray(X), jnp.asarray(Y)


def make_reg():
    density = models.DiagGaussianDensity(1)
    return models.Regressor(
        mlp=models.MLPSpec(1, density.n_inputs, (32, 32),
                           dropout=models.cdropout(0.1)),
        output_density=density)


class TestTrainRegressorFeatures:
    def _run(self, **kwargs):
        reg = make_reg()
        X, Y = make_dataset()
        params = reg.init(jax.random.PRNGKey(0))
        stats = reg.fit_stats(X, Y)
        return train_regressor(reg, params, stats, X, Y,
                               jax.random.PRNGKey(1), iters=300,
                               batchsize=64, optimizer=optax.adam(1e-3),
                               return_aux=True, **kwargs)

    def test_decoupled_reg_improves_lml(self):
        _, _, metrics, aux = self._run(decoupled_reg=True)
        elml = np.asarray(metrics['E_lml'])
        assert np.all(np.isfinite(elml))
        assert elml[-30:].mean() > elml[:30].mean()
        assert aux['reg_opt_state'] is not None

    def test_prioritized_sampling_improves_lml_and_tracks_state(self):
        _, _, metrics, aux = self._run(prioritized_sampling=True)
        elml = np.asarray(metrics['E_lml'])
        assert np.all(np.isfinite(elml))
        assert elml[-30:].mean() > elml[:30].mean()
        prio = aux['priority_state']
        assert int(prio['step']) == 300
        # beta annealed past warmup: 0.4 + 300 * 1e-3 capped at 1.0
        assert float(prio['beta']) == pytest.approx(0.7, abs=1e-3)
        # visited samples accumulated counts
        assert float(jnp.sum(prio['counts'])) == pytest.approx(300 * 64)
        # priorities were updated away from the uniform init
        assert float(jnp.std(prio['p'])) > 0

    def test_priority_state_reuse_across_calls(self):
        reg = make_reg()
        X, Y = make_dataset()
        params = reg.init(jax.random.PRNGKey(0))
        stats = reg.fit_stats(X, Y)
        Xn, Yn = normalize_dataset(stats, X, Y)
        opt = optax.adam(1e-3)
        train = make_train_fn(reg, opt, batchsize=32,
                              prioritized_sampling=True)
        state = opt.init(params)
        prio = init_priority_state(Xn.shape[0])
        params, state, _, aux = train(params, state, Xn, Yn,
                                      jax.random.PRNGKey(1), 50,
                                      priority_state=prio)
        params, state, metrics, aux = train(
            params, state, Xn, Yn, jax.random.PRNGKey(2), 50,
            priority_state=aux['priority_state'])
        assert int(aux['priority_state']['step']) == 100
        assert np.all(np.isfinite(np.asarray(metrics['loss'])))


class TestModelEnsemble:
    def test_init_apply_shapes(self):
        ens = models.ModelEnsemble(make_reg(), n_members=4)
        params = ens.init(jax.random.PRNGKey(0))
        # stacked leading member axis on every leaf
        leaves = jax.tree_util.tree_leaves(params)
        assert all(leaf.shape[0] == 4 for leaf in leaves)
        X, Y = make_dataset(64)
        stats = ens.fit_stats(X, Y)
        noise = ens.sample_noise(jax.random.PRNGKey(1), (64,))
        out = ens.apply(params, stats, X, noise, return_samples=True)
        assert out.shape == (4, 64, 1)
        # members disagree (independent inits)
        assert float(jnp.std(out, 0).mean()) > 0

    def test_bootstrap_training_improves_all_members(self):
        ens = models.ModelEnsemble(make_reg(), n_members=3)
        X, Y = make_dataset(128)
        stats = ens.fit_stats(X, Y)
        Xn, Yn = normalize_dataset(stats, X, Y)
        params = ens.init(jax.random.PRNGKey(0))
        masks = models.bootstrap_masks(jax.random.PRNGKey(1), 3, 128)
        opt = optax.adam(1e-3)
        train = models.make_ensemble_train_fn(ens, opt, batchsize=64)
        params, _, metrics = train(params, opt.init(params), Xn, Yn, masks,
                                   jax.random.PRNGKey(2), 300)
        elml = np.asarray(metrics['E_lml'])
        assert np.all(np.isfinite(elml))
        assert elml[-30:].mean() > elml[:30].mean()

    def test_member_inputs_mode(self):
        ens = models.ModelEnsemble(make_reg(), n_members=2)
        params = ens.init(jax.random.PRNGKey(0))
        x = jnp.zeros((2, 8, 1))
        noise = ens.sample_noise(jax.random.PRNGKey(1), (8,))
        out = ens.apply(params, None, x, noise, member_inputs=True,
                        return_samples=True)
        assert out.shape == (2, 8, 1)


def test_jacobian_helpers():
    from prob_mbrl_tpu.utils.core import jacobian, batch_jacobian

    def f(x):
        return jnp.stack([x[0] ** 2, x[0] * x[1]])

    J = jacobian(f, jnp.array([2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(J), [[4.0, 0.0], [3.0, 2.0]],
                               atol=1e-5)
    Jb = batch_jacobian(f, jnp.array([[2.0, 3.0], [1.0, 1.0]]))
    assert Jb.shape == (2, 2, 2)
