"""v2 conditional-density API tests.

Oracles: closed-form log-densities (scipy/stats formulas inlined), whitening
round-trips (`conditional_density.py:129-163`), straight-through gradient
structure, and a 1-D heteroscedastic regression NLL improvement check — the
jitted analog of the reference's `examples/bnn_regression.py` smoke test.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from prob_mbrl_tpu import models
from prob_mbrl_tpu.models import (GaussianDN, GaussianMDN, SoftmaxDN,
                                  RelaxedSoftmaxDN, density_network_mlp,
                                  mixture_density_network_mlp, fit_scaling,
                                  whiten)
from prob_mbrl_tpu.ops import distributions as D
from prob_mbrl_tpu.utils import train_model


class TestMVNTril:
    def test_log_prob_matches_closed_form(self):
        rng = np.random.RandomState(0)
        A = rng.randn(4, 3, 3)
        L = np.tril(A) + 3 * np.eye(3)
        mu = rng.randn(4, 3)
        y = rng.randn(4, 3)
        d = D.MultivariateNormalTril(jnp.asarray(mu), jnp.asarray(L))
        lp = np.asarray(d.log_prob(jnp.asarray(y)))
        for i in range(4):
            S = L[i] @ L[i].T
            diff = y[i] - mu[i]
            ref = (-0.5 * diff @ np.linalg.solve(S, diff)
                   - 0.5 * np.linalg.slogdet(2 * np.pi * S)[1])
            np.testing.assert_allclose(lp[i], ref, rtol=1e-5)

    def test_rsample_moments(self):
        L = jnp.asarray([[2.0, 0.0], [1.0, 0.5]])
        mu = jnp.asarray([1.0, -1.0])
        d = D.MultivariateNormalTril(mu, L)
        s = d.rsample(jax.random.PRNGKey(0), (20000,))
        np.testing.assert_allclose(np.mean(np.asarray(s), 0), mu, atol=0.05)
        S = np.cov(np.asarray(s).T)
        np.testing.assert_allclose(S, np.asarray(L @ L.T), atol=0.15)


class TestMixture:
    def test_log_prob_matches_logsumexp(self):
        rng = np.random.RandomState(1)
        logits = jnp.asarray(rng.randn(5, 2))
        mu = jnp.asarray(rng.randn(5, 2, 3))
        L = jnp.asarray(np.tril(rng.randn(5, 2, 3, 3)) + 2 * np.eye(3))
        mix = D.MixtureSameFamily(D.Categorical(logits),
                                  D.MultivariateNormalTril(mu, L))
        y = jnp.asarray(rng.randn(5, 3))
        lp = np.asarray(mix.log_prob(y))
        comp = D.MultivariateNormalTril(mu, L)
        comp_lp = np.asarray(comp.log_prob(y[:, None, :]))
        w = np.asarray(jax.nn.log_softmax(logits, -1))
        ref = np.log(np.sum(np.exp(w + comp_lp), -1))
        np.testing.assert_allclose(lp, ref, rtol=1e-5)

    def test_straight_through_rsample_grads_flow(self):
        logits = jnp.zeros((1, 2))
        mu = jnp.asarray([[[0.0, 0.0], [5.0, 5.0]]])

        def f(mu):
            comp = D.MultivariateNormalTril(mu, 0.1 * jnp.eye(2))
            mix = D.MixtureSameFamily(D.Categorical(logits), comp)
            return jnp.sum(mix.rsample(jax.random.PRNGKey(0)))

        g = jax.grad(f)(mu)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.any(np.asarray(g) != 0)


class TestScaling:
    def test_whiten_round_trip(self):
        rng = np.random.RandomState(2)
        X = jnp.asarray(rng.randn(500, 4) * [1.0, 5.0, 0.2, 2.0] + 3.0)
        sc = fit_scaling(X)
        Xw = whiten(X, sc)
        # unwhiten: y = x @ L^T + mean
        Xr = jnp.matmul(Xw, sc['L'].T) + sc['mean']
        np.testing.assert_allclose(np.asarray(Xr), np.asarray(X), rtol=1e-3,
                                   atol=1e-3)
        # whitened data is decorrelated with std ~0.5 (L = 2 chol)
        C = np.cov(np.asarray(Xw).T)
        np.testing.assert_allclose(C, 0.25 * np.eye(4), atol=0.05)

    def test_affine_tril_log_prob_change_of_variables(self):
        rng = np.random.RandomState(3)
        mu = jnp.asarray(rng.randn(6, 2))
        base = D.MultivariateNormalTril(mu, jnp.eye(2))
        L = jnp.asarray([[2.0, 0.0], [0.5, 3.0]])
        loc = jnp.asarray([1.0, -2.0])
        t = D.AffineTril(base, loc, L)
        y = jnp.asarray(rng.randn(6, 2))
        x = np.linalg.solve(np.asarray(L), (np.asarray(y) - loc).T).T
        ref = np.asarray(base.log_prob(jnp.asarray(x))) - np.log(
            np.abs(np.prod(np.diag(L))))
        np.testing.assert_allclose(np.asarray(t.log_prob(y)), ref, rtol=1e-5)


class TestGaussianDN:
    def test_n_params_and_dist_shapes(self):
        m = density_network_mlp(3, 2, hids=(16,))
        assert m.mlp.output_dims == 8
        params = m.init(jax.random.PRNGKey(0))
        x = jnp.zeros((7, 3))
        dist = m.apply(params, None, x)
        assert dist.mu.shape == (7, 2)
        assert dist.scale_tril.shape == (7, 2, 2)
        # scale_tril structure: strictly-lower from u v^T, diag exp-clipped
        st = np.asarray(dist.scale_tril)
        assert np.all(np.triu(st, 1) == 0)
        assert np.all(np.diagonal(st, axis1=-2, axis2=-1) > 0)

    def test_temperature_scales_noise(self):
        m = density_network_mlp(3, 2, hids=(16,))
        params = m.init(jax.random.PRNGKey(0))
        x = jnp.zeros((4, 3))
        d1 = m.apply(params, None, x, temperature=1.0)
        d0 = m.apply(params, None, x, temperature=1e-9)
        np.testing.assert_allclose(np.asarray(d0.scale_tril), 0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(d0.mu), np.asarray(d1.mu))


class TestMDN:
    def test_shapes(self):
        m = mixture_density_network_mlp(2, 3, nc=4, hids=(16,))
        assert m.mlp.output_dims == (4 * 3 + 1) * 4
        params = m.init(jax.random.PRNGKey(0))
        dist = m.apply(params, None, jnp.zeros((5, 2)))
        assert dist.components.mu.shape == (5, 4, 3)
        assert dist.components.scale_tril.shape == (5, 4, 3, 3)
        assert dist.mixture.logits.shape == (5, 4)
        s = dist.rsample(jax.random.PRNGKey(1))
        assert s.shape == (5, 3)
        lp = dist.log_prob(s)
        assert lp.shape == (5,) and np.all(np.isfinite(np.asarray(lp)))


class TestSoftmaxDN:
    def test_onehot_log_prob(self):
        m = density_network_mlp(3, 4, density_model=SoftmaxDN, hids=(8,))
        params = m.init(jax.random.PRNGKey(0))
        dist = m.apply(params, None, jnp.zeros((2, 3)))
        s = dist.sample(jax.random.PRNGKey(1))
        assert s.shape == (2, 4)
        np.testing.assert_allclose(np.sum(np.asarray(s), -1), 1.0)
        assert np.all(np.isfinite(np.asarray(dist.log_prob(s))))

    def test_relaxed_rsample_differentiable(self):
        m = density_network_mlp(3, 4, density_model=RelaxedSoftmaxDN,
                                hids=(8,))
        params = m.init(jax.random.PRNGKey(0))

        def f(params):
            dist = m.apply(params, None, jnp.zeros((2, 3)))
            return jnp.sum(dist.rsample(jax.random.PRNGKey(1)) ** 2)

        g = jax.grad(f)(params)
        flat = jnp.concatenate([jnp.ravel(l) for l in
                                jax.tree_util.tree_leaves(g)])
        assert np.all(np.isfinite(np.asarray(flat)))


class TestTrainModel:
    def test_bnn_regression_1d_nll_improves(self):
        # gap-riddled heteroscedastic sine (bnn_regression.py workload, tiny)
        rng = np.random.RandomState(0)
        x = np.concatenate([rng.uniform(-4, -1, 200),
                            rng.uniform(1, 4, 200)])
        y = np.sin(x) + 0.1 * np.abs(x) * rng.randn(400)
        X = jnp.asarray(x[:, None], jnp.float32)
        Y = jnp.asarray(y[:, None], jnp.float32)
        m = density_network_mlp(1, 1, hids=(32, 32), dropout=0.1)
        params = m.init(jax.random.PRNGKey(0))
        scaling = m.fit_scaling(X, Y)
        params, _, metrics = train_model(
            m, params, scaling, X, Y, jax.random.PRNGKey(1), iters=500,
            batchsize=100, optimizer=optax.adam(1e-3))
        first = float(jnp.mean(metrics['E_lml'][:20]))
        last = float(jnp.mean(metrics['E_lml'][-20:]))
        assert np.isfinite(last) and last > first
