"""Transformer dynamics + MAF flow tests.

Oracles: exact causality (future tokens cannot influence past outputs),
padding-mask invariance, MAF invertibility (density-direction transform of
samples recovers the base noise) and log-density consistency against a
change-of-variables computation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prob_mbrl_tpu.models.transformer import (TransformerDynamicsModel,
                                              TransformerEncoderSpec,
                                              causal_mask_from_times,
                                              positional_encoding)
from prob_mbrl_tpu.models.flows import MAFSpec


@pytest.fixture(scope='module')
def tiny_dyn():
    m = TransformerDynamicsModel(3, 1, embedding_size=16,
                                 encoder=TransformerEncoderSpec(
                                     d_model=16, n_heads=2, n_layers=2,
                                     d_ff=32))
    params = m.init(jax.random.PRNGKey(0))
    return m, params


class TestTransformerDynamics:
    def test_shapes(self, tiny_dyn):
        m, params = tiny_dyn
        B, T = 2, 6
        ps, pr, pdone = m.apply(params, jnp.ones((B, T, 3)),
                                jnp.ones((B, T, 1)))
        assert ps.mu.shape == (B, T, 3)
        assert pr.mu.shape == (B, T, 1)
        assert pdone.logits.shape == (B, T, 2)

    def test_causality_exact(self, tiny_dyn):
        m, params = tiny_dyn
        B, T = 2, 6
        key = jax.random.PRNGKey(1)
        s = jax.random.normal(key, (B, T, 3))
        a = jax.random.normal(jax.random.fold_in(key, 1), (B, T, 1))
        ps1, _, _ = m.apply(params, s, a)
        # perturb the LAST timestep's state and action
        s2 = s.at[:, -1].add(100.0)
        a2 = a.at[:, -1].add(100.0)
        ps2, _, _ = m.apply(params, s2, a2)
        np.testing.assert_allclose(np.asarray(ps1.mu[:, :-1]),
                                   np.asarray(ps2.mu[:, :-1]), atol=1e-5)
        # and the last output MUST change (same-time attention)
        assert np.abs(np.asarray(ps1.mu[:, -1] - ps2.mu[:, -1])).max() > 1e-3

    def test_padding_mask_blocks_padded_tokens(self, tiny_dyn):
        m, params = tiny_dyn
        B, T = 2, 6
        key = jax.random.PRNGKey(2)
        s = jax.random.normal(key, (B, T, 3))
        a = jax.random.normal(jax.random.fold_in(key, 1), (B, T, 1))
        lens = jnp.asarray([4, 4])
        ps1, _, _ = m.apply(params, s, a, seqlens=lens)
        # garbage in the padded region must not affect valid outputs
        s2 = s.at[:, 4:].set(999.0)
        a2 = a.at[:, 4:].set(-999.0)
        ps2, _, _ = m.apply(params, s2, a2, seqlens=lens)
        np.testing.assert_allclose(np.asarray(ps1.mu[:, :4]),
                                   np.asarray(ps2.mu[:, :4]), atol=1e-5)

    def test_mask_helper(self):
        times = jnp.asarray([0, 1, 2, 0, 1, 2])
        mask = causal_mask_from_times(times, times)
        # query at time 0 cannot see keys at time 1, 2
        assert mask[0, 1] == -jnp.inf and mask[0, 2] == -jnp.inf
        assert mask[0, 0] == 0 and mask[0, 3] == 0
        assert mask[2, 1] == 0  # past visible

    def test_pe_shapes(self):
        pe = positional_encoding(10, 8)
        assert pe.shape == (10, 8)
        assert np.all(np.isfinite(np.asarray(pe)))


class TestMAF:
    def test_log_prob_matches_change_of_variables(self):
        maf = MAFSpec(dims=3, n_blocks=2, hidden=16)
        params = maf.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 3))
        lp = maf.log_prob(params, x)
        # manual: apply blocks in order, accumulate -sum(log_s)
        z = x
        logdet = 0.0
        for b, p in enumerate(params):
            mu, log_s = maf._block_params(p, z, reverse=bool(b % 2))
            z = (z - mu) * jnp.exp(-log_s)
            logdet = logdet - jnp.sum(log_s, -1)
        ref = -0.5 * jnp.sum(z ** 2 + np.log(2 * np.pi), -1) + logdet
        np.testing.assert_allclose(np.asarray(lp), np.asarray(ref),
                                   rtol=1e-5)

    def test_sample_inverts_density_direction(self):
        maf = MAFSpec(dims=4, n_blocks=3, hidden=16)
        params = maf.init(jax.random.PRNGKey(0))
        n = 6
        key = jax.random.PRNGKey(2)
        x = maf.sample(params, key, n)
        # push samples through the density direction: recovered z must be
        # exactly the base noise used to generate them
        z = x
        for b, p in enumerate(params):
            mu, log_s = maf._block_params(p, z, reverse=bool(b % 2))
            z = (z - mu) * jnp.exp(-log_s)
        z_base = jax.random.normal(key, (n, 4))
        np.testing.assert_allclose(np.asarray(z), np.asarray(z_base),
                                   rtol=1e-3, atol=1e-4)

    def test_training_improves_fit(self):
        import optax
        maf = MAFSpec(dims=2, n_blocks=3, hidden=32)
        params = maf.init(jax.random.PRNGKey(0))
        # target: shifted, scaled gaussian
        rng = np.random.RandomState(0)
        data = jnp.asarray(rng.randn(500, 2) * [0.5, 2.0] + [3.0, -1.0],
                           jnp.float32)
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            loss, g = jax.value_and_grad(
                lambda p: -jnp.mean(maf.log_prob(p, data)))(params)
            updates, opt_state = opt.update(g, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        for _ in range(300):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] - 1.0
        s = maf.sample(params, jax.random.PRNGKey(5), 2000)
        np.testing.assert_allclose(np.mean(np.asarray(s), 0), [3.0, -1.0],
                                   atol=0.5)
