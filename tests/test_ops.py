import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prob_mbrl_tpu import ops


def test_gaussian_log_likelihood_matches_closed_form():
    rng = np.random.RandomState(0)
    y = rng.randn(7, 3).astype(np.float32)
    mu = rng.randn(7, 3).astype(np.float32)
    log_std = rng.randn(7, 3).astype(np.float32) * 0.3

    got = ops.gaussian_log_likelihood(jnp.array(y), jnp.array(mu),
                                      jnp.array(log_std))
    # independent closed form
    var = np.exp(2 * log_std)
    want = -0.5 * np.sum((y - mu) ** 2 / var + 2 * log_std +
                         np.log(2 * np.pi), -1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_gaussian_log_likelihood_no_std():
    y = jnp.ones((2, 3))
    mu = jnp.zeros((2, 3))
    got = ops.gaussian_log_likelihood(y, mu)
    np.testing.assert_allclose(np.asarray(got), -1.5 * np.ones(2), rtol=1e-6)


def test_mixture_log_likelihood_reduces_to_gaussian_single_component():
    rng = np.random.RandomState(1)
    y = rng.randn(5, 4).astype(np.float32)
    mu = rng.randn(5, 4, 1).astype(np.float32)
    log_std = (0.1 * rng.randn(5, 4, 1)).astype(np.float32)
    logit_pi = np.zeros((5, 1), np.float32)

    got = ops.gaussian_mixture_log_likelihood(
        jnp.array(y), jnp.array(mu), jnp.array(log_std), jnp.array(logit_pi))
    want = ops.gaussian_log_likelihood(
        jnp.array(y), jnp.array(mu[..., 0]), jnp.array(log_std[..., 0]))
    np.testing.assert_allclose(np.asarray(got)[:, 0], np.asarray(want),
                               rtol=1e-5)


def test_mixture_log_likelihood_matches_numpy_logsumexp():
    rng = np.random.RandomState(2)
    B, D, K = 6, 3, 4
    y = rng.randn(B, D).astype(np.float32)
    mu = rng.randn(B, D, K).astype(np.float32)
    log_std = (0.2 * rng.randn(B, D, K)).astype(np.float32)
    logit_pi = rng.randn(B, K).astype(np.float32)

    got = ops.gaussian_mixture_log_likelihood(
        jnp.array(y), jnp.array(mu), jnp.array(log_std), jnp.array(logit_pi))

    # independent computation
    comp_ll = -0.5 * np.sum(
        ((y[..., None] - mu) / np.exp(log_std)) ** 2 + 2 * log_std +
        np.log(2 * np.pi), axis=-2)
    log_pi = logit_pi - np.log(np.sum(np.exp(logit_pi), -1, keepdims=True))
    want = np.log(np.sum(np.exp(log_pi + comp_ll), -1))
    np.testing.assert_allclose(np.asarray(got)[:, 0], want, rtol=1e-4)


def test_quadratic_losses():
    x = jnp.array([[1.0, 0.0]])
    t = jnp.array([[0.0, 0.0]])
    Q = 2.0 * jnp.eye(2)
    np.testing.assert_allclose(np.asarray(ops.quadratic_loss(x, t, Q)),
                               [[2.0]])
    np.testing.assert_allclose(
        np.asarray(ops.quadratic_saturating_loss(x, t, Q)),
        [[1.0 - np.exp(-1.0)]], rtol=1e-6)


def test_to_complex_layout():
    x = jnp.array([[0.1, 0.2, np.pi / 2, 0.4]])
    out = ops.to_complex(x, (2,))
    want = np.array([[0.1, 0.2, 0.4, np.sin(np.pi / 2), np.cos(np.pi / 2)]])
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_to_complex_numpy_and_jax_agree():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 6).astype(np.float32)
    a = ops.to_complex(x, (1, 4))
    b = ops.to_complex(jnp.array(x), (1, 4))
    np.testing.assert_allclose(a, np.asarray(b), rtol=1e-6)
    assert a.shape == (4, 8)


def test_to_complex_empty_dims_identity():
    x = jnp.ones((3, 2))
    assert ops.to_complex(x, ()) is x


def test_softplus_upper_clip():
    x = jnp.array([-10.0, 0.0, 10.0, 100.0])
    out = ops.softplus_upper_clip(x, np.log(5.0))
    assert np.all(np.asarray(out) <= np.log(5.0) + 1e-6)
    # identity far below the bound
    np.testing.assert_allclose(np.asarray(out)[0], -10.0, atol=1e-3)


def test_safe_cholesky_psd():
    rng = np.random.RandomState(4)
    A = rng.randn(5, 5)
    S = (A @ A.T + 5 * np.eye(5)).astype(np.float32)
    L = ops.safe_cholesky(jnp.array(S))
    np.testing.assert_allclose(np.asarray(L @ L.T), S, rtol=1e-4, atol=1e-4)


def test_safe_cholesky_rank_deficient():
    # rank-1 matrix: plain cholesky fails, jitter escalation must rescue
    v = np.array([[1.0, 2.0, 3.0]], np.float32)
    S = jnp.array(v.T @ v)
    L = ops.safe_cholesky(S, initial_jitter=1e-12)
    assert np.all(np.isfinite(np.asarray(L)))
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(S), atol=1e-2)


def test_safe_cholesky_jittable():
    S = jnp.eye(3)
    L = jax.jit(ops.safe_cholesky)(S)
    np.testing.assert_allclose(np.asarray(L), np.eye(3), atol=1e-6)


def test_mm_resample_preserves_moments():
    rng = np.random.RandomState(5)
    samples = jnp.array(rng.randn(4096, 4).astype(np.float32))
    z = jnp.array(rng.randn(4096, 4).astype(np.float32))
    out = ops.mm_resample(samples, z)
    m_in, S_in = ops.particle_moments(samples)
    m_out, S_out = ops.particle_moments(out)
    np.testing.assert_allclose(np.asarray(m_out), np.asarray(m_in), atol=1e-4)
    # matched up to the sampling error of the standardized fixed noise
    np.testing.assert_allclose(np.asarray(S_out), np.asarray(S_in), atol=0.1)


def test_mm_resample_infer_ns_is_identity_in_value():
    rng = np.random.RandomState(6)
    samples = jnp.array(rng.randn(64, 3).astype(np.float32))
    z = jnp.zeros_like(samples)
    out = ops.mm_resample_infer_ns(samples, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(samples), atol=1e-3)


def test_mm_resample_gradients_flow():
    samples = jnp.ones((32, 2)) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (32, 2))
    z = jax.random.normal(jax.random.PRNGKey(1), (32, 2))

    def loss(s):
        return jnp.sum(ops.mm_resample(s, z) ** 2)

    g = jax.grad(loss)(samples)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0


def test_grouped_mm_shapes():
    rng = np.random.RandomState(7)
    samples = jnp.array(rng.randn(100, 4).astype(np.float32))
    z = jnp.array(rng.randn(100, 4).astype(np.float32))
    out = ops.grouped(ops.mm_resample, samples, z, mm_groups=4)
    assert out.shape == (100, 4)


def test_sample_mm_mixing_orthogonal_and_fixes_ones():
    M = 64
    U = np.asarray(ops.sample_mm_mixing(jax.random.PRNGKey(0), M), np.float64)
    np.testing.assert_allclose(U @ np.ones(M), np.ones(M), atol=1e-4)
    np.testing.assert_allclose(U @ U.T, np.eye(M), atol=1e-4)


def test_sample_mm_mixing_grouped_shape():
    U = ops.sample_mm_mixing(jax.random.PRNGKey(0), 64, mm_groups=4)
    assert U.shape == (4, 16, 16)
    for g in range(4):
        Ug = np.asarray(U[g], np.float64)
        np.testing.assert_allclose(Ug @ np.ones(16), np.ones(16), atol=1e-4)
        np.testing.assert_allclose(Ug @ Ug.T, np.eye(16), atol=1e-4)


def test_mm_resample_mix_preserves_moments_exactly():
    # the orthogonal-mixing kernel matches BOTH empirical moments exactly
    # (the reference/cholesky kernel only matches covariance to O(1/sqrt(M)))
    rng = np.random.RandomState(5)
    samples = jnp.array((rng.randn(100, 4) * [1, 2, 3, 4]).astype(np.float32))
    U = ops.sample_mm_mixing(jax.random.PRNGKey(1), 100)
    out = ops.mm_resample_mix(samples, U)
    m_in, S_in = ops.particle_moments(samples)
    m_out, S_out = ops.particle_moments(out)
    np.testing.assert_allclose(np.asarray(m_out), np.asarray(m_in), atol=1e-2)
    np.testing.assert_allclose(np.asarray(S_out), np.asarray(S_in),
                               rtol=0.02, atol=1e-2)


def test_mm_resample_mix_gradients_flow():
    samples = jnp.ones((32, 2)) + 0.1 * jax.random.normal(
        jax.random.PRNGKey(0), (32, 2))
    U = ops.sample_mm_mixing(jax.random.PRNGKey(1), 32)

    def loss(s):
        return jnp.sum(ops.mm_resample_mix(s, U) ** 2)

    g = jax.grad(loss)(samples)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).sum() > 0


def test_mm_resample_mix_shift_equals_rolled_matrix():
    # rolling the mixed cloud by t == mixing with Pi^t U (the per-step cyclic
    # decorrelation), and a rolled U still preserves the empirical moments
    rng = np.random.RandomState(11)
    samples = jnp.array(rng.randn(32, 3).astype(np.float32))
    U = ops.sample_mm_mixing(jax.random.PRNGKey(3), 32)
    for t in (0, 1, 5):
        out_shift = ops.mm_resample_mix(samples, U, shift=t)
        out_rolled = ops.mm_resample_mix(samples, jnp.roll(U, t, axis=-2))
        np.testing.assert_allclose(np.asarray(out_shift),
                                   np.asarray(out_rolled), atol=1e-5)
    m_in, S_in = ops.particle_moments(samples)
    m_out, S_out = ops.particle_moments(
        ops.mm_resample_mix(samples, U, shift=7))
    np.testing.assert_allclose(np.asarray(m_out), np.asarray(m_in), atol=1e-4)
    np.testing.assert_allclose(np.asarray(S_out), np.asarray(S_in),
                               rtol=1e-3, atol=1e-4)


def test_mm_resample_mix_gaussianizes_skewed_cloud():
    # the POINT of moment matching is resampling toward a Gaussian
    # (`rollout.py:20-29`); mixing achieves it CLT-style: each output
    # particle is a random unit-norm recombination of all M inputs. A
    # strongly skewed cloud must come out with near-Gaussian shape stats at
    # the reference particle count (B=100).
    rng = np.random.RandomState(0)
    samples = jnp.asarray(rng.exponential(1.0, (100, 1)).astype(np.float32))

    def skew_kurt(x):
        x = np.asarray(x, np.float64).ravel()
        z = (x - x.mean()) / x.std()
        return np.mean(z ** 3), np.mean(z ** 4) - 3.0

    s_in, k_in = skew_kurt(samples)
    assert s_in > 1.5  # exponential: skewness ~2
    skews, kurts = [], []
    for seed in range(5):
        U = ops.sample_mm_mixing(jax.random.PRNGKey(seed), 100)
        s, k = skew_kurt(ops.mm_resample_mix(samples, U))
        skews.append(abs(s))
        kurts.append(abs(k))
    # mixed clouds are near-Gaussian: shape stats shrink by >3x vs input
    assert np.mean(skews) < s_in / 3, (np.mean(skews), s_in)
    assert np.mean(kurts) < abs(k_in) / 3 + 0.3, (np.mean(kurts), k_in)


def test_grouped_mix_shapes_and_moments():
    rng = np.random.RandomState(7)
    samples = jnp.array(rng.randn(100, 4).astype(np.float32))
    U = ops.sample_mm_mixing(jax.random.PRNGKey(2), 100, mm_groups=4)
    out = ops.grouped_mix(samples, U, mm_groups=4)
    assert out.shape == (100, 4)
    s_g = np.asarray(samples).reshape(4, 25, 4)
    o_g = np.asarray(out).reshape(4, 25, 4)
    np.testing.assert_allclose(o_g.mean(1), s_g.mean(1), atol=1e-2)


def test_clip_grad_norm():
    g = {'a': jnp.ones((10,)), 'b': 2.0 * jnp.ones((5,))}
    clipped = ops.clip_grad_norm(g, 1.0)
    total = np.sqrt(sum(np.sum(np.asarray(v) ** 2)
                        for v in jax.tree_util.tree_leaves(clipped)))
    assert total <= 1.0 + 1e-4
    # no-op when under the limit
    small = {'a': 1e-3 * jnp.ones((2,))}
    out = ops.clip_grad_norm(small, 1.0)
    np.testing.assert_allclose(np.asarray(out['a']),
                               np.asarray(small['a']), rtol=1e-5)


class TestSmallCholesky:
    def test_matches_lapack_forward_and_pullback(self):
        import numpy as np
        import jax
        import jax.numpy as jnp
        from prob_mbrl_tpu.ops.math import small_cholesky
        rng = np.random.RandomState(0)
        for D in (1, 2, 5, 16):
            A = jnp.asarray(rng.randn(7, D, D + 3))

            def f(A, chol):
                return jnp.sum(jnp.sin(chol(A @ jnp.swapaxes(A, -1, -2))))

            np.testing.assert_allclose(
                f(A, small_cholesky), f(A, jnp.linalg.cholesky), rtol=1e-5)
            g1 = jax.grad(lambda A: f(A, small_cholesky))(A)
            g2 = jax.grad(lambda A: f(A, jnp.linalg.cholesky))(A)
            np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                       rtol=2e-3, atol=1e-5)



class TestMMRewardsMeanOnly:
    """The analytic mean-only shortcut for the reward MM resample.

    ``m + z @ chol(S)^T`` with z standardized to exact zero particle-mean is
    invisible — in value AND gradient — to any plain particle-mean reduction
    of the rewards, so `mc_pilco` (CVaR off, no TD critic refit) replaces the
    whole [T, B, 1] resample chain with its per-step mean broadcast
    (30% of device busy time at B=4096 cholesky, BASELINE.md round 5).
    """

    def _loss(self, rewards, z_rr, T, B, groups, mean_only):
        from prob_mbrl_tpu.utils.rollout import _mm_rewards_batched
        out = _mm_rewards_batched(rewards, z_rr, T, B, groups, False,
                                  'cholesky', mean_only=mean_only)
        w = jnp.asarray(0.9 ** np.arange(T), out.dtype)
        return jnp.mean(jnp.sum(out[..., 0] * w[:, None], 0))

    @pytest.mark.parametrize('groups', [None, 4])
    def test_value_and_grad_match_full_resample(self, groups):
        T, B = 7, 64
        rewards = (0.5 * jax.random.normal(jax.random.PRNGKey(0), (T, B, 1))
                   + 1.0)
        z_rr = jax.random.normal(jax.random.PRNGKey(1), (B, 1))
        lf, gf = jax.value_and_grad(
            lambda r: self._loss(r, z_rr, T, B, groups, False))(rewards)
        lm, gm = jax.value_and_grad(
            lambda r: self._loss(r, z_rr, T, B, groups, True))(rewards)
        np.testing.assert_allclose(float(lf), float(lm), rtol=1e-5,
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gm),
                                   rtol=1e-4, atol=1e-6)

    def test_mean_only_is_constant_across_particles(self):
        T, B = 3, 16
        rewards = jax.random.normal(jax.random.PRNGKey(2), (T, B, 1))
        z_rr = jax.random.normal(jax.random.PRNGKey(3), (B, 1))
        from prob_mbrl_tpu.utils.rollout import _mm_rewards_batched
        out = _mm_rewards_batched(rewards, z_rr, T, B, None, False,
                                  'cholesky', mean_only=True)
        np.testing.assert_allclose(
            np.asarray(out), np.broadcast_to(
                np.mean(np.asarray(rewards), 1, keepdims=True), out.shape),
            rtol=1e-6)

    def test_infer_noise_variables_bypasses_shortcut(self):
        # identity-preserving MM must keep per-particle values
        T, B = 3, 16
        rewards = jax.random.normal(jax.random.PRNGKey(4), (T, B, 1))
        z_rr = jax.random.normal(jax.random.PRNGKey(5), (B, 1))
        from prob_mbrl_tpu.utils.rollout import _mm_rewards_batched
        out = _mm_rewards_batched(rewards, z_rr, T, B, None, True,
                                  'cholesky', mean_only=True)
        # infer_ns rebuilds each particle exactly (value-identity)
        np.testing.assert_allclose(np.asarray(out), np.asarray(rewards),
                                   rtol=1e-4, atol=1e-5)
