"""Moment-matching particle resampling.

TPU-native reimplementation of the reference MM kernels
(`prob_mbrl/utils/rollout.py:6-29`): fit a Gaussian to the particle cloud
(empirical mean + covariance), then re-inject fixed standardized noise so the
resampled particles follow the matched Gaussian while the PEGASUS noise stays
pinned. Group variants reshape particles into ``mm_groups`` independent groups
— on a sharded particle axis the groups map exactly onto per-device shards, so
grouped MM needs no cross-device collectives. The global (ungrouped) variant
has a psum-based distributed counterpart in ``prob_mbrl_tpu.parallel``.
"""
import jax
import jax.numpy as jnp

from .math import safe_cholesky


def particle_moments(samples):
    """Mean and covariance over the particle axis (-2). Returns (m, S)."""
    M = samples.shape[-2]
    m = jnp.mean(samples, -2, keepdims=True)
    deltas = samples - m
    S = jnp.matmul(jnp.swapaxes(deltas, -1, -2), deltas) / (M - 1)
    return m, S


def mm_resample(samples, z, jitter=1e-12):
    """Moment-match and resample with standardized fixed noise.

    Matches `rollout.py:20-29`: z is standardized over the particle axis
    (guards against under-dispersed fixed noise) and detached from the graph.

    Args:
      samples: [..., M, D] particles.
      z: [..., M, D] fixed noise (PEGASUS).
      jitter: initial diagonal jitter for the Cholesky.

    Returns:
      [..., M, D] resampled particles, differentiable wrt samples via (m, L).
    """
    m, S = particle_moments(samples)
    L = safe_cholesky(S, initial_jitter=jitter)
    z = (z - jnp.mean(z, -2, keepdims=True)) / jnp.std(z, -2, keepdims=True)
    z = jax.lax.stop_gradient(z)
    return m + jnp.matmul(z, jnp.swapaxes(L, -1, -2))


def mm_resample_infer_ns(samples, z, jitter=1e-12):
    """Moment-match, inferring the noise variables from the samples.

    Matches `rollout.py:6-17`: solve L n = deltas^T for the standardized noise
    that would have generated each particle, detach it, and rebuild the
    particles through the differentiable (m, L). Preserves particle identity.
    The ``z`` argument is accepted for signature parity but unused.
    """
    del z
    m, S = particle_moments(samples)
    deltas = samples - m
    L = safe_cholesky(S, initial_jitter=jitter)
    deltasT = jnp.swapaxes(deltas, -1, -2)
    n = jax.scipy.linalg.solve_triangular(L, deltasT, lower=True)
    n = jax.lax.stop_gradient(jnp.swapaxes(n, -1, -2))
    return m + jnp.matmul(n, jnp.swapaxes(L, -1, -2))


def grouped(mm_fn, samples, z, mm_groups, jitter=1e-12):
    """Apply an MM kernel independently over ``mm_groups`` particle groups.

    Matches the reshape dance at `rollout.py:125-145`: [M, D] ->
    [groups, M/groups, D] -> mm -> [M, D].
    """
    D = samples.shape[-1]
    zD = z.shape[-1]
    s = mm_fn(samples.reshape(mm_groups, -1, D), z.reshape(mm_groups, -1, zD),
              jitter)
    return s.reshape(-1, D)
