"""Distributed moment matching: cross-device particle moments via psum.

Global (ungrouped) moment matching needs the mean and covariance of ALL
particles each imagined step (`prob_mbrl/utils/rollout.py:20-29`). When
particles shard over a mesh, the sufficient statistics (sum x, sum x x^T,
count) are reduced with ``psum`` — two small [D] / [D, D] collectives per
step riding ICI — after which every device holds the same (m, L) and
re-injects its local shard of the fixed noise. D is a state dimension
(4-8 for the analytic envs), so the collective payload is tiny; the win is
keeping the particle batch sharded through the whole rollout.

These functions must run inside ``shard_map`` (or pmap) with ``axis_name``
bound; per-device inputs are the local particle shards.
"""
import jax
import jax.numpy as jnp

from ..ops.math import safe_cholesky


def particle_moments_psum(samples, axis_name):
    """Global mean/cov over a device-sharded particle axis.

    Args:
      samples: [B_local, D] this device's particle shard.
      axis_name: mesh axis the particles shard over.

    Returns:
      (m [1, D], S [D, D]) — identical on every device.
    """
    n_local = samples.shape[0]
    n = jax.lax.psum(jnp.asarray(n_local, samples.dtype), axis_name)
    s1 = jax.lax.psum(jnp.sum(samples, 0), axis_name)          # [D]
    m = (s1 / n)[None]                                          # [1, D]
    deltas = samples - m
    s2 = jax.lax.psum(deltas.T @ deltas, axis_name)             # [D, D]
    S = s2 / (n - 1.0)
    return m, S


def mm_resample_psum(samples, z, axis_name, jitter=1e-12):
    """Distributed ``mm_resample`` (`rollout.py:20-29` across devices).

    The fixed noise ``z`` is standardized with *global* moments (psum) so the
    resampled cloud has exactly the matched mean/covariance regardless of how
    particles are laid out across devices — bit-consistent with the
    single-device kernel up to reduction order.
    """
    m, S = particle_moments_psum(samples, axis_name)
    L = safe_cholesky(S, initial_jitter=jitter)
    n = jax.lax.psum(jnp.asarray(z.shape[0], z.dtype), axis_name)
    z_mean = jax.lax.psum(jnp.sum(z, 0), axis_name) / n
    # unbiased (ddof=1) like torch .std() and ops.mm_resample
    z_var = jax.lax.psum(jnp.sum((z - z_mean) ** 2, 0),
                         axis_name) / (n - 1.0)
    z = (z - z_mean) * jax.lax.rsqrt(z_var + 1e-30)
    z = jax.lax.stop_gradient(z)
    return m + z @ L.T
