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
import numpy as np

from .math import safe_cholesky


def particle_moments(samples):
    """Mean and covariance over the particle axis (-2). Returns (m, S)."""
    M = samples.shape[-2]
    m = jnp.mean(samples, -2, keepdims=True)
    deltas = samples - m
    S = jnp.matmul(jnp.swapaxes(deltas, -1, -2), deltas) / (M - 1)
    return m, S


def standardize_noise(z):
    """Standardize fixed noise over the particle axis (-2).

    Unbiased std (ddof=1), matching torch.Tensor.std (`rollout.py:27`).
    Standardization commutes with cyclic rolls of the particle axis, so
    per-epoch noise banks can be standardized ONCE outside the rollout scan
    instead of inside every MM call (ungrouped MM only: grouped MM
    standardizes per group, and the per-step roll moves particles across
    group boundaries).
    """
    return (z - jnp.mean(z, -2, keepdims=True)) / jnp.std(z, -2,
                                                          keepdims=True,
                                                          ddof=1)


def mm_resample(samples, z, jitter=1e-12, standardized=False):
    """Moment-match and resample with standardized fixed noise.

    Matches `rollout.py:20-29`: z is standardized over the particle axis
    (guards against under-dispersed fixed noise) and detached from the graph.

    Args:
      samples: [..., M, D] particles.
      z: [..., M, D] fixed noise (PEGASUS).
      jitter: initial diagonal jitter for the Cholesky.
      standardized: set when ``z`` was already passed through
        :func:`standardize_noise` (hot loops hoist it out of the scan).

    Returns:
      [..., M, D] resampled particles, differentiable wrt samples via (m, L).
    """
    m, S = particle_moments(samples)
    L = safe_cholesky(S, initial_jitter=jitter)
    if not standardized:
        z = standardize_noise(z)
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


# ---------------------------------------------------------------------------
# Orthogonal-mixing moment matching (TPU-first redesign, no Cholesky)
# ---------------------------------------------------------------------------
#
# The reference kernel (`rollout.py:20-29`) resamples as ``m + z @ chol(S)^T``
# — a D x D Cholesky inside the sequential rollout scan, which lowers to a
# long chain of tiny scalar ops on TPU and whose matched covariance is itself
# only approximate (the standardized noise Gram ``z^T z/(M-1)`` has O(1/sqrt M)
# off-diagonal error). The TPU-native kernel below instead mixes the particle
# cloud in *particle-index space* with a fixed random orthogonal matrix U that
# fixes the ones vector (U @ 1 = 1):
#
#     x_new = m + U @ (x - m)
#
# Because U is orthogonal and preserves the ones direction, the resampled
# cloud has EXACTLY the empirical mean and covariance of the input cloud
# (better than the reference), each output particle is a random unit-norm
# recombination of all M inputs (CLT-Gaussianizing the cloud, which is the
# point of moment matching), gradients flow to every input particle through
# the differentiable (m, x - m), and the whole step is one MXU matmul —
# no Cholesky, no PSD failure modes, no jitter escalation.
#
# PEGASUS determinism: U plays the role of the fixed noise ``z`` — sampled
# once per noise epoch (`mc_pilco.py:64-74`) and reused, stop-gradient like
# the reference's standardized z.


def sample_mm_mixing(key, n_particles, mm_groups=None, dtype=jnp.float32):
    """Sample a Haar-random orthogonal mixing matrix with ``U @ 1 = 1``.

    Construction: ``U = V (1 ⊕ H) V`` where H is Haar-orthogonal on
    R^(M-1) (QR of a Gaussian with the sign fix of Mezzadri 2007) and V is
    the Householder reflection mapping ``e_1 -> 1/sqrt(M)``. Then
    ``U @ 1 = U^T @ 1 = 1`` and U restricted to the centered subspace is
    Haar-uniform.

    Args:
      key: PRNG key.
      n_particles: total particle count M.
      mm_groups: if given, returns ``[groups, M/groups, M/groups]``
        independent per-group mixings (groups map onto device shards).
      dtype: matrix dtype.

    Returns:
      ``[M, M]`` (or ``[groups, M/groups, M/groups]``) orthogonal mixing.
    """
    if mm_groups is not None:
        group_size = n_particles // mm_groups
        keys = jax.random.split(key, mm_groups)
        return jax.vmap(
            lambda k: sample_mm_mixing(k, group_size, dtype=dtype))(keys)

    M = n_particles
    if M == 1:
        return jnp.full((1, 1), 1.0, dtype)
    A = jax.random.normal(key, (M - 1, M - 1), dtype)
    Q, R = jnp.linalg.qr(A)
    Q = Q * jnp.sign(jnp.diagonal(R))[None, :]
    # static pieces in numpy: this traces inside every training jit, and on a
    # remote-attached device each eager jnp constant is a network round-trip
    e00 = np.zeros((M, M), np.float64)
    e00[0, 0] = 1.0
    H = jnp.pad(Q, ((1, 0), (1, 0))) + e00.astype(dtype)
    e1 = np.zeros((M,), np.float64)
    e1[0] = 1.0
    u = e1 - np.ones((M,)) / np.sqrt(M)
    u = u / np.linalg.norm(u)
    V = (np.eye(M) - 2.0 * np.outer(u, u)).astype(dtype)
    # full-precision products: U is built once per PEGASUS epoch, and bf16
    # MXU passes would cost ~1e-3 orthogonality error for no speedup that
    # matters here
    return jnp.matmul(jnp.matmul(V, H, precision='highest'), V,
                      precision='highest')


def mm_resample_mix(samples, U, shift=None):
    """Moment-match by orthogonal particle mixing: ``m + U @ (x - m)``.

    Exactly preserves the empirical mean and covariance of ``samples`` for
    any ``U`` from :func:`sample_mm_mixing`. Drop-in TPU-fast replacement for
    :func:`mm_resample` (`rollout.py:20-29`): the fixed noise is the mixing
    matrix instead of a z-buffer.

    Args:
      samples: ``[..., M, D]`` particles.
      U: ``[..., M, M]`` orthogonal mixing fixing the ones vector (PEGASUS
        noise; stop-gradient is applied here like the reference detaches z).
      shift: optional (possibly traced) integer. When given, the mixed cloud
        is cyclically rolled by ``shift`` along the particle axis — the exact
        equivalent of mixing with ``Pi^shift @ U`` (the reference's per-step
        cyclic noise decorrelation, `rollout.py:53-59`) without ever
        materializing per-step ``[T, M, M]`` matrix stacks: a roll is a
        permutation (O(M D) data movement, gradient = inverse roll), and a
        rolled U is still orthogonal and still fixes the ones vector, so the
        exact-moments property is untouched.

    Returns:
      ``[..., M, D]`` resampled particles, differentiable wrt samples.
    """
    m = jnp.mean(samples, -2, keepdims=True)
    U = jax.lax.stop_gradient(U)
    y = jnp.matmul(U, samples - m)
    if shift is not None:
        y = jnp.roll(y, shift, axis=-2)
    return m + y


def grouped_mix(samples, U, mm_groups, shift=None):
    """Per-group :func:`mm_resample_mix`: [M, D] with [G, M/G, M/G] mixing.

    ``shift`` rolls within each group (the per-group analog of the cyclic
    decorrelation; see :func:`mm_resample_mix`).
    """
    D = samples.shape[-1]
    out = mm_resample_mix(samples.reshape(mm_groups, -1, D), U, shift=shift)
    return out.reshape(-1, D)
