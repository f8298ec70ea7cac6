"""Log-likelihoods and quadratic costs.

TPU-native reimplementation of the reference loss surface
(`prob_mbrl/losses.py:16-75` in mcgillmrl/prob_mbrl): diagonal-Gaussian and
mixture-of-diagonal-Gaussians log likelihoods, plus the PILCO quadratic and
saturating quadratic costs. All functions are pure, jittable and batch-polymorphic.
"""
import math

import jax.numpy as jnp
from jax import nn as jnn

HALF_LOG_TWO_PI = 0.5 * math.log(2.0 * math.pi)


def gaussian_log_likelihood(targets, means, log_stds=None):
    """Diagonal-Gaussian log likelihood of ``targets``.

    Matches the reference semantics (`losses.py:16-37`): when ``log_stds`` is
    None this degrades to an unnormalized squared-error score.

    Args:
      targets: [..., D] observations.
      means: [..., D] predicted means (broadcastable against targets).
      log_stds: optional [..., D] predicted log standard deviations.

    Returns:
      [...] log likelihood per batch element (last dim reduced).
    """
    D = means.shape[-1]
    deltas = means - targets
    if log_stds is not None:
        lml = (-0.5 * jnp.sum((deltas * jnp.exp(-log_stds)) ** 2, -1)
               - jnp.sum(log_stds, -1)
               - D * HALF_LOG_TWO_PI)
    else:
        lml = -0.5 * jnp.sum(deltas ** 2, -1)
    return lml


def gaussian_mixture_log_likelihood(targets, means, log_stds, logit_pi):
    """Log likelihood under a mixture of diagonal Gaussians.

    Matches `losses.py:40-64`: components live on the trailing axis.

    Args:
      targets: [..., D].
      means: [..., D, K] per-component means.
      log_stds: [..., D, K].
      logit_pi: [..., K] unnormalized mixture logits.

    Returns:
      [..., 1] total log probability (keepdims, as in the reference).
    """
    D = means.shape[-2]
    deltas = means - targets[..., None]
    inv_stds = jnp.exp(-log_stds)
    log_norm = -D * HALF_LOG_TWO_PI - jnp.sum(log_stds, -2)
    dists = -0.5 * jnp.sum((deltas * inv_stds) ** 2, -2)
    log_probs = jnn.log_softmax(logit_pi, -1) + log_norm + dists
    return jnn.logsumexp(log_probs, axis=-1, keepdims=True)


def quadratic_loss(states, target, Q):
    """0.5-free quadratic state cost ``(x - t)^T Q (x - t)`` (`losses.py:67-71`)."""
    deltas = states - target
    return jnp.sum((deltas @ Q) * deltas, -1, keepdims=True)


def quadratic_saturating_loss(states, target, Q):
    """Saturating cost ``1 - exp(-0.5 (x-t)^T Q (x-t))`` (`losses.py:74-75`)."""
    return 1.0 - jnp.exp(-0.5 * quadratic_loss(states, target, Q))
