"""Probability density heads over MLP outputs.

TPU-first redesign of the reference density modules
(`prob_mbrl/models/densities.py:18-259`). Heads are stateless frozen
dataclasses: the reparameterization noise that the reference caches in mutable
buffers (``z``, ``z_pi``, ``z_normal``) lives in an explicit noise pytree,
sampled with ``sample_noise(key, batch_shape)`` and reused for PEGASUS.

The reference draws its Gumbel-softmax *hard* component selection with an
unpinned ``torch.distributions.Categorical(...).sample()`` each forward
(`densities.py:221-222`); here a pinned uniform (``u_cat``) drives an
inverse-CDF draw so fixed noise state implies a fully deterministic sample.
"""
import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from ..ops.math import softplus_upper_clip
from ..ops.losses import (gaussian_log_likelihood,
                          gaussian_mixture_log_likelihood)


@dataclasses.dataclass(frozen=True)
class DiagGaussianDensity:
    """Diagonal-Gaussian head (`densities.py:70-148`).

    Input [..., 2D] splits into (mean, log_std); log_std is softly clipped at
    log(max_noise_std); optional (my, Sy) un-normalization; reparameterized
    sampling with pinned noise ``z``.
    """
    output_dims: int
    max_noise_std: float = 5.0

    @property
    def n_inputs(self):
        return 2 * self.output_dims

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        return {'z': jax.random.normal(
            key, tuple(batch_shape) + (self.output_dims,), dtype)}

    def distribution(self, x, scaling_params=None):
        """[..., 2D] -> (mean, log_std) after clipping and un-normalization."""
        D = self.output_dims
        mean, log_std = x[..., :D], x[..., D:2 * D]
        log_std = softplus_upper_clip(log_std, math.log(self.max_noise_std))
        if scaling_params is not None:
            my, Sy = scaling_params
            log_std = log_std + jnp.log(Sy)
            mean = mean * Sy + my
        return mean, log_std

    def sample(self, x, noise, scaling_params=None):
        mean, log_std = self.distribution(x, scaling_params)
        return mean + noise['z'] * jnp.exp(log_std)

    def apply(self, x, noise=None, scaling_params=None, return_samples=False):
        if return_samples:
            return self.sample(x, noise, scaling_params)
        return self.distribution(x, scaling_params)

    def log_prob(self, y, mean, log_std=None):
        return gaussian_log_likelihood(y, mean, log_std)


@dataclasses.dataclass(frozen=True)
class GaussianMixtureDensity:
    """Mixture of diagonal Gaussians head (`densities.py:151-259`).

    Input [..., 2*D*K + K + 1] splits into per-component means/log_stds,
    mixture logits, and a learned log sampling temperature. Component
    selection is Gumbel-softmax with a straight-through hard max.
    """
    output_dims: int
    n_components: int
    max_noise_std: float = 5.0

    @property
    def n_inputs(self):
        # mean (D*K) + log_std (D*K) + logit_pi (K) + log_temperature (1)
        return 2 * self.output_dims * self.n_components + self.n_components + 1

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        kg, kn, kc = jax.random.split(key, 3)
        bs = tuple(batch_shape)
        K, D = self.n_components, self.output_dims
        u = jax.random.uniform(kg, bs + (K,), dtype, minval=1e-7,
                               maxval=1.0 - 1e-7)
        return {
            'z_pi': -jnp.log(-jnp.log(u)),          # Gumbel noise
            'z_normal': jax.random.normal(kn, bs + (D,), dtype),
            'u_cat': jax.random.uniform(kc, bs + (1,), dtype),
        }

    def distribution(self, x, scaling_params=None):
        """[..., n_inputs] -> (mean [.., D, K], log_std [.., D, K], logit_pi [.., K])."""
        D, K = self.output_dims, self.n_components
        nD = D * K
        mean = x[..., :nD]
        log_std = x[..., nD:2 * nD]
        logit_pi = x[..., 2 * nD:2 * nD + K]
        log_temperature = x[..., 2 * nD + K:2 * nD + K + 1]

        log_std = softplus_upper_clip(log_std, math.log(self.max_noise_std))
        mean = mean.reshape(mean.shape[:-1] + (D, K))
        log_std = log_std.reshape(log_std.shape[:-1] + (D, K))
        temp = 1e-1 + jax.nn.softplus(log_temperature)
        logit_pi = logit_pi / temp

        if scaling_params is not None:
            my, Sy = scaling_params
            log_std = log_std + jnp.log(Sy)[..., None]
            mean = mean * Sy[..., None] + my[..., None]
        return mean, log_std, logit_pi

    def sample(self, x, noise, scaling_params=None, sampling_temperature=0.1):
        mean, log_std, logit_pi = self.distribution(x, scaling_params)
        K = self.n_components
        # Gumbel-softmax relaxed component weights
        k_soft = jax.nn.softmax(
            (jax.nn.log_softmax(logit_pi, -1) + noise['z_pi'])
            / sampling_temperature, -1)
        # hard draw from the relaxed categorical via pinned inverse-CDF
        cdf = jnp.cumsum(k_soft, -1)
        k_idx = jnp.sum((noise['u_cat'] > cdf).astype(jnp.int32), -1)
        k_hard = jax.nn.one_hot(k_idx, K, dtype=k_soft.dtype)
        # straight-through: forward hard, backward through the softmax
        k = jax.lax.stop_gradient(k_hard - k_soft) + k_soft
        k = k[..., None, :]                      # [..., 1, K]
        samples = jnp.sum(mean * k, -1)
        stds = jnp.exp(jnp.sum(log_std * k, -1))
        return samples + noise['z_normal'] * stds

    def apply(self, x, noise=None, scaling_params=None, return_samples=False,
              sampling_temperature=0.1):
        if return_samples:
            return self.sample(x, noise, scaling_params, sampling_temperature)
        return self.distribution(x, scaling_params)

    def log_prob(self, y, mean, log_std, logit_pi):
        return gaussian_mixture_log_likelihood(y, mean, log_std, logit_pi)


@dataclasses.dataclass(frozen=True)
class CategoricalDensity:
    """Gumbel-softmax categorical head (`densities.py:18-67`).

    The reference's ``log_prob`` is unreachable dead code (nested inside
    ``forward``, `densities.py:65-67`); here it is implemented properly.
    """
    output_dims: int

    @property
    def n_inputs(self):
        # logits (D) + optional log_temperature handled at apply time
        return self.output_dims

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        kg, kc = jax.random.split(key)
        bs = tuple(batch_shape)
        D = self.output_dims
        u = jax.random.uniform(kg, bs + (D,), dtype, minval=1e-7,
                               maxval=1.0 - 1e-7)
        return {'z': -jnp.log(-jnp.log(u)),
                'u_cat': jax.random.uniform(kc, bs + (1,), dtype)}

    def apply(self, x, noise=None, return_samples=False,
              sampling_temperature=0.1):
        D = self.output_dims
        logits = x[..., :D]
        if not return_samples:
            return logits
        y_soft = jax.nn.softmax(
            (jax.nn.log_softmax(x, -1) + noise['z']) / sampling_temperature,
            -1)
        cdf = jnp.cumsum(y_soft, -1)
        y_idx = jnp.sum((noise['u_cat'] > cdf).astype(jnp.int32), -1)
        y_hard = jax.nn.one_hot(y_idx, x.shape[-1], dtype=y_soft.dtype)
        return jax.lax.stop_gradient(y_hard - y_soft) + y_soft

    def log_prob(self, y, logits):
        """log p(one-hot y | logits)."""
        logp = jax.nn.log_softmax(logits, -1)
        return jnp.sum(y * logp, -1, keepdims=True)


@dataclasses.dataclass(frozen=True)
class TanhSquashedDensity:
    """Tanh-squashed wrapper around a base density.

    The reference declares this as a broken ``def``-instead-of-``class``
    (`densities.py:262-286`); implemented here with proper log-det-Jacobian
    correction for the squash.
    """
    density: DiagGaussianDensity
    max_u: float = 1.0
    min_u: Optional[float] = None

    @property
    def n_inputs(self):
        return self.density.n_inputs

    @property
    def scale(self):
        min_u = -self.max_u if self.min_u is None else self.min_u
        return 0.5 * (self.max_u - min_u)

    @property
    def bias(self):
        min_u = -self.max_u if self.min_u is None else self.min_u
        return 0.5 * (self.max_u + min_u)

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        return self.density.sample_noise(key, batch_shape, dtype)

    def apply(self, x, noise=None, scaling_params=None, return_samples=False):
        if return_samples:
            u = self.density.sample(x, noise, scaling_params)
            return self.scale * jnp.tanh(u) + self.bias
        return self.density.distribution(x, scaling_params)

    def log_prob(self, y, mean, log_std=None):
        """log prob of squashed sample y with change-of-variables correction."""
        u01 = jnp.clip((y - self.bias) / self.scale, -1.0 + 1e-6, 1.0 - 1e-6)
        u = jnp.arctanh(u01)
        base = gaussian_log_likelihood(u, mean, log_std)
        # |dy/du| = scale * (1 - tanh(u)^2)
        log_det = jnp.sum(jnp.log(self.scale * (1.0 - u01 ** 2) + 1e-12), -1)
        return base - log_det
