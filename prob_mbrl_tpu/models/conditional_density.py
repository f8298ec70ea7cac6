"""Conditional density models (the reference's v2 API), TPU-native.

Re-design of `prob_mbrl/models/conditional_density.py:91-386`: a base MLP
predicts the parameters of an output distribution; inputs/outputs are
whitened with full-covariance Cholesky scaling fitted from data. Instead of
``nn.Module`` state, models are frozen specs with explicit params/scaling
pytrees; distributions come from ``ops.distributions`` and are consumed
inside jitted training/eval functions.

Subclass contract (mirrors the reference): ``n_params(D)`` gives the base
model's output width, ``get_dist(params, temperature)`` builds the output
distribution from the base model's raw outputs.
"""
import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import distributions as dist_ops
from .mlp import MLPSpec
from .dropout import cdropout


def fit_scaling(X, eps=1e-4):
    """Full-covariance whitening params (`conditional_density.py:134-145`).

    Returns dict(mean, L, iL) with ``L = 2 * chol(cov(X_delta))`` where
    ``X_delta = X - mean + eps * std`` (the reference's jitter quirk, which
    inflates the covariance slightly to keep it full rank).
    """
    mean = jnp.mean(X, 0, keepdims=True)
    delta = X - mean + eps * jnp.std(X, 0)
    cov = (delta.T @ delta) / (X.shape[0] - 1)
    L = 2.0 * jnp.linalg.cholesky(cov)
    iL = jax.scipy.linalg.solve_triangular(L, np.eye(L.shape[-1],
                                                     dtype=X.dtype),
                                           lower=True)
    return dict(mean=mean, L=L, iL=iL)


def whiten(x, scaling):
    """x -> (x - mean) @ iL^T, i.e. L^{-1}(x - mean) per row (`:147-149`;
    transposed vs the reference so the output is actually decorrelated —
    see ``ops.distributions.AffineTril``)."""
    return jnp.matmul(x - scaling['mean'],
                      jnp.swapaxes(scaling['iL'], -1, -2))


@dataclasses.dataclass(frozen=True)
class ConditionalDensityModel:
    """Base model predicting distribution parameters (`:91-193`)."""
    mlp: MLPSpec

    @staticmethod
    def n_params(D):
        return D

    def get_dist(self, params, temperature):
        # unit-variance Gaussian around the predictions (`:117-123`); built
        # as a diag MVN so event-dim log_prob composes with AffineTril
        D = params.shape[-1]
        eye = np.eye(D, dtype=params.dtype)
        return dist_ops.MultivariateNormalTril(params, temperature * eye)

    # -- param / noise management (delegates to the MLP spec) ---------------
    def init(self, key, dtype=jnp.float32):
        return self.mlp.init(key, dtype)

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        return dict(mlp=self.mlp.sample_noise(key, batch_shape, dtype))

    def init_scaling(self, D_in, D_out, dtype=jnp.float32):
        eye_in = jnp.eye(D_in, dtype=dtype)
        eye_out = jnp.eye(D_out, dtype=dtype)
        return dict(X=dict(mean=jnp.zeros((1, D_in), dtype), L=eye_in,
                           iL=eye_in),
                    Y=dict(mean=jnp.zeros((1, D_out), dtype), L=eye_out,
                           iL=eye_out))

    def fit_scaling(self, X, Y):
        """(X, Y) -> whitening pytree (`set_scaling`, `:129-131`)."""
        return dict(X=fit_scaling(X), Y=fit_scaling(Y))

    def regularization_loss(self, params):
        return self.mlp.regularization_loss(params)

    def apply(self, params, scaling, x, noise=None, temperature=1.0,
              train=False):
        """x -> output distribution (un-whitened when scaling is given)."""
        if scaling is not None:
            x = whiten(x, scaling['X'])
        mlp_noise = noise.get('mlp') if noise is not None else None
        raw = self.mlp.apply(params, x, mlp_noise, train)
        dist = self.get_dist(raw, temperature)
        if scaling is not None:
            dist = dist_ops.AffineTril(dist, scaling['Y']['mean'],
                                       scaling['Y']['L'])
        return dist


@dataclasses.dataclass(frozen=True)
class GaussianDN(ConditionalDensityModel):
    """Full-covariance Gaussian density network (`:196-222`).

    4D params per output dim: mean + (u, v, d) with
    ``scale_tril = tril(u v^T, -1) + diag(exp(clip(d, -10, 10)))``.
    """

    @staticmethod
    def n_params(D):
        return 4 * D

    def get_dist(self, params, temperature):
        D = params.shape[-1] // 4
        mu = params[..., :D]
        uvd = params[..., D:].reshape(params.shape[:-1] + (3, D))
        u, v, d = uvd[..., 0, :], uvd[..., 1, :], uvd[..., 2, :]
        outer = u[..., :, None] * v[..., None, :]
        tril = jnp.tril(outer, -1)
        diag = jnp.exp(jnp.clip(d, -10.0, 10.0))
        scale_tril = temperature * (
            tril + diag[..., None] * np.eye(D, dtype=params.dtype))
        return dist_ops.MultivariateNormalTril(mu, scale_tril)


@dataclasses.dataclass(frozen=True)
class GaussianMDN(ConditionalDensityModel):
    """Full-covariance Gaussian mixture density network (`:270-305`)."""
    n_components: int = 5

    @staticmethod
    def n_params(D, n_components=5):
        return (4 * D + 1) * n_components

    def get_dist(self, params, temperature):
        nc = self.n_components
        D = (params.shape[-1] // nc - 1) // 4
        shp = params.shape[:-1]
        mu = params[..., :D * nc].reshape(shp + (nc, D))
        uvd = params[..., D * nc:4 * D * nc].reshape(shp + (3, nc, D))
        u, v, d = uvd[..., 0, :, :], uvd[..., 1, :, :], uvd[..., 2, :, :]
        outer = u[..., :, None] * v[..., None, :]
        tril = jnp.tril(outer, -1)
        diag = jnp.exp(jnp.clip(d, -10.0, 10.0))
        scale_tril = temperature * (
            tril + diag[..., None] * np.eye(D, dtype=params.dtype))
        logit_pi = params[..., 4 * D * nc:].reshape(shp + (nc,)) / temperature
        mix = dist_ops.Categorical(logit_pi)
        comp = dist_ops.MultivariateNormalTril(mu, scale_tril)
        return dist_ops.MixtureSameFamily(mix, comp, temperature)


@dataclasses.dataclass(frozen=True)
class SoftmaxDN(ConditionalDensityModel):
    """(One-hot) categorical head for discrete outputs (`:308-322`)."""
    one_hot: bool = True

    @staticmethod
    def n_params(D):
        return D

    def get_dist(self, params, temperature):
        logits = params / temperature
        return (dist_ops.OneHotCategorical(logits) if self.one_hot
                else dist_ops.Categorical(logits))

    def apply(self, params, scaling, x, noise=None, temperature=1.0,
              train=False):
        # categorical outputs are never rescaled (`:314-316`)
        if scaling is not None:
            x = whiten(x, scaling['X'])
        mlp_noise = noise.get('mlp') if noise is not None else None
        raw = self.mlp.apply(params, x, mlp_noise, train)
        return self.get_dist(raw, temperature)


@dataclasses.dataclass(frozen=True)
class RelaxedSoftmaxDN(SoftmaxDN):
    """Gumbel-softmax head with reparameterized samples (`:325-335`)."""

    def get_dist(self, params, temperature):
        return dist_ops.RelaxedOneHotCategorical(0.1, params / temperature)


def density_network_mlp(inputs, outputs, density_model=GaussianDN,
                        hids=(200, 200), dropout=0.1, input_dropout=None,
                        activation='relu', **head_kwargs):
    """Build a CDropout-MLP density network (`:338-360`)."""
    n_params = density_model.n_params(outputs)
    spec = MLPSpec(inputs, n_params, tuple(hids),
                   dropout=cdropout(dropout) if dropout else None,
                   input_dropout=(cdropout(input_dropout)
                                  if input_dropout else None),
                   nonlin=activation)
    return density_model(mlp=spec, **head_kwargs)


def mixture_density_network_mlp(inputs, outputs, nc=5,
                                density_model=GaussianMDN, hids=(200, 200),
                                dropout=0.1, input_dropout=None,
                                activation='relu'):
    """Build a CDropout-MLP mixture density network (`:363-386`)."""
    n_params = density_model.n_params(outputs, nc)
    spec = MLPSpec(inputs, n_params, tuple(hids),
                   dropout=cdropout(dropout) if dropout else None,
                   input_dropout=(cdropout(input_dropout)
                                  if input_dropout else None),
                   nonlin=activation)
    return density_model(mlp=spec, n_components=nc)
