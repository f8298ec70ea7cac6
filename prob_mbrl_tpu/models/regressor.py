"""Regressor / Policy / DynamicsModel wrappers.

TPU-first redesign of `prob_mbrl/models/core.py:121-303`. The reference stores
dataset normalization statistics and the dataset itself as module buffers;
here the *spec* (architecture) is a static frozen dataclass, learnable
parameters are one pytree, and normalization statistics are a second pytree
(``stats``) computed from data with ``fit_stats``. Dropout masks / density
noise travel in an explicit noise pytree (see ``models.dropout``).

The reference's broken ``ModelEnsemble`` (`core.py:102-118`, multiprocessing
misuse) is intentionally not replicated: dropout-mask sampling IS the ensemble
mechanism here (a per-particle mask = one model sample), and a vmapped
explicit-ensemble variant lives in ``models.ensembles``.
"""
import dataclasses
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.angles import to_complex
from .mlp import MLPSpec


def fit_stats(X, Y):
    """Normalization stats from a dataset (`core.py:142-149`).

    Sx/Sy are 4x the empirical std (so +-4 sigma maps to roughly unit range),
    with zero-variance dims clamped to scale 4.0.
    """
    def scale(V):
        # unbiased std (ddof=1), matching torch.std (`core.py:143,147`)
        ddof = 1 if V.shape[0] > 1 else 0
        s = 4.0 * jnp.std(V, 0, keepdims=True, ddof=ddof)
        return jnp.where(s == 0, 4.0, s)

    mx = jnp.mean(X, 0, keepdims=True)
    Sx = scale(X)
    my = jnp.mean(Y, 0, keepdims=True)
    Sy = scale(Y)
    return {'mx': mx, 'Sx': Sx, 'iSx': 1.0 / Sx,
            'my': my, 'Sy': Sy, 'iSy': 1.0 / Sy}


def init_stats(input_dims, output_dims, dtype=jnp.float32):
    """Identity normalization (before any dataset is seen)."""
    z = jnp.zeros((1, input_dims), dtype)
    o = jnp.ones((1, input_dims), dtype)
    zy = jnp.zeros((1, output_dims), dtype)
    oy = jnp.ones((1, output_dims), dtype)
    return {'mx': z, 'Sx': o, 'iSx': o, 'my': zy, 'Sy': oy, 'iSy': oy}


@dataclasses.dataclass(frozen=True)
class Regressor:
    """MLP + density head with input/output whitening (`core.py:121-187`)."""
    mlp: MLPSpec
    output_density: Optional[Any] = None
    angle_dims: Tuple[int, ...] = ()

    def init(self, key, dtype=jnp.float32):
        return {'mlp': self.mlp.init(key, dtype)}

    def init_stats(self, dtype=jnp.float32):
        out_dims = (self.output_density.output_dims
                    if self.output_density is not None
                    else self.mlp.output_dims)
        return init_stats(self.mlp.input_dims, out_dims, dtype)

    def fit_stats(self, X, Y):
        if self.angle_dims:
            X = to_complex(X, self.angle_dims)
        return fit_stats(X, Y)

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        km, kd = jax.random.split(key)
        noise = {'mlp': self.mlp.sample_noise(km, batch_shape, dtype)}
        if self.output_density is not None:
            noise['density'] = self.output_density.sample_noise(
                kd, batch_shape, dtype)
        return noise

    def apply(self, params, stats, x, noise=None, normalize=True,
              return_samples=False, train=False, **density_kwargs):
        if self.angle_dims:
            x = to_complex(x, self.angle_dims)
        if normalize and stats is not None:
            x = (x - stats['mx']) * stats['iSx']
        mlp_noise = noise.get('mlp') if noise is not None else None
        outs = self.mlp.apply(params['mlp'], x, mlp_noise, train)
        if self.output_density is not None:
            scaling_params = ((stats['my'], stats['Sy'])
                              if normalize and stats is not None else None)
            dnoise = noise.get('density') if noise is not None else None
            outs = self.output_density.apply(
                outs, dnoise, scaling_params=scaling_params,
                return_samples=return_samples, **density_kwargs)
        elif stats is not None:
            outs = outs * stats['Sy'] + stats['my']
        return outs

    def regularization_loss(self, params):
        return self.mlp.regularization_loss(params['mlp'])


@dataclasses.dataclass(frozen=True)
class Policy:
    """Stochastic policy: MLP -> density sample -> tanh squash (`core.py:190-248`).

    ``u = scale * tanh(sample) + bias`` with (scale, bias) from action bounds.
    """
    mlp: MLPSpec
    output_density: Optional[Any] = None
    angle_dims: Tuple[int, ...] = ()
    max_u: Tuple[float, ...] = (1.0,)
    min_u: Optional[Tuple[float, ...]] = None

    @property
    def scale(self):
        max_u = jnp.asarray(self.max_u, jnp.float32)
        min_u = (-max_u if self.min_u is None
                 else jnp.asarray(self.min_u, jnp.float32))
        return 0.5 * (max_u - min_u)

    @property
    def bias(self):
        max_u = jnp.asarray(self.max_u, jnp.float32)
        min_u = (-max_u if self.min_u is None
                 else jnp.asarray(self.min_u, jnp.float32))
        return 0.5 * (max_u + min_u)

    def init(self, key, dtype=jnp.float32):
        return {'mlp': self.mlp.init(key, dtype)}

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        km, kd = jax.random.split(key)
        noise = {'mlp': self.mlp.sample_noise(km, batch_shape, dtype)}
        if self.output_density is not None:
            noise['density'] = self.output_density.sample_noise(
                kd, batch_shape, dtype)
        return noise

    def apply(self, params, x, noise=None, train=False, return_samples=True,
              **density_kwargs):
        if self.angle_dims:
            x = to_complex(x, self.angle_dims)
        mlp_noise = noise.get('mlp') if noise is not None else None
        u = self.mlp.apply(params['mlp'], x, mlp_noise, train)
        if self.output_density is not None:
            dnoise = noise.get('density') if noise is not None else None
            u = self.output_density.apply(u, dnoise,
                                          return_samples=return_samples,
                                          **density_kwargs)
            if not return_samples:
                # greedy evaluation: squashed MEAN action. The reference's
                # non-sample path adds sampled noise pre-squash
                # (`core.py:236-239`); sampled actions here go through
                # ``return_samples=True`` with an explicit noise pytree
                # instead, so this path is deliberately deterministic.
                mean, log_std = u[0], u[1]
                u = mean
        return self.scale * jnp.tanh(u) + self.bias

    def regularization_loss(self, params):
        return self.mlp.regularization_loss(params['mlp'])


@dataclasses.dataclass(frozen=True)
class DynamicsModel:
    """Learned dynamics: predicts state deltas (+ reward) (`core.py:251-303`).

    When ``reward_func`` is provided, the head predicts only state deltas and
    the analytic reward is applied to (prev + delta, action). Otherwise the
    last output dim is the learned reward.
    """
    regressor: Regressor
    reward_func: Optional[Callable] = None

    @property
    def state_dims(self):
        out = (self.regressor.output_density.output_dims
               if self.regressor.output_density is not None
               else self.regressor.mlp.output_dims)
        return out if self.reward_func is not None else out - 1

    def init(self, key, dtype=jnp.float32):
        return self.regressor.init(key, dtype)

    def init_stats(self, dtype=jnp.float32):
        return self.regressor.init_stats(dtype)

    def fit_stats(self, X, Y):
        """Stats from the supervised (state-action -> delta[+reward]) dataset.

        The reference additionally tracks the observed reward range in
        ``maxR``/``minR`` buffers (`models/core.py:254-263`) but never reads
        them anywhere — write-only state, deliberately not carried here.
        """
        return self.regressor.fit_stats(X, Y)

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        return self.regressor.sample_noise(key, batch_shape, dtype)

    def apply(self, params, stats, prev_states, actions, noise=None,
              normalize=True, return_samples=False, separate_outputs=False,
              deltas=True, train=False, with_rewards=True, **kwargs):
        inputs = jnp.concatenate([prev_states, actions], -1)
        outs = self.regressor.apply(params, stats, inputs, noise,
                                    normalize=normalize,
                                    return_samples=return_samples,
                                    train=train, **kwargs)
        if not return_samples:
            return outs

        if self.reward_func is not None:
            dstates = outs
            if not with_rewards:
                # caller computes the analytic reward itself (e.g. the
                # rollout engine hoists it out of the time scan and batches
                # it over the whole horizon)
                return dstates if deltas else prev_states + dstates
            rewards = self.reward_func(prev_states + dstates, actions)
        else:
            D = outs.shape[-1] - 1
            dstates, rewards = outs[..., :D], outs[..., D:]

        states = dstates if deltas else prev_states + dstates
        if separate_outputs:
            return states, rewards
        return jnp.concatenate([states, rewards], -1)

    def regularization_loss(self, params):
        return self.regressor.regularization_loss(params)
