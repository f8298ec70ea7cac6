"""MC-dropout as pure functions over explicit noise state.

TPU-first redesign of the reference dropout layers
(`prob_mbrl/models/modules.py:14-171`). The reference caches mask buffers
inside mutable modules and resamples them on shape changes or explicit
``resample()`` calls; here the mask-generating randomness is an explicit pytree
(the *noise state*) threaded through every apply. PEGASUS ("fix the random
numbers for K optimizer steps") becomes: reuse the same noise pytree. Resample
becomes: draw a fresh one from a new key. Nothing is hidden from jit, so whole
training loops compile to single XLA programs.

Two flavors:
  * Bernoulli MC-dropout (``BDropout``, `modules.py:14-70`): fixed rate,
    inverted-dropout scaling (divide by keep prob), Gal & Ghahramani L2 weight
    regularizer.
  * Concrete dropout (``CDropout``, `modules.py:73-171`): learnable keep
    probability via ``logit_p``; forward uses hard Bernoulli samples with a
    straight-through sigmoid-relaxed (concrete) backward at temperature
    ``temp``; adds a dropout-entropy regularizer. NOTE: concrete dropout does
    NOT rescale by 1/p (matches the reference).

Noise state per layer:
  * bernoulli: ``{'u': uniform[batch, width]}`` — mask = (u < p).
  * concrete: ``{'u': uniform, 'u_hard': uniform}`` — ``u`` parameterizes the
    concrete relaxation; ``u_hard`` drives the hard Bernoulli sample. The
    reference draws the hard sample with an ad-hoc ``torch.bernoulli`` at every
    mask update; using a pinned uniform gives the same distribution while
    keeping the PEGASUS property that fixed noise => fixed mask.
"""
import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BernoulliDropoutSpec:
    """Config for Bernoulli MC-dropout (BDropout)."""
    rate: float = 0.5
    regularizer_scale: float = 1.0

    def init(self, width, dtype=jnp.float32):
        """No learnable params."""
        del width, dtype
        return {}

    def sample_noise(self, key, batch_shape, width, dtype=jnp.float32):
        return {'u': jax.random.uniform(key, tuple(batch_shape) + (width,),
                                        dtype=dtype)}

    def mask(self, params, noise, dtype=jnp.float32, train=False):
        """Multiplicative mask (inverted-dropout 1/p scaling folded in)."""
        del params, train
        p = 1.0 - self.rate
        return jax.lax.stop_gradient((noise['u'] < p).astype(dtype)) / p

    def apply(self, params, noise, x, train=False):
        return x * self.mask(params, noise, x.dtype, train)

    def regularizer(self, params, weights, biases=None):
        """0.5 * scale * (p * ||W||^2 + ||b||^2) (`modules.py:30-35`)."""
        del params
        p = 1.0 - self.rate
        # weights are stored (din, dout); the dropped units index din, so the
        # per-unit weight norm sums over the output axis (the reference stores
        # torch-layout (dout, din) and sums over axis 0 — same quantity).
        reg = 0.5 * self.regularizer_scale * jnp.sum(
            p * jnp.sum(weights ** 2, -1))
        if biases is not None:
            reg = reg + 0.5 * self.regularizer_scale * jnp.sum(biases ** 2)
        return reg


@dataclasses.dataclass(frozen=True)
class ConcreteDropoutSpec:
    """Config for concrete dropout (CDropout) with learnable rate.

    ``rate`` may be a scalar (shared initial rate) — the learned ``logit_p``
    parameter is always per-unit, matching the reference usage
    (`examples/deep_pilco_mm.py:130`: ``CDropout(rate * np.ones(hid))``).
    """
    rate: float = 0.5
    regularizer_scale: float = 1.0
    dropout_regularizer: float = 1.0
    temperature: float = 0.1

    def init(self, width, dtype=jnp.float32):
        p0 = 1.0 - self.rate
        logit_p = jnp.full((width,), jnp.log(p0 / (1.0 - p0)), dtype=dtype)
        return {'logit_p': logit_p}

    def sample_noise(self, key, batch_shape, width, dtype=jnp.float32):
        k1, k2 = jax.random.split(key)
        shape = tuple(batch_shape) + (width,)
        return {'u': jax.random.uniform(k1, shape, dtype=dtype),
                'u_hard': jax.random.uniform(k2, shape, dtype=dtype)}

    def mask(self, params, noise, dtype=jnp.float32, train=False):
        """Straight-through concrete mask (`modules.py:102-160`).

        train=True: gradient flows into logit_p through the relaxed probs.
        train=False: the mask is a constant (reference eval mode detach).
        """
        logit_p = params['logit_p']
        u = noise['u']
        concrete_p = logit_p + jnp.log((u + 1e-7) / (1.0 - (u - 1e-7)))
        probs = jax.nn.sigmoid(concrete_p / self.temperature)
        hard = (noise['u_hard'] < probs).astype(dtype)
        if train:
            return jax.lax.stop_gradient(hard - probs) + probs
        return jax.lax.stop_gradient(hard)

    def apply(self, params, noise, x, train=False):
        return x * self.mask(params, noise, x.dtype, train)

    def regularizer(self, params, weights, biases=None):
        """scale/2 * p ||W||^2 + dropout_reg * (p log p + (1-p)log(1-p)) (`modules.py:88-93`)."""
        p = jax.nn.sigmoid(params['logit_p'])
        # (din, dout) layout: per-dropped-unit norms reduce the output axis
        reg = 0.5 * self.regularizer_scale * (p * jnp.sum(weights ** 2, -1))
        reg = reg + self.dropout_regularizer * (
            p * jnp.log(p) + (1.0 - p) * jnp.log(1.0 - p))
        reg = jnp.sum(reg)
        if biases is not None:
            # bias regularizer inherited from BDropout (`modules.py:34-35`)
            reg = reg + 0.5 * self.regularizer_scale * jnp.sum(biases ** 2)
        return reg


DropoutSpec = Union[BernoulliDropoutSpec, ConcreteDropoutSpec]


def bdropout(rate=0.5, regularizer_scale=1.0):
    return BernoulliDropoutSpec(rate=rate, regularizer_scale=regularizer_scale)


def cdropout(rate=0.5, regularizer_scale=1.0, dropout_regularizer=1.0,
             temperature=0.1):
    return ConcreteDropoutSpec(rate=rate, regularizer_scale=regularizer_scale,
                               dropout_regularizer=dropout_regularizer,
                               temperature=temperature)
