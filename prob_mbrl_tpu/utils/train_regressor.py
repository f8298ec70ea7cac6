"""Dynamics-model / regressor training: one jitted scan over all SGD steps.

TPU-first redesign of `prob_mbrl/utils/train_regressor.py:58-165`. The
reference runs a Python minibatch loop (2000 host-dispatched steps per
episode); here the entire fit — minibatch sampling, dropout-mask resampling,
loss, backward, optimizer update — compiles to a single ``lax.scan``, so one
device launch trains the model.

Loss matches `train_regressor.py:130-133`:
  ``-E[log p(y|x)] + reg_weight * regularization / N``
computed on the pre-whitened dataset (inputs/targets normalized once up
front, `train_regressor.py:74-75`), with fresh dropout noise every step
(``resample=True`` default).

Minibatches are drawn with replacement via ``jax.random.randint``; the
reference shuffles epochs without replacement — statistically equivalent for
SGD at these sizes and shape-static under jit.
"""
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def make_train_fn(reg, optimizer, batchsize=100, reg_weight=1.0,
                  train_dropout=True):
    """Build a jitted ``train(params, opt_state, X, Y, key, iters)`` closure.

    Args:
      reg: a ``models.Regressor`` (or ``DynamicsModel.regressor``) spec.
      optimizer: an optax GradientTransformation.
      batchsize: minibatch size M.
      reg_weight: regularization weight.
      train_dropout: pass train=True so concrete-dropout rates learn.

    Returns:
      ``train(params, opt_state, Xn, Yn, key, iters)`` ->
      (params, opt_state, metrics) where Xn/Yn are pre-normalized and
      metrics holds per-step ``loss`` and ``E_lml`` arrays. ``iters`` is
      static.
    """
    density = reg.output_density

    def loss_fn(params, x, y, noise, N):
        outs = reg.apply(params, None, x, noise, normalize=False,
                         train=train_dropout)
        if density is not None:
            log_probs = density.log_prob(y, *outs)
        else:
            log_probs = -jnp.sum((outs - y) ** 2, -1)
        Enlml = -jnp.mean(log_probs)
        reg_loss = reg.regularization_loss(params)
        loss = Enlml + reg_weight * reg_loss / N
        return loss, Enlml

    @partial(jax.jit, static_argnames=('iters',))
    def train(params, opt_state, Xn, Yn, key, iters):
        N = Xn.shape[0]

        def step(carry, k):
            params, opt_state = carry
            k_idx, k_noise = jax.random.split(k)
            idx = jax.random.randint(k_idx, (batchsize,), 0, N)
            x, y = Xn[idx], Yn[idx]
            noise = reg.sample_noise(k_noise, (batchsize,))
            (loss, Enlml), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, x, y, noise, N)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), {'loss': loss, 'E_lml': -Enlml}

        keys = jax.random.split(key, iters)
        (params, opt_state), metrics = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, metrics

    return train


def normalize_dataset(stats, X, Y):
    """Pre-whiten a dataset with regressor stats (`train_regressor.py:74-75`)."""
    Xn = (X - stats['mx']) * stats['iSx']
    Yn = (Y - stats['my']) * stats['iSy']
    return Xn, Yn


def train_regressor(reg, params, stats, X, Y, key, iters=2000, batchsize=100,
                    optimizer=None, opt_state=None, reg_weight=1.0,
                    angle_dims=()):
    """Convenience wrapper: whiten, build the train fn, run it.

    Returns (params, opt_state, metrics).
    """
    from ..ops.angles import to_complex
    if angle_dims:
        X = to_complex(X, angle_dims)
    if optimizer is None:
        optimizer = optax.adam(1e-4)
    if opt_state is None:
        opt_state = optimizer.init(params)
    Xn, Yn = normalize_dataset(stats, X, Y)
    train = make_train_fn(reg, optimizer, batchsize, reg_weight)
    return train(params, opt_state, Xn, Yn, key, iters)
