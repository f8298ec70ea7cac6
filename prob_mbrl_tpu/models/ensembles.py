"""Explicit model ensembles as vmapped parameter stacks.

The reference's ``ModelEnsemble`` (`prob_mbrl/models/core.py:102-118`) is
broken (a ``multiprocessing.Pool.map`` call with no iterable), and its
bootstrap-mask machinery (`core.py:150-152`) never registers the masks; the
de-facto ensembling mechanism in the reference is dropout-mask sampling. This
module provides the *working* TPU-native version of the intent: K
independently-initialized copies of a spec evaluated as ONE batched XLA
program by vmapping over a stacked parameter pytree. On a device mesh the
member axis can be sharded like any other batch axis.
"""
import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ModelEnsemble:
    """K independent copies of a Regressor-like spec (`core.py:102-118`).

    ``params`` for the ensemble is the member pytree with a leading [K] axis
    on every leaf. ``apply`` broadcasts shared inputs to all members or maps
    member-sliced inputs, entirely inside one program.
    """
    spec: Any
    n_members: int

    def init(self, key, dtype=jnp.float32):
        keys = jax.random.split(key, self.n_members)
        return jax.vmap(lambda k: self.spec.init(k, dtype))(keys)

    def init_stats(self, *args, **kwargs):
        # normalization stats are shared across members (same dataset)
        return self.spec.init_stats(*args, **kwargs)

    def fit_stats(self, X, Y):
        return self.spec.fit_stats(X, Y)

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        keys = jax.random.split(key, self.n_members)
        return jax.vmap(
            lambda k: self.spec.sample_noise(k, batch_shape, dtype))(keys)

    def apply(self, params, stats, x, noise=None, member_inputs=False,
              **kwargs):
        """Evaluate all members.

        Args:
          params: stacked member params (leading [K] axis per leaf).
          stats: shared normalization stats (or None).
          x: [..., D] shared inputs (broadcast to every member), or
            [K, ..., D] per-member inputs with ``member_inputs=True``.
          noise: stacked noise pytree from :meth:`sample_noise` (or None).

        Returns:
          outputs with a leading [K] member axis (pytree-structured like the
          underlying spec's output).
        """
        def one(p, n, xi):
            return self.spec.apply(p, stats, xi, n, **kwargs)

        in_axes = (0, 0 if noise is not None else None,
                   0 if member_inputs else None)
        return jax.vmap(one, in_axes=in_axes)(params, noise, x)

    def regularization_loss(self, params):
        return jnp.sum(jax.vmap(self.spec.regularization_loss)(params))


def bootstrap_masks(key, n_members, n_samples, p=0.5, dtype=jnp.float32):
    """Per-member bootstrap sample masks (the fixed version of the
    reference's phantom ``self.masks``, `core.py:150-152`): [K, N] Bernoulli
    keep-masks so each member fits a random subset of the dataset."""
    return jax.random.bernoulli(
        key, p, (n_members, n_samples)).astype(dtype)


def make_ensemble_train_fn(ensemble, optimizer, batchsize=100,
                           reg_weight=1.0, train_dropout=True):
    """Jitted bootstrap-ensemble trainer: all members train in one scan.

    Each scan step draws one shared minibatch, evaluates every member on it
    (vmap), masks each member's per-sample log-likelihoods with its bootstrap
    mask, and applies one optimizer update to the stacked params. Loss per
    member matches `train_regressor.py:130-133`.

    Returns ``train(params, opt_state, Xn, Yn, masks, key, iters)`` ->
    (params, opt_state, metrics) with per-step mean-over-members ``loss`` /
    ``E_lml``; ``masks`` is [K, N] from :func:`bootstrap_masks`.
    """
    import optax
    spec = ensemble.spec
    density = spec.output_density

    def member_loss(p, x, y, n, w, N):
        outs = spec.apply(p, None, x, n, normalize=False, train=train_dropout)
        if density is not None:
            lp = density.log_prob(y, *outs)
        else:
            lp = -jnp.sum((outs - y) ** 2, -1)
        Enlml = -jnp.sum(lp * w) / jnp.maximum(jnp.sum(w), 1.0)
        return Enlml + reg_weight * spec.regularization_loss(p) / N, Enlml

    def loss_fn(params, x, y, noise, w, N):
        losses, Enlmls = jax.vmap(
            lambda p, n, wk: member_loss(p, x, y, n, wk, N),
        )(params, noise, w)
        return jnp.sum(losses), jnp.mean(Enlmls)

    from functools import partial

    @partial(jax.jit, static_argnames=('iters',))
    def train(params, opt_state, Xn, Yn, masks, key, iters):
        N = Xn.shape[0]

        def step(carry, k):
            params, opt_state = carry
            k_idx, k_noise = jax.random.split(k)
            idx = jax.random.randint(k_idx, (batchsize,), 0, N)
            x, y = Xn[idx], Yn[idx]
            w = masks[:, idx]                                  # [K, M]
            noise = ensemble.sample_noise(k_noise, (batchsize,))
            (loss, Enlml), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params, x, y, noise, w, N)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), {'loss': loss, 'E_lml': -Enlml}

        keys = jax.random.split(key, iters)
        (params, opt_state), metrics = jax.lax.scan(
            step, (params, opt_state), keys)
        return params, opt_state, metrics

    return train


@dataclasses.dataclass(frozen=True)
class RandomPriorMLP:
    """Randomized prior functions (Osband et al. 2018).

    TPU-native version of ``NetWithRandomPrior`` from the reference notebook
    `notebooks/BNN_regression_example.ipynb` (cell 2): the trainable network's
    output is summed with the output of a fixed, independently-initialized
    prior copy, with no gradient flowing through the prior. Uncertainty away
    from the data then reverts to the prior ensemble's spread instead of
    collapsing.

    Drop-in for ``MLPSpec`` wherever a Regressor/density network expects one
    (same init/sample_noise/apply/regularization_loss contract), so
    ``Regressor(mlp=RandomPriorMLP(mlp_spec), ...)`` just works. The prior is
    always added — which is also the notebook's *actual* behavior: its
    ``if self.train`` gate tests nn.Module's bound ``train`` method (always
    truthy), so the notebook never disables the prior either.

    The prior's parameters live in the params pytree (so they checkpoint and
    replicate like everything else) but are wrapped in ``stop_gradient``, so
    gradients never reach them. Caveat: optimizers whose update is not purely
    gradient-driven — decoupled weight decay (``optax.adamw``, or
    ``optim.radam``/``optim.sdlbfgs`` with ``weight_decay > 0``) — would
    still shrink the prior toward zero; mask them off the ``'prior'``
    subtree (e.g. ``optax.masked``) when using such optimizers.
    """
    mlp: Any
    prior_scale: float = 1.0

    @property
    def input_dims(self):
        return self.mlp.input_dims

    @property
    def output_dims(self):
        return self.mlp.output_dims

    def init(self, key, dtype=jnp.float32):
        km, kp = jax.random.split(key)
        return {'model': self.mlp.init(km, dtype),
                'prior': self.mlp.init(kp, dtype)}

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        km, kp = jax.random.split(key)
        return {'model': self.mlp.sample_noise(km, batch_shape, dtype),
                'prior': self.mlp.sample_noise(kp, batch_shape, dtype)}

    def apply(self, params, x, noise=None, train=False):
        # index (not .get): a mismatched noise pytree (e.g. plain MLPSpec
        # noise with 'drop_*' keys) must fail loudly instead of silently
        # disabling dropout
        nm = noise['model'] if noise is not None else None
        npr = noise['prior'] if noise is not None else None
        y = self.mlp.apply(params['model'], x, nm, train)
        prior = self.mlp.apply(params['prior'], x, npr, train)
        return y + self.prior_scale * jax.lax.stop_gradient(prior)

    def regularization_loss(self, params):
        # only the trainable copy is regularized; the prior is fixed
        return self.mlp.regularization_loss(params['model'])
