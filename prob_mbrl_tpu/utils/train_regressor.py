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

Reference features redesigned jit-native:

* **decoupled regularization** (`train_regressor.py:86-91,139-144`): the
  data-fit gradient goes through the main optimizer and the regularizer
  gradient through a separate SGD step, both inside the same scan iteration
  (the reference keys a global ``decoupled_optimizers`` cache on the model;
  here the second optimizer state is just part of the carry).
* **prioritized sampling** (`train_regressor.py:93-127`): the reference keeps
  a host-side SumTree keyed on clipped per-sample log-likelihoods scaled by
  visit counts, with importance weights ``(N p)^-beta`` and beta annealed
  0.4 -> 1.0 at 1e-3/step after 100 uniform warmup iterations. Here the
  per-sample priorities, visit counts and beta live in device arrays carried
  through the scan; stratified tree retrieval becomes
  ``jax.random.categorical`` over log-priorities and the tree update becomes
  a scatter — same distribution, no host round-trips.
"""
from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


def init_priority_state(n, n_valid=None, dtype=jnp.float32):
    """Fresh per-sample priority state for ``prioritized_sampling``.

    ``n_valid`` masks out padding rows (priority 0 -> log-priority -inf ->
    never sampled by ``jax.random.categorical``).
    """
    p = jnp.ones((n,), dtype)
    if n_valid is not None:
        p = jnp.where(jnp.arange(n) < n_valid, p, 0.0)
    return {'p': p, 'counts': jnp.zeros((n,), dtype),
            'beta': jnp.asarray(0.4, dtype), 'step': jnp.asarray(0, jnp.int32)}


def make_train_fn(reg, optimizer, batchsize=100, reg_weight=1.0,
                  train_dropout=True, decoupled_reg=False, reg_optimizer=None,
                  prioritized_sampling=False, priority_eps=1e-3,
                  priority_alpha=0.6, priority_warmup=100, mesh=None,
                  batch_axis='particles'):
    """Build a jitted ``train(params, opt_state, X, Y, key, iters)`` closure.

    Args:
      reg: a ``models.Regressor`` (or ``DynamicsModel.regressor``) spec.
      optimizer: an optax GradientTransformation.
      batchsize: minibatch size M.
      reg_weight: regularization weight.
      train_dropout: pass train=True so concrete-dropout rates learn.
      decoupled_reg: take the regularizer gradient step with a separate
        optimizer (`train_regressor.py:86-91,139-144`).
      reg_optimizer: the decoupled optimizer (default ``optax.sgd(1e-4)``,
        mirroring the reference's SGD on the main optimizer's lr).
      prioritized_sampling: sample minibatches proportionally to per-sample
        priorities derived from clipped log-likelihoods and visit counts
        (`train_regressor.py:93-127`).
      priority_eps / priority_alpha / priority_warmup: prioritization
        hyperparameters (reference defaults).
      mesh: optional ``jax.sharding.Mesh``. When given, each sampled
        minibatch (inputs, targets, dropout noise, weights) is
        sharding-constrained along ``batch_axis`` so GSPMD data-parallelizes
        the fit: per-shard forward/backward, gradients combined by an
        automatic psum, params/opt-state replicated. The mesh size must
        divide ``batchsize``. The dataset itself stays replicated — the
        per-step gather of ``batchsize`` random rows is tiny next to the
        MLP flops, and a sharded dataset would turn every gather into an
        all-gather of the same bytes anyway.

    Returns:
      ``train(params, opt_state, Xn, Yn, key, iters, reg_opt_state=None,
      priority_state=None)`` -> (params, opt_state, metrics, aux) where
      Xn/Yn are pre-normalized, metrics holds per-step ``loss`` and ``E_lml``
      arrays, and aux carries the updated ``reg_opt_state`` /
      ``priority_state`` (None when the feature is off). ``iters`` is static.
    """
    density = reg.output_density
    if decoupled_reg and reg_optimizer is None:
        reg_optimizer = optax.sgd(1e-4)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec
        if batchsize % int(mesh.size):
            raise ValueError(
                f'make_train_fn: mesh size {int(mesh.size)} must divide '
                f'batchsize {batchsize} (each device takes an equal slice '
                'of every minibatch)')
        batch_sharding = NamedSharding(mesh, PartitionSpec(batch_axis))

        def constrain_batch(tree):
            return jax.tree_util.tree_map(
                lambda a: jax.lax.with_sharding_constraint(a, batch_sharding),
                tree)
    else:
        def constrain_batch(tree):
            return tree

    def log_prob_fn(params, x, y, noise):
        outs = reg.apply(params, None, x, noise, normalize=False,
                         train=train_dropout)
        if density is not None:
            return density.log_prob(y, *outs)
        return -jnp.sum((outs - y) ** 2, -1)

    def data_loss_fn(params, x, y, noise, weights, N):
        log_probs = log_prob_fn(params, x, y, noise)
        Enlml = -jnp.mean(log_probs * weights)
        if decoupled_reg:
            return Enlml, (Enlml, log_probs)
        reg_loss = reg.regularization_loss(params)
        loss = Enlml + reg_weight * reg_loss / N
        return loss, (Enlml, log_probs)

    def reg_loss_fn(params, N):
        return reg_weight * reg.regularization_loss(params) / N

    @partial(jax.jit, static_argnames=('iters',))
    def train(params, opt_state, Xn, Yn, key, iters, reg_opt_state=None,
              priority_state=None, n_valid=None):
        # Xn/Yn may be padded to a size bucket (see ``pad_to_bucket``);
        # ``n_valid`` is the true row count as a device scalar, so growing
        # datasets re-trace only when they cross a bucket boundary.
        N = Xn.shape[0]
        n = N if n_valid is None else n_valid
        if decoupled_reg and reg_opt_state is None:
            reg_opt_state = reg_optimizer.init(params)
        if prioritized_sampling and priority_state is None:
            priority_state = init_priority_state(N, n_valid)

        def step(carry, k):
            params, opt_state, reg_opt_state, prio = carry
            k_idx, k_noise = jax.random.split(k)

            if prioritized_sampling:
                warm = prio['step'] < priority_warmup
                idx_uniform = jax.random.randint(k_idx, (batchsize,), 0, n)
                idx_prio = jax.random.categorical(
                    k_idx, jnp.log(prio['p']), shape=(batchsize,))
                idx = jnp.where(warm, idx_uniform, idx_prio)
                # importance weights (N p)^-beta, max-normalized
                # (`experience_dataset.py:351-367`)
                p_sel = prio['p'][idx] / jnp.sum(prio['p'])
                w = (n * p_sel) ** (-prio['beta'])
                weights = jnp.where(warm, 1.0, w / jnp.max(w))
            else:
                idx = jax.random.randint(k_idx, (batchsize,), 0, n)
                weights = jnp.ones((batchsize,), Xn.dtype)

            x, y = constrain_batch((Xn[idx], Yn[idx]))
            weights = constrain_batch(weights)
            noise = constrain_batch(reg.sample_noise(k_noise, (batchsize,)))
            (loss, (Enlml, log_probs)), grads = jax.value_and_grad(
                data_loss_fn, has_aux=True)(params, x, y, noise, weights, n)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)

            if decoupled_reg:
                rgrads = jax.grad(reg_loss_fn)(params, n)
                rupdates, reg_opt_state = reg_optimizer.update(
                    rgrads, reg_opt_state, params)
                params = optax.apply_updates(params, rupdates)

            if prioritized_sampling:
                counts = prio['counts'].at[idx].add(1.0)
                # p0 = 1 + (a - clip(lp, -a, a)) / (2a), a=2
                # (`train_regressor.py:120-125`)
                a = 2.0
                p0 = 1.0 + (a - jnp.clip(jax.lax.stop_gradient(log_probs),
                                         -a, a)) / (2 * a)
                max_count = jnp.maximum(jnp.max(counts), 1.0)
                new_p = (p0 * max_count / jnp.maximum(counts[idx], 1.0)
                         + priority_eps) ** priority_alpha
                prio = {'p': prio['p'].at[idx].set(new_p),
                        'counts': counts,
                        'beta': jnp.minimum(1.0, prio['beta'] + 1e-3),
                        'step': prio['step'] + 1}

            return (params, opt_state, reg_opt_state, prio), {
                'loss': loss, 'E_lml': -Enlml}

        keys = jax.random.split(key, iters)
        (params, opt_state, reg_opt_state, priority_state), metrics = \
            jax.lax.scan(step, (params, opt_state, reg_opt_state,
                                priority_state), keys)
        aux = {'reg_opt_state': reg_opt_state,
               'priority_state': priority_state}
        return params, opt_state, metrics, aux

    return train


def normalize_dataset(stats, X, Y):
    """Pre-whiten a dataset with regressor stats (`train_regressor.py:74-75`)."""
    Xn = (X - stats['mx']) * stats['iSx']
    Yn = (Y - stats['my']) * stats['iSy']
    return Xn, Yn


def pad_to_bucket(X, Y, min_rows=64):
    """Zero-pad (X, Y) rows up to the next power-of-two bucket.

    Episodic datasets grow by ``control_H`` rows per episode; compiling the
    training scan per exact size would re-trace every episode. Padding to
    power-of-two buckets bounds recompiles to O(log N) over a whole run;
    the padding rows are never sampled (minibatch indices are drawn below
    ``n_valid``).

    Returns (Xp, Yp, n_valid) with ``n_valid`` a device int32 scalar.
    """
    n = X.shape[0]
    bucket = max(min_rows, 1 << (n - 1).bit_length())
    pad = bucket - n
    if pad:
        X = jnp.concatenate([X, jnp.zeros((pad,) + X.shape[1:], X.dtype)], 0)
        Y = jnp.concatenate([Y, jnp.zeros((pad,) + Y.shape[1:], Y.dtype)], 0)
    return X, Y, jnp.asarray(n, jnp.int32)


_TRAIN_FN_CACHE = {}
_TRAIN_FN_CACHE_MAX = 64


def _cached_train_fn(reg, optimizer, batchsize, reg_weight, decoupled_reg,
                     reg_optimizer, prioritized_sampling, priority_eps,
                     priority_alpha, mesh=None):
    key = (id(reg), id(optimizer), batchsize, reg_weight, decoupled_reg,
           id(reg_optimizer), prioritized_sampling, priority_eps,
           priority_alpha, id(mesh))
    hit = _TRAIN_FN_CACHE.get(key)
    if hit is not None and hit[0] is reg and hit[1] is optimizer \
            and hit[2] is reg_optimizer:
        return hit[3]
    fn = make_train_fn(reg, optimizer, batchsize, reg_weight,
                       decoupled_reg=decoupled_reg,
                       reg_optimizer=reg_optimizer,
                       prioritized_sampling=prioritized_sampling,
                       priority_eps=priority_eps,
                       priority_alpha=priority_alpha, mesh=mesh)
    if len(_TRAIN_FN_CACHE) >= _TRAIN_FN_CACHE_MAX:
        _TRAIN_FN_CACHE.pop(next(iter(_TRAIN_FN_CACHE)))
    _TRAIN_FN_CACHE[key] = (reg, optimizer, reg_optimizer, fn)
    return fn


def train_regressor(reg, params, stats, X, Y, key, iters=2000, batchsize=100,
                    optimizer=None, opt_state=None, reg_weight=1.0,
                    angle_dims=(), decoupled_reg=False, reg_optimizer=None,
                    prioritized_sampling=False, priority_eps=1e-3,
                    priority_alpha=0.6, return_aux=False, mesh=None):
    """Convenience wrapper: whiten, build the train fn, run it.

    Returns (params, opt_state, metrics), or (params, opt_state, metrics,
    aux) with ``return_aux=True`` (aux carries decoupled-optimizer and
    priority state for cross-call reuse).
    """
    from ..ops.angles import to_complex
    if angle_dims:
        X = to_complex(X, angle_dims)
    if optimizer is None:
        optimizer = optax.adam(1e-4)
    if opt_state is None:
        opt_state = optimizer.init(params)
    Xn, Yn = normalize_dataset(stats, X, Y)
    Xn, Yn, n_valid = pad_to_bucket(Xn, Yn)
    train = _cached_train_fn(reg, optimizer, batchsize, reg_weight,
                             decoupled_reg, reg_optimizer,
                             prioritized_sampling, priority_eps,
                             priority_alpha, mesh=mesh)
    params, opt_state, metrics, aux = train(params, opt_state, Xn, Yn, key,
                                            iters, n_valid=n_valid)
    if return_aux:
        return params, opt_state, metrics, aux
    return params, opt_state, metrics
