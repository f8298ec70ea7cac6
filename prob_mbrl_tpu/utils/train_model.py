"""Trainer for conditional density models (v2 API).

Jitted equivalent of the reference's DataLoader loop
(`prob_mbrl/utils/core.py:229-275`): minibatch SGD on
``-E[dist.log_prob(y)] + reg/N`` with fresh dropout noise per step. The whole
optimization is a ``lax.scan`` over steps — one device launch per call
instead of a Python loop with per-batch host sync.
"""
import jax
import jax.numpy as jnp
import optax


def make_train_model_fn(model, optimizer, batchsize=100, reg_weight=1.0,
                        temperature=1.0, train_dropout=True):
    """Build ``train(params, opt_state, scaling, X, Y, key, iters)``.

    ``model`` is a ``ConditionalDensityModel``; scaling is its whitening
    pytree (or None). Returns (params, opt_state, metrics) with per-step
    ``loss`` / ``E_lml`` arrays; ``iters`` is static.
    """

    def loss_fn(params, scaling, x, y, noise, N):
        dist = model.apply(params, scaling, x, noise,
                           temperature=temperature, train=train_dropout)
        E_lml = jnp.mean(dist.log_prob(y))
        reg = model.regularization_loss(params)
        return -E_lml + reg_weight * reg / N, E_lml

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    from functools import partial

    @partial(jax.jit, static_argnames=('iters',))
    def train(params, opt_state, scaling, X, Y, key, iters):
        N = X.shape[0]

        def step(carry, step_key):
            params, opt_state = carry
            kb, kn = jax.random.split(step_key)
            idx = jax.random.randint(kb, (batchsize,), 0, N)
            x, y = X[idx], Y[idx]
            noise = model.sample_noise(kn, (batchsize,))
            (loss, E_lml), grads = grad_fn(params, scaling, x, y, noise, N)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), {'loss': loss, 'E_lml': E_lml}

        keys = jax.random.split(key, iters)
        (params, opt_state), metrics = jax.lax.scan(step, (params, opt_state),
                                                    keys)
        return params, opt_state, metrics

    return train


def train_model(model, params, scaling, X, Y, key, iters=2000, batchsize=100,
                optimizer=None, opt_state=None, reg_weight=1.0):
    """Convenience wrapper (`utils/core.py:229`): build + run the trainer."""
    if optimizer is None:
        optimizer = optax.adam(1e-4)
    if opt_state is None:
        opt_state = optimizer.init(params)
    train = make_train_model_fn(model, optimizer, batchsize, reg_weight)
    params, opt_state, metrics = train(params, opt_state, scaling,
                                       jnp.asarray(X), jnp.asarray(Y), key,
                                       iters)
    return params, opt_state, metrics
