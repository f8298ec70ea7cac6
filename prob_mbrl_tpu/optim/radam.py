"""Rectified Adam (Liu et al. 2019) as an optax GradientTransformation.

Behavioral equivalent of `prob_mbrl/thirdparty/radam.py:6-91`: Adam moments
with SMA-based variance rectification — when the approximated SMA length is
below 5 the step falls back to un-adapted (momentum-only) SGD, matching the
reference's conservative branch (`radam.py:67-75,82-88`). The branch is a
``jnp.where`` on traced scalars, so the whole update stays jittable.
"""
import jax
import jax.numpy as jnp
import optax


def radam(learning_rate=1e-3, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0):
    def init_fn(params):
        return dict(
            step=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params))

    def update_fn(grads, state, params=None):
        step = state['step'] + 1
        t = step.astype(jnp.float32)
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1 - b1) * g, state['mu'], grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1 - b2) * g * g, state['nu'], grads)

        beta2_t = b2 ** t
        n_sma_max = 2.0 / (1 - b2) - 1
        n_sma = n_sma_max - 2 * t * beta2_t / (1 - beta2_t)

        rect = jnp.sqrt((1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                        * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2))
        bias1 = 1 - b1 ** t
        step_adapt = learning_rate * rect / bias1
        step_plain = learning_rate / bias1
        adapted = n_sma >= 5

        def upd(m, v, p):
            u_adapt = -step_adapt * m / (jnp.sqrt(v) + eps)
            u_plain = -step_plain * m
            u = jnp.where(adapted, u_adapt, u_plain)
            if weight_decay and params is not None:
                u = u - weight_decay * learning_rate * p
            return u

        if params is None:
            params = jax.tree_util.tree_map(jnp.zeros_like, mu)
        updates = jax.tree_util.tree_map(upd, mu, nu, params)
        return updates, dict(step=step, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
