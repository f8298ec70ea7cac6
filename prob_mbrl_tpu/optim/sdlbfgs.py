"""Stochastic damped L-BFGS (Wang et al. 2017) as an optax transformation.

Behavioral equivalent of `prob_mbrl/thirdparty/sdlbfgs.py:107-295` with
``max_iter=1`` per update (the natural optax granularity): damped curvature
pairs ``y_bar = theta*y + (1-theta)*gamma*s`` (`sdlbfgs.py:173-187`),
two-loop recursion over a fixed-size history (`:200-217`), direction
normalization and ``lr/sqrt(k)`` decay (`:229-238`). The Python-list history
becomes fixed-shape rolling buffers with a validity mask, so the whole
update jits and scans.
"""
import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree


def sdlbfgs(learning_rate=1.0, history_size=10, lr_decay=True,
            weight_decay=0.0, gamma=1.0, eps=1e-10):
    m = history_size

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        n = flat.shape[0]
        return dict(
            n_iter=jnp.zeros([], jnp.int32),
            prev_grad=jnp.zeros(n, flat.dtype),
            prev_d=jnp.zeros(n, flat.dtype),
            prev_t=jnp.zeros([], flat.dtype),
            S=jnp.zeros((m, n), flat.dtype),       # steps s_i (oldest first)
            Ybar=jnp.zeros((m, n), flat.dtype),    # damped grad diffs
            valid=jnp.zeros((m,), bool))

    def update_fn(grads, state, params=None):
        g, unravel = ravel_pytree(grads)
        n_iter = state['n_iter'] + 1

        # -- memory update (skipped on the first step, `:161-165`) ----------
        y = g - state['prev_grad']
        s = state['prev_d'] * state['prev_t']
        ys = jnp.dot(y, s)
        sHs = gamma * jnp.dot(s, s)
        theta = jnp.where(ys < 0.25 * sHs,
                          0.75 * sHs / (sHs - ys + eps), 1.0)
        y_bar = theta * y + (1 - theta) * gamma * s

        do_update = n_iter > 1
        S = jnp.where(do_update,
                      jnp.concatenate([state['S'][1:], s[None]]), state['S'])
        Ybar = jnp.where(do_update,
                         jnp.concatenate([state['Ybar'][1:], y_bar[None]]),
                         state['Ybar'])
        valid = jnp.where(
            do_update,
            jnp.concatenate([state['valid'][1:],
                             jnp.ones((1,), bool)]), state['valid'])

        # -- two-loop recursion (`:200-217`), masked over invalid slots -----
        vmask = valid.astype(g.dtype)
        ro = vmask / (jnp.einsum('ij,ij->i', Ybar, S) + eps)
        q = -g
        al = [None] * m
        for i in range(m - 1, -1, -1):  # newest -> oldest
            al[i] = vmask[i] * ro[i] * jnp.dot(S[i], q)
            q = q - al[i] * Ybar[i]
        r = q / gamma  # H_diag = 1/gamma (`:170-172`)
        for i in range(m):  # oldest -> newest
            be = vmask[i] * ro[i] * jnp.dot(Ybar[i], r)
            r = r + (al[i] - be) * S[i]
        d = jnp.where(do_update, r, -g)

        if weight_decay and params is not None:
            p_flat, _ = ravel_pytree(params)
            d = d + weight_decay * p_flat

        d = d / (jnp.linalg.norm(d) + eps)

        # -- step size (`:229-238`) ----------------------------------------
        if lr_decay:
            t = learning_rate / jnp.sqrt(n_iter.astype(g.dtype))
        else:
            t0 = jnp.minimum(1.0, 1.0 / (jnp.sum(jnp.abs(g)) + eps)) \
                * learning_rate
            t = jnp.where(n_iter == 1, t0, learning_rate)

        new_state = dict(n_iter=n_iter, prev_grad=g, prev_d=d, prev_t=t,
                         S=S, Ybar=Ybar, valid=valid)
        return unravel(t * d), new_state

    return optax.GradientTransformation(init_fn, update_fn)
