"""Small training helpers (reference: `prob_mbrl/utils/core.py:155-197`)."""
import jax
import jax.numpy as jnp


def polyak_averaging(params, target_params, tau=0.005):
    """Soft target update: target <- tau * params + (1 - tau) * target
    (`utils/core.py:155-174`). Pure: returns the new target pytree."""
    return jax.tree_util.tree_map(
        lambda p, t: tau * p + (1.0 - tau) * t, params, target_params)


def sin_squashing_fn(x):
    """PILCO's smooth saturation: 0.125 * (9 sin x + sin 3x) in [-1, 1]
    (`utils/core.py:177-185`)."""
    return 0.125 * (9.0 * jnp.sin(x) + jnp.sin(3.0 * x))


def tile(x, n, axis=0):
    """Repeat-interleave x n times along ``axis`` (`utils/core.py:188-190`).

    [G, ...] -> [G * n, ...] with each row repeated n times contiguously, the
    layout mm_groups expects (group g occupies rows [g*n, (g+1)*n)).
    """
    return jnp.repeat(x, n, axis=axis)


def jacobian(f, x):
    """Jacobian of ``f`` at a single input (`utils/core.py:123-137`, which
    loops torch.autograd per output row; here one jacrev call)."""
    return jax.jacrev(f)(x)


def batch_jacobian(f, x):
    """Jacobian of ``f`` over a batch: [B, Din] -> [B, Dout, Din]
    (`utils/core.py:140-152`, reimagined with jax.jacrev + vmap)."""
    return jax.vmap(jax.jacrev(f))(x)
