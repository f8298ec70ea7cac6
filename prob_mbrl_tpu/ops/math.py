"""Numerics helpers: soft clipping, compiled-safe Cholesky with jitter escalation.

The reference handles Cholesky failures with Python ``try/except RuntimeError``
(`prob_mbrl/utils/rollout.py:154-157`). That pattern does not exist under XLA:
a failed factorization just produces NaNs. ``safe_cholesky`` instead escalates
a diagonal jitter a fixed number of times and selects the first finite result —
fully jittable, branch-free on the host.
"""
import jax
import jax.numpy as jnp


def softplus_upper_clip(x, upper):
    """Softly clip ``x`` from above at ``upper``.

    Matches the reference log-std clipping
    (`prob_mbrl/models/densities.py:97-98`):
    ``-softplus(-x + upper) + upper``; identity for x << upper, saturates at upper.
    """
    return -jax.nn.softplus(-x + upper) + upper


def safe_cholesky(S, initial_jitter=1e-12, max_tries=8, factor=100.0):
    """Cholesky with escalating diagonal jitter, jit-compatible.

    Computes cholesky(S + jitter*I), growing jitter by ``factor`` until the
    factorization is finite. All ``max_tries`` factorizations are evaluated
    (they are tiny DxD ops in this framework; D is a state dim, not a model
    width) and the first finite one is selected with ``jnp.where`` — no
    data-dependent control flow, so XLA can fuse and parallelize.

    Args:
      S: [..., D, D] symmetric PSD-ish matrices.
      initial_jitter: starting diagonal jitter.
      max_tries: number of escalations.
      factor: jitter multiplier per escalation.

    Returns:
      [..., D, D] lower-triangular factors. If every attempt fails, returns the
      last attempt (NaNs propagate, surfacing the error to the caller).
    """
    D = S.shape[-1]
    eye = jnp.eye(D, dtype=S.dtype)

    def attempt(i):
        jitter = initial_jitter * (factor ** i)
        return jnp.linalg.cholesky(S + jitter * eye)

    Ls = jnp.stack([attempt(i) for i in range(max_tries)])
    ok = jnp.isfinite(Ls).all(axis=tuple(range(1, Ls.ndim)))
    # index of first finite attempt (or last attempt if none)
    first_ok = jnp.argmax(ok)
    idx = jnp.where(ok.any(), first_ok, max_tries - 1)
    return Ls[idx]


def clip_grad_norm(grads, max_norm, eps=1e-6):
    """Global-norm gradient clipping over a pytree (torch `clip_grad_norm_` semantics)."""
    leaves = jax.tree_util.tree_leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + eps))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)
