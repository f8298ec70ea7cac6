"""Numerics helpers: soft clipping, compiled-safe Cholesky with jitter escalation.

The reference handles Cholesky failures with Python ``try/except RuntimeError``
(`prob_mbrl/utils/rollout.py:154-157`). That pattern does not exist under XLA:
a failed factorization just produces NaNs. ``safe_cholesky`` instead escalates
a diagonal jitter a fixed number of times and selects the first finite result —
fully jittable, branch-free on the host.
"""
import jax
import jax.numpy as jnp
import numpy as np

# NOTE on constants: every static (shape-derived) constant below is built
# with numpy, not jnp. A `jnp.arange`/`jnp.eye` on static inputs executes
# EAGERLY on the default accelerator even while tracing, and its value is
# fetched back device->host when the jaxpr is lowered. On a remote-attached
# TPU each such line costs two network round-trips per trace — hundreds of
# ms — and these helpers sit inside doubly-nested scans that trace in every
# training jit. numpy constants embed directly into the lowered module.


def softplus_upper_clip(x, upper):
    """Softly clip ``x`` from above at ``upper``.

    Matches the reference log-std clipping
    (`prob_mbrl/models/densities.py:97-98`):
    ``-softplus(-x + upper) + upper``; identity for x << upper, saturates at upper.
    """
    return -jax.nn.softplus(-x + upper) + upper


def small_cholesky(S):
    """Unrolled right-looking Cholesky for small D, batched over leading dims.

    ``jnp.linalg.cholesky`` lowers to a blocked factorization kernel that is
    enormously over-provisioned for the DxD particle-covariance matrices of
    the MM hot loop (D = a state dim, 1-16). This unrolls the outer-product
    (submatrix-downdate) form: per column one sqrt, one divide, one masked
    rank-1 update — all [D]- or [D,D]-shaped elementwise ops that XLA fuses
    into the surrounding rollout step. (Round 3: this replaced a
    Cholesky-Banachiewicz unrolling whose per-column stack/einsum chain was
    ~50% of ALL device time at the headline benchmark per the committed
    profile — the gather-heavy loop fusions it lowered to cost ~20us of the
    ~38us busy time per rollout step.) Differentiable through the plain jnp
    ops; NaN on non-PD inputs (sqrt of negative), matching the failure
    semantics `safe_cholesky` relies on.
    """
    D = S.shape[-1]
    if D == 1:
        return jnp.sqrt(S)
    A = S
    cols = []
    for j in range(D):
        # mask keeps only rows >= j: the column below (and incl.) the pivot
        mask = (np.arange(D) >= j).astype(S.dtype)
        pivot = jnp.sqrt(A[..., j, j])
        col = (A[..., :, j] / pivot[..., None]) * mask
        cols.append(col)
        if j + 1 < D:
            A = A - col[..., :, None] * col[..., None, :]
    return jnp.stack(cols, -1)


def safe_cholesky(S, initial_jitter=1e-12, max_tries=8, factor=100.0):
    """Cholesky with escalating diagonal jitter, jit-compatible AND
    differentiable at rank-deficient inputs.

    Computes cholesky(S + jitter*I) with jitter scaled *relative to the
    matrix* (mean diagonal), growing by ``factor`` until the factorization is
    well-conditioned. An attempt counts as ok only when it is finite and its
    smallest diagonal pivot is bounded away from zero — a merely-finite factor
    of a singular matrix has (near-)zero pivots whose cholesky backward pass
    divides by them, producing NaN gradients (the empirical covariance of M
    particles in D>=M dims is always rank-deficient, so this path is hot, not
    exceptional). All ``max_tries`` factorizations are evaluated (tiny DxD ops
    — D is a state dim, not a model width) and the first ok one is selected by
    a gather — no data-dependent control flow, so XLA fuses the batch.

    Args:
      S: [..., D, D] symmetric PSD-ish matrices.
      initial_jitter: starting *relative* diagonal jitter.
      max_tries: number of escalations.
      factor: jitter multiplier per escalation.

    Returns:
      [..., D, D] lower-triangular factors. If every attempt fails, returns
      the last attempt (NaNs propagate, surfacing the error to the caller).
    """
    D = S.shape[-1]
    eye = np.eye(D, dtype=S.dtype)
    # scale-free jitter: relative to the mean diagonal magnitude
    diag = jnp.diagonal(S, axis1=-2, axis2=-1)
    scale = jnp.mean(jnp.abs(diag), -1, keepdims=True)[..., None] + 1e-30
    scale = jax.lax.stop_gradient(scale)

    # Jitter selection runs entirely under stop_gradient: differentiating
    # through failed attempts would inject NaNs even with zero cotangents
    # (0/0 in the cholesky backward of a singular factor). Only the final,
    # well-conditioned factorization is differentiated.
    S_ng = jax.lax.stop_gradient(S)
    jitters = (initial_jitter
               * (factor ** np.arange(max_tries))).astype(S.dtype)

    chol = small_cholesky if D <= 16 else jnp.linalg.cholesky
    tol = 1e-5 * jnp.sqrt(jnp.max(scale))

    # All attempts in one batched factorization: [tries, ..., D, D]. The
    # batch rides the leading dim of elementwise/reduce ops, so this costs
    # barely more than ONE factorization graph — a round-3 experiment that
    # hid the escalation behind lax.cond measured SLOWER (1.25M vs 1.60M
    # particle-steps/s at the headline config): a conditional inside the
    # MC-PILCO scan body breaks fusion and adds sync overhead that exceeds
    # the entire escalation cost. Keep the branch-free select.
    jit_b = jitters.reshape((max_tries,) + (1,) * S.ndim)
    Ls = chol(S_ng + (jit_b * scale) * eye)
    diags = jnp.diagonal(Ls, axis1=-2, axis2=-1)
    finite = jnp.isfinite(Ls).all(axis=tuple(range(1, Ls.ndim)))
    # pivots bounded away from zero => bounded backward pass
    conditioned = (diags > tol).all(axis=tuple(range(1, diags.ndim)))
    ok = finite & conditioned
    first_ok = jnp.argmax(ok)
    idx = jnp.where(ok.any(), first_ok, max_tries - 1)
    return chol(S + (jnp.take(jitters, idx) * scale) * eye)


def clip_grad_norm(grads, max_norm, eps=1e-6):
    """Global-norm gradient clipping over a pytree (torch `clip_grad_norm_` semantics)."""
    leaves = jax.tree_util.tree_leaves(grads)
    total = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + eps))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)
