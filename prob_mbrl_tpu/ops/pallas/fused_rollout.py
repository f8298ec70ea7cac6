"""Single-kernel fused MC-PILCO rollout + loss (forward AND backward).

Why: the headline policy-optimization iteration lowers to ~1600 leaf HLO ops
on TPU (results/profile_headline trace: 322k leaf ops / 200 iters, median op
0.107 us) — at B=100 particles the device spends essentially ALL its time on
per-op overhead, not FLOPs (0.75% MFU). XLA cannot fuse across the matmul
boundaries of the 15-step rollout, so the fix is a Pallas mega-kernel: the
ENTIRE horizon (policy MLP -> dynamics MLP -> density resample -> reward ->
moment-matching chain, all T steps) runs in ONE kernel invocation from VMEM,
and the backward pass is a SECOND single kernel that recomputes the forward
and applies reverse-mode AD *inside* the kernel (``jax.vjp`` of the same jnp
step code, traced into the kernel body — no residual traffic through HBM).

Reuse strategy: the kernel body calls the real building blocks
(``Policy.apply``, ``DynamicsModel.apply``, the reward closure) so semantics
stay pinned to the XLA path; ``jax.closure_convert`` extracts every captured
constant (numpy masks, action-bound scales, ...) into explicit kernel inputs.
Only the moment-matching resample is re-expressed here in mask-and-reduce
form (`_mm_resample_kf` / `_safe_cholesky_kf`): the slice/argmax/take
patterns of `ops.math.safe_cholesky` have autodiff adjoints Mosaic cannot
lower ("Offset change" on offset-vector reductions), while one-hot
mask-multiply-reduce formulations lower cleanly in both directions. Parity
with the reference kernels is asserted in tests/test_fused_rollout.py.

Semantics matched (see `utils/rollout.py:130-311`, reference
`prob_mbrl/utils/rollout.py:93-153`): PEGASUS pinned noise, rewards evaluated
on PRE-state-MM next states, per-step cyclically-rolled standardized MM
noise, discounted mean-return loss (`algorithms/mc_pilco.py` loss_fn).
Supported configuration (gated by :func:`supports`): cholesky-MM or no-MM,
known analytic reward, ungrouped, PEGASUS, no CVaR/value/priorities/mesh.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------------------
# Kernel-friendly moment matching (mask-and-reduce formulations)
# ---------------------------------------------------------------------------

def _eye(D, dtype):
    r = jax.lax.broadcasted_iota(jnp.int32, (D, D), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    return (r == c).astype(dtype)


def _outer(a, b):
    """[D, 1] x [D, 1] -> [D, D] outer product without a transpose op
    (dot_general contracting the singleton dims — Mosaic-friendly)."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _small_cholesky_kf(A, eye):
    """Unrolled outer-product Cholesky, one-hot mask formulation.

    Identical math to ``ops.math.small_cholesky`` but column extraction /
    placement via mask-multiply-reduce instead of slicing + stack, and every
    intermediate kept >= 2-D ([D, 1] columns, [1, 1] pivots): Mosaic rejects
    1-D vector relayouts ("non-singleton logical dimension is replicated")
    and the slice/stack adjoints ("Offset change" reductions).
    """
    D = A.shape[-1]
    c = jax.lax.broadcasted_iota(jnp.int32, (D, D), 1)
    rowpos = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
    L = jnp.zeros_like(A)
    for j in range(D):
        colmask = (c == j).astype(A.dtype)                  # [D, D], col j
        pivot = jnp.sum(A * eye * colmask, keepdims=True)   # [1, 1] = A[j,j]
        piv = jnp.sqrt(pivot)
        colv = jnp.sum(A * colmask, -1, keepdims=True)      # [D, 1] = A[:,j]
        col = (colv / piv) * (rowpos >= j).astype(A.dtype)  # [D, 1]
        L = L + col * colmask
        if j + 1 < D:
            A = A - _outer(col, col)
    return L


def _packed_try_consts(D, max_tries, jitters):
    """Numpy constants for the 2-D packed jitter escalation ([G*D, D] rows).

    Mosaic rejects 3-D both-minor-dim reductions and mis-lowers batched
    dot_general, so the G attempts stack VERTICALLY as G blocks of D rows.
    Per-block broadcast/transpose become matmuls against these constants
    (hoisted into kernel operands by the make_jaxpr consts machinery):
      P [GD, GD]  block-indicator (broadcast a per-block row to its block)
      C [GD, D]   global column -> local column collapse (l -> l mod D)
      CT [D, GD]  its transpose (extract the selected block by matmul)
      eye_t       tiled identity, jit_r [GD, 1] per-block jitter rows
    """
    G = max_tries
    GD = G * D
    blk = np.repeat(np.arange(G), D)
    P = (blk[:, None] == blk[None, :]).astype(np.float32)
    C = (np.arange(GD)[:, None] % D == np.arange(D)[None, :]).astype(
        np.float32)
    eye_t = np.tile(np.eye(D, dtype=np.float32), (G, 1))
    jit_r = np.asarray(jitters, np.float32).repeat(D)[:, None]
    return P, C, C.T.copy(), eye_t, jit_r


def _safe_cholesky_kf(S, initial_jitter=1e-12, max_tries=8, factor=100.0):
    """`ops.math.safe_cholesky` semantics with a Mosaic-friendly layout.

    The original's ``argmax(ok)`` + ``jnp.take`` jitter select has no Mosaic
    lowering, and its [tries, D, D] batched escalation hits Mosaic 3-D
    layout crashes — so the ``max_tries`` attempts factor as ONE 2-D packed
    [tries*D, D] cholesky (blocks of D rows, per-block scalars broadcast by
    constant block-indicator matmuls), and the first-ok jitter select
    becomes a min-reduce (jitters are increasing, so the FIRST ok jitter is
    the SMALLEST ok jitter; no-ok falls back to the last, exactly like
    ``idx = max_tries - 1``).

    Unlike ops.safe_cholesky (which refactorizes at the selected jitter),
    the packed graph here is DIFFERENTIABLE (built from S, not
    stop_gradient(S)) and the selected block's factor is extracted by one
    constant matmul — no second factorization, forward or backward. The
    selection mask itself is stop_gradient; the clamps that keep FAILED
    blocks finite are inactive on any ok block (its pivots exceed tol), so
    the extracted factor and its gradient are bit-identical to a fresh
    ``small_cholesky(S + sel*scale*I)``. If every attempt fails, the
    result is poisoned with NaN to surface the failure like the original.
    """
    D = S.shape[-1]
    G = max_tries
    jitters = [float(initial_jitter * factor ** i) for i in range(G)]
    eye = _eye(D, S.dtype)
    diag = jnp.sum(S * eye, -1, keepdims=True)              # [D, 1]
    scale = jax.lax.stop_gradient(
        jnp.mean(jnp.abs(diag), keepdims=True) + 1e-30)     # [1, 1]
    tol = 1e-5 * jnp.sqrt(scale)

    P, C, CT, eye_t, jit_r = _packed_try_consts(D, G, jitters)
    P = jnp.asarray(P)
    C = jnp.asarray(C)
    CT = jnp.asarray(CT)
    eye_t = jnp.asarray(eye_t)
    jit_r = jnp.asarray(jit_r)

    A = jnp.tile(S, (G, 1)) + (jit_r * scale) * eye_t       # [GD, D]
    c = jax.lax.broadcasted_iota(jnp.int32, (G * D, D), 1)
    r_loc = jax.lax.broadcasted_iota(jnp.int32, (G * D, 1), 0) % D
    # Failure is tracked at the PIVOT level (pivot^2 <= tol^2 — the same
    # `diags > tol` criterion as ops.safe_cholesky) and the arithmetic is
    # clamped to stay finite: a NaN anywhere would poison EVERY block
    # through the cross-block P/C matmuls (NaN * 0 == NaN).
    tol_sq = tol * tol
    bad = jnp.zeros((G * D, 1), S.dtype)
    L = jnp.zeros_like(A)
    for j in range(D):
        colmask = (c == j).astype(A.dtype)                  # [GD, D]
        # per-block pivot A[j, j], broadcast to the block's rows via P
        piv_at = jnp.sum(A * eye_t * colmask, -1, keepdims=True)
        piv_sq = jnp.dot(P, piv_at, preferred_element_type=jnp.float32)
        bad = bad + (piv_sq <= tol_sq).astype(S.dtype)
        piv = jnp.sqrt(jnp.maximum(piv_sq, 1e-30))
        colv = jnp.sum(A * colmask, -1, keepdims=True)      # [GD, 1]
        col = jnp.clip(colv / piv, -1e18, 1e18) \
            * (r_loc >= j).astype(A.dtype)
        L = L + col * colmask
        if j + 1 < D:
            # block-diagonal outer product: full outer, cross-block masked,
            # global columns collapsed back to local via C
            O = jax.lax.dot_general(col, col, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            A = A - jnp.dot(O * P, C, preferred_element_type=jnp.float32)
    bad_blk = jnp.dot(P, bad, preferred_element_type=jnp.float32)
    BIG = jnp.asarray(3e38, S.dtype)
    cand = jnp.where(bad_blk > 0, BIG, jit_r)               # [GD, 1]
    sel_raw = jnp.min(cand, 0, keepdims=True)               # [1, 1]
    all_bad = (sel_raw >= BIG).astype(S.dtype)              # [1, 1]
    sel = jax.lax.stop_gradient(jnp.where(sel_raw >= BIG, jitters[-1],
                                          sel_raw))
    # extract the selected block: rows where jit_r == sel and the block is
    # ok (exact float equality — sel IS a copy of one jit_r entry)
    w = jax.lax.stop_gradient(
        ((jit_r == sel) & (bad_blk == 0)).astype(S.dtype))  # [GD, 1]
    L_sel = jnp.dot(CT, L * w, preferred_element_type=jnp.float32)
    # no attempt ok: surface the failure as NaN like the original (where,
    # not multiply — 0 * nan == nan)
    return jnp.where(all_bad > 0, jnp.asarray(np.nan, S.dtype), L_sel)


def _mm_resample_kf(x, z_std):
    """`ops.moment_matching.mm_resample` (ungrouped, pre-standardized z).

    m + z @ L^T via dot_general contracting on L's LAST axis — no transpose
    op (Mosaic transposes of tiny tiles are avoidable here).
    """
    B = x.shape[0]
    m = jnp.mean(x, 0, keepdims=True)
    d = x - m
    S = jax.lax.dot_general(d, d, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / (B - 1)
    L = _safe_cholesky_kf(S)
    z = jax.lax.stop_gradient(z_std)
    return m + jax.lax.dot_general(z, L, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# The fused loss implementation (plain jnp — shared by kernel + parity tests)
# ---------------------------------------------------------------------------

def make_loss_impl(dyn, pol, steps, w_t, mm_states, mm_rewards, maximize):
    """Build ``impl(pol_params, x0, dyn_params, dyn_stats, dyn_noise,
    pol_noise, z_mm_t, z_rr_t, action_eps) -> (loss, mean_return)``.

    ``z_mm_t`` / ``z_rr_t`` are the per-step standardized+cyclically-rolled
    noise stacks ([T, B, D] / [T, B, 1]) the caller prepares once per
    iteration (same hoisting as `utils/rollout.py:213-221`). ``w_t`` is the
    numpy discount-weight vector from ``discount_weights``.
    """
    w_list = [float(w) for w in np.asarray(w_t)]

    def impl(pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
             z_mm_t, z_rr_t, action_eps):
        states = x0
        B = x0.shape[0]
        # accumulators stay [B, 1]: Mosaic rejects 1-D vector layouts
        disc = jnp.zeros((B, 1), x0.dtype)
        raw = jnp.zeros((B, 1), x0.dtype)
        for t in range(steps):
            acts = pol.apply(pol_params, states, pol_noise,
                             return_samples=True)
            if action_eps is not None:
                acts = acts + action_eps[t]
            nxt = dyn.apply(dyn_params, dyn_stats, states, acts, dyn_noise,
                            return_samples=True, separate_outputs=True,
                            deltas=False, with_rewards=False)
            # rewards on the PRE-state-MM next states (`rollout.py:229-230`)
            r = dyn.reward_func(nxt, acts)
            if mm_states:
                nxt = _mm_resample_kf(nxt, z_mm_t[t])
            if mm_rewards:
                r = _mm_resample_kf(r, z_rr_t[t])
            disc = disc + w_list[t] * r
            raw = raw + r
            states = nxt
        loss = jnp.mean(disc)
        if maximize:
            loss = -loss
        return loss, jnp.mean(raw)

    return impl


# ---------------------------------------------------------------------------
# Pallas wrapping: one fwd kernel, one bwd kernel (vjp traced in-kernel)
# ---------------------------------------------------------------------------

def _pad2(x):
    """Mosaic wants >=2-D operands; pad leading singleton dims."""
    return x.reshape((1,) * max(0, 2 - x.ndim) + x.shape)


def make_fused_loss(dyn, pol, steps, w_t, mm_states, mm_rewards, maximize,
                    interpret=False):
    """Build the pallas-fused (loss, mean_return) function with custom VJP.

    Returns ``fused(pol_params, x0, dyn_params, dyn_stats, dyn_noise,
    pol_noise, z_mm_t, z_rr_t, action_eps)``; differentiable w.r.t.
    ``pol_params`` and ``action_eps`` only (all other cotangents are zeros —
    exactly the arguments `algorithms/mc_pilco.py`'s loss differentiates).
    """
    impl = make_loss_impl(dyn, pol, steps, w_t, mm_states, mm_rewards,
                          maximize)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def _closed(args):
        """Trace impl to a jaxpr; its consts become explicit kernel inputs.

        ``jax.closure_convert`` leaves some closed-over arrays inline (the
        analytic-reward constants re-materialize at kernel-trace time), so
        hoist ALL constvars explicitly: trace once with make_jaxpr, ship
        ``jaxpr.consts`` as kernel operands, and re-bind the primitives
        inside the kernel with ``eval_jaxpr`` — guaranteed capture-free.
        """
        flat, in_tree = jax.tree_util.tree_flatten(args)
        shapes = [a.shape for a in flat]

        def impl_flat(*leaves):
            leaves = [lv.reshape(s) for lv, s in zip(leaves, shapes)]
            return impl(*jax.tree_util.tree_unflatten(in_tree, leaves))

        padded = [_pad2(a) for a in flat]
        closed_jaxpr = jax.make_jaxpr(impl_flat)(*padded)
        consts = [jnp.asarray(c) for c in closed_jaxpr.consts]
        const_shapes = [c.shape for c in consts]
        n_args = len(padded)

        def closed(*vals_and_consts):
            # operands arrive 2-D-padded (Mosaic constraint); restore the
            # consts' traced shapes before re-binding the jaxpr
            vals = vals_and_consts[:n_args]
            cvals = [c.reshape(s) for c, s in
                     zip(vals_and_consts[n_args:], const_shapes)]
            out = jax.core.eval_jaxpr(closed_jaxpr.jaxpr, cvals, *vals)
            return tuple(out)

        return closed, padded, consts

    def _fwd_pallas(args):
        closed, padded, consts = _closed(args)
        n_in = len(padded)

        def fwd_kernel(*refs):
            in_refs = refs[:n_in + len(consts)]
            loss_ref, mret_ref = refs[n_in + len(consts):]
            vals = [r[:] for r in in_refs]
            loss, mret = closed(*vals)
            loss_ref[0, 0] = loss
            mret_ref[0, 0] = mret

        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        loss, mret = pl.pallas_call(
            fwd_kernel,
            out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32)),
            in_specs=[vmem] * (n_in + len(consts)),
            out_specs=(smem, smem),
            compiler_params=cparams,
            interpret=interpret,
        )(*padded, *[_pad2(c) for c in consts])
        return loss[0, 0], mret[0, 0]

    def _bwd_pallas(args, g_loss):
        closed, padded, consts = _closed(args)
        n_in = len(padded)
        # grads w.r.t. pol_params leaves + action_eps (the trailing arg)
        pol_flat, _ = jax.tree_util.tree_flatten(args[0])
        n_pol = len(pol_flat)
        eps_idx = n_in - 1  # action_eps is the last flattened leaf block
        diff_idx = list(range(n_pol)) + [eps_idx]

        def bwd_kernel(*refs):
            in_refs = refs[:n_in + len(consts)]
            g_ref = refs[n_in + len(consts)]
            out_refs = refs[n_in + len(consts) + 1:]
            vals = [r[:] for r in in_refs]

            def loss_of(diff_vals):
                v = list(vals)
                for k, i in enumerate(diff_idx):
                    v[i] = diff_vals[k]
                return closed(*v)[0]

            _, vjp = jax.vjp(loss_of, [vals[i] for i in diff_idx])
            grads, = vjp(g_ref[0, 0])
            for r, g in zip(out_refs, grads):
                r[:] = g

        cparams = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
        outs = pl.pallas_call(
            bwd_kernel,
            out_shape=tuple(jax.ShapeDtypeStruct(padded[i].shape,
                                                 padded[i].dtype)
                            for i in diff_idx),
            in_specs=[vmem] * (n_in + len(consts)) + [smem],
            out_specs=tuple([vmem] * len(diff_idx)),
            compiler_params=cparams,
            interpret=interpret,
        )(*padded, *[_pad2(c) for c in consts],
          g_loss.reshape(1, 1).astype(jnp.float32))
        return outs

    @jax.custom_vjp
    def fused(pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
              z_mm_t, z_rr_t, action_eps):
        return _fwd_pallas((pol_params, x0, dyn_params, dyn_stats,
                            dyn_noise, pol_noise, z_mm_t, z_rr_t,
                            action_eps))

    def fused_fwd(*args):
        return _fwd_pallas(args), args

    def fused_bwd(args, g):
        g_loss = g[0]
        outs = _bwd_pallas(args, g_loss)
        pol_flat, pol_tree = jax.tree_util.tree_flatten(args[0])
        n_pol = len(pol_flat)
        gpol = jax.tree_util.tree_unflatten(
            pol_tree, [o.reshape(p.shape)
                       for o, p in zip(outs[:n_pol], pol_flat)])
        g_eps = outs[n_pol].reshape(args[8].shape)
        zeros = tuple(jax.tree_util.tree_map(jnp.zeros_like, a)
                      for a in args[1:8])
        return (gpol,) + zeros + (g_eps,)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def make_fused_value_and_grad(dyn, pol, steps, w_t, mm_states, mm_rewards,
                              maximize, interpret=False):
    """ONE kernel per optimizer iteration: (loss, mean_return, pol grads).

    ``jax.value_and_grad`` over the custom-vjp pair runs TWO kernels (a
    forward for the primal, a backward that recomputes the forward anyway —
    55 + 143 us at the headline config). This variant traces the vjp inside
    a single kernel and writes the primal outputs alongside the gradients,
    deleting the separate forward launch. Returns
    ``f(pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
    z_mm_t, z_rr_t, action_eps) -> (loss, mean_return, grads_pytree)``.
    Not differentiable (the optimizer consumes the grads directly).
    """
    impl = make_loss_impl(dyn, pol, steps, w_t, mm_states, mm_rewards,
                          maximize)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def fused_vg(*args):
        flat, in_tree = jax.tree_util.tree_flatten(args)
        shapes = [a.shape for a in flat]

        def impl_flat(*leaves):
            leaves = [lv.reshape(s) for lv, s in zip(leaves, shapes)]
            return impl(*jax.tree_util.tree_unflatten(in_tree, leaves))

        padded = [_pad2(a) for a in flat]
        closed_jaxpr = jax.make_jaxpr(impl_flat)(*padded)
        consts = [jnp.asarray(c) for c in closed_jaxpr.consts]
        const_shapes = [c.shape for c in consts]
        n_in = len(padded)
        pol_flat, pol_tree = jax.tree_util.tree_flatten(args[0])
        n_pol = len(pol_flat)

        def kernel(*refs):
            in_refs = refs[:n_in + len(consts)]
            loss_ref, mret_ref = refs[n_in + len(consts):
                                      n_in + len(consts) + 2]
            out_refs = refs[n_in + len(consts) + 2:]
            vals = [r[:] for r in in_refs]
            cvals = [c.reshape(s) for c, s in
                     zip(vals[n_in:], const_shapes)]

            def outs_of(pol_vals):
                v = list(vals[:n_in])
                for k in range(n_pol):
                    v[k] = pol_vals[k]
                out = jax.core.eval_jaxpr(closed_jaxpr.jaxpr, cvals, *v)
                return tuple(out)

            (loss, mret), vjp = jax.vjp(outs_of, vals[:n_pol])
            grads, = vjp((jnp.ones((), jnp.float32),
                          jnp.zeros((), jnp.float32)))
            loss_ref[0, 0] = loss
            mret_ref[0, 0] = mret
            for r, g in zip(out_refs, grads):
                r[:] = g

        outs = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32))
            + tuple(jax.ShapeDtypeStruct(p.shape, p.dtype)
                    for p in padded[:n_pol]),
            in_specs=[vmem] * (n_in + len(consts)),
            out_specs=(smem, smem) + tuple([vmem] * n_pol),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(*padded, *[_pad2(c) for c in consts])
        loss, mret = outs[0][0, 0], outs[1][0, 0]
        grads = jax.tree_util.tree_unflatten(
            pol_tree, [o.reshape(p.shape)
                       for o, p in zip(outs[2:], pol_flat)])
        return loss, mret, grads

    return fused_vg


def prepare_mm_noise(z, steps, B):
    """Standardize + cyclically pre-roll fixed MM noise to [T, B, zD].

    Mirrors `utils/rollout.py:213-221` (ungrouped cholesky path): the
    standardization commutes with the roll, so it runs once per noise epoch.
    """
    from ..moment_matching import standardize_noise
    z = standardize_noise(z)
    tb = (np.arange(steps)[:, None] + np.arange(B)[None, :]) % B
    return z[tb]


def supports(cfg, dyn, pol, value_update, mesh):
    """True when the fused kernel covers this MC-PILCO configuration."""
    # VMEM ceiling: the backward kernel holds its linearization residuals
    # on-chip (no HBM spill) — measured ~11 KB of VMEM per particle-step
    # at [200, 200] widths (B=1000, T=15 demanded 167 MB vs the v5e's
    # 128 MB). Gate at ~68 MB (2x headroom); larger batches stay on the
    # XLA path, which is compute-bound there anyway (per-op overhead
    # amortizes over the big batch — the fused kernel's win is the
    # SMALL-batch latency regime).
    if cfg.n_particles * cfg.steps > 6144:
        return False
    return (cfg.mm_method == 'cholesky'
            and not cfg.infer_noise_variables
            and cfg.mm_groups is None
            and cfg.pegasus
            and cfg.cvar_eps == 0.0
            and cfg.reg_weight == 0.0
            and not cfg.with_priorities
            and value_update is None
            and mesh is None
            and dyn.reward_func is not None)
