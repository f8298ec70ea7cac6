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

Round-5 widening: the kernel now covers the full algorithm surface of the
reference drivers — learned rewards (reward = one more density output,
`prob_mbrl/models/core.py:290-296`), the TD(H) critic refit + terminal value
bootstrap (`mc_pilco.py:137-140`, traced in-kernel including its optax
update), grouped moment matching (`rollout.py:125-145`, block-diagonal
packed cholesky), and multi-device meshes (``shard_map`` over the particle
axis with shard-local groups — see :func:`make_fused_sharded_value_and_grad`).

Reuse strategy: the kernel body calls the real building blocks
(``Policy.apply``, ``DynamicsModel.apply``, the reward closure, the critic
update core from ``algorithms.value``) so semantics stay pinned to the XLA
path; the jaxpr-consts machinery extracts every captured constant (numpy
masks, action-bound scales, ...) into explicit kernel inputs. Only the
moment-matching resample is re-expressed here in mask-and-reduce form
(`_mm_resample_kf` / `_safe_cholesky_kf` / the grouped variants): the
slice/argmax/take patterns of `ops.math.safe_cholesky` have autodiff
adjoints Mosaic cannot lower ("Offset change" on offset-vector reductions),
while one-hot mask-multiply-reduce formulations lower cleanly in both
directions. Parity with the reference kernels is asserted in
tests/test_fused_rollout.py.

Semantics matched (see `utils/rollout.py:130-311`, reference
`prob_mbrl/utils/rollout.py:93-153`): PEGASUS pinned noise, rewards evaluated
on PRE-state-MM next states, per-step cyclically-rolled standardized MM
noise (per-group standardized when grouped), discounted mean-return loss
(`algorithms/mc_pilco.py` loss_fn). Configurations outside the gate
(:func:`supports`) fall back to the XLA rollout path.
"""
import dataclasses
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


def _safe_cholesky_kf(S, initial_jitter=1e-12, max_tries=8, factor=100.0,
                      cache=None):
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

    key = ('packed', D, G, float(initial_jitter), float(factor))
    if cache is None or key not in cache:
        Pn, Cn, CTn, eye_tn, jit_rn = _packed_try_consts(D, G, jitters)
        consts = dict(P=jnp.asarray(Pn), C=jnp.asarray(Cn),
                      CT=jnp.asarray(CTn), eye_t=jnp.asarray(eye_tn),
                      jit_r=jnp.asarray(jit_rn))
        if cache is not None:
            cache[key] = consts
    else:
        consts = cache[key]
    P, C, CT, eye_t, jit_r = (consts['P'], consts['C'], consts['CT'],
                              consts['eye_t'], consts['jit_r'])

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


def _mm_resample_kf(x, z_std, cache=None):
    """`ops.moment_matching.mm_resample` (ungrouped, pre-standardized z).

    m + z @ L^T via dot_general contracting on L's LAST axis — no transpose
    op (Mosaic transposes of tiny tiles are avoidable here). ``cache``
    (optional) supplies pre-built escalation constants so re-traces under
    the in-kernel checkpoint reuse hoisted kernel operands instead of
    materializing new captured constants (pallas_call rejects those).
    """
    B = x.shape[0]
    m = jnp.mean(x, 0, keepdims=True)
    d = x - m
    S = jax.lax.dot_general(d, d, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32) / (B - 1)
    L = _safe_cholesky_kf(S, cache=cache)
    z = jax.lax.stop_gradient(z_std)
    return m + jax.lax.dot_general(z, L, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Grouped moment matching (`rollout.py:125-145`): block-diagonal packing
# ---------------------------------------------------------------------------

def _grouped_consts(B, D, G, cache):
    """Per-trace jnp constants for grouped MM (memoized so T rollout steps
    share ONE copy of each mask instead of embedding T duplicates as kernel
    operands)."""
    key = ('grouped', B, D, G)
    if key not in cache:
        Bg = B // G
        GD = G * D
        gi = np.repeat(np.arange(G), Bg)                     # particle->group
        blk = np.repeat(np.arange(G), D)                     # packed row->grp
        GI = (np.arange(G)[:, None] == gi[None, :]).astype(np.float32)
        IND = (blk[:, None] == gi[None, :]).astype(np.float32)   # [GD, B]
        cache[key] = dict(
            GI=jnp.asarray(GI),                              # [G, B]
            IND=jnp.asarray(IND),                            # [GD, B]
            Bm=jnp.asarray(IND.T.copy()),                    # [B, GD]
            TileD=jnp.asarray(np.tile(np.eye(D, dtype=np.float32),
                                      (G, 1))),              # [GD, D]
            C=jnp.asarray((np.arange(GD)[:, None] % D ==
                           np.arange(D)[None, :]).astype(np.float32)),
            P=jnp.asarray((blk[:, None] == blk[None, :]).astype(np.float32)),
        )
    return cache[key]


def _cholpackT_consts(D, G, max_tries, jitters, cache):
    """Constants for the LANE-MAJOR tries x groups packed escalation.

    All try-expanded values live as [D, N] / [1, N] with N = Tr*G*D on the
    LANE axis: a rows-packed [N, D] layout tiles to (N, 128) — 204 KB per
    transient at G=10 — and the escalation's per-column intermediates blew
    the 128 MB VMEM as Mosaic stack/spill slots (measured 126-149 MB).
    Lane-major tiles are (8, lanes): ~16 KB per value, ~13x smaller.
    """
    key = ('cholpackT', D, G, max_tries)
    if key not in cache:
        GD = G * D
        N = max_tries * GD
        NB = max_tries * G
        r = np.arange(N)
        blk = r // D                                     # packed row -> blk
        Pb = (blk[:, None] == np.arange(NB)[None, :]).astype(np.float32)
        Sel = np.zeros((max_tries, N, GD), np.float32)   # try-t extractor
        for t in range(max_tries):
            Sel[t, t * GD + np.arange(GD), np.arange(GD)] = 1.0
        SelC = np.zeros((D, N, NB), np.float32)          # col-c of own block
        for c in range(D):
            SelC[c, np.arange(NB) * D + c, np.arange(NB)] = 1.0
        q = np.arange(GD)
        Pbg = ((q // D)[:, None] ==
               np.arange(G)[None, :]).astype(np.float32)
        cache[key] = dict(
            Pb=jnp.asarray(Pb),                          # [N, NB]
            PbT=jnp.asarray(Pb.T.copy()),                # [NB, N]
            SelT=[jnp.asarray(Sel[t]) for t in range(max_tries)],  # [N, GD]
            TileTt=jnp.asarray(Sel.sum(0).T.copy()),     # [GD, N]
            SelSumT=jnp.asarray(Sel.sum(0)),             # [N, GD]
            SelCT=[jnp.asarray(SelC[c]) for c in range(D)],        # [N, NB]
            eyeTN=jnp.asarray((np.arange(N)[None, :] % D ==
                               np.arange(D)[:, None]).astype(np.float32)),
            eyeTG=jnp.asarray((q[None, :] % D ==
                               np.arange(D)[:, None]).astype(np.float32)),
            Pbg=jnp.asarray(Pbg),                        # [GD, G]
            PbgT=jnp.asarray(Pbg.T.copy()),              # [G, GD]
            jit_row=jnp.asarray(np.asarray(jitters, np.float32)
                                .repeat(GD)[None, :]),   # [1, N]
        )
    return cache[key]


def _safe_cholesky_grouped_t(St, n_groups, cache, initial_jitter=1e-12,
                             max_tries=8, factor=100.0):
    """Per-group ``safe_cholesky``, lane-major: St [D, G*D] -> Lt [D, G*D].

    ``St[j, g*D+i] = S_g[i, j]`` (the g-th group's covariance, transposed
    into the lane axis). ALL ``max_tries`` jitter attempts of ALL groups
    factor in ONE packed [D, Tr*G*D] block-cholesky; per-group first-ok
    selection = per-group min over the ok tries' jitters (jitters
    increase), extracted by constant selector matmuls. Selection masks are
    stop_gradient, the selected try's factor is differentiable w.r.t. St,
    and groups where every attempt fails are NaN-poisoned — exactly
    :func:`_safe_cholesky_kf`'s semantics, per group.
    """
    D = St.shape[0]
    G = n_groups
    GD = G * D
    jitters = [float(initial_jitter * factor ** i) for i in range(max_tries)]
    cs = _cholpackT_consts(D, G, max_tries, jitters, cache)
    dtype = St.dtype
    f32 = jnp.float32
    dot = lambda a, b: jnp.dot(a, b, preferred_element_type=f32)

    diag = jnp.sum(St * cs['eyeTG'], 0, keepdims=True)       # [1, GD]
    scale = jax.lax.stop_gradient(
        dot(dot(jnp.abs(diag), cs['Pbg']) / D, cs['PbgT']) + 1e-30)
    tol = 1e-5 * jnp.sqrt(scale)                             # [1, GD]
    tol_row = dot(tol, cs['TileTt'])                         # [1, N]
    tol_sq = tol_row * tol_row
    scale_row = dot(scale, cs['TileTt'])                     # [1, N]
    A = dot(St, cs['TileTt']) \
        + (cs['jit_row'] * scale_row) * cs['eyeTN']          # [D, N]
    N = A.shape[-1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1) % D
    row = jax.lax.broadcasted_iota(jnp.int32, (D, 1), 0)
    bad = jnp.zeros((1, N), dtype)
    L = jnp.zeros_like(A)
    for j in range(D):
        cm_j = (row == j).astype(dtype)                      # [D, 1]
        row_j = jnp.sum(A * cm_j, 0, keepdims=True)          # [1, N] = A[:,j]
        piv_at = row_j * (lane == j).astype(dtype)           # pivots only
        piv_sq = dot(dot(piv_at, cs['Pb']), cs['PbT'])       # block-bcast
        bad = bad + (piv_sq <= tol_sq).astype(dtype)
        piv = jnp.sqrt(jnp.maximum(piv_sq, 1e-30))
        col = jnp.clip(row_j / piv, -1e18, 1e18) \
            * (lane >= j).astype(dtype)                      # [1, N]
        L = L + cm_j * col
        if j + 1 < D:
            # Schur update, block-diagonal: A[c, r] -= col[b(r)*D+c]*col[r]
            colblock = jnp.zeros_like(A)
            for c in range(D):
                s_c = dot(dot(col, cs['SelCT'][c]), cs['PbT'])   # [1, N]
                colblock = colblock + (row == c).astype(dtype) * s_c
            A = A - colblock * col
    bad_blk = dot(dot(bad, cs['Pb']), cs['PbT'])             # [1, N]
    BIG = jnp.asarray(3e38, dtype)
    cand = jnp.where(bad_blk > 0, BIG, cs['jit_row'])        # [1, N]
    m = dot(cand, cs['SelT'][0])                             # [1, GD]
    for t in range(1, max_tries):
        m = jnp.minimum(m, dot(cand, cs['SelT'][t]))
    all_bad = m >= BIG                                       # [1, GD]
    sel_row = dot(m, cs['TileTt'])                           # [1, N]
    w = jax.lax.stop_gradient(
        ((cs['jit_row'] == sel_row) & (bad_blk == 0)).astype(dtype))
    L_sel = dot(L * w, cs['SelSumT'])                        # [D, GD]
    return jnp.where(all_bad, jnp.asarray(np.nan, dtype), L_sel)


def _safe_cholesky_grouped(S, n_groups, cache, **kw):
    """Rows-packed convenience wrapper ([G*D, D] -> [G*D, D]) over
    :func:`_safe_cholesky_grouped_t` (tests / non-kernel callers; the
    in-kernel resample path builds the lane-major St directly)."""
    Lt = _safe_cholesky_grouped_t(jnp.transpose(S), n_groups, cache, **kw)
    return jnp.transpose(Lt)


def _mm_resample_grouped_kf(x, z_std, n_groups, cache):
    """Grouped `mm_resample` (contiguous particle blocks), all-matmul form.

    Parity target: ``ops.moment_matching.grouped(mm_resample, x, z, G)``
    (`rollout.py:125-145`) with ``z_std`` already per-group standardized
    (see :func:`prepare_mm_noise`). Per-group means/covariances and the
    per-particle group gather are expressed as matmuls against constant
    indicator matrices — no 3-D arrays, no gathers (Mosaic constraints).
    """
    B, D = x.shape
    G = n_groups
    Bg = B // G
    cs = _grouped_consts(B, D, G, cache)
    GI, IND, Bm, TileD, C = (cs['GI'], cs['IND'], cs['Bm'], cs['TileD'],
                             cs['C'])
    m_g = jnp.dot(GI, x, preferred_element_type=jnp.float32) / Bg  # [G, D]
    # per-particle group mean: GI^T @ m_g (contract GI's group axis)
    mu = jax.lax.dot_general(GI, m_g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)   # [B, D]
    d = x - mu
    # packed per-group covariance, LANE-MAJOR ([D, G*D]; the escalation's
    # try-expanded transients lane-pad ~13x less in this layout — see
    # _cholpackT_consts): St[j, g*D+i] = sum_{b in g} d[b,i] d[b,j].
    # TileD @ d^T tiles d's transpose per group (dot_general, no transpose
    # op); IND masks to own-group particles.
    Dt = jax.lax.dot_general(TileD, d, (((1,), (1,)), ((), ())))   # [GD, B]
    St = jax.lax.dot_general(d, Dt * IND, (((0,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) \
        / (Bg - 1)                                                 # [D, GD]
    Lt = _safe_cholesky_grouped_t(St, G, cache)                    # [D, GD]
    z = jax.lax.stop_gradient(z_std)
    # y[b, :] = z[b] @ L_g(b)^T: compute against ALL groups ([B, GD]), mask
    # to the particle's own block, collapse global->local columns via C
    A = jnp.dot(z, Lt, preferred_element_type=jnp.float32)         # [B, GD]
    y = jnp.dot(A * Bm, C, preferred_element_type=jnp.float32)     # [B, D]
    return mu + y


def _inline_checkpoint(fn):
    """Manual gradient checkpointing that lowers inside Pallas kernels.

    ``jax.checkpoint``'s ``remat2`` primitive has no Mosaic lowering
    ("Unimplemented primitive in Pallas TPU lowering: remat2"), so remat
    inside the kernel body is expressed as a ``custom_vjp`` whose residuals
    are exactly the primal INPUTS and whose bwd rule re-binds the forward:
    after AD the jaxpr contains only plain ops (the recompute inlined next
    to its consumers), which Mosaic lowers — and the kernel's liveness
    window for the function's internals shrinks from
    forward-until-backward to just the recompute region.

    The function is traced to a jaxpr ONCE, at the outer (impl) trace, and
    everything it captures — closure tracers AND the constants its library
    calls materialize (action-bound scales, density clamps, MM indicator
    masks) — is promoted from jaxpr consts to EXPLICIT custom_vjp inputs.
    A naive ``bwd = lambda args, g: jax.vjp(fn, *args)(g)`` would instead
    re-run the Python at kernel-AD time and mint fresh array constants
    inside the kernel trace, which ``pallas_call`` rejects ("captures
    constants ... pass them as inputs").
    """
    def wrapper(*args):
        flat, in_tree = jax.tree_util.tree_flatten(args)

        def fn_flat(*leaves):
            return fn(*jax.tree_util.tree_unflatten(in_tree, leaves))

        closed, out_shape = jax.make_jaxpr(fn_flat,
                                           return_shape=True)(*flat)
        _, out_tree = jax.tree_util.tree_flatten(out_shape)
        consts = list(closed.consts)

        def call(consts, *leaves):
            return tuple(jax.core.eval_jaxpr(closed.jaxpr, consts,
                                             *leaves))

        @jax.custom_vjp
        def f(consts, *leaves):
            return call(consts, *leaves)

        def fwd(consts, *leaves):
            return call(consts, *leaves), (consts, leaves)

        def bwd(res, g):
            consts, leaves = res
            _, vjp = jax.vjp(call, consts, *leaves)
            return vjp(tuple(g))

        f.defvjp(fwd, bwd)
        out_flat = f(consts, *flat)
        return jax.tree_util.tree_unflatten(out_tree, list(out_flat))

    return wrapper


# ---------------------------------------------------------------------------
# The fused loss implementation (plain jnp — shared by kernel + parity tests)
# ---------------------------------------------------------------------------

def make_loss_impl(dyn, pol, steps, w_t, mm_states, mm_rewards, maximize,
                   mm_groups=None, value_update=None, w_H=None,
                   remat=False, mm_rewards_mean_only=False):
    """Build ``impl(pol_params, x0, dyn_params, dyn_stats, dyn_noise,
    pol_noise, z_mm_t, z_rr_t, action_eps, extras) -> (loss, mean_return,
    aux)``.

    ``z_mm_t`` / ``z_rr_t`` are the per-step standardized+cyclically-rolled
    noise stacks ([T, B, D] / [T, B, 1]) the caller prepares once per
    iteration (same hoisting as `utils/rollout.py:213-221`; per-GROUP
    standardized when ``mm_groups``). ``w_t`` is the numpy discount-weight
    vector from ``discount_weights``.

    Learned rewards (``dyn.reward_func is None``): the density head's last
    output dim is the reward (`prob_mbrl/models/core.py:290-296`).

    Value bootstrap (``value_update`` from ``make_value_update_fn`` with its
    ``.core`` attribute): the TD(H) critic refit runs IN-KERNEL on the
    (stop-gradient) trajectory — including its optax update and polyak
    target — and the freshly-updated critic evaluates the terminal
    bootstrap ``w_H * V(s_T)`` added to the discounted return, exactly the
    XLA path's ordering (`mc_pilco.py:120-140`,
    `deep_pilco_no_mm_with_value.py:380-400`). ``extras`` then carries
    ``(v_params, v_target, v_opt_state, v_stats, v_noise)`` and ``aux``
    returns ``(v_params', v_target', v_opt_state', v_loss)``; otherwise
    both are ``()``.
    """
    w_list = [float(w) for w in np.asarray(w_t)]
    learn_reward = dyn.reward_func is None
    # Reward-MM mean-only shortcut (same invariance as
    # utils.rollout._mm_rewards_batched): valid only when nothing observes
    # per-particle rewards — the in-kernel TD(H) critic refit does, so the
    # flag is force-cleared with value_update (defensive; mc_pilco's gate
    # already excludes it). Default OFF keeps every directly-constructed
    # kernel reference-exact (parity records stay bitwise stable).
    mm_rewards_mean_only = (mm_rewards_mean_only and mm_rewards
                            and value_update is None)
    if value_update is not None:
        v_wlist = [float(w) for w in np.asarray(value_update.w_t)]
        v_H = value_update.H
        V = value_update.spec

    def impl(pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
             z_mm_t, z_rr_t, action_eps, extras=()):
        states = x0
        B = x0.shape[0]
        sg = jax.lax.stop_gradient
        # Pre-populate ALL mask/indicator constants the MM kernels need and
        # thread the cache THROUGH the checkpoint boundaries as an explicit
        # pytree argument: _inline_checkpoint's bwd re-traces the function
        # inside the kernel trace, and any constant materialized there would
        # be a captured kernel constant, which pallas_call rejects ("You
        # should pass them as inputs"). As args, the constants flow through
        # the hoisted-consts machinery once and are reused by the re-trace.
        cache = {}
        if mm_states or mm_rewards:
            dims = ([x0.shape[-1]] if mm_states else []) \
                + ([1] if mm_rewards and not mm_rewards_mean_only else [])
            for d_ in dims:
                if mm_groups:
                    _grouped_consts(B, d_, mm_groups, cache)
                    jitters = [float(1e-12 * 100.0 ** i) for i in range(8)]
                    _cholpackT_consts(d_, mm_groups, 8, jitters, cache)
                else:
                    _safe_cholesky_kf(jnp.zeros((d_, d_)), cache=cache)
        if mm_rewards_mean_only and mm_groups:
            gs = B // mm_groups
            cache[('r_gmean',)] = jnp.asarray(
                np.kron(np.eye(mm_groups), np.ones((gs, gs)) / gs),
                x0.dtype)
        # accumulators stay [B, 1]: Mosaic rejects 1-D vector layouts
        disc = jnp.zeros((B, 1), x0.dtype)
        raw = jnp.zeros((B, 1), x0.dtype)
        vret = jnp.zeros((B, 1), x0.dtype)
        sH = None

        def resample(v, z, cache):
            if mm_groups:
                return _mm_resample_grouped_kf(v, z, mm_groups, cache)
            return _mm_resample_kf(v, z, cache)

        if mm_groups:
            # rematerialize the grouped escalation in the backward pass:
            # its per-column intermediates are [G*D, D]-shaped, which
            # Mosaic lane-pads ~100x ([50, 5] -> [56, 128] tiles) — storing
            # them as residuals for 8 tries x D columns x 2T resample sites
            # spilled 149 MB of VMEM at G=10. Recomputing the tiny
            # factorization (a few kFLOPs) during backward keeps only the
            # resample inputs live.
            resample = _inline_checkpoint(resample)

        def one_step(pol_params, states, z_mm_s, z_rr_s, eps_s, cache):
            acts = pol.apply(pol_params, states, pol_noise,
                             return_samples=True)
            if eps_s is not None:
                acts = acts + eps_s
            if learn_reward:
                # reward = last density output dim (`core.py:297-303`)
                nxt, r = dyn.apply(dyn_params, dyn_stats, states, acts,
                                   dyn_noise, return_samples=True,
                                   separate_outputs=True, deltas=False)
            else:
                nxt = dyn.apply(dyn_params, dyn_stats, states, acts,
                                dyn_noise, return_samples=True,
                                separate_outputs=True, deltas=False,
                                with_rewards=False)
                # rewards on the PRE-state-MM next states (`rollout.py:229`)
                r = dyn.reward_func(nxt, acts)
            if mm_states:
                nxt = resample(nxt, z_mm_s, cache)
            if mm_rewards:
                if mm_rewards_mean_only:
                    # the resample's exact particle mean; per-group means
                    # via one [B, B] block-diagonal averaging matmul
                    # (Mosaic-friendly: stays 2-D, no reshapes)
                    if mm_groups:
                        r = jnp.matmul(cache[('r_gmean',)], r)
                    else:
                        r = jnp.broadcast_to(
                            jnp.mean(r, 0, keepdims=True), r.shape)
                else:
                    r = resample(r, z_rr_s, cache)
            return nxt, r

        if remat:
            # gradient checkpointing INSIDE the kernel: the backward
            # recomputes each step's activations from its boundary state
            # instead of holding all T steps' residuals in VMEM at once —
            # in-kernel VMEM drops ~T-fold, which is what admits the
            # compute-bound large-B configs (B=4096) into the single-kernel
            # regime. Costs one extra forward pass (the standard remat
            # trade); the small-B latency-bound headline keeps remat off.
            # pol_params is an explicit arg: _inline_checkpoint's
            # custom_vjp would treat a closed-over pol_params as constant
            # and silently drop the policy gradient.
            one_step = _inline_checkpoint(one_step)

        for t in range(steps):
            nxt, r = one_step(pol_params, states, z_mm_t[t], z_rr_t[t],
                              action_eps[t] if action_eps is not None
                              else None, cache)
            disc = disc + w_list[t] * r
            raw = raw + r
            if value_update is not None and t < v_H:
                vret = vret + v_wlist[t] * r
            states = nxt
            if value_update is not None and t + 1 == v_H:
                sH = states

        aux = ()
        if value_update is not None:
            v_params, v_tgt, v_opt, v_stats, v_noise = extras
            # Mosaic cannot lower optax adam's bias-correction pow in
            # either of its scalar forms (`decay ** count`: int exponent ->
            # "expected floating point type"; float scalar ->
            # "failed to legalize math.powf"). As a [1, 1] float32 VECTOR
            # the pow lowers through the VPU's exp/log path, so run the
            # in-kernel update with the step counter reshaped/cast to
            # [1, 1] f32 (optax.safe_increment and the bias-correction
            # broadcasts are shape/dtype-agnostic) and restore the external
            # int32 scalar on the way out (exact for counts < 2^24).
            def _vecf(x):
                if x.dtype == jnp.int32 and x.ndim == 0:
                    return x.astype(jnp.float32).reshape(1, 1)
                return x

            v_opt_in = jax.tree_util.tree_map(_vecf, v_opt)
            vp2, vt2, vo2, v_loss = value_update.core(
                v_params, v_tgt, v_opt_in, v_stats, sg(x0), sg(sH),
                sg(vret), v_noise)

            # the [1, 1] bias-correction terms broadcast every updated leaf
            # to rank >= 2; restore the reference shapes/dtypes (a pure
            # reshape — the broadcast is numerically a no-op)
            def _like(t, ref):
                return jax.tree_util.tree_map(
                    lambda x, r: (x.reshape(r.shape).astype(r.dtype)
                                  if (x.dtype, x.shape) !=
                                  (r.dtype, r.shape) else x), t, ref)

            vp2 = _like(vp2, v_params)
            vt2 = _like(vt2, v_tgt)
            vo2 = _like(vo2, v_opt)
            # terminal bootstrap under the refit critic (params detached,
            # differentiable through the final states — `mc_pilco.py:137`)
            v_end = V.apply(jax.tree_util.tree_map(sg, vp2), v_stats,
                            states, v_noise, return_samples=True)
            disc = disc + float(w_H) * v_end
            aux = (vp2, vt2, vo2, v_loss)

        loss = jnp.mean(disc)
        if maximize:
            loss = -loss
        return loss, jnp.mean(raw), aux

    return impl


# ---------------------------------------------------------------------------
# Pallas wrapping: one fwd kernel, one bwd kernel (vjp traced in-kernel)
# ---------------------------------------------------------------------------

def _pad2(x):
    """Mosaic wants >=2-D operands; pad leading singleton dims."""
    return x.reshape((1,) * max(0, 2 - x.ndim) + x.shape)


def _pad2_shape(shape):
    return (1,) * max(0, 2 - len(shape)) + tuple(shape)


def _write(ref, val):
    """Write a (possibly 0-/1-D) value into its 2-D-padded output ref."""
    if val.ndim == 0:
        ref[0, 0] = val
    else:
        ref[:] = val.reshape(ref.shape)


def _norm_args(args):
    """Accept the legacy 9-arg call (no extras) by appending ``()``."""
    if len(args) == 9:
        args = tuple(args) + ((),)
    return tuple(args)


def _trace_closed(impl, args):
    """Trace impl to a jaxpr; its consts become explicit kernel inputs.

    ``jax.closure_convert`` leaves some closed-over arrays inline (the
    analytic-reward constants re-materialize at kernel-trace time), so
    hoist ALL constvars explicitly: trace once with make_jaxpr, ship
    ``jaxpr.consts`` as kernel operands, and re-bind the primitives
    inside the kernel with ``eval_jaxpr`` — guaranteed capture-free.
    Returns (closed, padded_inputs, consts, out_leaves, out_tree).
    """
    flat, in_tree = jax.tree_util.tree_flatten(args)
    shapes = [a.shape for a in flat]

    def impl_flat(*leaves):
        leaves = [lv.reshape(s) for lv, s in zip(leaves, shapes)]
        return impl(*jax.tree_util.tree_unflatten(in_tree, leaves))

    padded = [_pad2(jnp.asarray(a)) for a in flat]
    # trace under compile-time eval: when the caller is itself being jit-
    # traced, constants minted during this inner trace would otherwise be
    # lifted as OUTER-trace tracers (unhashable, un-dedupable); this keeps
    # them concrete so they ship as ordinary kernel operands
    with jax.ensure_compile_time_eval():
        closed_jaxpr, out_shape = jax.make_jaxpr(
            impl_flat, return_shape=True)(
                *[jax.ShapeDtypeStruct(p.shape, p.dtype) for p in padded])
    consts_all = [jnp.asarray(c) for c in closed_jaxpr.consts]
    # Dedupe identical constants BY CONTENT: each _inline_checkpoint
    # call-site's sub-trace lifts its own constvar for the same underlying
    # array (T steps x the MM indicator masks), and every pallas operand
    # slot is a separate VMEM staging buffer — the grouped G=10 kernel
    # shipped 15 copies of its [400, 400] escalation constants and blew the
    # 100 MB scoped-VMEM budget before this collapse.
    uniq, index, seen = [], [], {}
    for c in consts_all:
        key = (c.shape, str(c.dtype), np.asarray(c).tobytes())
        if key not in seen:
            seen[key] = len(uniq)
            uniq.append(c)
        index.append(seen[key])
    consts = uniq
    const_shapes = [c.shape for c in consts_all]
    n_args = len(padded)
    out_leaves, out_tree = jax.tree_util.tree_flatten(out_shape)

    def closed(*vals_and_consts):
        # operands arrive 2-D-padded (Mosaic constraint); restore the
        # consts' traced shapes before re-binding the jaxpr, expanding the
        # deduped operands back to one value per constvar position
        vals = vals_and_consts[:n_args]
        cuniq = vals_and_consts[n_args:]
        cvals = [cuniq[i].reshape(s) for i, s in zip(index, const_shapes)]
        out = jax.core.eval_jaxpr(closed_jaxpr.jaxpr, cvals, *vals)
        return tuple(out)

    return closed, padded, consts, out_leaves, out_tree


_VMEM_LIMIT = 100 * 1024 * 1024


def make_fused_loss(dyn, pol, steps, w_t, mm_states, mm_rewards, maximize,
                    mm_groups=None, value_update=None, w_H=None,
                    remat=False, interpret=False, mode=None,
                    mm_rewards_mean_only=False):
    """Build the pallas-fused (loss, mean_return, aux) function, custom VJP.

    Returns ``fused(pol_params, x0, dyn_params, dyn_stats, dyn_noise,
    pol_noise, z_mm_t, z_rr_t, action_eps[, extras])``; differentiable
    w.r.t. ``pol_params`` and ``action_eps`` only, through BOTH the loss and
    mean_return outputs (all other cotangents are zeros — exactly the
    arguments `algorithms/mc_pilco.py`'s loss differentiates). ``aux``
    (the value-update outputs) is non-differentiable.

    ``mode`` selects the kernel tier (see :func:`fused_mode`): ``'full'``
    (whole rollout, all residuals in VMEM), ``'remat'`` (whole rollout,
    in-kernel per-step checkpoint — compile-fragile above B*T ~ 4k, kept
    for tests/forcing), ``'step'`` (per-step kernels under a scan — the
    large-batch production tier). ``remat=True`` is legacy for
    ``mode='remat'``.
    """
    if mode is None:
        mode = 'remat' if remat else 'full'
    if mode == 'step':
        return make_stepwise_loss(dyn, pol, steps, w_t, mm_states,
                                  mm_rewards, maximize, mm_groups=mm_groups,
                                  value_update=value_update, w_H=w_H,
                                  interpret=interpret)
    if mode == 'grid':
        return make_grid_loss(dyn, pol, steps, w_t, mm_states, mm_rewards,
                              maximize, mm_groups=mm_groups,
                              value_update=value_update, w_H=w_H,
                              interpret=interpret)
    impl = make_loss_impl(dyn, pol, steps, w_t, mm_states, mm_rewards,
                          maximize, mm_groups=mm_groups,
                          value_update=value_update, w_H=w_H,
                          remat=mode == 'remat',
                          mm_rewards_mean_only=mm_rewards_mean_only)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

    def _fwd_pallas(args):
        closed, padded, consts, out_leaves, out_tree = _trace_closed(impl,
                                                                     args)
        n_in = len(padded)

        def fwd_kernel(*refs):
            in_refs = refs[:n_in + len(consts)]
            out_refs = refs[n_in + len(consts):]
            vals = [r[:] for r in in_refs]
            outs = closed(*vals)
            for r, o in zip(out_refs, outs):
                _write(r, o)

        outs = pl.pallas_call(
            fwd_kernel,
            out_shape=tuple(jax.ShapeDtypeStruct(_pad2_shape(o.shape),
                                                 o.dtype)
                            for o in out_leaves),
            in_specs=[vmem] * (n_in + len(consts)),
            out_specs=tuple(smem if len(o.shape) == 0 else vmem
                            for o in out_leaves),
            compiler_params=cparams,
            interpret=interpret,
        )(*padded, *[_pad2(c) for c in consts])
        outs = [o.reshape(l.shape) for o, l in zip(outs, out_leaves)]
        return jax.tree_util.tree_unflatten(out_tree, outs)

    def _bwd_pallas(args, g_loss, g_mret):
        closed, padded, consts, out_leaves, _ = _trace_closed(impl, args)
        n_in = len(padded)
        # grads w.r.t. pol_params leaves + action_eps (the leaf right
        # before the extras block)
        pol_flat, _ = jax.tree_util.tree_flatten(args[0])
        n_pol = len(pol_flat)
        n_extras = len(jax.tree_util.tree_flatten(args[9])[0])
        eps_idx = n_in - n_extras - 1
        diff_idx = list(range(n_pol)) + [eps_idx]

        def bwd_kernel(*refs):
            in_refs = refs[:n_in + len(consts)]
            g_ref = refs[n_in + len(consts)]
            gm_ref = refs[n_in + len(consts) + 1]
            out_refs = refs[n_in + len(consts) + 2:]
            vals = [r[:] for r in in_refs]

            def loss_of(diff_vals):
                v = list(vals)
                for k, i in enumerate(diff_idx):
                    v[i] = diff_vals[k]
                out = closed(*v)
                # (loss, mean_return) differentiated; aux is sg-decoupled
                return (out[0], out[1]), out[2:]

            _, vjp, _ = jax.vjp(loss_of, [vals[i] for i in diff_idx],
                                has_aux=True)
            grads, = vjp((g_ref[0, 0], gm_ref[0, 0]))
            for r, g in zip(out_refs, grads):
                r[:] = g

        outs = pl.pallas_call(
            bwd_kernel,
            out_shape=tuple(jax.ShapeDtypeStruct(padded[i].shape,
                                                 padded[i].dtype)
                            for i in diff_idx),
            in_specs=[vmem] * (n_in + len(consts)) + [smem, smem],
            out_specs=tuple([vmem] * len(diff_idx)),
            compiler_params=cparams,
            interpret=interpret,
        )(*padded, *[_pad2(c) for c in consts],
          g_loss.reshape(1, 1).astype(jnp.float32),
          g_mret.reshape(1, 1).astype(jnp.float32))
        return outs

    @jax.custom_vjp
    def fused10(pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
                z_mm_t, z_rr_t, action_eps, extras):
        return _fwd_pallas((pol_params, x0, dyn_params, dyn_stats,
                            dyn_noise, pol_noise, z_mm_t, z_rr_t,
                            action_eps, extras))

    def fused_fwd(*args):
        return _fwd_pallas(args), args

    def fused_bwd(args, g):
        g_loss = jnp.asarray(g[0])
        g_mret = jnp.asarray(g[1])
        outs = _bwd_pallas(args, g_loss, g_mret)
        pol_flat, pol_tree = jax.tree_util.tree_flatten(args[0])
        n_pol = len(pol_flat)
        gpol = jax.tree_util.tree_unflatten(
            pol_tree, [o.reshape(p.shape)
                       for o, p in zip(outs[:n_pol], pol_flat)])
        g_eps = outs[n_pol].reshape(args[8].shape)
        zeros = tuple(jax.tree_util.tree_map(jnp.zeros_like, a)
                      for a in args[1:8])
        z_extras = jax.tree_util.tree_map(jnp.zeros_like, args[9])
        return (gpol,) + zeros + (g_eps, z_extras)

    fused10.defvjp(fused_fwd, fused_bwd)

    def fused(*args):
        return fused10(*_norm_args(args))

    return fused


def make_fused_value_and_grad(dyn, pol, steps, w_t, mm_states, mm_rewards,
                              maximize, mm_groups=None, value_update=None,
                              w_H=None, remat=False, interpret=False,
                              mode=None, mm_rewards_mean_only=False):
    """ONE kernel per optimizer iteration: (loss, mean_return, grads, aux).

    ``jax.value_and_grad`` over the custom-vjp pair runs TWO kernels (a
    forward for the primal, a backward that recomputes the forward anyway —
    55 + 143 us at the headline config). This variant traces the vjp inside
    a single kernel and writes the primal outputs alongside the gradients,
    deleting the separate forward launch. With ``value_update``, the TD(H)
    critic refit (and its optax/polyak state transition) runs in the SAME
    kernel and its outputs come back in ``aux``. Returns
    ``f(pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
    z_mm_t, z_rr_t, action_eps[, extras]) -> (loss, mean_return,
    grads_pytree, aux)``. Not differentiable (the optimizer consumes the
    grads directly).
    """
    if mode is None:
        mode = 'remat' if remat else 'full'
    if mode == 'step':
        return make_stepwise_value_and_grad(
            dyn, pol, steps, w_t, mm_states, mm_rewards, maximize,
            mm_groups=mm_groups, value_update=value_update, w_H=w_H,
            interpret=interpret)
    if mode == 'grid':
        return make_grid_value_and_grad(
            dyn, pol, steps, w_t, mm_states, mm_rewards, maximize,
            mm_groups=mm_groups, value_update=value_update, w_H=w_H,
            interpret=interpret)
    impl = make_loss_impl(dyn, pol, steps, w_t, mm_states, mm_rewards,
                          maximize, mm_groups=mm_groups,
                          value_update=value_update, w_H=w_H,
                          remat=mode == 'remat',
                          mm_rewards_mean_only=mm_rewards_mean_only)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def fused_vg(*args):
        args = _norm_args(args)
        closed, padded, consts, out_leaves, out_tree = _trace_closed(impl,
                                                                     args)
        n_in = len(padded)
        pol_flat, pol_tree = jax.tree_util.tree_flatten(args[0])
        n_pol = len(pol_flat)
        n_aux = len(out_leaves) - 2

        def kernel(*refs):
            in_refs = refs[:n_in + len(consts)]
            loss_ref, mret_ref = refs[n_in + len(consts):
                                      n_in + len(consts) + 2]
            grad_refs = refs[n_in + len(consts) + 2:
                             n_in + len(consts) + 2 + n_pol]
            aux_refs = refs[n_in + len(consts) + 2 + n_pol:]
            vals = [r[:] for r in in_refs]

            def outs_of(pol_vals):
                v = list(vals)
                for k in range(n_pol):
                    v[k] = pol_vals[k]
                out = closed(*v)
                return (out[0], out[1]), out[2:]

            (loss, mret), vjp, aux = jax.vjp(outs_of, vals[:n_pol],
                                             has_aux=True)
            grads, = vjp((jnp.ones((), jnp.float32),
                          jnp.zeros((), jnp.float32)))
            loss_ref[0, 0] = loss
            mret_ref[0, 0] = mret
            for r, g in zip(grad_refs, grads):
                r[:] = g
            for r, a in zip(aux_refs, aux):
                _write(r, a)

        aux_leaves = out_leaves[2:]
        outs = pl.pallas_call(
            kernel,
            out_shape=(jax.ShapeDtypeStruct((1, 1), jnp.float32),
                       jax.ShapeDtypeStruct((1, 1), jnp.float32))
            + tuple(jax.ShapeDtypeStruct(p.shape, p.dtype)
                    for p in padded[:n_pol])
            + tuple(jax.ShapeDtypeStruct(_pad2_shape(a.shape), a.dtype)
                    for a in aux_leaves),
            in_specs=[vmem] * (n_in + len(consts)),
            out_specs=(smem, smem) + tuple([vmem] * n_pol)
            + tuple(smem if len(a.shape) == 0 else vmem
                    for a in aux_leaves),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
            interpret=interpret,
        )(*padded, *[_pad2(c) for c in consts])
        loss, mret = outs[0][0, 0], outs[1][0, 0]
        grads = jax.tree_util.tree_unflatten(
            pol_tree, [o.reshape(p.shape)
                       for o, p in zip(outs[2:2 + n_pol], pol_flat)])
        aux_flat = [o.reshape(l.shape)
                    for o, l in zip(outs[2 + n_pol:], aux_leaves)]
        full = jax.tree_util.tree_unflatten(
            out_tree, [jnp.zeros(()), jnp.zeros(())] + aux_flat)
        return loss, mret, grads, full[2]

    return fused_vg


def make_fused_sharded_value_and_grad(dyn, pol, steps, w_t, mm_states,
                                      mm_rewards, maximize, mesh,
                                      particle_axis, mm_groups=None,
                                      remat=False, interpret=False,
                                      mode=None, mm_rewards_mean_only=False):
    """Compose the fused kernel with a device mesh: shard_map over particles.

    Composition contract (from the reference's own grouped-MM semantics,
    `prob_mbrl/utils/rollout.py:125-145`): grouped moment matching is
    block-local over contiguous particle blocks, so with ``mm_groups``
    divisible by the mesh size every group lives entirely on one shard and
    per-shard grouped MM is EXACTLY global grouped MM — no collectives
    inside the rollout at all. Each device runs the single fused kernel on
    its particle shard (with ``mm_groups / n_devices`` local groups); the
    only cross-device traffic is one pmean of (loss, mean_return,
    policy-grads) per optimizer iteration. Ungrouped MM under a mesh would
    need cross-shard moments between kernel segments and stays on the XLA
    path (see :func:`supports`).

    Returns ``f(...) -> (loss, mean_return, grads, ())`` with the same
    signature as :func:`make_fused_value_and_grad` (no value bootstrap —
    the per-shard critic refit would desynchronize critic replicas).
    """
    try:
        from jax import shard_map as _sm

        def shard_map(f, **kw):
            return _sm(f, check_vma=False, **kw)
    except ImportError:  # older jax
        from functools import partial
        from jax.experimental.shard_map import shard_map as _sm
        shard_map = partial(_sm, check_rep=False)
    from jax.sharding import PartitionSpec as P

    n_dev = int(mesh.size)
    g_local = mm_groups // n_dev if mm_groups else None
    local_vg = make_fused_value_and_grad(
        dyn, pol, steps, w_t, mm_states, mm_rewards, maximize,
        mm_groups=g_local, remat=remat, interpret=interpret, mode=mode,
        mm_rewards_mean_only=mm_rewards_mean_only)

    def _local(pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
               z_mm_t, z_rr_t, action_eps, extras):
        loss, mret, grads, aux = local_vg(
            pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
            z_mm_t, z_rr_t, action_eps, extras)
        # equal shard sizes: global mean = mean of per-shard means; the
        # policy gradient of the global mean loss is likewise the pmean
        loss = jax.lax.pmean(loss, particle_axis)
        mret = jax.lax.pmean(mret, particle_axis)
        grads = jax.lax.pmean(grads, particle_axis)
        return loss, mret, grads, aux

    rep, par, tpar = P(), P(particle_axis), P(None, particle_axis)
    sharded = shard_map(
        _local, mesh=mesh,
        in_specs=(rep, par, rep, rep, par, par, tpar, tpar, tpar, rep),
        out_specs=(rep, rep, rep, rep))

    def fused_vg(*args):
        return sharded(*_norm_args(args))

    return fused_vg


# ---------------------------------------------------------------------------
# Stepwise tier: one fused kernel PER ROLLOUT STEP under a lax.scan
# ---------------------------------------------------------------------------

def make_step_impl(dyn, pol, mm_states, mm_rewards, mm_groups=None):
    """Single-rollout-step impl: ``(nxt, r) = step(pol_params, states, ...)``.

    Same math as one iteration of :func:`make_loss_impl`'s step loop
    (policy -> dynamics -> reward-on-pre-MM-states -> MM resample,
    `utils/rollout.py:130-311`), factored to per-step granularity so it can
    be wrapped in a per-step Pallas kernel. The MM constant cache is
    populated inside the trace; :func:`_trace_closed` hoists the minted
    constants into explicit kernel operands.
    """
    learn_reward = dyn.reward_func is None

    def step_impl(pol_params, states, z_mm_s, z_rr_s, eps_s, dyn_params,
                  dyn_stats, dyn_noise, pol_noise):
        B = states.shape[0]
        cache = {}
        if mm_states or mm_rewards:
            dims = ([states.shape[-1]] if mm_states else []) \
                + ([1] if mm_rewards else [])
            for d_ in dims:
                if mm_groups:
                    _grouped_consts(B, d_, mm_groups, cache)
                    jitters = [float(1e-12 * 100.0 ** i) for i in range(8)]
                    _cholpackT_consts(d_, mm_groups, 8, jitters, cache)
                else:
                    _safe_cholesky_kf(jnp.zeros((d_, d_)), cache=cache)

        def resample(v, z):
            if mm_groups:
                return _mm_resample_grouped_kf(v, z, mm_groups, cache)
            return _mm_resample_kf(v, z, cache)

        acts = pol.apply(pol_params, states, pol_noise,
                         return_samples=True)
        acts = acts + eps_s
        if learn_reward:
            nxt, r = dyn.apply(dyn_params, dyn_stats, states, acts,
                               dyn_noise, return_samples=True,
                               separate_outputs=True, deltas=False)
        else:
            nxt = dyn.apply(dyn_params, dyn_stats, states, acts, dyn_noise,
                            return_samples=True, separate_outputs=True,
                            deltas=False, with_rewards=False)
            r = dyn.reward_func(nxt, acts)
        if mm_states:
            nxt = resample(nxt, z_mm_s)
        if mm_rewards:
            r = resample(r, z_rr_s)
        return nxt, r

    return step_impl


def make_fused_step(dyn, pol, mm_states, mm_rewards, mm_groups=None,
                    interpret=False):
    """Pallas-fused single rollout step with a checkpointing custom VJP.

    Forward: one kernel computing ``(nxt, r)``. Backward: one kernel that
    RECOMPUTES the step from its inputs and applies ``jax.vjp`` in-kernel —
    residuals are exactly the step inputs, so the in-kernel liveness is one
    step's activations regardless of the batch size. This is what admits
    arbitrarily large particle counts into the fused regime: the monolithic
    whole-rollout kernel's register allocator spilled ~200 MB of VMEM at
    B=1000 (all T steps' activations live), while the per-step kernel's
    working set is O(B * layer widths) and the horizon runs as a
    ``lax.scan`` of kernel invocations (one Mosaic compile, T launches).

    Differentiable w.r.t. ``pol_params``, ``states`` (the scan carry
    cotangent chain) and ``eps_s``; all other cotangents are zeros.
    """
    impl = make_step_impl(dyn, pol, mm_states, mm_rewards, mm_groups)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    cparams = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)

    def _fwd_pallas(args):
        closed, padded, consts, out_leaves, out_tree = _trace_closed(impl,
                                                                     args)
        n_in = len(padded)

        def fwd_kernel(*refs):
            in_refs = refs[:n_in + len(consts)]
            out_refs = refs[n_in + len(consts):]
            vals = [r[:] for r in in_refs]
            outs = closed(*vals)
            for r, o in zip(out_refs, outs):
                _write(r, o)

        outs = pl.pallas_call(
            fwd_kernel,
            out_shape=tuple(jax.ShapeDtypeStruct(_pad2_shape(o.shape),
                                                 o.dtype)
                            for o in out_leaves),
            in_specs=[vmem] * (n_in + len(consts)),
            out_specs=tuple([vmem] * len(out_leaves)),
            compiler_params=cparams,
            interpret=interpret,
        )(*padded, *[_pad2(c) for c in consts])
        outs = [o.reshape(l.shape) for o, l in zip(outs, out_leaves)]
        return jax.tree_util.tree_unflatten(out_tree, outs)

    def _bwd_pallas(args, g_nxt, g_r):
        closed, padded, consts, out_leaves, _ = _trace_closed(impl, args)
        n_in = len(padded)
        pol_flat, _ = jax.tree_util.tree_flatten(args[0])
        n_pol = len(pol_flat)
        # diff wrt pol leaves + states + eps_s (flat arg order:
        # pol leaves, states, z_mm_s, z_rr_s, eps_s, ...)
        diff_idx = list(range(n_pol)) + [n_pol, n_pol + 3]

        def bwd_kernel(*refs):
            in_refs = refs[:n_in + len(consts)]
            gn_ref, gr_ref = refs[n_in + len(consts):n_in + len(consts) + 2]
            out_refs = refs[n_in + len(consts) + 2:]
            vals = [r[:] for r in in_refs]

            def outs_of(diff_vals):
                v = list(vals)
                for k, i in enumerate(diff_idx):
                    v[i] = diff_vals[k]
                return closed(*v)

            _, vjp = jax.vjp(outs_of, [vals[i] for i in diff_idx])
            grads, = vjp((gn_ref[:].reshape(out_leaves[0].shape),
                          gr_ref[:].reshape(out_leaves[1].shape)))
            for r, g in zip(out_refs, grads):
                r[:] = g

        outs = pl.pallas_call(
            bwd_kernel,
            out_shape=tuple(jax.ShapeDtypeStruct(padded[i].shape,
                                                 padded[i].dtype)
                            for i in diff_idx),
            in_specs=[vmem] * (n_in + len(consts) + 2),
            out_specs=tuple([vmem] * len(diff_idx)),
            compiler_params=cparams,
            interpret=interpret,
        )(*padded, *[_pad2(c) for c in consts],
          _pad2(jnp.asarray(g_nxt)), _pad2(jnp.asarray(g_r)))
        return outs

    @jax.custom_vjp
    def step9(pol_params, states, z_mm_s, z_rr_s, eps_s, dyn_params,
              dyn_stats, dyn_noise, pol_noise):
        return _fwd_pallas((pol_params, states, z_mm_s, z_rr_s, eps_s,
                            dyn_params, dyn_stats, dyn_noise, pol_noise))

    def step_fwd(*args):
        return _fwd_pallas(args), args

    def step_bwd(args, g):
        g_nxt, g_r = g
        outs = _bwd_pallas(args, g_nxt, g_r)
        pol_flat, pol_tree = jax.tree_util.tree_flatten(args[0])
        n_pol = len(pol_flat)
        gpol = jax.tree_util.tree_unflatten(
            pol_tree, [o.reshape(p.shape)
                       for o, p in zip(outs[:n_pol], pol_flat)])
        g_states = outs[n_pol].reshape(args[1].shape)
        g_eps = outs[n_pol + 1].reshape(args[4].shape)
        zeros_mid = (jnp.zeros_like(args[2]), jnp.zeros_like(args[3]))
        zeros_tail = tuple(jax.tree_util.tree_map(jnp.zeros_like, a)
                           for a in args[5:])
        return (gpol, g_states) + zeros_mid + (g_eps,) + zeros_tail

    step9.defvjp(step_fwd, step_bwd)
    return step9


def make_stepwise_loss(dyn, pol, steps, w_t, mm_states, mm_rewards,
                       maximize, mm_groups=None, value_update=None,
                       w_H=None, interpret=False):
    """Stepwise-fused ``(loss, mean_return, aux)`` — same contract as
    :func:`make_fused_loss` but built as a ``lax.scan`` of per-step fused
    kernels instead of one monolithic kernel.

    The return accumulation, TD(H) critic refit and terminal value
    bootstrap run as plain XLA ops BETWEEN kernels (they are tiny [B, 1] /
    critic-sized computations — the per-op-latency problem the fused path
    solves lives in the per-step MLP/MM chain, which stays in-kernel).
    Semantics identical to :func:`make_loss_impl`
    (`algorithms/mc_pilco.py` loss_fn; reference
    `prob_mbrl/utils/rollout.py:93-153`, `mc_pilco.py:120-140`).
    """
    step = make_fused_step(dyn, pol, mm_states, mm_rewards, mm_groups,
                           interpret=interpret)
    w_list = [float(w) for w in np.asarray(w_t)]
    if value_update is not None:
        v_wlist = [float(w) for w in np.asarray(value_update.w_t)]
        v_H = value_update.H
        V = value_update.spec

    def loss_fn(*args):
        (pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
         z_mm_t, z_rr_t, action_eps, extras) = _norm_args(args)
        B = x0.shape[0]
        sg = jax.lax.stop_gradient
        w_arr = jnp.asarray(w_list, x0.dtype)
        vw = np.zeros(steps)
        if value_update is not None:
            vw[:v_H] = v_wlist[:v_H]
        vw_arr = jnp.asarray(vw, x0.dtype)
        zeros = jnp.zeros((B, 1), x0.dtype)

        def body(carry, xs):
            states, disc, raw, vret = carry
            z_mm_s, z_rr_s, eps_s, w, vwt = xs
            nxt, r = step(pol_params, states, z_mm_s, z_rr_s, eps_s,
                          dyn_params, dyn_stats, dyn_noise, pol_noise)
            carry = (nxt, disc + w * r, raw + r, vret + vwt * r)
            return carry, (nxt if value_update is not None else None)

        (states, disc, raw, vret), ys = jax.lax.scan(
            body, (x0, zeros, zeros, zeros),
            (z_mm_t, z_rr_t, action_eps, w_arr, vw_arr))

        aux = ()
        if value_update is not None:
            v_params, v_tgt, v_opt, v_stats, v_noise = extras
            sH = ys[v_H - 1]
            vp2, vt2, vo2, v_loss = value_update.core(
                v_params, v_tgt, v_opt, v_stats, sg(x0), sg(sH),
                sg(vret), v_noise)
            # terminal bootstrap under the refit critic (params detached,
            # differentiable through the final states — `mc_pilco.py:137`)
            v_end = V.apply(jax.tree_util.tree_map(sg, vp2), v_stats,
                            states, v_noise, return_samples=True)
            disc = disc + float(w_H) * v_end
            aux = (vp2, vt2, vo2, v_loss)

        loss = jnp.mean(disc)
        if maximize:
            loss = -loss
        return loss, jnp.mean(raw), aux

    return loss_fn


def make_stepwise_value_and_grad(dyn, pol, steps, w_t, mm_states,
                                 mm_rewards, maximize, mm_groups=None,
                                 value_update=None, w_H=None,
                                 interpret=False):
    """Stepwise counterpart of :func:`make_fused_value_and_grad`.

    ``jax.value_and_grad`` over the stepwise loss: the forward scan runs T
    fwd kernels, the backward scan T bwd kernels (each recomputing its step
    — checkpoint residuals are the step inputs, so no [T, B, width]
    residual stacks ever hit HBM). Same return contract:
    ``(loss, mean_return, grads, aux)``.
    """
    loss_fn = make_stepwise_loss(dyn, pol, steps, w_t, mm_states,
                                 mm_rewards, maximize, mm_groups=mm_groups,
                                 value_update=value_update, w_H=w_H,
                                 interpret=interpret)

    def fused_vg(*args):
        args = _norm_args(args)

        def lf(pol_params):
            loss, mret, aux = loss_fn(pol_params, *args[1:])
            return loss, (mret, aux)

        (loss, (mret, aux)), grads = jax.value_and_grad(
            lf, has_aux=True)(args[0])
        return loss, mret, grads, aux

    return fused_vg


# ---------------------------------------------------------------------------
# Grid tier: whole rollout as ONE pallas_call with grid=(T,), carry in VMEM
# scratch — the large-batch production tier
# ---------------------------------------------------------------------------
#
# Why a grid and not a scan of per-step kernels ('step' mode): each
# pallas_call costs ~30 us of fixed dispatch on this runtime, so 30
# launches/iteration cap B=1000 at ~13M particle-steps/s (slower than the
# XLA path's 17M). With grid=(T,) the T steps run as the kernel's own
# sequential loop: weights/masks/consts are VMEM-resident across steps
# (fetched once), only the per-step noise slices stream, and one iteration
# is 2 launches total (fwd grid + bwd grid). Why not the monolithic
# unrolled kernel ('full'/'remat'): its T-step unrolled body holds all
# steps' activations live through the in-kernel backward — Mosaic's
# register allocator spilled 200 MB of VMEM at B=1000 — while the grid
# body is ONE step's program, so liveness is bounded at any batch size.

def _smem_scalar(x):
    return jnp.asarray(x, jnp.float32).reshape(-1, 1)


def make_grid_rollout(dyn, pol, steps, mm_states, mm_rewards,
                      mm_groups=None, interpret=False):
    """Grid-pipelined differentiable rollout.

    Returns ``rollout9(pol_params, x0, z_mm_t, z_rr_t, action_eps,
    dyn_params, dyn_stats, dyn_noise, pol_noise, w_t, vw_t) ->
    (disc, raw, vret, states_all)`` where ``disc[b] = sum_t w_t r_t[b]``,
    ``raw[b] = sum_t r_t[b]``, ``vret[b] = sum_t vw_t r_t[b]`` and
    ``states_all[t]`` is the post-MM state after step t. Differentiable
    w.r.t. ``pol_params``, ``action_eps`` and all four outputs (the
    backward grid kernel folds the per-output cotangents into one
    reverse sweep; ``states_all`` cotangents join the carry chain, which
    is how the terminal value bootstrap's gradient enters).
    """
    impl = make_step_impl(dyn, pol, mm_states, mm_rewards, mm_groups)
    # the grid body is one step's program; at B=4096 the bwd body's
    # recompute+vjp stack measured 104.4 MB — give the grid kernels the
    # chip's real headroom (128 MB VMEM) instead of the default 100 MB cap
    grid_params = pltpu.CompilerParams(
        vmem_limit_bytes=120 * 1024 * 1024,
        dimension_semantics=('arbitrary',))
    T = steps

    def _specs(args):
        """Trace the step impl; build operand lists shared by fwd/bwd.

        Flat step-arg order (see :func:`make_step_impl`): pol leaves,
        states, z_mm_s, z_rr_s, eps_s, dyn/stats/noise leaves. The
        per-step leaves (states, z_mm_s, z_rr_s, eps_s) are replaced by
        grid-blocked stacks / the scratch carry; everything else is a
        whole-array VMEM operand fetched once.
        """
        (pol_params, x0, z_mm_t, z_rr_t, eps_t, dyn_params, dyn_stats,
         dyn_noise, pol_noise) = args
        step_args = (pol_params, x0, z_mm_t[0], z_rr_t[0], eps_t[0],
                     dyn_params, dyn_stats, dyn_noise, pol_noise)
        closed, padded, consts, out_leaves, _ = _trace_closed(impl,
                                                              step_args)
        n_pol = len(jax.tree_util.tree_flatten(pol_params)[0])
        return closed, padded, consts, out_leaves, n_pol

    vmem_whole = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_whole = pl.BlockSpec(memory_space=pltpu.SMEM)

    def _blk(stack, rev=False):
        _, B_, D_ = stack.shape
        if rev:
            return pl.BlockSpec((1, B_, D_), lambda t: (T - 1 - t, 0, 0))
        return pl.BlockSpec((1, B_, D_), lambda t: (t, 0, 0))

    def _fwd_pallas(args, w_t, vw_t):
        closed, padded, consts, out_leaves, n_pol = _specs(args)
        (pol_params, x0, z_mm_t, z_rr_t, eps_t, *_rest) = args
        B, D = x0.shape
        x0p = _pad2(jnp.asarray(x0))
        rest = padded[:n_pol] + padded[n_pol + 4:]  # drop per-step leaves
        n_rest = len(rest)
        n_const = len(consts)
        dt = x0p.dtype

        def fwd_kernel(*refs):
            (rest_refs, const_refs, x0_ref, zmm_ref, zrr_ref, eps_ref,
             w_ref, vw_ref) = (refs[:n_rest],
                               refs[n_rest:n_rest + n_const],
                               *refs[n_rest + n_const:n_rest + n_const + 6])
            sall_ref, disc_ref, raw_ref, vret_ref = \
                refs[n_rest + n_const + 6:n_rest + n_const + 10]
            state_s, = refs[n_rest + n_const + 10:]
            t = pl.program_id(0)

            @pl.when(t == 0)
            def _init():
                state_s[:] = x0_ref[:]
                disc_ref[:] = jnp.zeros_like(disc_ref)
                raw_ref[:] = jnp.zeros_like(raw_ref)
                vret_ref[:] = jnp.zeros_like(vret_ref)

            rest_vals = [r[:] for r in rest_refs]
            const_vals = [r[:] for r in const_refs]
            vals = (rest_vals[:n_pol]
                    + [state_s[:],
                       zmm_ref[:].reshape(zmm_ref.shape[1:]),
                       zrr_ref[:].reshape(zrr_ref.shape[1:]),
                       eps_ref[:].reshape(eps_ref.shape[1:])]
                    + rest_vals[n_pol:])
            nxt, r = closed(*vals, *const_vals)
            state_s[:] = nxt
            sall_ref[:] = nxt.reshape(sall_ref.shape)
            w = w_ref[t, 0]
            vw = vw_ref[t, 0]
            disc_ref[:] += (w * r).astype(disc_ref.dtype)
            raw_ref[:] += r.astype(raw_ref.dtype)
            vret_ref[:] += (vw * r).astype(vret_ref.dtype)

        outs = pl.pallas_call(
            fwd_kernel,
            grid=(T,),
            out_shape=(jax.ShapeDtypeStruct((T, B, D), dt),
                       jax.ShapeDtypeStruct((B, 1), dt),
                       jax.ShapeDtypeStruct((B, 1), dt),
                       jax.ShapeDtypeStruct((B, 1), dt)),
            in_specs=[vmem_whole] * (n_rest + n_const)
            + [vmem_whole, _blk(z_mm_t), _blk(z_rr_t), _blk(eps_t),
               smem_whole, smem_whole],
            out_specs=(_blk(jnp.zeros((T, B, D), dt)),
                       pl.BlockSpec((B, 1), lambda t: (0, 0)),
                       pl.BlockSpec((B, 1), lambda t: (0, 0)),
                       pl.BlockSpec((B, 1), lambda t: (0, 0))),
            scratch_shapes=[pltpu.VMEM((B, D), dt)],
            compiler_params=grid_params,
            interpret=interpret,
        )(*rest, *[_pad2(c) for c in consts], x0p, z_mm_t, z_rr_t, eps_t,
          _smem_scalar(w_t), _smem_scalar(vw_t))
        return outs  # (states_all, disc, raw, vret)

    def _bwd_pallas(args):
        closed, padded, consts, out_leaves, n_pol = _specs(args)
        (pol_params, x0, z_mm_t, z_rr_t, eps_t, *_rest) = args
        B, D = x0.shape
        U = eps_t.shape[-1]
        rest = padded[:n_pol] + padded[n_pol + 4:]
        n_rest = len(rest)
        n_const = len(consts)
        dt = jnp.asarray(x0).dtype
        # diff wrt pol leaves + states + eps_s in the step-arg flat order
        diff_idx = list(range(n_pol)) + [n_pol, n_pol + 3]

        def bwd_kernel(*refs):
            (rest_refs, const_refs) = (refs[:n_rest],
                                       refs[n_rest:n_rest + n_const])
            (xpre_ref, zmm_ref, zrr_ref, eps_ref, gsall_ref, gd_ref,
             gr_ref, gv_ref, w_ref, vw_ref) = \
                refs[n_rest + n_const:n_rest + n_const + 10]
            gpol_refs = refs[n_rest + n_const + 10:
                             n_rest + n_const + 10 + n_pol]
            geps_ref = refs[n_rest + n_const + 10 + n_pol]
            gstate_s, = refs[n_rest + n_const + 11 + n_pol:]
            ti = pl.program_id(0)         # grid index; real step T-1-ti
            t = T - 1 - ti

            @pl.when(ti == 0)
            def _init():
                gstate_s[:] = jnp.zeros_like(gstate_s)
                for gp in gpol_refs:
                    gp[:] = jnp.zeros_like(gp)

            rest_vals = [r[:] for r in rest_refs]
            const_vals = [r[:] for r in const_refs]
            vals = (rest_vals[:n_pol]
                    + [xpre_ref[:].reshape(xpre_ref.shape[1:]),
                       zmm_ref[:].reshape(zmm_ref.shape[1:]),
                       zrr_ref[:].reshape(zrr_ref.shape[1:]),
                       eps_ref[:].reshape(eps_ref.shape[1:])]
                    + rest_vals[n_pol:])

            def outs_of(diff_vals):
                v = list(vals)
                for k, i in enumerate(diff_idx):
                    v[i] = diff_vals[k]
                return closed(*v, *const_vals)

            _, vjp = jax.vjp(outs_of, [vals[i] for i in diff_idx])
            # cotangent of nxt: carry chain + this step's states_all slice
            g_nxt = gstate_s[:] + gsall_ref[:].reshape(gstate_s.shape)
            w = w_ref[t, 0]
            vw = vw_ref[t, 0]
            g_r = (w * gd_ref[:] + gr_ref[:] + vw * gv_ref[:]).astype(dt)
            grads, = vjp((g_nxt.astype(out_leaves[0].dtype),
                          g_r.reshape(out_leaves[1].shape)))
            for gp, g in zip(gpol_refs, grads[:n_pol]):
                gp[:] += g
            gstate_s[:] = grads[n_pol]
            geps_ref[:] = grads[n_pol + 1].reshape(geps_ref.shape)

        outs = pl.pallas_call(
            bwd_kernel,
            grid=(T,),
            out_shape=tuple(jax.ShapeDtypeStruct(p.shape, p.dtype)
                            for p in padded[:n_pol])
            + (jax.ShapeDtypeStruct((T, B, U), dt),),
            in_specs=[vmem_whole] * (n_rest + n_const)
            + [_blk(jnp.zeros((T, B, D), dt), rev=True),
               _blk(z_mm_t, rev=True), _blk(z_rr_t, rev=True),
               _blk(eps_t, rev=True),
               _blk(jnp.zeros((T, B, D), dt), rev=True),
               vmem_whole, vmem_whole, vmem_whole,
               smem_whole, smem_whole],
            out_specs=tuple(pl.BlockSpec(p.shape, lambda t: (0, 0))
                            for p in padded[:n_pol])
            + (pl.BlockSpec((1, B, U), lambda t: (T - 1 - t, 0, 0)),),
            scratch_shapes=[pltpu.VMEM((B, D), dt)],
            compiler_params=grid_params,
            interpret=interpret,
        )
        return outs, rest, consts, n_pol

    @jax.custom_vjp
    def rollout9(pol_params, x0, z_mm_t, z_rr_t, eps_t, dyn_params,
                 dyn_stats, dyn_noise, pol_noise, w_t, vw_t):
        sall, disc, raw, vret = _fwd_pallas(
            (pol_params, x0, z_mm_t, z_rr_t, eps_t, dyn_params, dyn_stats,
             dyn_noise, pol_noise), w_t, vw_t)
        return disc, raw, vret, sall

    def roll_fwd(*args):
        sall, disc, raw, vret = _fwd_pallas(args[:9], args[9], args[10])
        return (disc, raw, vret, sall), (args, sall)

    def roll_bwd(res, g):
        args, sall = res
        g_disc, g_raw, g_vret, g_sall = [jnp.asarray(x) for x in g]
        (pol_params, x0, z_mm_t, z_rr_t, eps_t, dyn_params, dyn_stats,
         dyn_noise, pol_noise, w_t, vw_t) = args
        x_pre = jnp.concatenate([x0[None], sall[:-1]], 0)
        call, rest, consts, n_pol = _bwd_pallas(args[:9])
        outs = call(*rest, *[_pad2(c) for c in consts],
                    x_pre, z_mm_t, z_rr_t, eps_t, g_sall,
                    g_disc.astype(jnp.float32),
                    g_raw.astype(jnp.float32),
                    g_vret.astype(jnp.float32),
                    _smem_scalar(w_t), _smem_scalar(vw_t))
        pol_flat, pol_tree = jax.tree_util.tree_flatten(pol_params)
        gpol = jax.tree_util.tree_unflatten(
            pol_tree, [o.reshape(p.shape)
                       for o, p in zip(outs[:n_pol], pol_flat)])
        g_eps = outs[n_pol].reshape(eps_t.shape)
        zeros = tuple(jax.tree_util.tree_map(jnp.zeros_like, a)
                      for a in (x0, z_mm_t, z_rr_t))
        ztail = tuple(jax.tree_util.tree_map(jnp.zeros_like, a)
                      for a in (dyn_params, dyn_stats, dyn_noise,
                                pol_noise, w_t, vw_t))
        return (gpol,) + zeros + (g_eps,) + ztail

    rollout9.defvjp(roll_fwd, roll_bwd)
    return rollout9


def make_grid_loss(dyn, pol, steps, w_t, mm_states, mm_rewards, maximize,
                   mm_groups=None, value_update=None, w_H=None,
                   interpret=False):
    """Grid-tier ``(loss, mean_return, aux)`` — contract of
    :func:`make_fused_loss`, built on :func:`make_grid_rollout` (2 kernel
    launches per loss+grad evaluation at any batch size).

    Return accumulation happens IN the forward grid kernel (VMEM
    accumulators); the TD(H) critic refit and terminal bootstrap run as
    plain XLA on the kernel's outputs, exactly like the 'step' tier.
    """
    rollout9 = make_grid_rollout(dyn, pol, steps, mm_states, mm_rewards,
                                 mm_groups=mm_groups, interpret=interpret)
    w_list = [float(w) for w in np.asarray(w_t)]
    if value_update is not None:
        v_wlist = [float(w) for w in np.asarray(value_update.w_t)]
        v_H = value_update.H
        V = value_update.spec

    def loss_fn(*args):
        (pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
         z_mm_t, z_rr_t, action_eps, extras) = _norm_args(args)
        sg = jax.lax.stop_gradient
        vw = np.zeros(steps)
        if value_update is not None:
            vw[:v_H] = v_wlist[:v_H]
        disc, raw, vret, sall = rollout9(
            pol_params, x0, z_mm_t, z_rr_t, action_eps, dyn_params,
            dyn_stats, dyn_noise, pol_noise,
            jnp.asarray(w_list, jnp.float32), jnp.asarray(vw, jnp.float32))

        aux = ()
        if value_update is not None:
            v_params, v_tgt, v_opt, v_stats, v_noise = extras
            sH = sall[v_H - 1]
            vp2, vt2, vo2, v_loss = value_update.core(
                v_params, v_tgt, v_opt, v_stats, sg(x0), sg(sH),
                sg(vret), v_noise)
            v_end = V.apply(jax.tree_util.tree_map(sg, vp2), v_stats,
                            sall[-1], v_noise, return_samples=True)
            disc = disc + float(w_H) * v_end
            aux = (vp2, vt2, vo2, v_loss)

        loss = jnp.mean(disc)
        if maximize:
            loss = -loss
        return loss, jnp.mean(raw), aux

    return loss_fn


def make_grid_value_and_grad(dyn, pol, steps, w_t, mm_states, mm_rewards,
                             maximize, mm_groups=None, value_update=None,
                             w_H=None, interpret=False):
    """Grid-tier counterpart of :func:`make_fused_value_and_grad`."""
    loss_fn = make_grid_loss(dyn, pol, steps, w_t, mm_states, mm_rewards,
                             maximize, mm_groups=mm_groups,
                             value_update=value_update, w_H=w_H,
                             interpret=interpret)

    def fused_vg(*args):
        args = _norm_args(args)

        def lf(pol_params):
            loss, mret, aux = loss_fn(pol_params, *args[1:])
            return loss, (mret, aux)

        (loss, (mret, aux)), grads = jax.value_and_grad(
            lf, has_aux=True)(args[0])
        return loss, mret, grads, aux

    return fused_vg


def prepare_mm_noise(z, steps, B, mm_groups=None):
    """Standardize + cyclically pre-roll fixed MM noise to [T, B, zD].

    Mirrors `utils/rollout.py:213-221` (cholesky path): ungrouped noise is
    standardized once per noise epoch (the standardization commutes with
    the roll); grouped noise is standardized PER GROUP of each rolled
    per-step slice (the roll moves particles across group boundaries, so it
    cannot be hoisted past the grouping — same as the XLA grouped path,
    `ops/moment_matching.py:85-95`).
    """
    from ..moment_matching import standardize_noise
    tb = (np.arange(steps)[:, None] + np.arange(B)[None, :]) % B
    if not mm_groups:
        return standardize_noise(z)[tb]
    zt = z[tb]                                             # [T, B, zD]
    zD = z.shape[-1]
    zt = zt.reshape(steps, mm_groups, B // mm_groups, zD)
    zt = standardize_noise(zt)
    return zt.reshape(steps, B, zD)


# ---------------------------------------------------------------------------
# Support gate
# ---------------------------------------------------------------------------

VMEM_BUDGET_BYTES = 68 * 1024 * 1024
# measured grid-vs-XLA crossover for moment-matched configs (see
# fused_mode): grid wins at B=1000, loses at B=2048 on v5e
GRID_XLA_CROSSOVER_PARTICLES = 1536


def vmem_bytes_estimate(cfg, dyn, pol, value_spec=None, remat=False,
                        mode=None):
    """Estimated VMEM footprint of the backward kernel's in-kernel state.

    The backward kernel holds its linearization residuals on-chip (no HBM
    spill). Measured on v5e: ~11 KB of residuals per particle-step at the
    default [200, 200]+[200, 200] widths and D=5 (B=1000, T=15 demanded
    167 MB against the 128 MB VMEM). Residuals are dominated by the
    per-layer activations/masks of the two MLPs, so the estimate scales
    with total hidden width instead of hard-coding the default shapes
    (round-4 advisor finding: a width-blind particle-step cap under-gates
    wide --dyn_shape/--pol_shape configs).

    ``mode='remat'`` (whole-rollout kernel, in-kernel per-step gradient
    checkpointing): one step's residuals live at a time plus the T
    step-boundary states — but Mosaic's register allocator keeps the
    unrolled steps' activations live anyway and spills them to VMEM
    (measured: 200 MB of spill slots at B=1000), so the auto gate no
    longer admits it (see :func:`fused_mode`). ``mode='step'`` (per-step
    kernels under a scan): the working set really is one step's
    activations for one recompute+vjp, at any batch size.
    """
    if mode is None:
        mode = 'remat' if remat else 'full'
    D_in = pol.mlp.input_dims
    U = pol.mlp.output_dims
    units = (sum(dyn.regressor.mlp.hidden_dims) + sum(pol.mlp.hidden_dims)
             + 4 * (D_in + U))
    if mode in ('step', 'grid'):
        # one step's program in the bwd body (fwd recompute + vjp): the
        # Mosaic stack arena measured 124.4 MB at B=4096 / default widths
        # (units=824) -> ~37 B per particle-unit, no T scaling. Same body
        # for 'step' and 'grid'.
        total = cfg.n_particles * 37.0 * units
    elif mode == 'remat':
        total = (cfg.n_particles * 14.0 * units
                 + 3 * cfg.steps * cfg.n_particles * 4.0 * (D_in + 1))
    else:
        total = cfg.n_particles * cfg.steps * 14.0 * units
    if value_spec is not None and mode != 'step':
        # critic fwd+bwd residuals are per-particle (evaluated at s0/sT
        # only), plus two extra param/opt-state copies. In 'step' mode the
        # critic refit runs as plain XLA between kernels — no kernel cost.
        total += cfg.n_particles * 3 * 14.0 * sum(
            value_spec.mlp.hidden_dims)
        total += 6 * 4.0 * sum(
            a * b for a, b in zip(
                (value_spec.mlp.input_dims,) + value_spec.mlp.hidden_dims,
                value_spec.mlp.hidden_dims + (value_spec.mlp.output_dims,)))
    if cfg.mm_groups:
        D = dyn.state_dims
        GD = cfg.mm_groups * D
        # grouped-MM indicator masks ([GD, B] / [B, GD]) + packed transients
        total += 4.0 * (GD * GD + 3 * GD * cfg.n_particles)
    return total


def supports(cfg, dyn, pol, value_update, mesh, value_spec=None):
    """True when the fused kernel covers this MC-PILCO configuration."""
    return fused_mode(cfg, dyn, pol, value_update, mesh, value_spec) \
        is not None


def fused_mode(cfg, dyn, pol, value_update, mesh, value_spec=None):
    """Which fused-kernel variant covers this configuration.

    Returns ``'full'`` (all T steps' residuals resident in VMEM — the
    small-batch latency-bound regime), ``'remat'`` (per-step in-kernel
    checkpointing for large batches), or ``None`` (XLA rollout path).
    """
    n_shards = 1
    if mesh is not None:
        try:
            n_shards = int(mesh.size)
        except (AttributeError, TypeError):
            return None
        if cfg.n_particles % n_shards:
            return None
        if cfg.mm_states or cfg.mm_rewards:
            # per-shard MM == global MM only for shard-aligned groups
            if not cfg.mm_groups or cfg.mm_groups % n_shards:
                return None
        if value_update is not None:
            # a per-shard critic refit would desynchronize critic replicas
            return None
    if cfg.mm_groups:
        if cfg.n_particles % cfg.mm_groups:
            return None
        if cfg.n_particles // cfg.mm_groups < 2:
            return None  # group size 1: covariance undefined (both paths)
    if value_update is not None:
        if value_spec is None or getattr(value_update, 'core', None) is None:
            return None
        if getattr(cfg, 'val_mask_mode', 'epoch') != 'epoch':
            # 'iter' mode draws fresh critic masks per iteration from a key;
            # the kernel takes the per-epoch noise pytree (reference mode)
            return None
        if value_update.H > cfg.steps:
            return None
    if not (cfg.mm_method == 'cholesky'
            and not cfg.infer_noise_variables
            and cfg.pegasus
            and cfg.cvar_eps == 0.0
            and cfg.reg_weight == 0.0
            and not cfg.with_priorities):
        return None
    if (dyn.regressor.mlp.compute_dtype is not None
            or pol.mlp.compute_dtype is not None):
        # bf16 compute stays on the XLA path: Mosaic rejects sub-32-bit
        # matmul accumulators and bf16 vector comparisons in-kernel
        # ("Target does not support this comparison"), and bf16's win is
        # the bandwidth-bound LARGE-batch regime where XLA already beats
        # the fused tiers (B=4096 no-MM: 104.6M ps/s XLA bf16 end-to-end
        # vs 30.3M fused-grid f32); the latency-bound small-B regime the
        # fused tiers own measures bf16-neutral.
        return None
    local = dataclasses.replace(
        cfg, n_particles=cfg.n_particles // n_shards,
        mm_groups=(cfg.mm_groups // n_shards if cfg.mm_groups else None))
    vspec = value_spec if value_update is not None else None
    if vmem_bytes_estimate(local, dyn, pol, vspec) <= VMEM_BUDGET_BYTES:
        return 'full'
    # NOT 'remat': the whole-rollout checkpointed kernel compiles only up
    # to B*T ~ 4k at default widths (Mosaic's register allocator spills
    # the unrolled steps' activations — 200 MB of VMEM spill slots at
    # B=1000 — and the compile itself takes minutes). The grid tier's
    # kernel body is ONE step's program (grid=(T,), carry in VMEM
    # scratch), so liveness is bounded; 'step' (a scan of per-step
    # kernels) has the same bound but pays ~30 us dispatch per launch,
    # 30x per iteration, and stays force-only.
    #
    # The grid tier is admitted only for MOMENT-MATCHED configs below the
    # measured XLA crossover: fusing the rollout wins by deleting the
    # serial per-step MM chain's op latency, but Mosaic's matmul
    # throughput on this body is below XLA's, so once XLA is
    # compute-bound it wins. v5e measurements (cholesky-MM, f32, default
    # widths): B=1000 grid 19.9M ps/s vs XLA 17.2M (grid wins the
    # latency-bound gap above the 'full' tier); B=2048 grid 23.8M vs XLA
    # 30.7M; B=4096 no-MM grid 30.3M vs XLA 71.7M (XLA wins
    # compute-bound). Pure no-MM configs above the 'full' tier stay on
    # the XLA path outright.
    # Round-5 re-calibration: when the XLA path can take the reward-MM
    # mean-only shortcut (utils.rollout._mm_rewards_batched — valid exactly
    # when no TD critic refit consumes per-particle rewards; CVaR and
    # infer_noise_variables are already gated off above), it beats the grid
    # tier at EVERY batch above the 'full' tier (v5e, cholesky-MM f32:
    # B=512 XLA 14.5M vs grid 12.9M; B=1000 XLA 25.2M vs grid 19.1M), so
    # those configs route to XLA. The grid tier keeps the regime where the
    # XLA path must run the full [T, B, 1] reward resample chain (critic
    # refit on) or where there is no reward MM to shortcut (mm_states-only).
    xla_has_mean_only_shortcut = cfg.mm_rewards and value_update is None
    if ((cfg.mm_states or cfg.mm_rewards)
            and not xla_has_mean_only_shortcut
            and local.n_particles <= GRID_XLA_CROSSOVER_PARTICLES
            and vmem_bytes_estimate(
                local, dyn, pol, vspec, mode='grid') <= VMEM_BUDGET_BYTES):
        return 'grid'
    return None
