"""Parity tests for the Pallas fused rollout+loss kernels (CPU interpret).

Oracle: the existing XLA rollout + the mc_pilco loss math. The fused path
must reproduce loss, mean_return and gradients (pol_params AND action_eps)
bit-near-exactly — it is the same jnp program traced into one kernel.
On TPU the same kernels compile via Mosaic (exercised by bench.py --fused
on, the auto-enabled driver path, and the @pytest.mark.tpu test in
test_fused_tpu.py); these tests pin the semantics.

Round-5 widening coverage: grouped MM (block-diagonal packed cholesky),
learned rewards, the in-kernel TD(H) critic refit + value bootstrap, and
the shard_map fused+mesh composition.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from prob_mbrl_tpu import models
from prob_mbrl_tpu.envs.cartpole import cartpole_reward
from prob_mbrl_tpu.utils.rollout import rollout
from prob_mbrl_tpu.algorithms.mc_pilco import discount_weights
from prob_mbrl_tpu.ops.pallas import fused_rollout as fr
from prob_mbrl_tpu.ops import moment_matching as mm_ops


def small_setup(B=16, T=3, hidden=(8, 8), learn_reward=False):
    D, U = 4, 1
    density = models.DiagGaussianDensity(D + 1 if learn_reward else D)
    dyn_mlp = models.MLPSpec(D + U, density.n_inputs, hidden,
                             dropout=models.cdropout(0.1))
    dyn = models.DynamicsModel(
        regressor=models.Regressor(mlp=dyn_mlp, output_density=density),
        reward_func=None if learn_reward else cartpole_reward())
    pd = models.DiagGaussianDensity(U)
    pol_mlp = models.MLPSpec(D, pd.n_inputs, hidden,
                             dropout=models.bdropout(0.1))
    pol = models.Policy(mlp=pol_mlp, output_density=pd, max_u=(10.0,))
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 7)
    env = dict(
        dyn=dyn, pol=pol, D=D, U=U, B=B, T=T,
        dyn_params=dyn.init(ks[0]), pol_params=pol.init(ks[1]),
        stats=dyn.init_stats(),
        dyn_noise=dyn.sample_noise(ks[2], (B,)),
        pol_noise=pol.sample_noise(ks[3], (B,)),
        z_mm=jax.random.normal(ks[4], (B, D)),
        z_rr=jax.random.normal(ks[5], (B, 1)),
        x0=0.1 * jax.random.normal(ks[6], (B, D)),
        eps=jnp.zeros((T, B, U)))
    return env


def ref_loss(e, pol_params, eps, mm, groups=None):
    traj = rollout(e['x0'], e['dyn'], e['pol'], e['T'], e['dyn_params'],
                   e['stats'], pol_params, e['dyn_noise'], e['pol_noise'],
                   mm_states=mm, mm_rewards=mm, z_mm=e['z_mm'],
                   z_rr=e['z_rr'], mm_groups=groups, action_eps=eps,
                   unroll=e['T'])
    rewards = traj[2]
    w_t, _ = discount_weights(None, e['T'])
    disc = (rewards[..., 0] * w_t[:, None]).sum(0)
    return -jnp.mean(disc), jnp.mean(rewards[..., 0].sum(0))


def prep_noise(e, mm, groups=None):
    zmt = (fr.prepare_mm_noise(e['z_mm'], e['T'], e['B'], groups) if mm
           else jnp.zeros((e['T'], e['B'], e['D'])))
    zrt = (fr.prepare_mm_noise(e['z_rr'], e['T'], e['B'], groups) if mm
           else jnp.zeros((e['T'], e['B'], 1)))
    return zmt, zrt


class TestKernelFriendlyMM:
    def test_mm_resample_matches_ops(self):
        rng = np.random.RandomState(0)
        for D in (1, 4, 5):
            x = jnp.asarray(rng.randn(32, D), jnp.float32)
            z = jnp.asarray(rng.randn(32, D), jnp.float32)
            got = fr._mm_resample_kf(x, mm_ops.standardize_noise(z))
            want = mm_ops.mm_resample(x, z)
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=1e-5, atol=1e-5)

    def test_mm_resample_gradient_matches(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(32, 4), jnp.float32)
        z = mm_ops.standardize_noise(
            jnp.asarray(rng.randn(32, 4), jnp.float32))
        g1 = jax.grad(lambda a: jnp.sum(jnp.sin(
            fr._mm_resample_kf(a, z))))(x)
        g2 = jax.grad(lambda a: jnp.sum(jnp.sin(
            mm_ops.mm_resample(a, z, standardized=True))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5)

    def test_safe_cholesky_rank_deficient_select(self):
        # rank-1 cloud: the escalation must pick a larger jitter, like the
        # original's argmax select
        from prob_mbrl_tpu.ops.math import safe_cholesky
        v = jnp.asarray(np.random.RandomState(2).randn(4, 1), jnp.float32)
        S = v @ v.T
        got = fr._safe_cholesky_kf(S)
        want = safe_cholesky(S)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestGroupedMM:
    @staticmethod
    def _std_grouped(z, G):
        B, D = z.shape
        zr = z.reshape(G, B // G, D)
        return mm_ops.standardize_noise(zr).reshape(B, D)

    @pytest.mark.parametrize('G,D', [(2, 4), (4, 4), (4, 1), (8, 3)])
    def test_grouped_resample_matches_ops(self, G, D):
        rng = np.random.RandomState(3)
        B = 32
        x = jnp.asarray(rng.randn(B, D), jnp.float32)
        z = jnp.asarray(rng.randn(B, D), jnp.float32)
        got = fr._mm_resample_grouped_kf(x, self._std_grouped(z, G), G, {})
        want = mm_ops.grouped(mm_ops.mm_resample, x, z, G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)

    def test_grouped_resample_gradient_matches(self):
        rng = np.random.RandomState(4)
        B, D, G = 32, 4, 4
        x = jnp.asarray(rng.randn(B, D), jnp.float32)
        z = jnp.asarray(rng.randn(B, D), jnp.float32)
        zs = self._std_grouped(z, G)
        g1 = jax.grad(lambda a: jnp.sum(jnp.sin(
            fr._mm_resample_grouped_kf(a, zs, G, {}))))(x)
        g2 = jax.grad(lambda a: jnp.sum(jnp.sin(
            mm_ops.grouped(mm_ops.mm_resample, a, z, G))))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5)

    def test_grouped_cholesky_escalation_per_group(self):
        # one healthy group + one rank-deficient group: the deficient group
        # must escalate to a larger jitter WITHOUT touching the healthy one
        from prob_mbrl_tpu.ops.math import safe_cholesky
        rng = np.random.RandomState(5)
        D = 3
        A = rng.randn(8, D).astype(np.float32)
        S_ok = jnp.asarray(A.T @ A / 8 + 0.5 * np.eye(D, dtype=np.float32))
        v = jnp.asarray(rng.randn(D, 1), jnp.float32)
        S_bad = v @ v.T
        S_packed = jnp.concatenate([S_ok, S_bad], 0)
        L = fr._safe_cholesky_grouped(S_packed, 2, {})
        np.testing.assert_allclose(np.asarray(L[:D]),
                                   np.asarray(safe_cholesky(S_ok)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(L[D:]),
                                   np.asarray(safe_cholesky(S_bad)),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize('mm', [True, False])
class TestFusedLossParity:
    def test_impl_matches_rollout(self, mm):
        e = small_setup()
        w_t, _ = discount_weights(None, e['T'])
        impl = fr.make_loss_impl(e['dyn'], e['pol'], e['T'], w_t, mm, mm,
                                 True)
        zmt, zrt = prep_noise(e, mm)
        li, mi, _ = impl(e['pol_params'], e['x0'], e['dyn_params'],
                         e['stats'], e['dyn_noise'], e['pol_noise'], zmt,
                         zrt, e['eps'])
        lr, mr = ref_loss(e, e['pol_params'], e['eps'], mm)
        np.testing.assert_allclose(float(li), float(lr), rtol=1e-5,
                                   atol=1e-8)
        np.testing.assert_allclose(float(mi), float(mr), rtol=1e-5,
                                   atol=1e-8)

    def test_pallas_interpret_fwd_bwd_parity(self, mm):
        e = small_setup()
        w_t, _ = discount_weights(None, e['T'])
        fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, mm, mm,
                                   True, interpret=True)
        zmt, zrt = prep_noise(e, mm)

        def f_loss(p, eps):
            return fused(p, e['x0'], e['dyn_params'], e['stats'],
                         e['dyn_noise'], e['pol_noise'], zmt, zrt, eps)[:2]

        (lf, mf) = f_loss(e['pol_params'], e['eps'])
        lr, mr = ref_loss(e, e['pol_params'], e['eps'], mm)
        np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(float(mf), float(mr), rtol=1e-5,
                                   atol=1e-7)
        gf = jax.grad(lambda p, ee: f_loss(p, ee)[0],
                      argnums=(0, 1))(e['pol_params'], e['eps'])
        gr = jax.grad(lambda p, ee: ref_loss(e, p, ee, mm)[0],
                      argnums=(0, 1))(e['pol_params'], e['eps'])
        scale = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(lambda a: float(jnp.abs(a).max()),
                                        gr))
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()), gf, gr))
        assert err < 1e-6 + 1e-3 * scale, (err, scale)

    def test_remat_kernel_parity(self, mm):
        # the large-batch variant: per-step jax.checkpoint INSIDE the
        # kernel. Same math, different residual schedule — loss and grads
        # must match the XLA oracle exactly like the full-residual kernel.
        e = small_setup()
        w_t, _ = discount_weights(None, e['T'])
        fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, mm, mm,
                                   True, remat=True, interpret=True)
        zmt, zrt = prep_noise(e, mm)

        def f_loss(p):
            return fused(p, e['x0'], e['dyn_params'], e['stats'],
                         e['dyn_noise'], e['pol_noise'], zmt, zrt,
                         e['eps'])[0]

        lf = f_loss(e['pol_params'])
        lr, _ = ref_loss(e, e['pol_params'], e['eps'], mm)
        np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5,
                                   atol=1e-7)
        gf = jax.grad(f_loss)(e['pol_params'])
        gr = jax.grad(lambda p: ref_loss(e, p, e['eps'], mm)[0])(
            e['pol_params'])
        scale = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(lambda a: float(jnp.abs(a).max()),
                                        gr))
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()), gf, gr))
        assert err < 1e-6 + 1e-3 * scale, (err, scale)

    def test_mean_return_cotangent_flows(self, mm):
        # round-4 advisor finding: the bwd kernel used to silently drop the
        # mean_return cotangent. grad through mean_return must now match
        # the XLA oracle instead of returning loss-only gradients.
        e = small_setup()
        w_t, _ = discount_weights(None, e['T'])
        fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, mm, mm,
                                   True, interpret=True)
        zmt, zrt = prep_noise(e, mm)
        gf = jax.grad(lambda p: fused(
            p, e['x0'], e['dyn_params'], e['stats'], e['dyn_noise'],
            e['pol_noise'], zmt, zrt, e['eps'])[1])(e['pol_params'])
        gr = jax.grad(lambda p: ref_loss(e, p, e['eps'], mm)[1])(
            e['pol_params'])
        scale = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(lambda a: float(jnp.abs(a).max()),
                                        gr))
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()), gf, gr))
        assert scale > 0  # the oracle gradient is nonzero
        assert err < 1e-6 + 1e-3 * scale, (err, scale)


class TestFusedGroupedParity:
    @pytest.mark.parametrize('G', [2, 4])
    def test_grouped_impl_and_kernel_match_rollout(self, G):
        # B=32 keeps every group's covariance full-rank (group size > D);
        # degenerate groups escalate to sqrt(jitter)-dominated factors where
        # f32 reassociation noise swamps a bitwise-parity tolerance
        e = small_setup(B=32)
        w_t, _ = discount_weights(None, e['T'])
        fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, True,
                                   True, True, mm_groups=G, interpret=True)
        zmt, zrt = prep_noise(e, True, G)

        def f_loss(p, eps):
            return fused(p, e['x0'], e['dyn_params'], e['stats'],
                         e['dyn_noise'], e['pol_noise'], zmt, zrt, eps)[:2]

        lf, mf = f_loss(e['pol_params'], e['eps'])
        lr, mr = ref_loss(e, e['pol_params'], e['eps'], True, groups=G)
        np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(float(mf), float(mr), rtol=1e-5,
                                   atol=1e-7)
        gf = jax.grad(lambda p, ee: f_loss(p, ee)[0],
                      argnums=(0, 1))(e['pol_params'], e['eps'])
        gr = jax.grad(lambda p, ee: ref_loss(e, p, ee, True, G)[0],
                      argnums=(0, 1))(e['pol_params'], e['eps'])
        scale = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(lambda a: float(jnp.abs(a).max()),
                                        gr))
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()), gf, gr))
        assert err < 1e-6 + 1e-3 * scale, (err, scale)


class TestFusedLearnedReward:
    def test_learned_reward_matches_rollout(self):
        e = small_setup(learn_reward=True)
        w_t, _ = discount_weights(None, e['T'])
        for mm in (False, True):
            fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, mm,
                                       mm, True, interpret=True)
            zmt, zrt = prep_noise(e, mm)

            def f_loss(p):
                return fused(p, e['x0'], e['dyn_params'], e['stats'],
                             e['dyn_noise'], e['pol_noise'], zmt, zrt,
                             e['eps'])[0]

            lf = f_loss(e['pol_params'])
            lr, _ = ref_loss(e, e['pol_params'], e['eps'], mm)
            np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5,
                                       atol=1e-7)
            gf = jax.grad(f_loss)(e['pol_params'])
            gr = jax.grad(lambda p: ref_loss(e, p, e['eps'], mm)[0])(
                e['pol_params'])
            err = jax.tree_util.tree_reduce(
                max, jax.tree_util.tree_map(
                    lambda a, b: float(jnp.abs(a - b).max()), gf, gr))
            assert err < 1e-4, err


def _value_pieces(e, use_density=False):
    from prob_mbrl_tpu.algorithms.value import make_value_update_fn
    v_density = models.DiagGaussianDensity(1) if use_density else None
    v_mlp = models.MLPSpec(e['D'], v_density.n_inputs if v_density else 1,
                           (8, 8), dropout=models.cdropout(0.1))
    V = models.Regressor(mlp=v_mlp, output_density=v_density)
    v_opt = optax.adam(1e-3)
    v_params = V.init(jax.random.PRNGKey(9))
    update = make_value_update_fn(V, v_opt, e['T'], use_density=use_density,
                                  polyak=1.0)
    state = dict(params=v_params, target=v_params,
                 opt_state=v_opt.init(v_params))
    return V, update, state


class TestFusedValueParity:
    @pytest.mark.parametrize('use_density', [False, True])
    def test_opt_with_value_matches_unfused(self, use_density):
        # the full with-value iteration — TD(H) critic refit + terminal
        # bootstrap — through the fused kernel vs the XLA path
        from prob_mbrl_tpu.algorithms.mc_pilco import (MCPILCOConfig,
                                                       make_mc_pilco_fn)
        e = small_setup()
        opt_ = optax.adam(1e-3)
        x0_pool = jnp.tile(e['x0'], (2, 1))
        V, update, state0 = _value_pieces(e, use_density)
        outs = {}
        for fused in (False, True):
            cfg = MCPILCOConfig(n_particles=e['B'], steps=e['T'],
                                fused_rollout=fused)
            opt = make_mc_pilco_fn(e['dyn'], e['pol'], cfg, opt_,
                                   value_spec=V, value_update=update)
            p, s, m, n, vc = opt(
                e['pol_params'], opt_.init(e['pol_params']),
                e['dyn_params'], e['stats'], x0_pool,
                jax.random.PRNGKey(5), 0, 4,
                value_params=state0['params'],
                value_stats=V.init_stats(),
                value_target=state0['target'],
                value_opt_state=state0['opt_state'])
            outs[fused] = (np.asarray(m['loss']), np.asarray(m['v_loss']),
                           jax.tree_util.tree_map(np.asarray, vc[0]))
        np.testing.assert_allclose(outs[True][0], outs[False][0],
                                   rtol=2e-3, atol=1e-6)
        np.testing.assert_allclose(outs[True][1], outs[False][1],
                                   rtol=2e-3, atol=1e-6)
        # final critic params must match too (the in-kernel optax update)
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(np.abs(a - b).max()),
                outs[True][2], outs[False][2]))
        assert err < 1e-4, err


@pytest.mark.parametrize('mm', [True, False])
class TestStepwiseParity:
    # the large-batch production tier: one fused kernel PER STEP under a
    # lax.scan (bounded VMEM at any B; replaces the compile-fragile
    # whole-rollout remat kernel in the auto gate)
    def test_stepwise_loss_and_grads_match_oracle(self, mm):
        e = small_setup()
        w_t, _ = discount_weights(None, e['T'])
        fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, mm, mm,
                                   True, interpret=True, mode='step')
        zmt, zrt = prep_noise(e, mm)

        def f_loss(p, eps):
            return fused(p, e['x0'], e['dyn_params'], e['stats'],
                         e['dyn_noise'], e['pol_noise'], zmt, zrt, eps)[:2]

        lf, mf = f_loss(e['pol_params'], e['eps'])
        lr, mr = ref_loss(e, e['pol_params'], e['eps'], mm)
        np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(float(mf), float(mr), rtol=1e-5,
                                   atol=1e-7)
        # grads wrt pol_params AND action_eps, through loss AND mean_return
        # (the step custom_vjp chains state cotangents through the scan)
        gf = jax.grad(lambda p, ee: sum(f_loss(p, ee)),
                      argnums=(0, 1))(e['pol_params'], e['eps'])
        gr = jax.grad(lambda p, ee: sum(ref_loss(e, p, ee, mm)),
                      argnums=(0, 1))(e['pol_params'], e['eps'])
        scale = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(lambda a: float(jnp.abs(a).max()),
                                        gr))
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()), gf, gr))
        assert err < 1e-6 + 1e-3 * scale, (err, scale)

    def test_stepwise_value_and_grad_matches_monolithic(self, mm):
        e = small_setup()
        w_t, _ = discount_weights(None, e['T'])
        zmt, zrt = prep_noise(e, mm)
        args = (e['pol_params'], e['x0'], e['dyn_params'], e['stats'],
                e['dyn_noise'], e['pol_noise'], zmt, zrt, e['eps'])
        out = {}
        for mode in ('full', 'step'):
            vg = fr.make_fused_value_and_grad(
                e['dyn'], e['pol'], e['T'], w_t, mm, mm, True,
                interpret=True, mode=mode)
            loss, mret, grads, _ = vg(*args)
            out[mode] = (float(loss), float(mret), grads)
        np.testing.assert_allclose(out['step'][0], out['full'][0],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(out['step'][1], out['full'][1],
                                   rtol=1e-5, atol=1e-7)
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()),
                out['step'][2], out['full'][2]))
        assert err < 1e-5, err


@pytest.mark.parametrize('mm', [True, False])
class TestGridParity:
    # the grid tier: whole rollout as ONE pallas_call with grid=(T,) and
    # the carry in VMEM scratch — 2 launches per loss+grad at any B
    # (the per-step-kernel 'step' tier pays ~30 us dispatch per launch,
    # 30x per iteration; the grid pays it twice)
    def test_grid_loss_and_grads_match_oracle(self, mm):
        e = small_setup()
        w_t, _ = discount_weights(None, e['T'])
        fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, mm, mm,
                                   True, interpret=True, mode='grid')
        zmt, zrt = prep_noise(e, mm)

        def f_loss(p, eps):
            return fused(p, e['x0'], e['dyn_params'], e['stats'],
                         e['dyn_noise'], e['pol_noise'], zmt, zrt, eps)[:2]

        lf, mf = f_loss(e['pol_params'], e['eps'])
        lr, mr = ref_loss(e, e['pol_params'], e['eps'], mm)
        np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5,
                                   atol=1e-7)
        np.testing.assert_allclose(float(mf), float(mr), rtol=1e-5,
                                   atol=1e-7)
        gf = jax.grad(lambda p, ee: sum(f_loss(p, ee)),
                      argnums=(0, 1))(e['pol_params'], e['eps'])
        gr = jax.grad(lambda p, ee: sum(ref_loss(e, p, ee, mm)),
                      argnums=(0, 1))(e['pol_params'], e['eps'])
        scale = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(lambda a: float(jnp.abs(a).max()),
                                        gr))
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()), gf, gr))
        assert err < 1e-6 + 1e-3 * scale, (err, scale)

    def test_grid_value_and_grad_matches_monolithic(self, mm):
        e = small_setup()
        w_t, _ = discount_weights(None, e['T'])
        zmt, zrt = prep_noise(e, mm)
        args = (e['pol_params'], e['x0'], e['dyn_params'], e['stats'],
                e['dyn_noise'], e['pol_noise'], zmt, zrt, e['eps'])
        out = {}
        for mode in ('full', 'grid'):
            vg = fr.make_fused_value_and_grad(
                e['dyn'], e['pol'], e['T'], w_t, mm, mm, True,
                interpret=True, mode=mode)
            loss, mret, grads, _ = vg(*args)
            out[mode] = (float(loss), float(mret), grads)
        np.testing.assert_allclose(out['grid'][0], out['full'][0],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(out['grid'][1], out['full'][1],
                                   rtol=1e-5, atol=1e-7)
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()),
                out['grid'][2], out['full'][2]))
        assert err < 1e-5, err


class TestGridVariants:
    def test_grid_grouped_matches_oracle(self):
        e = small_setup(B=32)
        G = 4
        w_t, _ = discount_weights(None, e['T'])
        fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, True,
                                   True, True, mm_groups=G, interpret=True,
                                   mode='grid')
        zmt, zrt = prep_noise(e, True, G)
        lf = fused(e['pol_params'], e['x0'], e['dyn_params'], e['stats'],
                   e['dyn_noise'], e['pol_noise'], zmt, zrt, e['eps'])[0]
        lr, _ = ref_loss(e, e['pol_params'], e['eps'], True, groups=G)
        np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5,
                                   atol=1e-7)

    def test_grid_learned_reward_matches_oracle(self):
        e = small_setup(learn_reward=True)
        w_t, _ = discount_weights(None, e['T'])
        zmt, zrt = prep_noise(e, True)
        out = {}
        for mode in ('full', 'grid'):
            fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t,
                                       True, True, True, interpret=True,
                                       mode=mode)
            out[mode] = float(fused(
                e['pol_params'], e['x0'], e['dyn_params'], e['stats'],
                e['dyn_noise'], e['pol_noise'], zmt, zrt, e['eps'])[0])
        np.testing.assert_allclose(out['grid'], out['full'], rtol=1e-5,
                                   atol=1e-7)

    def test_grid_value_matches_monolithic(self):
        e = small_setup()
        w_t, w_H = discount_weights(None, e['T'])
        V, update, state0 = _value_pieces(e, False)
        zmt, zrt = prep_noise(e, False)
        v_noise = V.sample_noise(jax.random.PRNGKey(9), (e['B'],))
        extras = (state0['params'], state0['target'], state0['opt_state'],
                  V.init_stats(), v_noise)
        out = {}
        for mode in ('full', 'grid'):
            vg = fr.make_fused_value_and_grad(
                e['dyn'], e['pol'], e['T'], w_t, False, False, True,
                value_update=update, w_H=w_H, interpret=True, mode=mode)
            loss, mret, grads, aux = vg(
                e['pol_params'], e['x0'], e['dyn_params'], e['stats'],
                e['dyn_noise'], e['pol_noise'], zmt, zrt, e['eps'], extras)
            out[mode] = (float(loss), float(aux[3]),
                         jax.tree_util.tree_map(np.asarray, aux[0]), grads)
        np.testing.assert_allclose(out['grid'][0], out['full'][0],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(out['grid'][1], out['full'][1],
                                   rtol=1e-5, atol=1e-6)
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(np.abs(a - b).max()),
                out['grid'][2], out['full'][2]))
        assert err < 1e-5, err
        gerr = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()),
                out['grid'][3], out['full'][3]))
        assert gerr < 1e-5, gerr


class TestStepwiseVariants:
    def test_stepwise_grouped_matches_oracle(self):
        # B=32: group size > D keeps every group full-rank (see
        # TestFusedGroupedParity for why degenerate groups need looser tols)
        e = small_setup(B=32)
        G = 4
        w_t, _ = discount_weights(None, e['T'])
        fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, True,
                                   True, True, mm_groups=G, interpret=True,
                                   mode='step')
        zmt, zrt = prep_noise(e, True, G)
        lf = fused(e['pol_params'], e['x0'], e['dyn_params'], e['stats'],
                   e['dyn_noise'], e['pol_noise'], zmt, zrt, e['eps'])[0]
        lr, _ = ref_loss(e, e['pol_params'], e['eps'], True, groups=G)
        np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5,
                                   atol=1e-7)

    def test_stepwise_learned_reward_matches_oracle(self):
        e = small_setup(learn_reward=True)
        w_t, _ = discount_weights(None, e['T'])
        zmt, zrt = prep_noise(e, True)
        out = {}
        for mode in ('full', 'step'):
            fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t,
                                       True, True, True, interpret=True,
                                       mode=mode)
            out[mode] = float(fused(
                e['pol_params'], e['x0'], e['dyn_params'], e['stats'],
                e['dyn_noise'], e['pol_noise'], zmt, zrt, e['eps'])[0])
        np.testing.assert_allclose(out['step'], out['full'], rtol=1e-5,
                                   atol=1e-7)

    def test_stepwise_value_matches_monolithic(self):
        # TD(H) critic refit: XLA-side in the step tier, in-kernel in the
        # monolithic tier — same (loss, v_loss, critic params) either way
        e = small_setup()
        w_t, w_H = discount_weights(None, e['T'])
        V, update, state0 = _value_pieces(e, False)
        zmt, zrt = prep_noise(e, False)
        v_noise = V.sample_noise(jax.random.PRNGKey(9), (e['B'],))
        extras = (state0['params'], state0['target'], state0['opt_state'],
                  V.init_stats(), v_noise)
        out = {}
        for mode in ('full', 'step'):
            vg = fr.make_fused_value_and_grad(
                e['dyn'], e['pol'], e['T'], w_t, False, False, True,
                value_update=update, w_H=w_H, interpret=True, mode=mode)
            loss, mret, grads, aux = vg(
                e['pol_params'], e['x0'], e['dyn_params'], e['stats'],
                e['dyn_noise'], e['pol_noise'], zmt, zrt, e['eps'], extras)
            out[mode] = (float(loss), float(aux[3]),
                         jax.tree_util.tree_map(np.asarray, aux[0]), grads)
        np.testing.assert_allclose(out['step'][0], out['full'][0],
                                   rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(out['step'][1], out['full'][1],
                                   rtol=1e-5, atol=1e-6)
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(np.abs(a - b).max()),
                out['step'][2], out['full'][2]))
        assert err < 1e-5, err
        gerr = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()),
                out['step'][3], out['full'][3]))
        assert gerr < 1e-5, gerr


class TestMCPILCOFusedIntegration:
    def test_opt_runs_and_matches_unfused(self):
        # one optimizer chunk with fused_rollout=True (interpret) vs False:
        # same seeds, loss curves must track closely
        from prob_mbrl_tpu.algorithms.mc_pilco import (MCPILCOConfig,
                                                       make_mc_pilco_fn)
        e = small_setup()
        opt_ = optax.adam(1e-3)
        x0_pool = jnp.tile(e['x0'], (2, 1))
        outs = {}
        for fused in (False, True):
            cfg = MCPILCOConfig(n_particles=e['B'], steps=e['T'],
                                mm_states=True, mm_rewards=True,
                                fused_rollout=fused)
            opt = make_mc_pilco_fn(e['dyn'], e['pol'], cfg, opt_)
            p, s, m, n = opt(e['pol_params'], opt_.init(e['pol_params']),
                             e['dyn_params'], e['stats'], x0_pool,
                             jax.random.PRNGKey(5), 0, 4)
            outs[fused] = np.asarray(m['loss'])
        np.testing.assert_allclose(outs[True], outs[False], rtol=1e-3,
                                   atol=1e-6)

    def test_opt_grouped_matches_unfused(self):
        from prob_mbrl_tpu.algorithms.mc_pilco import (MCPILCOConfig,
                                                       make_mc_pilco_fn)
        e = small_setup()
        opt_ = optax.adam(1e-3)
        x0_pool = jnp.tile(e['x0'], (2, 1))
        outs = {}
        for fused in (False, True):
            cfg = MCPILCOConfig(n_particles=e['B'], steps=e['T'],
                                mm_states=True, mm_rewards=True,
                                mm_groups=4, fused_rollout=fused)
            opt = make_mc_pilco_fn(e['dyn'], e['pol'], cfg, opt_)
            p, s, m, n = opt(e['pol_params'], opt_.init(e['pol_params']),
                             e['dyn_params'], e['stats'], x0_pool,
                             jax.random.PRNGKey(5), 0, 4)
            outs[fused] = np.asarray(m['loss'])
        np.testing.assert_allclose(outs[True], outs[False], rtol=1e-3,
                                   atol=1e-6)


class TestFusedSharded:
    def test_fused_mesh_matches_single_device(self):
        # fused + shard_map over a 4-device virtual mesh with shard-local
        # MM groups == the single-device fused program (and the XLA path)
        from prob_mbrl_tpu import parallel
        from prob_mbrl_tpu.algorithms.mc_pilco import (MCPILCOConfig,
                                                       make_mc_pilco_fn)
        e = small_setup()
        opt_ = optax.adam(1e-3)
        x0_pool = jnp.tile(e['x0'], (2, 1))
        mesh = parallel.make_mesh(4)
        outs = {}
        for name, (fused, m_) in dict(
                sharded=(True, mesh), single=(True, None),
                xla=(False, None)).items():
            cfg = MCPILCOConfig(n_particles=e['B'], steps=e['T'],
                                mm_states=True, mm_rewards=True,
                                mm_groups=4, fused_rollout=fused)
            opt = make_mc_pilco_fn(e['dyn'], e['pol'], cfg, opt_, mesh=m_)
            p, s, m, n = opt(e['pol_params'], opt_.init(e['pol_params']),
                             e['dyn_params'], e['stats'], x0_pool,
                             jax.random.PRNGKey(5), 0, 4)
            outs[name] = np.asarray(m['loss'])
        # rtol 1e-3: the per-shard matmuls accumulate in a different order
        # than the single-device ones, and the grouped cholesky amplifies
        # that reassociation noise through 4 compounding Adam iterations
        # (observed flake at rtol=1e-4: 2e-6 abs on a 2.5e-3 loss at iter 4)
        np.testing.assert_allclose(outs['sharded'], outs['single'],
                                   rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(outs['sharded'], outs['xla'],
                                   rtol=1e-3, atol=1e-6)

    def test_fused_mesh_no_mm(self):
        from prob_mbrl_tpu import parallel
        from prob_mbrl_tpu.algorithms.mc_pilco import (MCPILCOConfig,
                                                       make_mc_pilco_fn)
        e = small_setup()
        opt_ = optax.adam(1e-3)
        x0_pool = jnp.tile(e['x0'], (2, 1))
        mesh = parallel.make_mesh(4)
        outs = {}
        for name, m_ in dict(sharded=mesh, single=None).items():
            cfg = MCPILCOConfig(n_particles=e['B'], steps=e['T'],
                                fused_rollout=True)
            opt = make_mc_pilco_fn(e['dyn'], e['pol'], cfg, opt_, mesh=m_)
            p, s, m, n = opt(e['pol_params'], opt_.init(e['pol_params']),
                             e['dyn_params'], e['stats'], x0_pool,
                             jax.random.PRNGKey(5), 0, 4)
            outs[name] = np.asarray(m['loss'])
        np.testing.assert_allclose(outs['sharded'], outs['single'],
                                   rtol=1e-4, atol=1e-7)


class TestSupportsGate:
    def test_gating(self):
        from prob_mbrl_tpu import parallel
        from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig
        e = small_setup()
        base = dict(mm_states=True, mm_rewards=True)
        ok = MCPILCOConfig(n_particles=100, steps=15, **base)
        assert fr.supports(ok, e['dyn'], e['pol'], None, None)
        # bf16 compute stays on the XLA path (Mosaic rejects sub-32-bit
        # matmul acc / bf16 vector compares in-kernel; see fused_mode)
        bf = small_setup()
        import dataclasses as dc
        bf_pol = dc.replace(bf['pol'],
                            mlp=dc.replace(bf['pol'].mlp,
                                           compute_dtype='bfloat16'))
        assert fr.fused_mode(ok, bf['dyn'], bf_pol, None, None) is None
        # pure no-MM above the 'full' tier stays on XLA (compute-bound
        # matmul chain — XLA measures 2.4x faster than the grid kernel)
        nomm_big = MCPILCOConfig(n_particles=1024, steps=15)
        prod0 = small_setup(hidden=(200, 200))
        assert fr.fused_mode(nomm_big, prod0['dyn'], prod0['pol'], None,
                             None) is None
        # VMEM tiers at PRODUCTION widths: small B rides the full-residual
        # kernel, mid-size MM batches the grid kernel, large B falls back
        prod = small_setup(hidden=(200, 200))
        assert fr.fused_mode(ok, prod['dyn'], prod['pol'], None,
                             None) == 'full'
        # round-5 re-calibration: with CVaR off and no critic refit the XLA
        # path takes the reward-MM mean-only shortcut and beats the grid
        # tier at every batch above 'full' (B=512: 14.5M vs 12.9M; B=1000:
        # 25.2M vs 19.1M) — these configs now route to XLA
        big = MCPILCOConfig(n_particles=1024, steps=15, **base)
        assert fr.fused_mode(big, prod['dyn'], prod['pol'], None,
                             None) is None
        # ...but the grid tier keeps mm_states-only configs (no reward MM
        # to shortcut on the XLA side)
        big_so = MCPILCOConfig(n_particles=1024, steps=15, mm_states=True)
        assert fr.fused_mode(big_so, prod['dyn'], prod['pol'], None,
                             None) == 'grid'
        # above the measured grid-vs-XLA crossover the compute-bound XLA
        # path wins (see fused_mode) — fall back
        huge = MCPILCOConfig(n_particles=4096, steps=15, **base)
        assert fr.fused_mode(huge, prod['dyn'], prod['pol'], None,
                             None) is None
        # width-aware gate (round-4 advisor finding): the same B*T with
        # much wider MLPs must leave the full-residual tier
        wide = small_setup(hidden=(2048, 2048))
        mid = MCPILCOConfig(n_particles=1024, steps=15, **base)
        assert fr.fused_mode(mid, e['dyn'], e['pol'], None, None) == 'full'
        assert fr.fused_mode(mid, wide['dyn'], wide['pol'], None,
                             None) != 'full'
        # unsupported features fall back
        for kw in (dict(mm_method='mix'), dict(cvar_eps=0.3),
                   dict(with_priorities=True),
                   dict(pegasus=False), dict(reg_weight=0.1)):
            cfg = MCPILCOConfig(n_particles=100, steps=15, **base, **kw)
            assert not fr.supports(cfg, e['dyn'], e['pol'], None, None), kw
        # grouped MM is now fused (round 5) — but not group size < 2
        grp = MCPILCOConfig(n_particles=100, steps=15, **base, mm_groups=4)
        assert fr.supports(grp, e['dyn'], e['pol'], None, None)
        tiny = MCPILCOConfig(n_particles=4, steps=15, **base, mm_groups=4)
        assert not fr.supports(tiny, e['dyn'], e['pol'], None, None)
        # value bootstrap is fused when the update exposes its core and the
        # critic spec is given; 'iter' mask mode stays on the XLA path
        V, update, _ = _value_pieces(e)
        okv = MCPILCOConfig(n_particles=100, steps=15)
        assert fr.supports(okv, e['dyn'], e['pol'], update, None, V)
        assert not fr.supports(okv, e['dyn'], e['pol'], update, None, None)
        assert not fr.supports(okv, e['dyn'], e['pol'], object(), None, V)
        it = dataclasses.replace(okv, val_mask_mode='iter')
        assert not fr.supports(it, e['dyn'], e['pol'], update, None, V)
        # meshes: fused only with shard-aligned groups (or no MM); a bogus
        # mesh object falls back
        mesh = parallel.make_mesh(4)
        assert fr.supports(grp, e['dyn'], e['pol'], None, mesh)
        assert not fr.supports(ok, e['dyn'], e['pol'], None, mesh)  # no grp
        nomm = MCPILCOConfig(n_particles=100, steps=15)
        assert fr.supports(nomm, e['dyn'], e['pol'], None, mesh)
        odd = MCPILCOConfig(n_particles=102, steps=15)
        assert not fr.supports(odd, e['dyn'], e['pol'], None, mesh)
        grp6 = MCPILCOConfig(n_particles=96, steps=15, **base, mm_groups=6)
        assert not fr.supports(grp6, e['dyn'], e['pol'], None, mesh)
        assert not fr.supports(ok, e['dyn'], e['pol'], None, object())
        # value + mesh stays on the XLA path (critic would desynchronize)
        assert not fr.supports(okv, e['dyn'], e['pol'], update, mesh, V)
        # learned reward (no analytic fn) IS fused since round 5
        el = small_setup(learn_reward=True)
        assert fr.supports(ok, el['dyn'], el['pol'], None, None)


class TestFusedMeanOnlyRewardMM:
    """In-kernel reward-MM mean-only shortcut (round 5, BASELINE.md).

    Same invariance as utils.rollout._mm_rewards_batched: with the loss a
    plain particle mean, replacing the reward resample by its per-step
    (per-group) mean changes nothing observable. The kernel flag defaults
    OFF (directly-constructed kernels stay reference-exact); mc_pilco turns
    it on when CVaR and the TD critic refit are off. Measured on-chip:
    headline B=100 cholesky 5.17M -> 5.61M ps/s.
    """

    def _xla_mean_only_loss(self, e, pol_params, eps, groups=None):
        traj = rollout(e['x0'], e['dyn'], e['pol'], e['T'], e['dyn_params'],
                       e['stats'], pol_params, e['dyn_noise'],
                       e['pol_noise'], mm_states=True, mm_rewards=True,
                       z_mm=e['z_mm'], z_rr=e['z_rr'], mm_groups=groups,
                       action_eps=eps, unroll=e['T'],
                       mm_rewards_mean_only=True)
        rewards = traj[2]
        w_t, _ = discount_weights(None, e['T'])
        return -jnp.mean((rewards[..., 0] * w_t[:, None]).sum(0))

    @pytest.mark.parametrize('groups', [None, 4])
    def test_interpret_parity_vs_xla_mean_only(self, groups):
        # B=32 keeps every group's covariance full-rank (see
        # TestFusedGroupedParity: degenerate groups escalate to
        # jitter-dominated factors where reassociation noise dominates)
        e = small_setup(B=32 if groups else 16)
        w_t, _ = discount_weights(None, e['T'])
        fused = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, True,
                                   True, True, mm_groups=groups,
                                   interpret=True,
                                   mm_rewards_mean_only=True)
        zmt, zrt = prep_noise(e, True, groups)

        def f_loss(p):
            return fused(p, e['x0'], e['dyn_params'], e['stats'],
                         e['dyn_noise'], e['pol_noise'], zmt, zrt,
                         e['eps'])[0]

        lf = f_loss(e['pol_params'])
        lr = self._xla_mean_only_loss(e, e['pol_params'], e['eps'], groups)
        np.testing.assert_allclose(float(lf), float(lr), rtol=1e-5,
                                   atol=1e-7)
        gf = jax.grad(f_loss)(e['pol_params'])
        gr = jax.grad(lambda p: self._xla_mean_only_loss(
            e, p, e['eps'], groups))(e['pol_params'])
        scale = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(lambda a: float(jnp.abs(a).max()),
                                        gr))
        err = jax.tree_util.tree_reduce(
            max, jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).max()), gf, gr))
        assert err < 1e-6 + 1e-3 * scale, (err, scale)

    def test_mean_only_close_to_full_resample(self):
        # the shortcut's loss equals the full-resample loss to float noise
        e = small_setup()
        w_t, _ = discount_weights(None, e['T'])
        fused_on = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t, True,
                                      True, True, interpret=True,
                                      mm_rewards_mean_only=True)
        fused_off = fr.make_fused_loss(e['dyn'], e['pol'], e['T'], w_t,
                                       True, True, True, interpret=True)
        zmt, zrt = prep_noise(e, True)
        args = (e['pol_params'], e['x0'], e['dyn_params'], e['stats'],
                e['dyn_noise'], e['pol_noise'], zmt, zrt, e['eps'])
        np.testing.assert_allclose(float(fused_on(*args)[0]),
                                   float(fused_off(*args)[0]),
                                   rtol=1e-5, atol=1e-5)
