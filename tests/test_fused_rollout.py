"""Parity tests for the Pallas fused rollout+loss kernels (CPU interpret).

Oracle: the existing XLA rollout + the mc_pilco loss math. The fused path
must reproduce loss, mean_return and gradients (pol_params AND action_eps)
bit-near-exactly — it is the same jnp program traced into one kernel.
On TPU the same kernels compile via Mosaic (exercised by bench.py --fused
on and the auto-enabled driver path); these tests pin the semantics.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prob_mbrl_tpu import models
from prob_mbrl_tpu.envs.cartpole import cartpole_reward
from prob_mbrl_tpu.utils.rollout import rollout
from prob_mbrl_tpu.algorithms.mc_pilco import discount_weights
from prob_mbrl_tpu.ops.pallas import fused_rollout as fr
from prob_mbrl_tpu.ops import moment_matching as mm_ops


def small_setup(B=16, T=3, hidden=(8, 8)):
    D, U = 4, 1
    density = models.DiagGaussianDensity(D)
    dyn_mlp = models.MLPSpec(D + U, density.n_inputs, hidden,
                             dropout=models.cdropout(0.1))
    dyn = models.DynamicsModel(
        regressor=models.Regressor(mlp=dyn_mlp, output_density=density),
        reward_func=cartpole_reward())
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


def ref_loss(e, pol_params, eps, mm):
    traj = rollout(e['x0'], e['dyn'], e['pol'], e['T'], e['dyn_params'],
                   e['stats'], pol_params, e['dyn_noise'], e['pol_noise'],
                   mm_states=mm, mm_rewards=mm, z_mm=e['z_mm'],
                   z_rr=e['z_rr'], action_eps=eps, unroll=e['T'])
    rewards = traj[2]
    w_t, _ = discount_weights(None, e['T'])
    disc = (rewards[..., 0] * w_t[:, None]).sum(0)
    return -jnp.mean(disc), jnp.mean(rewards[..., 0].sum(0))


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


@pytest.mark.parametrize('mm', [True, False])
class TestFusedLossParity:
    def test_impl_matches_rollout(self, mm):
        e = small_setup()
        w_t, _ = discount_weights(None, e['T'])
        impl = fr.make_loss_impl(e['dyn'], e['pol'], e['T'], w_t, mm, mm,
                                 True)
        zmt = (fr.prepare_mm_noise(e['z_mm'], e['T'], e['B']) if mm
               else jnp.zeros((e['T'], e['B'], e['D'])))
        zrt = (fr.prepare_mm_noise(e['z_rr'], e['T'], e['B']) if mm
               else jnp.zeros((e['T'], e['B'], 1)))
        li, mi = impl(e['pol_params'], e['x0'], e['dyn_params'], e['stats'],
                      e['dyn_noise'], e['pol_noise'], zmt, zrt, e['eps'])
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
        zmt = (fr.prepare_mm_noise(e['z_mm'], e['T'], e['B']) if mm
               else jnp.zeros((e['T'], e['B'], e['D'])))
        zrt = (fr.prepare_mm_noise(e['z_rr'], e['T'], e['B']) if mm
               else jnp.zeros((e['T'], e['B'], 1)))

        def f_loss(p, eps):
            return fused(p, e['x0'], e['dyn_params'], e['stats'],
                         e['dyn_noise'], e['pol_noise'], zmt, zrt, eps)

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


class TestMCPILCOFusedIntegration:
    def test_opt_runs_and_matches_unfused(self):
        # one optimizer chunk with fused_rollout=True (interpret) vs False:
        # same seeds, loss curves must track closely
        from prob_mbrl_tpu.algorithms.mc_pilco import (MCPILCOConfig,
                                                       make_mc_pilco_fn)
        import optax
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


class TestSupportsGate:
    def test_gating(self):
        from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig
        e = small_setup()
        base = dict(mm_states=True, mm_rewards=True)
        ok = MCPILCOConfig(n_particles=100, steps=15, **base)
        assert fr.supports(ok, e['dyn'], e['pol'], None, None)
        # VMEM ceiling: large B*T stays on the XLA path
        big = MCPILCOConfig(n_particles=4096, steps=15, **base)
        assert not fr.supports(big, e['dyn'], e['pol'], None, None)
        # unsupported features fall back
        for kw in (dict(mm_method='mix'), dict(cvar_eps=0.3),
                   dict(with_priorities=True), dict(mm_groups=4),
                   dict(pegasus=False), dict(reg_weight=0.1)):
            cfg = MCPILCOConfig(n_particles=100, steps=15, **base, **kw)
            assert not fr.supports(cfg, e['dyn'], e['pol'], None, None), kw
        # critic refit and meshes not fused
        assert not fr.supports(ok, e['dyn'], e['pol'], object(), None)
        assert not fr.supports(ok, e['dyn'], e['pol'], None, object())
        # learned reward (no analytic fn) unsupported
        import dataclasses
        dyn_lr = dataclasses.replace(e['dyn'], reward_func=None)
        assert not fr.supports(ok, dyn_lr, e['pol'], None, None)
