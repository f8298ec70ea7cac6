"""Algorithm-layer tests: MC-PILCO policy optimization, value updates, MBDDPG.

Oracle strategy per SURVEY.md §4: analytic envs as fixtures, loss-decrease /
learning signals as integration checks, exact-semantics unit checks (discount
weights, CVaR filter, PEGASUS pinning) against closed forms.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from prob_mbrl_tpu import models, algorithms
from prob_mbrl_tpu.algorithms.mc_pilco import (MCPILCOConfig, cvar_filter,
                                               discount_weights,
                                               make_mc_pilco_fn)
from prob_mbrl_tpu.envs import Cartpole, cartpole_reward


def tiny_setup(learn_reward=False, seed=0):
    D, U = 4, 1
    density = models.DiagGaussianDensity(D if not learn_reward else D + 1)
    dyn_mlp = models.MLPSpec(D + U, density.n_inputs, (32, 32),
                             dropout=models.cdropout(0.1))
    reward = None if learn_reward else cartpole_reward()
    dyn = models.DynamicsModel(
        regressor=models.Regressor(mlp=dyn_mlp, output_density=density),
        reward_func=reward)
    pol_density = models.DiagGaussianDensity(U)
    pol_mlp = models.MLPSpec(D, pol_density.n_inputs, (32, 32),
                             dropout=models.bdropout(0.1))
    pol = models.Policy(mlp=pol_mlp, output_density=pol_density,
                        max_u=(10.0,))
    key = jax.random.PRNGKey(seed)
    kd, kp = jax.random.split(key)
    return dyn, pol, dyn.init(kd), dyn.init_stats(), pol.init(kp)


class TestDiscountWeights:
    def test_uniform_default(self):
        w, wH = discount_weights(None, 10)
        np.testing.assert_allclose(w, np.full(10, 0.1), rtol=1e-6)
        assert wH == pytest.approx(0.1)

    def test_gamma(self):
        w, wH = discount_weights(0.9, 4)
        np.testing.assert_allclose(w, 0.9 ** np.arange(4), rtol=1e-6)
        assert wH == pytest.approx(0.9 ** 4)

    def test_callable(self):
        w, _ = discount_weights(lambda i: float(i), 3)
        np.testing.assert_allclose(w, [0.0, 1.0, 2.0])


class TestCVaR:
    def test_no_filter(self):
        r = jnp.arange(10.0)
        out, k = cvar_filter(r, 0.0)
        assert k == 10 and out.shape == (10,)

    def test_worst_case_keeps_lowest(self):
        r = jnp.arange(10.0)
        out, k = cvar_filter(r, 0.3)
        assert k == 3
        np.testing.assert_allclose(np.sort(np.asarray(out)), [0.0, 1.0, 2.0])

    def test_best_case_keeps_highest(self):
        r = jnp.arange(10.0)
        out, k = cvar_filter(r, -0.2)
        assert k == 2
        np.testing.assert_allclose(np.sort(np.asarray(out)), [8.0, 9.0])


class TestMCPILCO:
    def test_opt_runs_and_updates(self):
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        cfg = MCPILCOConfig(n_particles=20, steps=5)
        optimizer = optax.adam(1e-3)
        opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer)
        opt_state = optimizer.init(pol_params)
        x0_pool = jnp.zeros((8, 4)) + 0.01 * jax.random.normal(
            jax.random.PRNGKey(1), (8, 4))
        new_params, opt_state, metrics, n = opt(
            pol_params, opt_state, dyn_params, dyn_stats, x0_pool,
            jax.random.PRNGKey(2), 0, 10)
        assert int(n) == 10
        assert metrics['loss'].shape == (10,)
        assert np.all(np.isfinite(metrics['loss']))
        # params actually changed
        diff = jax.tree_util.tree_reduce(
            lambda a, b: a + b,
            jax.tree_util.tree_map(
                lambda a, b: float(jnp.abs(a - b).sum()),
                new_params, pol_params))
        assert diff > 0

    def test_pegasus_counter_chunk_equivalence(self):
        """Two chunked calls == one fused call (global-counter key stream)."""
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        cfg = MCPILCOConfig(n_particles=10, steps=3, resampling_period=4)
        optimizer = optax.adam(1e-3)
        opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer)
        x0_pool = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (8, 4))
        key = jax.random.PRNGKey(3)

        p1, s1, m1, n1 = opt(pol_params, optimizer.init(pol_params),
                             dyn_params, dyn_stats, x0_pool, key, 0, 8)
        p2, s2, m2, n2 = opt(pol_params, optimizer.init(pol_params),
                             dyn_params, dyn_stats, x0_pool, key, 0, 4)
        p2, s2, m3, n3 = opt(p2, s2, dyn_params, dyn_stats, x0_pool, key,
                             n2, 4)
        np.testing.assert_allclose(
            np.concatenate([m2['loss'], m3['loss']]), m1['loss'], rtol=2e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=2e-5), p1, p2)

    def test_mm_and_value_and_cvar_paths_compile(self):
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        V = models.Regressor(
            mlp=models.MLPSpec(4, 2, (16,), dropout=models.cdropout(0.1)),
            output_density=models.DiagGaussianDensity(1))
        v_params = V.init(jax.random.PRNGKey(7))
        v_stats = V.init_stats()
        cfg = MCPILCOConfig(n_particles=16, steps=4, mm_states=True,
                            mm_rewards=True, mm_groups=4, cvar_eps=0.25,
                            init_state_noise=0.01)
        optimizer = optax.adam(1e-3)
        opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer, value_spec=V)
        x0_pool = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (8, 4))
        _, _, metrics, _ = opt(pol_params, optimizer.init(pol_params),
                               dyn_params, dyn_stats, x0_pool,
                               jax.random.PRNGKey(2), 0, 3,
                               value_params=v_params, value_stats=v_stats)
        assert np.all(np.isfinite(metrics['loss']))

    def test_mm_methods_both_compile_and_learn(self):
        # 'mix' (TPU-native orthogonal mixing) and 'cholesky'
        # (reference-exact) must both run finite through the jitted optimizer
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        optimizer = optax.adam(1e-3)
        x0_pool = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (8, 4))
        for method in ('mix', 'cholesky'):
            cfg = MCPILCOConfig(n_particles=16, steps=4, mm_states=True,
                                mm_rewards=True, mm_method=method)
            opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer)
            _, _, metrics, _ = opt(pol_params, optimizer.init(pol_params),
                                   dyn_params, dyn_stats, x0_pool,
                                   jax.random.PRNGKey(2), 0, 4)
            assert np.all(np.isfinite(metrics['loss'])), method

    def test_rollout_mix_mm_preserves_step_moments(self):
        from prob_mbrl_tpu.utils.rollout import rollout
        from prob_mbrl_tpu import ops
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        B = 32
        key = jax.random.PRNGKey(0)
        dyn_noise = dyn.sample_noise(jax.random.fold_in(key, 1), (B,))
        pol_noise = pol.sample_noise(jax.random.fold_in(key, 2), (B,))
        U_s = ops.sample_mm_mixing(jax.random.fold_in(key, 3), B)
        U_r = ops.sample_mm_mixing(jax.random.fold_in(key, 4), B)
        x0 = 0.05 * jax.random.normal(jax.random.fold_in(key, 5), (B, 4))
        states, actions, rewards = rollout(
            x0, dyn, pol, 4, dyn_params, dyn_stats, pol_params,
            dyn_noise, pol_noise, mm_states=True, mm_rewards=True,
            z_mm=U_s, z_rr=U_r, mm_method='mix')
        assert states.shape == (5, B, 4)
        assert np.all(np.isfinite(np.asarray(states)))
        assert np.all(np.isfinite(np.asarray(rewards)))

    def test_mix_mm_auto_groups_large_particle_counts(self):
        # [B, B] mixing matrices are a memory/QR hazard at large B
        # (VERDICT r1 weak #4): above MIX_AUTO_GROUP_SIZE the optimizer must
        # auto-partition the mixing into bounded groups and still run finite.
        import warnings
        from prob_mbrl_tpu.algorithms.mc_pilco import MIX_AUTO_GROUP_SIZE
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        B = 2048
        assert B > MIX_AUTO_GROUP_SIZE
        cfg = MCPILCOConfig(n_particles=B, steps=3, mm_states=True,
                            mm_rewards=True, mm_method='mix')
        optimizer = optax.adam(1e-3)
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter('always')
            opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer)
        assert any('auto-grouping' in str(w.message) for w in caught)
        x0_pool = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (64, 4))
        _, _, metrics, _ = opt(pol_params, optimizer.init(pol_params),
                               dyn_params, dyn_stats, x0_pool,
                               jax.random.PRNGKey(2), 0, 2)
        assert np.all(np.isfinite(metrics['loss']))

    def test_host_loop_with_priorities(self):
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        x0_pool = 0.01 * np.random.RandomState(0).randn(32, 4).astype(
            np.float32)
        new_params, opt_state, metrics, n = algorithms.mc_pilco(
            x0_pool, dyn, pol, 3, dyn_params, dyn_stats, pol_params,
            opt_iters=6, n_particles=8, prioritized_replay=True, chunk=3,
            key=jax.random.PRNGKey(0))
        assert int(n) == 6
        assert len(metrics['loss']) == 6
        assert np.all(np.isfinite(metrics['loss']))


class TestValueUpdate:
    def test_td_h_value_update_decreases_loss(self):
        V = models.Regressor(
            mlp=models.MLPSpec(4, 2, (32,), dropout=models.cdropout(0.1)),
            output_density=models.DiagGaussianDensity(1))
        key = jax.random.PRNGKey(0)
        params = V.init(key)
        tgt = jax.tree_util.tree_map(jnp.copy, params)
        stats = V.init_stats()
        optimizer = optax.adam(1e-2)
        opt_state = optimizer.init(params)
        update = algorithms.make_value_update_fn(V, optimizer, H=5)

        states = jax.random.normal(key, (6, 16, 4))
        rewards = jnp.ones((5, 16, 1))
        losses = []
        for i in range(30):
            params, tgt, opt_state, loss = update(
                params, tgt, opt_state, stats, states, rewards,
                jax.random.fold_in(key, i))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_q_update_runs(self):
        Q = models.Regressor(
            mlp=models.MLPSpec(5, 1, (16,), dropout=models.cdropout(0.1)))
        pol = models.Policy(
            mlp=models.MLPSpec(4, 1, (16,), dropout=models.bdropout(0.1)),
            max_u=(1.0,))
        key = jax.random.PRNGKey(0)
        q_params = Q.init(key)
        q_tgt = jax.tree_util.tree_map(jnp.copy, q_params)
        pol_params = pol.init(jax.random.fold_in(key, 1))
        optimizer = optax.adam(1e-3)
        opt_state = optimizer.init(q_params)
        update = algorithms.make_q_update_fn(Q, pol, optimizer, H=4)
        states = jax.random.normal(key, (5, 8, 4))
        actions = jax.random.normal(key, (4, 8, 1))
        rewards = jnp.ones((4, 8, 1))
        q_params, q_tgt, opt_state, loss = update(
            q_params, q_tgt, opt_state, Q.init_stats(), pol_params, states,
            actions, rewards, key)
        assert np.isfinite(float(loss))


class TestMBDDPG:
    def test_agent_fit_smoke(self):
        from prob_mbrl_tpu.utils.experience import ExperienceDataset
        env = Cartpole()
        env.seed(0)
        exp = ExperienceDataset()
        rng = np.random.RandomState(0)
        for ep in range(2):
            exp.new_episode()
            x = env.reset()
            for t in range(12):
                u = rng.uniform(-10, 10, (1,))
                exp.add_sample(x, u, rng.rand(), False, {}, t)
                x, *_ = env.step(u)

        # cartpole observations are angle-embedded: 5 dims
        agent = algorithms.MBDDPG(state_dim=5, action_dim=1, max_action=10.0)
        hist = agent.fit(exp, horizon=4, iterations=2, model_fit_iters=20,
                         batch_size=16)
        assert len(hist) == 2
        assert np.isfinite(hist[-1]['critic_loss'])
        u = agent(np.zeros(5))
        assert u.shape == (1,) and np.all(np.abs(u) <= 10.0)


class TestRolloutWithValues:
    def test_values_and_qvalues_shapes(self):
        from prob_mbrl_tpu.utils.rollout import (rollout_with_values,
                                                 rollout_with_Qvalues)
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        B, T, D = 8, 4, 4
        V = models.Regressor(
            mlp=models.MLPSpec(D, 2, (8,), dropout=models.cdropout(0.1)),
            output_density=models.DiagGaussianDensity(1))
        Q = models.Regressor(
            mlp=models.MLPSpec(D + 1, 2, (8,), dropout=models.cdropout(0.1)),
            output_density=models.DiagGaussianDensity(1))
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 6)
        x0 = 0.01 * jax.random.normal(ks[0], (B, D))
        dnoise = dyn.sample_noise(ks[1], (B,))
        pnoise = pol.sample_noise(ks[2], (B,))
        v_params = V.init(ks[3])
        vnoise = V.sample_noise(ks[4], (B,))
        states, actions, rewards, values = rollout_with_values(
            x0, dyn, pol, T, V, dyn_params, dyn_stats, pol_params, dnoise,
            pnoise, v_params, V.init_stats(), vnoise)
        assert values.shape == (T + 1, B, 1)
        assert np.all(np.isfinite(np.asarray(values)))

        q_params = Q.init(ks[5])
        qnoise = Q.sample_noise(ks[4], (B,))
        states, actions, rewards, qvalues = rollout_with_Qvalues(
            x0, dyn, pol, T, Q, dyn_params, dyn_stats, pol_params, dnoise,
            pnoise, q_params, Q.init_stats(), qnoise)
        assert qvalues.shape == (T + 1, B, 1)
        assert np.all(np.isfinite(np.asarray(qvalues)))


class TestMCPILCOAgent:
    def test_agent_roundtrip(self):
        from prob_mbrl_tpu.algorithms import MCPILCOAgent
        from prob_mbrl_tpu.utils.experience import ExperienceDataset
        dyn, pol, *_ = tiny_setup()
        exp = ExperienceDataset()
        rng = np.random.RandomState(0)
        for ep in range(2):
            exp.new_episode()
            for t in range(10):
                exp.add_sample(rng.randn(4) * 0.1, rng.randn(1),
                               rng.rand(), False, {}, t)
        agent = MCPILCOAgent(pol, dyn, exp)
        m1 = agent.fit_dynamics(iters=20, batchsize=8)
        assert np.all(np.isfinite(np.asarray(m1['E_lml'])))
        m2 = agent.train(steps=4, batch_size=8, opt_iters=5)
        assert len(m2['loss']) == 5
        assert agent.policy_update_counter == 5
        u = agent(np.zeros(4))
        assert u.shape == (1,) and np.isfinite(u).all()
