import numpy as np
import jax
import jax.numpy as jnp
import pytest

from prob_mbrl_tpu import envs


ALL_ENVS = [envs.Cartpole, envs.Pendulum, envs.DoubleCartpole,
            envs.CartAcrobot, envs.Rendezvous]


@pytest.mark.parametrize('env_cls', ALL_ENVS)
def test_env_step_reset_api(env_cls):
    env = env_cls()
    env.seed(0)
    obs = env.reset()
    assert obs.shape == (env.observation_size,)
    u = env.action_space.sample(np.random.RandomState(0))
    obs2, reward, done, info = env.step(u)
    assert obs2.shape == obs.shape
    assert np.all(np.isfinite(obs2))
    assert np.isfinite(float(np.asarray(reward).reshape(-1)[0]))


@pytest.mark.parametrize('env_cls', ALL_ENVS)
def test_env_determinism_given_seed(env_cls):
    def run():
        env = env_cls()
        env.seed(42)
        env.reset()
        traj = []
        for t in range(5):
            obs, r, d, _ = env.step(0.1 * np.ones(env.model.action_size))
            traj.append(obs)
        return np.stack(traj)

    np.testing.assert_allclose(run(), run(), rtol=1e-6)


def test_integrators_agree_on_smooth_dynamics():
    model = envs.PendulumModel()
    x = jnp.array([0.1, 0.0])
    u = jnp.array([0.0])
    outs = {m: envs.integrate(model.dynamics, x, u, 0.01, m)
            for m in [envs.Integrator.FW_EULER, envs.Integrator.MIDPOINT,
                      envs.Integrator.RUNGE_KUTTA, envs.Integrator.DOPRI5]}
    rk4 = np.asarray(outs[envs.Integrator.RUNGE_KUTTA])
    np.testing.assert_allclose(np.asarray(outs[envs.Integrator.DOPRI5]), rk4,
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(outs[envs.Integrator.MIDPOINT]),
                               rk4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(outs[envs.Integrator.FW_EULER]),
                               rk4, atol=1e-3)


def test_cartpole_equilibria():
    """theta=0 (hanging down, the reset state) is stable; theta=pi (upright,
    the reward target) is unstable."""
    model = envs.CartpoleModel()
    u = jnp.array([0.0])
    # near upright: falls away
    x = jnp.array([0.0, 0.0, np.pi + 0.1, 0.0])
    for _ in range(10):
        x = model(x, u)
    assert abs(float(x[2]) - np.pi) > 0.1
    # near bottom: oscillates, stays bounded
    x = jnp.array([0.0, 0.0, 0.1, 0.0])
    for _ in range(10):
        x = model(x, u)
    assert abs(float(x[2])) < 0.5


def test_cartpole_reward_max_at_target():
    reward = envs.cartpole_reward(0.5)
    target = jnp.array([[0.0, 0.0, np.pi, 0.0]])
    u0 = jnp.zeros((1, 1))
    r_target = float(np.asarray(reward(target, u0)).squeeze())
    assert abs(r_target - 1.0) < 1e-5
    r_down = float(np.asarray(reward(jnp.array([[0.0, 0.0, 0.0, 0.0]]), u0)).squeeze())
    assert r_down < r_target
    # cost at hanging-down is 1 -> reward exp(-1) ~ 0.368 (normalized tip)
    np.testing.assert_allclose(r_down, np.exp(-0.5 * 16.0), rtol=1e-4)


def test_cartpole_reward_embedded_and_raw_agree():
    from prob_mbrl_tpu.ops.angles import to_complex
    reward = envs.cartpole_reward(0.5)
    x = jnp.array([[0.3, 0.1, 1.2, -0.4]])
    u = jnp.array([[0.5]])
    r_raw = np.asarray(reward(x, u))
    r_emb = np.asarray(reward(to_complex(x, (2,)), u))
    np.testing.assert_allclose(r_raw, r_emb, rtol=1e-5)


def test_pendulum_reward_target():
    reward = envs.pendulum_reward(1.0)
    r = float(np.asarray(reward(jnp.array([[np.pi, 0.0]]), jnp.zeros((1, 1)))).squeeze())
    assert abs(r - 1.0) < 1e-5


def test_double_cartpole_reward_upright():
    reward = envs.double_cartpole_reward()
    x_up = jnp.array([[0.0, 0, 0.0, 0, 0.0, 0]])
    r = float(np.asarray(reward(x_up, jnp.zeros((1, 1)))).squeeze())
    assert abs(r - 1.0) < 1e-5


def test_cart_acrobot_differs_from_double_cartpole():
    dc = envs.DoubleCartpoleModel()
    ca = envs.CartAcrobotModel()
    z = jnp.array([0.1, 0.2, 0.3, 0.4, 0.5, 0.6])
    u = jnp.array([1.0])
    d1 = np.asarray(dc.dynamics(z, u))
    d2 = np.asarray(ca.dynamics(z, u))
    assert np.abs(d1 - d2).max() > 1e-3
    # with zero action both reduce to the same unforced system
    u0 = jnp.zeros((1,))
    np.testing.assert_allclose(np.asarray(dc.dynamics(z, u0)),
                               np.asarray(ca.dynamics(z, u0)), rtol=1e-5)


def test_rendezvous_reward_zero_at_meeting():
    reward = envs.RendezvousReward()
    x = jnp.array([[1.0, 1.0, 1.0, 1.0, 0, 0, 0, 0]])
    r = float(np.asarray(reward(x, jnp.zeros((1, 4)))).squeeze())
    assert abs(r) < 1e-6


def test_cartpole_done_conditions():
    env = envs.Cartpole()
    env.seed(0)
    env.reset()
    env.state = np.array([3.6, 0, 0, 0], np.float32)
    _, _, done, _ = env.step(np.zeros(1))
    assert done


def test_batched_dynamics():
    model = envs.CartpoleModel()
    z = jnp.ones((32, 4))
    u = jnp.ones((32, 1))
    dz = model.dynamics(z, u)
    assert dz.shape == (32, 4)
    # jit + vmap compatible
    dz2 = jax.jit(jax.vmap(model.dynamics))(z, u)
    np.testing.assert_allclose(np.asarray(dz), np.asarray(dz2), rtol=1e-5)


def test_batched_double_cartpole_dynamics():
    model = envs.DoubleCartpoleModel()
    z = 0.1 * jnp.ones((8, 6))
    u = jnp.ones((8, 1))
    assert model.dynamics(z, u).shape == (8, 6)


def test_make_registry():
    env = envs.make('Cartpole')
    assert isinstance(env, envs.Cartpole)
    with pytest.raises(KeyError):
        envs.make('Nope')


# -- JAX-native lunar lander --------------------------------------------------

def test_lander_free_fall_and_hover():
    model = envs.JaxLanderModel()
    x = jnp.zeros((1, 8)).at[0, 1].set(1.0)
    # free fall: no thrust -> vy decreases by ~g*dt
    x1 = model.step(x, jnp.zeros((1, 2)))
    assert float(x1[0, 3]) < 0.0
    np.testing.assert_allclose(float(x1[0, 3]), model.gravity * model.dt,
                               rtol=1e-5)
    # full main throttle upright: net accel = power - g > 0
    x2 = model.step(x, jnp.array([[1.0, 0.0]]))
    assert float(x2[0, 3]) > 0.0


def test_lander_contact_stops_fall_and_sets_flags():
    model = envs.JaxLanderModel()
    x0 = jnp.zeros((1, 8)).at[0, 1].set(1.0)

    def rollout(x, n):
        for _ in range(n):
            x = model.step(x, jnp.zeros((1, 2)))
        return x

    xT = rollout(x0, 400)  # 8 seconds: must have settled on the pad
    xT = np.asarray(xT)[0]
    # resting on the legs: body height ~ leg_dy, not falling through
    assert xT[1] > 0.0
    assert abs(xT[3]) < 0.1
    assert xT[6] > 0.5 and xT[7] > 0.5  # both contact flags on


def test_lander_side_engine_torques_and_gating():
    model = envs.JaxLanderModel()
    x = jnp.zeros((1, 8)).at[0, 1].set(1.0)
    # below gating threshold: no effect
    x_low = model.step(x, jnp.array([[0.0, 0.4]]))
    np.testing.assert_allclose(np.asarray(x_low[0, 5]), 0.0, atol=1e-7)
    # above threshold: spins the body
    x_hi = model.step(x, jnp.array([[0.0, 1.0]]))
    assert abs(float(x_hi[0, 5])) > 0.0


def test_lander_reward_differentiable_through_contact():
    model = envs.JaxLanderModel()
    reward = envs.lander_reward(model)

    def total_reward(u):
        x = jnp.zeros((1, 8)).at[0, 1].set(0.3)
        r = 0.0
        for _ in range(20):
            x = model.step(x, u)
            r = r + reward(x, u).sum()
        return r

    g = jax.grad(total_reward)(jnp.array([[0.9, 0.0]]))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).sum()) > 0.0  # gradients flow through contacts


def test_lander_gym_api_and_registry():
    # with box2d present the registry returns the reference-faithful host
    # env; the JAX-native lander stays the on-device/differentiable variant
    env = envs.make('LunarLander')
    if envs._HAS_LUNAR_LANDER:
        from prob_mbrl_tpu.envs.lunar_lander import LunarLander as B2Lander
        assert isinstance(env, B2Lander)
    env.seed(3)
    obs = env.reset()
    assert obs.shape == (8,)
    total = 0.0
    for _ in range(30):
        obs, r, done, _ = env.step(np.array([0.5, 0.0]))
        total += float(r)
        if done:
            break
    assert np.all(np.isfinite(obs))
    # batched on-device ground-truth step (JAX lander)
    jenv = envs.JaxLunarLander()
    jenv.seed(3)
    jobs = jenv.reset()
    xs = jnp.tile(jnp.asarray(jobs)[None], (4, 1))
    us = jnp.zeros((4, 2))
    nxt = jenv.batch_step(xs, us)
    assert nxt.shape == (4, 8)


class TestRendering:
    """render() parity with the reference's pyglet viewers (matplotlib,
    headless-safe rgb_array mode; `prob_mbrl/envs/cartpole/env.py:174-248`)."""

    @pytest.mark.parametrize('name', ['Cartpole', 'Pendulum',
                                      'DoubleCartpole', 'CartAcrobot',
                                      'Rendezvous'])
    def test_rgb_array_frames(self, name):
        import matplotlib
        matplotlib.use('Agg')
        env = envs.make(name)
        env.seed(0)
        env.reset()
        frames = []
        for _ in range(3):
            env.step(np.zeros(env.action_size, np.float32))
            frames.append(env.render(mode='rgb_array'))
        env.close()
        f = frames[-1]
        assert f.ndim == 3 and f.shape[-1] == 3 and f.dtype == np.uint8
        # the scene actually draws something (not a blank canvas)
        assert (f < 250).any()

    def test_render_before_reset_raises(self):
        env = envs.make('Cartpole')
        with pytest.raises(RuntimeError):
            env.render(mode='rgb_array')

    def test_lander_render(self):
        import matplotlib
        matplotlib.use('Agg')
        env = envs.make('LunarLander')
        env.seed(0)
        env.reset()
        env.step(np.zeros(env.action_size, np.float32))
        f = env.render(mode='rgb_array')
        env.close()
        assert f.ndim == 3 and f.shape[-1] == 3
        assert (f < 250).any()
