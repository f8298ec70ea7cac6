"""JAX-native differentiable lunar lander.

The reference vendors gym's Box2D ``LunarLanderContinuous`` with
parameterized leg spring torque and engine powers
(`prob_mbrl/envs/lunar_lander.py:89-116`) — the only stepwise-reward,
contact-driven, non-differentiable env in the suite. Box2D runs on the host
and blocks gradient flow, so the TPU build replaces it with a from-scratch
2-D rigid-body lander whose contacts are smooth penalty springs: the whole
step is jittable, batchable, and differentiable end-to-end, which means
imagined rollouts can use the *ground-truth* lander as a drop-in dynamics
model and real-env data collection can run vectorized on-device.

State (8-dim, matching the gym observation layout):
  [x, y, vx, vy, theta, omega, leg1_contact, leg2_contact]
with x/y in helipad-centered units (the gym obs scaling), theta=0 upright.
Action (2-dim, in [-1, 1]): [main throttle, lateral thrust]. Gym gating is
kept: the main engine fires only for ``a0 > 0`` at power ``0.5 + 0.5 a0``;
the side engines fire only for ``|a1| > 0.5`` (`lunar_lander.py:111-116`
semantics) — inside the active region both are differentiable.

Contacts: each leg tip gets a spring-damper normal force (softplus-smoothed
penetration) plus tanh-regularized Coulomb friction; the contact flags are
sigmoids of the penetration, so even they carry (small) gradients.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .base import Box

FPS = 50.0


@dataclasses.dataclass
class JaxLanderModel:
    """Discrete-time lander physics: ``step(x, u) -> x_next`` (batched)."""
    dt: float = 1.0 / FPS
    gravity: float = -10.0
    main_engine_power: float = 15.0  # peak upward acceleration (units/s^2)
    side_engine_power: float = 2.0   # lateral acceleration
    side_engine_torque: float = 6.0  # rad/s^2 per unit side power
    leg_spring: float = 400.0        # contact spring stiffness (1/s^2)
    leg_damping: float = 25.0        # contact damper (1/s)
    friction: float = 0.7
    leg_dx: float = 0.12             # leg tip body-frame offsets
    leg_dy: float = 0.14
    angular_damping: float = 0.3
    contact_smooth: float = 0.005    # penetration scale for smooth contact

    state_size: int = 8
    action_size: int = 2
    angular_indices = ()  # theta stays raw: the gym obs does not embed it

    def _gated_powers(self, u):
        a_main = jnp.clip(u[..., 0], -1.0, 1.0)
        a_side = jnp.clip(u[..., 1], -1.0, 1.0)
        # gym gating (`lunar_lander.py` step): main fires iff a0 > 0 at
        # 0.5 + 0.5*a0; side fires iff |a1| > 0.5 at |a1| in [0.5, 1]
        m_power = jnp.where(a_main > 0.0, 0.5 + 0.5 * a_main, 0.0)
        s_mag = jnp.abs(a_side)
        s_power = jnp.where(s_mag > 0.5, s_mag, 0.0)
        s_dir = jnp.sign(a_side)
        return m_power, s_power, s_dir

    def _leg_forces(self, x, y, vx, vy, theta, omega):
        """Spring-damper + friction contact forces at the two leg tips.

        Returns (fx, fy, torque, c1, c2) where c_i are smooth contact flags.
        """
        sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)
        fx = jnp.zeros_like(x)
        fy = jnp.zeros_like(x)
        tq = jnp.zeros_like(x)
        flags = []
        for side in (-1.0, 1.0):
            # body-frame leg tip -> world frame
            rx = side * self.leg_dx * cos_t + self.leg_dy * sin_t
            ry = side * self.leg_dx * sin_t - self.leg_dy * cos_t
            tip_y = y + ry
            # tip velocity = v + omega x r
            tvx = vx - omega * ry
            tvy = vy + omega * rx
            # smooth penetration depth (softplus keeps gradients alive near 0)
            w = self.contact_smooth
            pen = w * jax.nn.softplus(-tip_y / w)
            contact = jax.nn.sigmoid(-tip_y / w)
            fn = jnp.maximum(
                self.leg_spring * pen - self.leg_damping * tvy * contact, 0.0)
            ft = -self.friction * fn * jnp.tanh(tvx / 0.1)
            fx = fx + ft
            fy = fy + fn
            tq = tq + rx * fn - ry * ft
            flags.append(contact)
        return fx, fy, tq, flags[0], flags[1]

    def step(self, x, u):
        """One physics step. x: [..., 8], u: [..., 2] -> [..., 8]."""
        px, py = x[..., 0], x[..., 1]
        vx, vy = x[..., 2], x[..., 3]
        theta, omega = x[..., 4], x[..., 5]
        m_power, s_power, s_dir = self._gated_powers(u)
        sin_t, cos_t = jnp.sin(theta), jnp.cos(theta)

        # engine accelerations (body-frame up = (-sin, cos))
        ax = -sin_t * self.main_engine_power * m_power
        ay = cos_t * self.main_engine_power * m_power + self.gravity
        # side engines push laterally in the body frame and spin the body
        ax = ax + cos_t * self.side_engine_power * s_power * s_dir
        ay = ay + sin_t * self.side_engine_power * s_power * s_dir
        alpha = -self.side_engine_torque * s_power * s_dir
        alpha = alpha - self.angular_damping * omega

        cfx, cfy, ctq, c1, c2 = self._leg_forces(px, py, vx, vy, theta, omega)
        ax = ax + cfx
        ay = ay + cfy
        alpha = alpha + ctq

        # semi-implicit Euler (what Box2D does)
        vx = vx + ax * self.dt
        vy = vy + ay * self.dt
        omega = omega + alpha * self.dt
        px = px + vx * self.dt
        py = py + vy * self.dt
        theta = theta + omega * self.dt
        return jnp.stack([px, py, vx, vy, theta, omega, c1, c2], -1)

    def __call__(self, x, u):
        return self.step(x, u)


def lander_reward(model=None):
    """Differentiable stepwise reward ``r(x_next, u)`` for imagined rollouts.

    The gym env rewards the *difference* of a shaping potential between
    consecutive steps plus fuel costs and terminal bonuses; a
    ``reward_func(next_state, action)`` cannot see the previous state, so the
    imagined-rollout reward uses the potential itself (identical optimal
    policy up to the telescoping constant) plus the gym fuel costs
    (-0.3/-0.03 per unit power).
    """
    m = model or JaxLanderModel()

    def reward(x, u):
        x = jnp.atleast_2d(x)
        u = jnp.atleast_2d(u)
        m_power, s_power, _ = m._gated_powers(u)
        shaping = (-100.0 * jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)
                   - 100.0 * jnp.sqrt(x[..., 2] ** 2 + x[..., 3] ** 2)
                   - 100.0 * jnp.abs(x[..., 4])
                   + 10.0 * x[..., 6] + 10.0 * x[..., 7])
        r = 0.01 * shaping - 0.30 * m_power - 0.03 * s_power
        return r[..., None]

    return reward


class JaxLunarLander:
    """Host-facing lander env with the gym API (discrete-time, no ODE).

    Mirrors the reference's parameterized construction
    (`lunar_lander.py:89-96`): engine powers and leg spring are ctor args.
    Terminals follow the gym rules: out of viewport (|x| > 1) or body-ground
    contact = crash (-100); resting with both legs down = landed (+100).
    """
    metadata = {"render.modes": []}
    spec = None

    def __init__(self, model=None, main_engine_power=None,
                 side_engine_power=None, leg_spring=None):
        kwargs = {}
        if main_engine_power is not None:
            kwargs['main_engine_power'] = float(main_engine_power)
        if side_engine_power is not None:
            kwargs['side_engine_power'] = float(side_engine_power)
        if leg_spring is not None:
            kwargs['leg_spring'] = float(leg_spring)
        self.model = model or JaxLanderModel(**kwargs)
        self.dt = self.model.dt
        self.reward_func = lander_reward(self.model)
        self.angle_dims = ()
        self.np_random = np.random.RandomState()
        self.state = None
        self.steps = 0
        self.prev_shaping = None
        self.action_space = Box(-np.ones(2, np.float32),
                                np.ones(2, np.float32))
        high = np.array([1.5, 1.5, 5, 5, np.pi, 5, 1, 1], np.float32)
        self.observation_space = Box(-high, high)
        self._device_step = jax.jit(self.model.step)

    # -- gym API -------------------------------------------------------------
    def seed(self, seed=None):
        self.np_random = np.random.RandomState(seed)
        return [seed]

    def _shaping(self, s):
        return (-100 * np.sqrt(s[0] ** 2 + s[1] ** 2)
                - 100 * np.sqrt(s[2] ** 2 + s[3] ** 2)
                - 100 * abs(s[4]) + 10 * s[6] + 10 * s[7])

    def step(self, action):
        u = np.clip(np.asarray(action, np.float32).reshape(-1), -1, 1)
        x_next = np.asarray(self._device_step(jnp.asarray(self.state), u))
        self.state = x_next
        self.steps += 1

        shaping = self._shaping(x_next)
        reward = 0.0 if self.prev_shaping is None else (
            shaping - self.prev_shaping)
        self.prev_shaping = shaping
        m_power = max(0.0, 0.5 + 0.5 * u[0]) if u[0] > 0 else 0.0
        s_power = abs(u[1]) if abs(u[1]) > 0.5 else 0.0
        reward -= 0.30 * m_power + 0.03 * s_power

        done = False
        # body-center height below the leg stance => body contact => crash
        body_clearance = x_next[1] - self.model.leg_dy * np.cos(x_next[4])
        if abs(x_next[0]) > 1.0 or body_clearance < -0.02:
            done, reward = True, reward - 100.0
        elif (x_next[6] > 0.5 and x_next[7] > 0.5
              and np.hypot(x_next[2], x_next[3]) < 0.05
              and abs(x_next[5]) < 0.05):
            done, reward = True, reward + 100.0
        return x_next.astype(np.float32), np.float32(reward), done, {}

    def reset(self, init_state=None, init_state_std=0.0):
        if init_state is None:
            # start above the pad with a random initial push (gym applies a
            # random force to the body at spawn)
            init_state = np.zeros(8, np.float32)
            init_state[1] = 1.3
            init_state[2] = self.np_random.uniform(-0.5, 0.5)
            init_state[3] = self.np_random.uniform(-0.5, 0.0)
        self.state = (np.asarray(init_state, np.float32)
                      + init_state_std * self.np_random.randn(8).astype(
                          np.float32))
        self.steps = 0
        self.prev_shaping = None
        return self.state.copy()

    def render(self, mode="human", **kwargs):
        raise NotImplementedError(
            'rendering is not implemented for the TPU-native envs')

    def close(self):
        pass

    # -- framework API --------------------------------------------------------
    @property
    def observation_size(self):
        return self.model.state_size

    @property
    def action_size(self):
        return self.model.action_size

    def batch_step(self, states, actions):
        """Vectorized on-device ground-truth step: [B, 8], [B, 2] -> [B, 8]."""
        return self._device_step(states, actions)
