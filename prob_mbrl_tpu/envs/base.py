"""Environment base layer: jittable analytic dynamics + host-facing wrapper.

TPU-first redesign of `prob_mbrl/envs/base.py:29-230`. The reference couples
integration, torch/numpy dispatch, and a scipy ``ode`` solver inside a module;
here an env is:

  * a pure ``dynamics(x, u) -> dx/dt`` function (batched, jittable),
  * a pure integrator (``integrate``: Euler / midpoint / RK4 / DOPRI5 via
    ``jax.experimental.ode.odeint`` — the JAX odeint is adaptive *and*
    differentiable, unlike the reference's scipy path),
  * a pure reward function,
  * a thin host-facing ``GymEnv`` wrapper with the gym API (step/reset/spaces)
    that jits one step end-to-end.

Because the analytic envs are jittable, on-device imagined rollouts and
"real"-env rollouts share the same compiled kernels — ground-truth rollouts
can run vectorized on the TPU (the reference steps one state at a time on the
host, `envs/base.py:62-104`).
"""
import dataclasses
from enum import IntEnum
from functools import partial
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.angles import to_complex, embedded_size


class Integrator(IntEnum):
    FW_EULER = 0
    MIDPOINT = 1
    RUNGE_KUTTA = 2
    DOPRI5 = 3


def integrate(dynamics, x, u, dt, method=Integrator.RUNGE_KUTTA):
    """One integration step of ``dx/dt = dynamics(x, u)``.

    Matches the reference integrators (`envs/base.py:190-230`); DOPRI5 uses
    ``jax.experimental.ode.odeint`` (adaptive, differentiable).
    """
    if method == Integrator.FW_EULER:
        return x + dynamics(x, u) * dt
    if method == Integrator.MIDPOINT:
        mid = x + dynamics(x, u) * (dt / 2)
        return x + dynamics(mid, u) * dt
    if method == Integrator.RUNGE_KUTTA:
        d1 = dynamics(x, u)
        d2 = dynamics(x + d1 * (dt / 2), u)
        d3 = dynamics(x + d2 * (dt / 2), u)
        d4 = dynamics(x + d3 * dt, u)
        return x + (d1 + 2 * d2 + 2 * d3 + d4) * (dt / 6)
    if method == Integrator.DOPRI5:
        from jax.experimental.ode import odeint

        def f(y, t):
            return dynamics(y, u)

        ys = odeint(f, x, jnp.array([0.0, dt]), rtol=1e-9, atol=1e-9)
        return ys[-1]
    raise ValueError(f'unknown integrator {method}')


class AnalyticModel:
    """Base for analytic dynamics models.

    Subclasses define ``dynamics(x, u) -> dx/dt`` (pure, batched) plus the
    class attributes ``state_size``, ``action_size``, ``angular_indices`` and
    ``dt`` (via __init__).
    """
    state_size: int = 0
    action_size: int = 0
    angular_indices: Tuple[int, ...] = ()

    def __init__(self, dt):
        self.dt = float(dt)

    def dynamics(self, x, u):
        raise NotImplementedError

    def __call__(self, x, u, method=Integrator.RUNGE_KUTTA):
        return integrate(self.dynamics, x, u, self.dt, method)


class Box:
    """Minimal gym.spaces.Box stand-in (gym is not a dependency)."""

    def __init__(self, low, high, dtype=np.float32):
        self.low = np.broadcast_arrays(np.asarray(low, dtype),
                                       np.asarray(high, dtype))[0]
        self.high = np.broadcast_arrays(np.asarray(high, dtype),
                                        np.asarray(low, dtype))[0]
        self.dtype = dtype

    @property
    def shape(self):
        return self.low.shape

    def sample(self, rng=None):
        rng = rng if rng is not None else np.random
        return rng.uniform(self.low, self.high).astype(self.dtype)

    def contains(self, x):
        return bool(np.all(x >= self.low) and np.all(x <= self.high))

    def __repr__(self):
        return f'Box(low={self.low}, high={self.high})'


class GymEnv:
    """Host-facing env wrapper over an analytic model (`envs/base.py:36-113`).

    ``step``: integrate dynamics, apply the differentiable reward, add Gaussian
    measurement noise, angle-embed the observation. The device step
    (integration + reward) is jitted once; noise is drawn host-side from the
    seeded numpy RNG for gym-style reproducibility.
    """
    metadata = {"render.modes": []}
    spec = None

    def __init__(self, model, reward_func=None, measurement_noise=None,
                 angle_dims=(), integrator=Integrator.RUNGE_KUTTA):
        self.model = model
        self.dt = model.dt
        self.reward_func = reward_func
        self.measurement_noise = (None if measurement_noise is None
                                  else np.asarray(measurement_noise,
                                                  np.float32))
        self.angle_dims = tuple(angle_dims)
        self.state = None
        self.steps = 0
        self.np_random = np.random.RandomState()
        self.viewer = None

        def device_step(x, u):
            x_next = integrate(model.dynamics, x, u, model.dt, integrator)
            if callable(reward_func):
                r = reward_func(x_next[None], u[None])[0]
            else:
                r = jnp.zeros(())
            return x_next, r

        self._device_step = jax.jit(device_step)

    # -- gym API -----------------------------------------------------------
    def seed(self, seed=None):
        self.np_random = np.random.RandomState(seed)
        return [seed]

    def observe(self, state):
        obs = np.asarray(state, np.float32)
        if self.measurement_noise is not None:
            obs = obs + self.measurement_noise * self.np_random.randn(
                *obs.shape).astype(np.float32)
        if self.angle_dims:
            obs = to_complex(obs, self.angle_dims)
        return obs

    def step(self, action, **kwargs):
        u = np.asarray(action, np.float32).reshape(-1)
        x_next, reward = self._device_step(jnp.asarray(self.state), u)
        self.state = np.asarray(x_next)
        self.steps += 1
        obs = self.observe(self.state)
        return obs, np.asarray(reward), False, {}

    def reset(self, init_state=None, init_state_std=0.0):
        if init_state is None:
            init_state = np.zeros(self.model.state_size, np.float32)
        self.state = (np.asarray(init_state, np.float32) + init_state_std *
                      self.np_random.randn(*np.shape(init_state)).astype(
                          np.float32))
        self.steps = 0
        return self._reset_obs()

    def _reset_obs(self):
        # reference `reset` embeds but does NOT add measurement noise
        # (`envs/base.py:106-113`)
        obs = np.asarray(self.state, np.float32)
        if self.angle_dims:
            obs = to_complex(obs, self.angle_dims)
        return obs

    # subclasses set to a callable ``(model, state) -> scene dict`` (see
    # envs/rendering.py) to enable render(); viewer bounds via _viewer_kwargs
    _scene_fn = None

    def _viewer_kwargs(self):
        return {}

    def render(self, mode="human", **kwargs):
        """Matplotlib render (counterpart of the reference's pyglet viewers,
        `prob_mbrl/envs/cartpole/env.py:174-248`, incl. the ghost trail).

        ``mode='human'``: update a live figure (no-op return) when the
        backend is interactive, else fall through to an RGB array.
        ``mode='rgb_array'``: return an [H, W, 3] uint8 frame.
        """
        if self._scene_fn is None:
            raise NotImplementedError(
                f'rendering is not implemented for {type(self).__name__}')
        if self.state is None:
            raise RuntimeError('render() before reset()')
        if self.viewer is None:
            from .rendering import MplViewer
            self.viewer = MplViewer(**self._viewer_kwargs())
        return self.viewer.render(type(self)._scene_fn(self.model,
                                                       self.state), mode)

    def close(self):
        if self.viewer is not None:
            self.viewer.close()
            self.viewer = None

    # -- framework API ------------------------------------------------------
    @property
    def observation_size(self):
        return embedded_size(self.model.state_size, self.angle_dims)

    @property
    def action_size(self):
        return self.model.action_size

    def batch_step(self, states, actions):
        """Vectorized on-device ground-truth step: [B, D], [B, U] -> [B, D]."""
        return jax.vmap(
            lambda x, u: integrate(self.model.dynamics, x, u, self.model.dt,
                                   Integrator.RUNGE_KUTTA))(states, actions)


@dataclasses.dataclass(frozen=True)
class ExpQuadTipReward:
    """exp(-0.5 [delta^T Q delta + u^T R u]) with delta a normalized
    tip-position error.

    Generic form of the cartpole/pendulum/double-cartpole/cart-acrobot rewards
    (`envs/cartpole/env.py:27-86` and friends). ``tip_fn`` maps an
    angle-embedded state to tip xy; ``norm`` normalizes the error.
    Operates on either raw states (angle-embeds first) or embedded states
    (detected by trailing dim).
    """
    tip_fn: Callable
    target_tip: Tuple[float, ...]
    q_scale: float
    r_scale: float
    raw_size: int
    angle_dims: Tuple[int, ...]
    norm: float

    def __call__(self, x, u):
        x = jnp.atleast_2d(x)
        u = jnp.atleast_2d(u)
        if x.shape[-1] == self.raw_size:
            xa = to_complex(x, self.angle_dims)
        else:
            xa = x
        tip = self.tip_fn(xa)
        target = jnp.asarray(self.target_tip, x.dtype)
        delta = (tip - target) / self.norm
        cost = 0.5 * (self.q_scale * jnp.sum(delta ** 2, -1, keepdims=True)
                      + self.r_scale * jnp.sum(u ** 2, -1, keepdims=True))
        return jnp.exp(-cost)
