"""Two-vehicle rendezvous (reference: `prob_mbrl/envs/rendezvous/`).

State [x0, y0, x1, y1, x0', y0', x1', y1'], action [Fx0, Fy0, Fx1, Fy1].
No angular dims. Reward is the (negative, non-saturating) quadratic
relative-state + control cost (`rendezvous/env.py:26-46`).

The reference's `Rendezvous.reset` has a copy-paste bug calling
``super(DoubleCartpole, ...)`` (`rendezvous/env.py:75`) — fixed here, not
replicated.
"""
import dataclasses

import numpy as np
import jax.numpy as jnp

from .base import AnalyticModel, Box, GymEnv


class RendezvousModel(AnalyticModel):
    state_size = 8
    action_size = 4
    angular_indices = ()

    def __init__(self, dt=0.1, m=1.0, alpha=0.1):
        super().__init__(dt)
        self.m, self.alpha = m, alpha

    def dynamics(self, z, u):
        # reference formulation (`rendezvous/model.py:86-103`): the
        # "acceleration" mixes in dt, replicated for behavioral parity.
        vel = z[..., 4:8]
        acc = vel * (1 - self.alpha * self.dt / self.m) + u * (self.dt /
                                                               self.m)
        return jnp.concatenate([vel, acc], -1)


@dataclasses.dataclass(frozen=True)
class RendezvousReward:
    q_scale: float = 1.0
    r_scale: float = 1.0

    def __call__(self, x, u):
        x = jnp.atleast_2d(x)
        u = jnp.atleast_2d(u)
        state_1 = jnp.concatenate([x[..., :2], x[..., 4:6]], -1)
        state_2 = jnp.concatenate([x[..., 2:4], x[..., 6:8]], -1)
        delta = state_1 - state_2
        cost = (self.q_scale * jnp.sum(delta ** 2, -1, keepdims=True)
                + self.r_scale * jnp.sum(u ** 2, -1, keepdims=True))
        return -cost


class Rendezvous(GymEnv):
    from .rendering import rendezvous_scene as _scene_fn
    _scene_fn = staticmethod(_scene_fn)

    def _viewer_kwargs(self):
        return dict(xlim=(-14.0, 14.0), ylim=(-14.0, 14.0))

    def __init__(self, model=None, reward_func=None, **kwargs):
        model = model or RendezvousModel()
        reward_func = (reward_func if callable(reward_func)
                       else RendezvousReward())
        super().__init__(model, reward_func, measurement_noise=None,
                         angle_dims=(), **kwargs)
        self.action_space = Box(-np.array([100.0] * 4),
                                np.array([100.0] * 4))
        high = np.array([np.finfo(np.float32).max] * 8)
        self.observation_space = Box(-high, high)

    def reset(self,
              init_state=np.array([-10.0, -10.0, 10.0, 10.0,
                                   0.0, 0.0, 0.0, 0.0]),
              init_state_std=1e-2):
        return super().reset(init_state, init_state_std)
