"""Cart-acrobot (reference: `prob_mbrl/envs/cart_acrobot/`).

Like the double cartpole but actuated at the elbow joint instead of the cart
(`cart_acrobot/model.py:108-185`): b[0] loses the 2F force term, b[2] gains
6F/(l2*mp2). Tip reward Q=8*I2, R=1e-4 (`cart_acrobot/env.py:27-91`);
action [F] in [-1, 1].
"""
import numpy as np
import jax.numpy as jnp

from .base import Box, GymEnv
from .double_cartpole import DoubleCartpoleModel, double_cartpole_reward


class CartAcrobotModel(DoubleCartpoleModel):
    def _Ab(self, z, u):
        A, _ = super()._Ab(z, u)
        mc, mp2 = self.mc, self.mp2
        l1, l2, mu, g = self.l1, self.l2, self.mu, self.g
        x_dot = z[..., 1]
        th1, th1_dot = z[..., 2], z[..., 3]
        th2, th2_dot = z[..., 4], z[..., 5]
        dth = th1 - th2
        F = u[..., 0]
        s1, s2, sd = jnp.sin(th1), jnp.sin(th2), jnp.sin(dth)
        a0 = mp2 + 2 * mc
        a1 = mc * l2
        a2 = l1 * th1_dot ** 2
        a3 = a1 * th2_dot ** 2
        b = jnp.stack([
            -2 * mu * x_dot - a0 * a2 * s1 - a3 * s2,
            3 * a0 * g * s1 - 3 * a3 * sd,
            6 * F / (l2 * mp2) + 3 * a2 * sd + 3 * g * s2,
        ], -1)
        return A, b


class CartAcrobot(GymEnv):
    from .rendering import double_cartpole_scene as _scene_fn
    _scene_fn = staticmethod(_scene_fn)

    def _viewer_kwargs(self):
        return dict(xlim=(-3.5, 3.5), ylim=(-1.5, 1.5))

    def __init__(self, model=None, reward_func=None, **kwargs):
        model = model or CartAcrobotModel()
        reward_func = (reward_func if callable(reward_func)
                       else double_cartpole_reward(model.l1, model.l2,
                                                   q_scale=8.0, r_scale=1e-4))
        super().__init__(model, reward_func,
                         measurement_noise=np.array([0.01] * 6),
                         angle_dims=(2, 4), **kwargs)
        self.action_space = Box(-np.array([1.0]), np.array([1.0]))
        obs_high = np.array([4, 10, 10, 10, 1, 1, 1, 1], np.float32)
        self.observation_space = Box(-obs_high, obs_high)

    def reset(self, init_state=np.array([0, 0, np.pi, 0, np.pi, 0],
                                        dtype=np.float64),
              init_state_std=2e-1):
        return super().reset(init_state, init_state_std)
