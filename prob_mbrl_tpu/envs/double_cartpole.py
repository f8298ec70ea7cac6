"""Double cartpole (reference: `prob_mbrl/envs/double_cartpole/`).

State [x, x', th1, th1', th2, th2'], action [F] in [-20, 20]. The dynamics
solve a 3x3 linear system per step (`double_cartpole/model.py:152-175`);
tip reward Q=8*I2, R=1e-3 (`double_cartpole/env.py:27-91`).
"""
import numpy as np
import jax.numpy as jnp

from .base import AnalyticModel, Box, ExpQuadTipReward, GymEnv


class DoubleCartpoleModel(AnalyticModel):
    state_size = 6
    action_size = 1
    angular_indices = (2, 4)

    def __init__(self, dt=0.05, mc=0.5, mp1=0.5, mp2=0.5, l1=0.6, l2=0.6,
                 mu=0.1, g=9.80665):
        super().__init__(dt)
        self.mc, self.mp1, self.mp2 = mc, mp1, mp2
        self.l1, self.l2, self.mu, self.g = l1, l2, mu, g

    def _Ab(self, z, u):
        mc, mp1, mp2 = self.mc, self.mp1, self.mp2
        l1, l2, mu, g = self.l1, self.l2, self.mu, self.g
        x_dot = z[..., 1]
        th1, th1_dot = z[..., 2], z[..., 3]
        th2, th2_dot = z[..., 4], z[..., 5]
        dth = th1 - th2
        F = u[..., 0]
        s1, s2, sd = jnp.sin(th1), jnp.sin(th2), jnp.sin(dth)
        c1, c2, cd = jnp.cos(th1), jnp.cos(th2), jnp.cos(dth)

        a0 = mp2 + 2 * mc
        a1 = mc * l2
        a2 = l1 * th1_dot ** 2
        a3 = a1 * th2_dot ** 2
        ones = jnp.ones_like(F)

        row0 = jnp.stack([2 * (mp1 + mp2 + mc) * ones, -a0 * l1 * c1,
                          -a1 * c2], -1)
        row1 = jnp.stack([-3 * a0 * c1, (2 * a0 + 2 * mc) * l1 * ones,
                          3 * a1 * cd], -1)
        row2 = jnp.stack([-3 * c2, 3 * l1 * cd, 2 * l2 * ones], -1)
        A = jnp.stack([row0, row1, row2], -2)
        b = jnp.stack([
            2 * F - 2 * mu * x_dot - a0 * a2 * s1 - a3 * s2,
            3 * a0 * g * s1 - 3 * a3 * sd,
            3 * a2 * sd + 3 * g * s2,
        ], -1)
        return A, b

    def dynamics(self, z, u):
        A, b = self._Ab(z, u)
        sol = jnp.linalg.solve(A, b[..., None])[..., 0]
        return jnp.stack([z[..., 1], sol[..., 0], z[..., 3], sol[..., 1],
                          z[..., 5], sol[..., 2]], -1)


def double_cartpole_reward(pole1_length=0.6, pole2_length=0.6,
                           q_scale=8.0, r_scale=1e-3):
    """Embedded layout (angle_dims=(2, 4)):
    [x, x', th1', th2', sin1, sin2, cos1, cos2];
    tip = (x - l1*sin1 - l2*sin2, l1*cos1 + l2*cos2); target upright ->
    tip (0, l1+l2)."""
    l1, l2 = float(pole1_length), float(pole2_length)

    def tip(xa):
        return jnp.stack([
            xa[..., 0] - l1 * xa[..., 4] - l2 * xa[..., 5],
            l1 * xa[..., 6] + l2 * xa[..., 7],
        ], -1)

    return ExpQuadTipReward(tip_fn=tip, target_tip=(0.0, l1 + l2),
                            q_scale=q_scale, r_scale=r_scale, raw_size=6,
                            angle_dims=(2, 4), norm=2 * (l1 + l2))


class DoubleCartpole(GymEnv):
    from .rendering import double_cartpole_scene as _scene_fn
    _scene_fn = staticmethod(_scene_fn)

    def _viewer_kwargs(self):
        return dict(xlim=(-3.5, 3.5), ylim=(-1.5, 1.5))

    def __init__(self, model=None, reward_func=None, **kwargs):
        model = model or DoubleCartpoleModel()
        reward_func = (reward_func if callable(reward_func)
                       else double_cartpole_reward(model.l1, model.l2))
        super().__init__(model, reward_func,
                         measurement_noise=np.array([0.01] * 6),
                         angle_dims=(2, 4), **kwargs)
        self.action_space = Box(-np.array([20.0]), np.array([20.0]))
        obs_high = np.array([4, 10, 10, 10, 1, 1, 1, 1], np.float32)
        self.observation_space = Box(-obs_high, obs_high)

    def reset(self, init_state=np.array([0, 0, np.pi, 0, np.pi, 0],
                                        dtype=np.float64),
              init_state_std=1e-1):
        return super().reset(init_state, init_state_std)
