"""Minimal OpenAI-gym API shim so the PyTorch reference at /root/reference
can run in this image (which ships gymnasium, not classic gym).

Only the surface the reference actually touches is provided:
  * ``gym.Env`` base class with a ``spec`` attribute
    (`/root/reference/prob_mbrl/envs/base.py:36`)
  * ``gym.spaces.Box`` with ``sample()``
    (`/root/reference/prob_mbrl/envs/cartpole/env.py:20`)
  * ``gym.utils.seeding.np_random`` returning a ``RandomState``
    (`/root/reference/prob_mbrl/envs/base.py:59`)
  * ``gym.utils.EzPickle`` (lunar lander)

Used exclusively by tools/run_reference.py and the parity tests; NOT part of
the TPU framework.
"""
from . import spaces, utils  # noqa: F401


class Env:
    metadata = {'render.modes': []}
    reward_range = (-float('inf'), float('inf'))
    spec = None
    action_space = None
    observation_space = None

    def reset(self):
        raise NotImplementedError

    def step(self, action):
        raise NotImplementedError

    def render(self, mode='human'):
        pass

    def close(self):
        pass

    def seed(self, seed=None):
        return []

    @property
    def unwrapped(self):
        return self
