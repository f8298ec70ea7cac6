"""prob_mbrl_tpu: TPU-native probabilistic model-based RL.

A from-scratch JAX/XLA/pjit framework with the capabilities of
mcgillmrl/prob_mbrl (Deep-PILCO / MC-PILCO with dropout-BNN dynamics models,
particle rollouts, moment matching, and model-based DDPG), redesigned
TPU-first: pure-functional models with explicit noise-state pytrees,
``lax.scan`` rollout engines, end-to-end jitted training loops, and
device-mesh sharding for multi-chip scale.
"""
from . import ops, models, optim, envs, utils, algorithms, parallel

__version__ = '0.1.0'
__all__ = ['ops', 'models', 'optim', 'envs', 'utils', 'algorithms',
           'parallel']
