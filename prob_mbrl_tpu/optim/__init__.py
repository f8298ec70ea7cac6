"""Optimizers: optax-native equivalents of the reference's third-party set.

The reference vendors RAdam (`prob_mbrl/thirdparty/radam.py`) and stochastic
damped L-BFGS (`prob_mbrl/thirdparty/sdlbfgs.py`). Here both are
GradientTransformations — pure (state, grads) -> (updates, state) functions
that jit/scan/shard like any optax optimizer.
"""
from .radam import radam
from .sdlbfgs import sdlbfgs

__all__ = ['radam', 'sdlbfgs']
