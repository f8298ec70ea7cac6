"""Box2D lunar lander (reference: `prob_mbrl/envs/lunar_lander.py`).

The reference vendors gym's Box2D ``LunarLanderContinuous`` with
parameterized leg spring torque and engine powers (`lunar_lander.py:89-116`).
Box2D is an optional dependency; this module raises ImportError when
``box2d-py`` is unavailable and the package __init__ gates on that.

A JAX-native differentiable approximation lives in
``prob_mbrl_tpu.envs.jax_lander`` (no Box2D required).
"""
import Box2D  # noqa: F401  (gate: raises ImportError without box2d-py)

raise ImportError(
    'Box2D-backed LunarLander is not yet wired up in prob_mbrl_tpu; '
    'use prob_mbrl_tpu.envs.jax_lander.JaxLunarLander instead.')
