"""Algorithms layer (reference: `prob_mbrl/algorithms/`)."""
from .mc_pilco import (MCPILCOConfig, MCPILCOAgent, make_mc_pilco_fn, mc_pilco,
                       discount_weights, cvar_filter)
from .value import make_value_update_fn, make_q_update_fn
from .mbddpg import (MBDDPG, make_actor, make_critic, make_dyn_model,
                     make_ddpg_iteration_fn)

__all__ = [
    'MCPILCOConfig', 'MCPILCOAgent', 'make_mc_pilco_fn', 'mc_pilco',
    'discount_weights',
    'cvar_filter', 'make_value_update_fn', 'make_q_update_fn', 'MBDDPG',
    'make_actor', 'make_critic', 'make_dyn_model', 'make_ddpg_iteration_fn',
]
