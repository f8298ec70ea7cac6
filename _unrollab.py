import sys, time, jax, jax.numpy as jnp, numpy as np, optax
import importlib
rmod = importlib.import_module('prob_mbrl_tpu.utils.rollout')
from bench import build
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn
import prob_mbrl_tpu.algorithms.mc_pilco as mcp

UNROLL = int(sys.argv[1])
orig_rollout = rmod.rollout
def rollout_unrolled(*a, **k):
    k.setdefault('unroll', UNROLL)
    return orig_rollout(*a, **k)
mcp.rollout_fn = rollout_unrolled

def run(iters=100, reps=3):
    dyn, pol = build(100, 15)
    kd, kp = jax.random.split(jax.random.PRNGKey(0))
    dyn_params, pol_params = dyn.init(kd), pol.init(kp)
    dyn_stats = dyn.init_stats()
    cfg = MCPILCOConfig(n_particles=100, steps=15, mm_states=True, mm_rewards=True)
    optimizer = optax.adam(1e-3)
    opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer)
    opt_state = optimizer.init(pol_params)
    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (100, 5))
    p, s, m, n = opt(pol_params, opt_state, dyn_params, dyn_stats, x0, jax.random.PRNGKey(2), 0, iters)
    jax.block_until_ready(m['loss'])
    best = 1e9
    for r in range(reps):
        t0 = time.perf_counter()
        p, s, m, n = opt(p, s, dyn_params, dyn_stats, x0, jax.random.PRNGKey(3+r), n, iters)
        jax.block_until_ready(m['loss'])
        best = min(best, time.perf_counter()-t0)
    return iters*100*15/best

print('unroll=%d: %d' % (UNROLL, run()))
