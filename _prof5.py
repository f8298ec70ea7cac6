"""Scratch: rollout-scan unroll sweep inside the jitted mc_pilco optimizer."""
import time
import json
import sys
import jax
import jax.numpy as jnp
import optax

from _prof4 import build
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn
import importlib
rollout_mod = importlib.import_module('prob_mbrl_tpu.utils.rollout')


def run(unroll, n_particles=100, steps=15, iters=200, reps=3):
    orig = rollout_mod.rollout

    def patched(*args, **kw):
        kw['unroll'] = unroll
        return orig(*args, **kw)

    import prob_mbrl_tpu.algorithms.mc_pilco as mcp
    mcp.rollout_fn = patched
    try:
        dyn, pol = build(False, None)
        key = jax.random.PRNGKey(0)
        kd, kp = jax.random.split(key)
        dyn_params = dyn.init(kd)
        pol_params = pol.init(kp)
        dyn_stats = dyn.init_stats()
        cfg = MCPILCOConfig(n_particles=n_particles, steps=steps,
                            mm_states=True, mm_rewards=True)
        optimizer = optax.adam(1e-3)
        opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer)
        opt_state = optimizer.init(pol_params)
        x0_pool = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (100, 5))
        p, s, m, n = opt(pol_params, opt_state, dyn_params, dyn_stats,
                         x0_pool, jax.random.PRNGKey(2), 0, iters)
        jax.block_until_ready(m['loss'])
        best = float('inf')
        for r in range(reps):
            t0 = time.perf_counter()
            p, s, m, n = opt(p, s, dyn_params, dyn_stats, x0_pool,
                             jax.random.PRNGKey(3 + r), n, iters)
            jax.block_until_ready(m['loss'])
            best = min(best, time.perf_counter() - t0)
        return iters * n_particles * steps / best
    finally:
        mcp.rollout_fn = orig


if __name__ == '__main__':
    for u in [int(x) for x in sys.argv[1:]] or [1, 3, 5, 15]:
        v = run(u)
        print(json.dumps({'unroll': u, 'psteps_per_s': round(v)}), flush=True)
