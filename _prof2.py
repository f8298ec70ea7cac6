"""Scratch: unroll sweep for the rollout/iteration scans on the real chip."""
import time
import jax
import jax.numpy as jnp
import optax
from functools import partial

from bench import build
import importlib
rmod = importlib.import_module('prob_mbrl_tpu.utils.rollout')
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn
import prob_mbrl_tpu.algorithms.mc_pilco as mcp


def timeit(fn, iters=200, reps=3):
    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps / iters * 1e6


def main():
    B, T = 100, 15
    dyn, pol = build(B, T)
    kd, kp = jax.random.split(jax.random.PRNGKey(0))
    dyn_params, pol_params = dyn.init(kd), pol.init(kp)
    dyn_stats = dyn.init_stats()
    x0 = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (B, 5))
    key = jax.random.PRNGKey(2)
    optimizer = optax.adam(1e-3)

    orig_rollout = rmod.rollout
    for unroll in (1, 3, 5, 15):
        def rolled(*a, **k):
            k['unroll'] = unroll
            return orig_rollout(*a, **k)
        mcp.rollout_fn = rolled
        for mm in (False, True):
            cfg = MCPILCOConfig(n_particles=B, steps=T, mm_states=mm,
                                mm_rewards=mm)
            opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer)
            opt_state = optimizer.init(pol_params)
            us = timeit(lambda o=opt, s=opt_state: o(
                pol_params, s, dyn_params, dyn_stats, x0, key, 0, 200)[2]['loss'])
            print(f'unroll={unroll:2d} mm={int(mm)}: {us:7.1f} us/iter')
    mcp.rollout_fn = orig_rollout


if __name__ == '__main__':
    main()
