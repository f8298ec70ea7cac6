"""Scratch: A/B fused-pallas vs unfused MLP in the mc_pilco optimizer."""
import dataclasses
import time
import json
import sys
import jax
import jax.numpy as jnp
import optax

from prob_mbrl_tpu import models
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn


def build(fused, compute_dtype=None, hidden=(200, 200), D=5, U=1):
    density = models.DiagGaussianDensity(D)
    dyn_mlp = models.MLPSpec(D + U, density.n_inputs, hidden,
                             dropout=models.cdropout(0.1), fused=fused,
                             compute_dtype=compute_dtype)

    def reward_func(states, actions):
        cost = (jnp.sum(states ** 2, -1, keepdims=True)
                + 1e-4 * jnp.sum(actions ** 2, -1, keepdims=True))
        return jnp.exp(-0.5 * cost)

    dyn = models.DynamicsModel(
        regressor=models.Regressor(mlp=dyn_mlp, output_density=density),
        reward_func=reward_func)
    pol_density = models.DiagGaussianDensity(U)
    pol_mlp = models.MLPSpec(D, pol_density.n_inputs, hidden,
                             dropout=models.bdropout(0.1), fused=fused,
                             compute_dtype=compute_dtype)
    pol = models.Policy(mlp=pol_mlp, output_density=pol_density,
                        max_u=(10.0,))
    return dyn, pol


def run(fused, compute_dtype=None, n_particles=100, steps=15,
        iters=200, reps=3):
    dyn, pol = build(fused, compute_dtype)
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

    p, s, m, n = opt(pol_params, opt_state, dyn_params, dyn_stats, x0_pool,
                     jax.random.PRNGKey(2), 0, iters)
    jax.block_until_ready(m['loss'])
    best = float('inf')
    for r in range(reps):
        t0 = time.perf_counter()
        p, s, m, n = opt(p, s, dyn_params, dyn_stats, x0_pool,
                         jax.random.PRNGKey(3 + r), n, iters)
        jax.block_until_ready(m['loss'])
        best = min(best, time.perf_counter() - t0)
    return iters * n_particles * steps / best


if __name__ == '__main__':
    which = sys.argv[1] if len(sys.argv) > 1 else 'all'
    combos = []
    if which in ('all', 'small'):
        combos += [(False, None, 100), (True, None, 100)]
    if which in ('all', 'big'):
        combos += [(False, None, 1000), (True, None, 1000)]
    if which in ('all', 'bf16'):
        combos += [(False, 'bfloat16', 100), (True, 'bfloat16', 100)]
    for fused, cdt, B in combos:
        v = run(fused, cdt, n_particles=B)
        print(json.dumps({'fused': fused, 'cdt': cdt, 'B': B,
                          'psteps_per_s': round(v)}), flush=True)
