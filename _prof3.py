"""Scratch: bf16/unroll sweep for the mc_pilco optimizer on the real chip."""
import time
import json
import jax
import jax.numpy as jnp
import optax

from prob_mbrl_tpu import models
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn


def build(hidden=(200, 200), D=5, U=1, compute_dtype=None):
    density = models.DiagGaussianDensity(D)
    dyn_mlp = models.MLPSpec(D + U, density.n_inputs, hidden,
                             dropout=models.cdropout(0.1),
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
                             dropout=models.bdropout(0.1),
                             compute_dtype=compute_dtype)
    pol = models.Policy(mlp=pol_mlp, output_density=pol_density,
                        max_u=(10.0,))
    return dyn, pol


def run(compute_dtype=None, n_particles=100, steps=15, iters=200, reps=3):
    dyn, pol = build(compute_dtype=compute_dtype)
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
    t0 = time.perf_counter()
    for r in range(reps):
        p, s, m, n = opt(p, s, dyn_params, dyn_stats, x0_pool,
                         jax.random.PRNGKey(3 + r), n, iters)
    jax.block_until_ready(m['loss'])
    dt = (time.perf_counter() - t0) / reps
    return iters * n_particles * steps / dt


if __name__ == '__main__':
    for dt in (None, 'bfloat16'):
        v = run(compute_dtype=dt)
        print(json.dumps({'compute_dtype': dt, 'psteps_per_s': round(v)}),
              flush=True)
