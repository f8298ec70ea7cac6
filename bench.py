"""Headline benchmark: imagined particle-steps/s through the MC-PILCO optimizer.

Workload = the reference's canonical deep_pilco_mm configuration
(`/root/reference/examples/deep_pilco_mm.py` defaults): 100 particles,
horizon 15, dynamics MLP [200,200] with concrete dropout + diag-Gaussian
head, policy MLP [200,200] with Bernoulli dropout + tanh squash, known
reward, moment-matched state/reward propagation, full reparameterized
backward through the rollout and an Adam update per iteration.

Baseline: the PyTorch reference measured on this host's CPU (best of 1/2
threads), pinned in BASELINE.md: 24,516 particle-steps/s (mm config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from prob_mbrl_tpu import models
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn

BASELINE_PARTICLE_STEPS_PER_S = 24516.0  # torch reference, mm config (BASELINE.md)


def build(n_particles=100, steps=15, hidden=(200, 200), D=5, U=1):
    density = models.DiagGaussianDensity(D)
    dyn_mlp = models.MLPSpec(D + U, density.n_inputs, hidden,
                             dropout=models.cdropout(0.1))

    def reward_func(states, actions):
        cost = (jnp.sum(states ** 2, -1, keepdims=True)
                + 1e-4 * jnp.sum(actions ** 2, -1, keepdims=True))
        return jnp.exp(-0.5 * cost)

    dyn = models.DynamicsModel(
        regressor=models.Regressor(mlp=dyn_mlp, output_density=density),
        reward_func=reward_func)
    pol_density = models.DiagGaussianDensity(U)
    pol_mlp = models.MLPSpec(D, pol_density.n_inputs, hidden,
                             dropout=models.bdropout(0.1))
    pol = models.Policy(mlp=pol_mlp, output_density=pol_density,
                        max_u=(10.0,))
    return dyn, pol


def main():
    n_particles, steps = 100, 15
    dyn, pol = build(n_particles, steps)
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

    iters = 200
    # warmup / compile
    p, s, m, n = opt(pol_params, opt_state, dyn_params, dyn_stats, x0_pool,
                     jax.random.PRNGKey(2), 0, iters)
    jax.block_until_ready(m['loss'])
    reps = 3
    t0 = time.perf_counter()
    for r in range(reps):
        p, s, m, n = opt(p, s, dyn_params, dyn_stats, x0_pool,
                         jax.random.PRNGKey(3 + r), n, iters)
    jax.block_until_ready(m['loss'])
    dt = (time.perf_counter() - t0) / reps

    assert np.all(np.isfinite(np.asarray(m['loss']))), 'non-finite bench loss'
    ps_per_s = iters * n_particles * steps / dt
    print(json.dumps({
        'metric': 'mc_pilco_mm_particle_steps_per_s',
        'value': round(ps_per_s, 1),
        'unit': 'particle-steps/s',
        'vs_baseline': round(ps_per_s / BASELINE_PARTICLE_STEPS_PER_S, 2),
    }))


if __name__ == '__main__':
    main()
