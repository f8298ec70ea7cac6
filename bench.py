"""Headline benchmark: imagined particle-steps/s through the MC-PILCO optimizer.

Workload = the reference's canonical deep_pilco_mm configuration
(`/root/reference/examples/deep_pilco_mm.py` defaults): 100 particles,
horizon 15, dynamics MLP [200,200] with concrete dropout + diag-Gaussian
head, policy MLP [200,200] with Bernoulli dropout + tanh squash, known
reward, moment-matched state/reward propagation, full reparameterized
backward through the rollout and an Adam update per iteration.

Baseline: the PyTorch reference measured on this host's CPU (best of 1/2
threads), pinned in BASELINE.md: 24,516 particle-steps/s (mm config).

Default invocation prints ONE JSON line:
  {"metric", "value", "unit", "vs_baseline"}
measured at the reference workload with the TPU-native mixing MM kernel
(learning-curve-validated against the reference-exact cholesky kernel —
RESULTS.md); pass ``--mm_method cholesky`` for the reference-exact kernel.

Extra knobs for the BASELINE.md scaling table:
  --particles N       particle count (default 100 = reference workload)
  --dtype bfloat16    run the MLP matmuls in bf16 (params/reductions f32)
  --mm_method {mix,cholesky,none}
  --sweep             print one JSON line per config over the whole table
"""
import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from prob_mbrl_tpu import models
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn

BASELINE_PARTICLE_STEPS_PER_S = 24516.0  # torch reference, mm config (BASELINE.md)


def build(n_particles=100, steps=15, hidden=(200, 200), D=5, U=1,
          compute_dtype=None):
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


def measure(n_particles=100, mm_method='mix', dtype=None, steps=15,
            iters=200, reps=3, hidden=(200, 200)):
    """Time the jitted MC-PILCO optimizer; returns particle-steps/s."""
    dyn, pol = build(n_particles, steps, hidden, compute_dtype=dtype)
    key = jax.random.PRNGKey(0)
    kd, kp = jax.random.split(key)
    dyn_params = dyn.init(kd)
    pol_params = pol.init(kp)
    dyn_stats = dyn.init_stats()

    mm = mm_method != 'none'
    cfg = MCPILCOConfig(n_particles=n_particles, steps=steps,
                        mm_states=mm, mm_rewards=mm,
                        mm_method=(mm_method if mm else 'cholesky'))
    optimizer = optax.adam(1e-3)
    opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer)
    opt_state = optimizer.init(pol_params)
    x0_pool = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                      (2 * min(n_particles, 4096), 5))

    # warmup / compile
    p, s, m, n = opt(pol_params, opt_state, dyn_params, dyn_stats, x0_pool,
                     jax.random.PRNGKey(2), 0, iters)
    jax.block_until_ready(m['loss'])
    t0 = time.perf_counter()
    for r in range(reps):
        p, s, m, n = opt(p, s, dyn_params, dyn_stats, x0_pool,
                         jax.random.PRNGKey(3 + r), n, iters)
    jax.block_until_ready(m['loss'])
    dt = (time.perf_counter() - t0) / reps

    assert np.all(np.isfinite(np.asarray(m['loss']))), 'non-finite bench loss'
    return iters * n_particles * steps / dt


def emit(name, ps_per_s):
    print(json.dumps({
        'metric': name,
        'value': round(ps_per_s, 1),
        'unit': 'particle-steps/s',
        'vs_baseline': round(ps_per_s / BASELINE_PARTICLE_STEPS_PER_S, 2),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--particles', type=int, default=100)
    ap.add_argument('--mm_method', default='mix',
                    choices=['mix', 'cholesky', 'none'])
    ap.add_argument('--dtype', default=None,
                    choices=[None, 'float32', 'bfloat16'])
    ap.add_argument('--iters', type=int, default=200)
    ap.add_argument('--sweep', action='store_true',
                    help='measure the whole BASELINE.md table')
    args = ap.parse_args()

    if args.sweep:
        for mm in ('none', 'mix', 'cholesky'):
            for B in (100, 1000, 4096):
                for dt in (None, 'bfloat16'):
                    ps = measure(B, mm, dt, iters=args.iters)
                    emit(f'mc_pilco_{mm}_B{B}_{dt or "f32"}', ps)
        return

    ps = measure(args.particles, args.mm_method, args.dtype,
                 iters=args.iters)
    emit('mc_pilco_mm_particle_steps_per_s', ps)


if __name__ == '__main__':
    main()
