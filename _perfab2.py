import sys, time, jax, jax.numpy as jnp, numpy as np, optax
import prob_mbrl_tpu.ops.moment_matching as mmod
import importlib
rmod = importlib.import_module('prob_mbrl_tpu.utils.rollout')
from bench import build
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn
from prob_mbrl_tpu.ops.math import small_cholesky

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

def set_mm(f):
    mmod.mm_resample = f
    rmod.mm.mm_resample = f

def mm_single_chol(samples, z, jitter=1e-12):
    m_, S = mmod.particle_moments(samples)
    L = small_cholesky(S + 1e-8 * jnp.eye(S.shape[-1], dtype=S.dtype))
    z = (z - jnp.mean(z, -2, keepdims=True)) / jnp.std(z, -2, keepdims=True)
    z = jax.lax.stop_gradient(z)
    return m_ + jnp.matmul(z, jnp.swapaxes(L, -1, -2))

def mm_diag_only(samples, z, jitter=1e-12):
    m_ = jnp.mean(samples, -2, keepdims=True)
    s_ = jnp.std(samples, -2, keepdims=True)
    z = (z - jnp.mean(z, -2, keepdims=True)) / jnp.std(z, -2, keepdims=True)
    z = jax.lax.stop_gradient(z)
    return m_ + z * s_

def mm_moments_only(samples, z, jitter=1e-12):
    m_, S = mmod.particle_moments(samples)
    return samples + 0.0 * m_ + 0.0 * jnp.sum(S, -1)

which = sys.argv[1]
if which == 'full': print('full safe_cholesky :', round(run()))
elif which == 'single': set_mm(mm_single_chol); print('single small chol  :', round(run()))
elif which == 'diag': set_mm(mm_diag_only); print('diag (no chol)     :', round(run()))
elif which == 'moments': set_mm(mm_moments_only); print('moments only       :', round(run()))
