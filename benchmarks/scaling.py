"""Multi-device scaling-efficiency benchmark for the sharded MC-PILCO optimizer.

Measures imagined particle-steps/s of the FULL policy-optimization step
(rollout + backward through the unrolled horizon + Adam) across mesh sizes,
holding the per-device particle count fixed (weak scaling — the production
regime: more chips = more particles per update). Reports throughput and
scaling efficiency vs the single-device run.

On real TPU slices this measures ICI-collective scaling (the psum'd loss and
gradient reductions plus the cross-shard moment-matching contractions); on a
development host, ``--virtual N`` spoofs N CPU devices to validate the
harness and the sharded program end-to-end (virtual-CPU "efficiency" is not a
hardware number).

Usage:
  python benchmarks/scaling.py                    # real devices, all mesh sizes
  python benchmarks/scaling.py --virtual 8       # 8 virtual CPU devices
  python benchmarks/scaling.py --particles-per-device 512 --iters 50

Prints one JSON line per mesh size:
  {"devices": n, "particle_steps_per_s": v, "efficiency": e}
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('--virtual', type=int, default=0,
                   help='spoof N virtual CPU devices (0 = use real devices)')
    p.add_argument('--particles-per-device', type=int, default=256)
    p.add_argument('--steps', type=int, default=15)
    p.add_argument('--hidden', type=int, nargs='+', default=[200, 200])
    p.add_argument('--iters', type=int, default=100)
    p.add_argument('--reps', type=int, default=3)
    p.add_argument('--mm', action='store_true', default=True)
    return p.parse_args()


def main():
    args = parse_args()
    if args.virtual:
        os.environ['XLA_FLAGS'] = (
            os.environ.get('XLA_FLAGS', '')
            + f' --xla_force_host_platform_device_count={args.virtual}')
        os.environ['JAX_PLATFORMS'] = 'cpu'
    import jax
    if args.virtual:
        jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    import numpy as np
    import optax
    from prob_mbrl_tpu import models, parallel
    from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig

    D, U = 5, 1
    n_avail = len(jax.devices())
    mesh_sizes = [n for n in (1, 2, 4, 8, 16, 32, 64) if n <= n_avail]

    density = models.DiagGaussianDensity(D)
    dyn_mlp = models.MLPSpec(D + U, density.n_inputs, tuple(args.hidden),
                             dropout=models.cdropout(0.1))

    def reward_func(states, actions):
        cost = (jnp.sum(states ** 2, -1, keepdims=True)
                + 1e-4 * jnp.sum(actions ** 2, -1, keepdims=True))
        return jnp.exp(-0.5 * cost)

    dyn = models.DynamicsModel(
        regressor=models.Regressor(mlp=dyn_mlp, output_density=density),
        reward_func=reward_func)
    pol_density = models.DiagGaussianDensity(U)
    pol = models.Policy(
        mlp=models.MLPSpec(D, pol_density.n_inputs, tuple(args.hidden),
                           dropout=models.bdropout(0.1)),
        output_density=pol_density, max_u=(10.0,))

    key = jax.random.PRNGKey(0)
    kd, kp, kx = jax.random.split(key, 3)
    base = None
    for n_dev in mesh_sizes:
        B = args.particles_per_device * n_dev
        mesh = parallel.make_mesh(n_dev)
        cfg = MCPILCOConfig(n_particles=B, steps=args.steps,
                            mm_states=args.mm, mm_rewards=args.mm,
                            mm_method='mix')
        optimizer = optax.adam(1e-3)
        opt = parallel.make_sharded_mc_pilco_fn(dyn, pol, cfg, optimizer,
                                                mesh)
        dyn_params = parallel.replicate(dyn.init(kd), mesh)
        pol_params = parallel.replicate(pol.init(kp), mesh)
        dyn_stats = parallel.replicate(dyn.init_stats(), mesh)
        opt_state = optimizer.init(pol_params)
        x0_pool = jax.device_put(0.1 * jax.random.normal(kx, (B, D)),
                                 parallel.particle_sharding(mesh))

        p, s, m, n = opt(pol_params, opt_state, dyn_params, dyn_stats,
                         x0_pool, jax.random.PRNGKey(2), 0, args.iters)
        jax.block_until_ready(m['loss'])
        best = float('inf')
        for r in range(args.reps):
            t0 = time.perf_counter()
            p, s, m, n = opt(p, s, dyn_params, dyn_stats, x0_pool,
                             jax.random.PRNGKey(3 + r), n, args.iters)
            jax.block_until_ready(m['loss'])
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(np.asarray(m['loss'])).all()
        v = args.iters * B * args.steps / best
        if base is None:
            base = v
        eff = v / (base * n_dev)
        rec = {'devices': n_dev,
               'particles': B,
               'particle_steps_per_s': round(v),
               'efficiency': round(eff, 3)}
        if 'cpu' in jax.devices()[0].platform.lower():
            # lead with the caveat so virtual-mesh rows can't be misread as
            # a scaling claim: N virtual devices share the same physical
            # cores, so 'efficiency' here only validates that the sharded
            # program compiles+runs at every mesh size. The informative
            # multi-chip artifacts are the static collective audit
            # (results/collective_audit.jsonl) and real-silicon runs.
            rec = {'caveat': 'virtual CPU mesh — timing NOT a scaling '
                             'measurement; see collective audit', **rec}
        print(json.dumps(rec), flush=True)


if __name__ == '__main__':
    sys.exit(main())
