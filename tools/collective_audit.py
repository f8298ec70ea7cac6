"""Static audit of the collectives in the sharded MC-PILCO loss.

Real multi-chip hardware is unavailable in this environment, but the
*program* the mesh will run is fully inspectable today: compile the sharded
moment-matched rollout loss for 2/4/8-device meshes and report every
all-reduce in the optimized HLO with its shape and payload bytes. This is
the statically-checkable half of BASELINE.json's scaling target (the
other half — measured ICI efficiency — awaits a real slice).

Usage::

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/collective_audit.py

Prints one JSON line per mesh size. Benchmark tooling only.
"""
import json
import os
import re
import sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), 'tests'))

DTYPE_BYTES = {'f32': 4, 'bf16': 2, 'f16': 2, 'f64': 8, 's32': 4, 'u32': 4,
               'pred': 1}

SHAPE_RE = re.compile(r'(f32|bf16|f16|f64|s32|u32|pred)\[([0-9,]*)\]')


def allreduce_summary(hlo):
    """[(shape, bytes)] for every all-reduce op in an HLO text."""
    out = []
    for line in hlo.splitlines():
        s = line.strip()
        # match the op line itself (result = shape all-reduce(...)), not uses
        if '= ' not in s or 'all-reduce' not in s.split('= ', 1)[1][:120]:
            continue
        if s.startswith('ROOT'):
            s = s[len('ROOT '):]
        lhs, rhs = s.split('= ', 1)
        if not rhs.lstrip('(').startswith(('f32', 'bf16', 'f16', 'f64',
                                           's32', 'u32', 'pred', 'all-reduce',
                                           '(')):
            continue
        m = SHAPE_RE.findall(rhs.split('all-reduce')[0])
        total = 0
        shapes = []
        for dt, dims in m:
            n = 1
            for d in dims.split(','):
                if d:
                    n *= int(d)
            total += n * DTYPE_BYTES[dt]
            shapes.append(f'{dt}[{dims}]')
        out.append((';'.join(shapes) or 'scalar', total))
    return out


def main():
    import numpy as np  # noqa: F401
    from prob_mbrl_tpu import parallel
    from test_algorithms import tiny_setup

    for n in (2, 4, 8):
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        mesh = parallel.make_mesh(n)
        B, T = 16, 15
        key = jax.random.PRNGKey(0)
        x0 = 0.1 * jax.random.normal(key, (B, 4))
        dyn_noise = dyn.sample_noise(jax.random.fold_in(key, 1), (B,))
        pol_noise = pol.sample_noise(jax.random.fold_in(key, 2), (B,))
        z_mm = jax.random.normal(jax.random.fold_in(key, 3), (B, 4))
        z_rr = jax.random.normal(jax.random.fold_in(key, 4), (B, 1))
        loss_fn = parallel.make_sharded_loss_fn(
            dyn, pol, T, mesh, mm_states=True, mm_rewards=True)
        grad_fn = jax.jit(jax.value_and_grad(loss_fn))
        hlo = grad_fn.lower(pol_params, x0, dyn_params, dyn_stats, dyn_noise,
                            pol_noise, z_mm, z_rr).compile().as_text()
        ars = allreduce_summary(hlo)
        print(json.dumps({
            'devices': n,
            'horizon': T,
            'all_reduce_count': len(ars),
            'total_bytes_per_step_call': sum(b for _, b in ars),
            'ops': [{'shape': s, 'bytes': b} for s, b in ars],
        }), flush=True)

    # fused + sharded (round 5): the Pallas mega-kernel per shard with
    # shard-local MM groups — the contract is NO collectives inside the
    # rollout at all; the only cross-device traffic per optimizer iteration
    # is the pmean of (loss, mean_return, policy grads) after the kernel.
    import optax
    from prob_mbrl_tpu.algorithms.mc_pilco import (MCPILCOConfig,
                                                   make_mc_pilco_fn)
    for n in (2, 4, 8):
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        mesh = parallel.make_mesh(n)
        B = 4 * n
        cfg = MCPILCOConfig(n_particles=B, steps=4, mm_states=True,
                            mm_rewards=True, mm_groups=n,
                            fused_rollout=True)
        optimizer = optax.adam(1e-3)
        opt = make_mc_pilco_fn(dyn, pol, cfg, optimizer, mesh=mesh)
        x0_pool = 0.1 * jax.random.normal(jax.random.PRNGKey(0), (B, 4))
        opt_state = optimizer.init(pol_params)
        hlo = opt.lower(pol_params, opt_state, dyn_params, dyn_stats,
                        x0_pool, jax.random.PRNGKey(1), 0,
                        2).compile().as_text()
        ars = allreduce_summary(hlo)
        print(json.dumps({
            'program': 'fused_sharded_optimizer_iteration',
            'devices': n,
            'all_reduce_count': len(ars),
            'total_bytes_per_iteration': sum(b for _, b in ars),
            'ops': [{'shape': s, 'bytes': b} for s, b in ars],
        }), flush=True)


if __name__ == '__main__':
    main()
