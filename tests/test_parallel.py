"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Oracles: the single-device kernels. Distributed MM / sharded rollouts /
the sharded MC-PILCO optimizer must reproduce single-device results up to
reduction order (SURVEY §4: device-count spoofing as the fake-backend
substitute).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest
from jax.sharding import PartitionSpec as P
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from prob_mbrl_tpu import models, parallel
from prob_mbrl_tpu.algorithms.mc_pilco import MCPILCOConfig, make_mc_pilco_fn
from prob_mbrl_tpu.ops import moment_matching as mm

from test_algorithms import tiny_setup

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason='needs multiple (virtual) devices')


@pytest.fixture(scope='module')
def mesh():
    return parallel.make_mesh()


class TestDistributedMM:
    def test_psum_moments_match_single_device(self, mesh):
        key = jax.random.PRNGKey(0)
        B, D = 32, 4
        samples = jax.random.normal(key, (B, D))

        def local(x):
            m, S = parallel.particle_moments_psum(x, 'particles')
            return m, S

        m, S = shard_map(local, mesh=mesh, in_specs=P('particles'),
                         out_specs=(P(), P()))(samples)
        m_ref, S_ref = mm.particle_moments(samples)
        np.testing.assert_allclose(m, m_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(S, S_ref, rtol=1e-5, atol=1e-6)

    def test_mm_resample_psum_matches_single_device(self, mesh):
        key = jax.random.PRNGKey(1)
        B, D = 32, 4
        samples = jax.random.normal(key, (B, D)) * 0.5 + 1.0
        z = jax.random.normal(jax.random.fold_in(key, 1), (B, D))

        out = shard_map(
            lambda s, zz: parallel.mm_resample_psum(s, zz, 'particles'),
            mesh=mesh, in_specs=(P('particles'), P('particles')),
            out_specs=P('particles'))(samples, z)
        ref = mm.mm_resample(samples, z)
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


class TestShardedLoss:
    def test_matches_single_device_loss_and_grad(self, mesh):
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        B, T = 16, 4
        key = jax.random.PRNGKey(0)
        x0 = 0.1 * jax.random.normal(key, (B, 4))
        dyn_noise = dyn.sample_noise(jax.random.fold_in(key, 1), (B,))
        pol_noise = pol.sample_noise(jax.random.fold_in(key, 2), (B,))
        z_mm = jax.random.normal(jax.random.fold_in(key, 3), (B, 4))
        z_rr = jax.random.normal(jax.random.fold_in(key, 4), (B, 1))

        loss_fn = parallel.make_sharded_loss_fn(
            dyn, pol, T, mesh, mm_states=True, mm_rewards=True)

        # single-device reference via the plain rollout
        from prob_mbrl_tpu.utils.rollout import rollout
        from prob_mbrl_tpu.algorithms.mc_pilco import discount_weights

        def ref_loss(pp):
            _, _, rewards = rollout(
                x0, dyn, pol, T, dyn_params, dyn_stats, pp, dyn_noise,
                pol_noise, mm_states=True, mm_rewards=True, z_mm=z_mm,
                z_rr=z_rr)[:3]
            w_t, _ = discount_weights(None, T)
            return -jnp.mean(jnp.sum(rewards[..., 0] * w_t[:, None], 0))

        args = (x0, dyn_params, dyn_stats, dyn_noise, pol_noise, z_mm, z_rr)
        l_sharded, g_sharded = jax.value_and_grad(loss_fn)(pol_params, *args)
        l_ref, g_ref = jax.value_and_grad(ref_loss)(pol_params)
        np.testing.assert_allclose(l_sharded, l_ref, rtol=1e-4)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3,
                                                    atol=2e-5),
            g_sharded, g_ref)


class TestShardedMCPILCO:
    def test_sharded_opt_matches_unsharded(self, mesh):
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        cfg = MCPILCOConfig(n_particles=16, steps=3)
        optimizer = optax.adam(1e-3)
        x0_pool = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (8, 4))
        key = jax.random.PRNGKey(2)

        opt_plain = make_mc_pilco_fn(dyn, pol, cfg, optimizer)
        opt_shard = parallel.make_sharded_mc_pilco_fn(
            dyn, pol, cfg, optimizer, mesh)

        p1, _, m1, _ = opt_plain(pol_params, optimizer.init(pol_params),
                                 dyn_params, dyn_stats, x0_pool, key, 0, 4)
        pool_sharded = jax.device_put(
            x0_pool, parallel.particle_sharding(mesh))
        params_repl = parallel.replicate(pol_params, mesh)
        p2, _, m2, _ = opt_shard(params_repl, optimizer.init(params_repl),
                                 dyn_params, dyn_stats, pool_sharded, key,
                                 0, 4)
        np.testing.assert_allclose(m1['loss'], m2['loss'], rtol=1e-3,
                                   atol=1e-5)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3,
                                                    atol=1e-5), p1, p2)

    def test_sharded_opt_with_mm_runs(self, mesh):
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        cfg = MCPILCOConfig(n_particles=16, steps=3, mm_states=True,
                            mm_rewards=True, mm_groups=8)
        optimizer = optax.adam(1e-3)
        opt = parallel.make_sharded_mc_pilco_fn(dyn, pol, cfg, optimizer,
                                                mesh)
        x0_pool = 0.01 * jax.random.normal(jax.random.PRNGKey(1), (8, 4))
        _, _, metrics, _ = opt(pol_params, optimizer.init(pol_params),
                               dyn_params, dyn_stats, x0_pool,
                               jax.random.PRNGKey(2), 0, 3)
        assert np.all(np.isfinite(metrics['loss']))


class TestStaticCollectiveAudit:
    """Compile-time audit of the collectives the sharded loss emits.

    Real multi-chip hardware is unavailable here (BASELINE.md scaling
    caveat); what CAN be checked today is the lowered program itself:
    compile the sharded MM loss for 2/4/8-device meshes and assert the
    psum structure — per-step global moment-matching reductions plus the
    final mean-loss reduction — lands in the optimized HLO as all-reduces
    whose count is device-count invariant (SPMD: one program, any N).
    """

    def _compiled_hlo(self, n_devices, steps=3):
        dyn, pol, dyn_params, dyn_stats, pol_params = tiny_setup()
        mesh = parallel.make_mesh(n_devices)
        B = 16
        key = jax.random.PRNGKey(0)
        x0 = 0.1 * jax.random.normal(key, (B, 4))
        dyn_noise = dyn.sample_noise(jax.random.fold_in(key, 1), (B,))
        pol_noise = pol.sample_noise(jax.random.fold_in(key, 2), (B,))
        z_mm = jax.random.normal(jax.random.fold_in(key, 3), (B, 4))
        z_rr = jax.random.normal(jax.random.fold_in(key, 4), (B, 1))
        loss_fn = parallel.make_sharded_loss_fn(
            dyn, pol, steps, mesh, mm_states=True, mm_rewards=True)
        compiled = jax.jit(loss_fn).lower(
            pol_params, x0, dyn_params, dyn_stats, dyn_noise, pol_noise,
            z_mm, z_rr).compile()
        return compiled.as_text()

    def test_allreduce_count_is_device_invariant(self):
        counts = {}
        for n in (2, 4, 8):
            hlo = self._compiled_hlo(n)
            counts[n] = hlo.count('all-reduce')
        assert counts[2] == counts[4] == counts[8], counts
        # at minimum: the per-step MM moment reductions (states + rewards
        # are batched into the scan body) and the final mean-loss psum
        assert counts[8] >= 2, counts

    def test_collectives_scale_with_steps_not_devices(self):
        # MM psums live in the scan body -> all-reduce op count in the
        # lowered module is constant in steps too (scan reuses the body)
        h3 = self._compiled_hlo(4, steps=3)
        h6 = self._compiled_hlo(4, steps=6)
        assert h3.count('all-reduce') == h6.count('all-reduce')


class TestDistributedInitialize:
    """2-process jax.distributed smoke run (VERDICT r2 item 8): the
    multi-host claim in parallel/sharding.py must be executed code."""

    @pytest.mark.slow
    def test_two_process_psum(self, tmp_path):
        import socket
        import subprocess
        import sys
        with socket.socket() as s:
            s.bind(('127.0.0.1', 0))
            port = s.getsockname()[1]
        worker = tmp_path / 'worker.py'
        worker.write_text(
            "import os, sys\n"
            "os.environ['JAX_PLATFORMS'] = 'cpu'\n"
            "os.environ['XLA_FLAGS'] = "
            "'--xla_force_host_platform_device_count=2'\n"
            "import jax, jax.numpy as jnp\n"
            "pid = int(sys.argv[1]); port = sys.argv[2]\n"
            "jax.distributed.initialize(f'127.0.0.1:{port}',"
            " num_processes=2, process_id=pid)\n"
            "assert jax.device_count() == 4, jax.device_count()\n"
            "assert jax.local_device_count() == 2\n"
            "from prob_mbrl_tpu import parallel\n"
            "mesh = parallel.make_mesh()  # all 4 global devices\n"
            "x = jnp.arange(4.0)\n"
            "y = jax.jit(lambda v: jnp.sum(v * v),\n"
            "            in_shardings=parallel.particle_sharding(mesh),\n"
            "            out_shardings=None)(x)\n"
            "assert float(y) == 14.0, float(y)\n"
            "print(f'proc {pid} OK', flush=True)\n"
            "jax.distributed.shutdown()\n")
        env = dict(os.environ)
        env.pop('PALLAS_AXON_POOL_IPS', None)
        env.pop('PALLAS_AXON_REMOTE_COMPILE', None)
        env['JAX_PLATFORMS'] = 'cpu'
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
        procs = [subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            for i in range(2)]
        outs = []
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
            assert p.returncode == 0, f'worker failed:\n{out[-2000:]}'
        assert 'proc 0 OK' in outs[0] and 'proc 1 OK' in outs[1]


class TestShardedDynamicsFit:
    """VERDICT r3 #3: --n_devices shards the dynamics fit end-to-end."""

    def test_sharded_fit_matches_single_device(self, mesh):
        from prob_mbrl_tpu.utils.train_regressor import (
            make_train_fn, normalize_dataset)
        import test_algorithms as ta
        dyn, pol, dyn_params, dyn_stats, _ = ta.tiny_setup()
        reg = dyn.regressor
        key = jax.random.PRNGKey(0)
        N, Din = 64, 5
        X = jax.random.normal(key, (N, Din))
        Y = 0.1 * jax.random.normal(jax.random.fold_in(key, 1), (N, 4))
        stats = reg.fit_stats(X, Y)
        Xn, Yn = normalize_dataset(stats, X, Y)
        opt = optax.adam(1e-3)

        train_1 = make_train_fn(reg, opt, batchsize=16)
        train_m = make_train_fn(reg, opt, batchsize=16, mesh=mesh)
        k = jax.random.PRNGKey(2)
        p1, _, m1, _ = train_1(dyn_params, opt.init(dyn_params), Xn, Yn,
                               k, 30)
        pm, _, mm_, _ = train_m(dyn_params, opt.init(dyn_params), Xn, Yn,
                                k, 30)
        # same RNG stream -> identical minibatches; sharding only changes
        # reduction order
        np.testing.assert_allclose(np.asarray(m1['loss']),
                                   np.asarray(mm_['loss']),
                                   rtol=1e-3, atol=1e-5)
        err = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), p1, pm)
        assert jax.tree_util.tree_reduce(max, err) < 1e-3

    def test_sharded_fit_hlo_carries_batch_sharding(self, mesh):
        from prob_mbrl_tpu.utils.train_regressor import (
            make_train_fn, normalize_dataset)
        import test_algorithms as ta
        dyn, _, dyn_params, _, _ = ta.tiny_setup()
        reg = dyn.regressor
        X = jax.random.normal(jax.random.PRNGKey(0), (64, 5))
        Y = 0.1 * jax.random.normal(jax.random.PRNGKey(1), (64, 4))
        stats = reg.fit_stats(X, Y)
        Xn, Yn = normalize_dataset(stats, X, Y)
        opt = optax.adam(1e-3)
        train_m = make_train_fn(reg, opt, batchsize=16, mesh=mesh)
        lowered = train_m.lower(dyn_params, opt.init(dyn_params), Xn, Yn,
                                jax.random.PRNGKey(2), 10)
        compiled = lowered.compile()
        txt = compiled.as_text()
        # DP fit: per-shard compute + gradient all-reduce across the mesh
        assert 'all-reduce' in txt, 'no gradient all-reduce in sharded fit'
