"""Smoke tests for the experiment drivers (the framework's CLI surface).

Each driver runs as a subprocess on tiny configurations — the TPU-native
version of the reference's de-facto verification strategy (SURVEY.md §4:
"executable examples as smoke tests").
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, 'examples')

TINY_PILCO = ['--ps_iters', '1', '--control_H', '8', '--pred_H', '4',
              '--n_initial_epi', '1',
              '--dyn_opt_iters', '20', '--dyn_batch_size', '16',
              '--pol_opt_iters', '10', '--pol_batch_size', '8',
              '--dyn_shape', '16,16', '--pol_shape', '16,16']


def hermetic_cpu_env():
    """Subprocess env that cannot touch the shared TPU tunnel.

    JAX_PLATFORMS=cpu alone is NOT hermetic here: the axon sitecustomize
    registers the remote-TPU PJRT plugin at interpreter startup whenever
    PALLAS_AXON_POOL_IPS is set, and that registration dials the tunnel —
    which can hang for minutes when the shared chip is contended (the
    round-2 `evaluate_policy` smoke-test timeouts). Stripping the pool-IPs
    var makes sitecustomize a no-op, so the subprocess never opens the
    tunnel at all.
    """
    env = dict(os.environ, JAX_PLATFORMS='cpu', MPLBACKEND='Agg')
    env.pop('XLA_FLAGS', None)  # single virtual device is enough & faster
    env.pop('PALLAS_AXON_POOL_IPS', None)
    env.pop('PALLAS_AXON_REMOTE_COMPILE', None)
    return env


def run_example(script, *extra, timeout=420):
    env = hermetic_cpu_env()
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), *extra],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO)
    assert out.returncode == 0, (
        f'{script} failed:\nSTDOUT:{out.stdout[-2000:]}\n'
        f'STDERR:{out.stderr[-2000:]}')
    return out.stdout


def results_folder_from(stdout):
    for line in stdout.splitlines():
        if 'results ->' in line:
            return line.split('results ->')[-1].strip()
    raise AssertionError(f'no results folder printed:\n{stdout}')


def test_deep_pilco_no_mm_and_evaluate(tmp_path):
    stdout = run_example('deep_pilco_no_mm.py', '-o', str(tmp_path),
                         *TINY_PILCO)
    folder = results_folder_from(stdout)
    assert os.path.exists(os.path.join(folder, 'args.json'))
    assert os.path.exists(os.path.join(folder, 'experience.pkl'))
    with open(os.path.join(folder, 'args.json')) as f:
        assert json.load(f)['ps_iters'] == 1
    # replay the saved snapshots into a learning curve
    out2 = run_example('evaluate_policy.py', folder, '--n_evals', '1')
    assert 'snapshot' in out2
    assert os.path.exists(os.path.join(folder, 'learning_curve.png'))


def test_deep_pilco_sharded_virtual_mesh(tmp_path):
    """--n_devices shards particles over a virtual 8-device mesh (VERDICT r2
    item 7: the flag must reach parallel.make_mesh from the CLI), and
    --dtype bfloat16 routes the MLP matmuls through bf16."""
    env = hermetic_cpu_env()
    env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=8'
    out = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, 'deep_pilco_no_mm.py'),
         '-o', str(tmp_path), *TINY_PILCO, '--n_devices', '8',
         '--dtype', 'bfloat16'],
        capture_output=True, text=True, timeout=420, env=env, cwd=REPO)
    assert out.returncode == 0, (
        f'sharded driver failed:\nSTDOUT:{out.stdout[-2000:]}\n'
        f'STDERR:{out.stderr[-2000:]}')
    assert 'sharding 8 particles over 8 devices' in out.stdout
    assert 'episode 0' in out.stdout


def test_deep_pilco_resume_from_checkpoint(tmp_path):
    """--load_from resumes params + experience from a previous run's folder
    (the reference's resume flow, `deep_pilco_mm.py:60-62` +
    `utils/core.py:200-226`)."""
    stdout = run_example('deep_pilco_no_mm.py', '-o', str(tmp_path),
                         *TINY_PILCO)
    folder = results_folder_from(stdout)
    stdout2 = run_example('deep_pilco_no_mm.py', '-o', str(tmp_path),
                          *TINY_PILCO, '--load_from', folder)
    folder2 = results_folder_from(stdout2)
    assert folder2 != folder
    # the resumed run starts from the first run's experience: its saved
    # dataset holds both runs' episodes (first run: 1 initial + 1 collected)
    sys.path.insert(0, REPO)
    from prob_mbrl_tpu.utils import ExperienceDataset
    exp1, exp2 = ExperienceDataset(), ExperienceDataset()
    exp1.load(os.path.join(folder, 'experience.pkl'))
    exp2.load(os.path.join(folder2, 'experience.pkl'))
    assert exp2.n_episodes() > exp1.n_episodes()


@pytest.mark.slow
def test_deep_pilco_mixture_dynamics(tmp_path):
    """--dyn_components 2: the GaussianMixtureDensity dynamics head through
    the full driver (`deep_pilco_mm.py:116-127` mixture branch)."""
    stdout = run_example('deep_pilco_no_mm.py', '-o', str(tmp_path),
                         *TINY_PILCO, '--dyn_components', '2')
    assert 'episode 0' in stdout


@pytest.mark.slow
def test_deep_pilco_learned_reward_prioritized(tmp_path):
    """--learn_reward + --prioritized_replay through the full driver: the
    learned-reward head (`core.py:286-303`) and the SumTree x0-priority
    path (`mc_pilco.py:156-188`) compose end-to-end."""
    stdout = run_example('deep_pilco_no_mm.py', '-o', str(tmp_path),
                         *TINY_PILCO, '--learn_reward',
                         '--prioritized_replay')
    assert 'episode 0' in stdout


@pytest.mark.slow
def test_deep_pilco_mm(tmp_path):
    stdout = run_example('deep_pilco_mm.py', '-o', str(tmp_path),
                         *TINY_PILCO)
    assert 'episode 0' in stdout


@pytest.mark.slow
def test_deep_pilco_with_value(tmp_path):
    stdout = run_example('deep_pilco_no_mm_with_value.py', '-o',
                         str(tmp_path), *TINY_PILCO)
    assert 'episode 0' in stdout


@pytest.mark.slow
def test_mbddpg(tmp_path):
    stdout = run_example(
        'mbddpg.py', '-o', str(tmp_path), '--ps_iters', '1',
        '--control_H', '8', '--pred_H', '4', '--n_rnd_epi', '2',
        '--fit_iters', '4', '--dyn_opt_iters', '20',
        '--dyn_batch_size', '16')
    assert 'episode 0' in stdout


@pytest.mark.slow
def test_bnn_regression_tiny():
    env = hermetic_cpu_env()
    code = ('import sys; sys.path.insert(0, "examples"); '
            'import bnn_regression as b; b.main(iters=40, plot=False)')
    out = subprocess.run([sys.executable, '-c', code], capture_output=True,
                         text=True, timeout=420, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
