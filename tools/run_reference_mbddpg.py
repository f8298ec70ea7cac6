"""Run the reference's examples/mbddpg.py headless.

The stock example hard-wires a pyglet ``env.render()`` callback and
matplotlib rollout plots into the training loop
(`/root/reference/examples/mbddpg.py:71,96-103`); this wrapper applies the
run_reference shims, no-ops those display hooks, points the results file at
a given directory, and execs the example. Benchmark tooling only.

Usage::

    python tools/run_reference_mbddpg.py /root/repo/runs/ref_mbddpg_s1
"""
import os
import runpy
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

from run_reference import setup_reference_path  # noqa: E402


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else '/root/repo/runs/ref_mbddpg'
    os.makedirs(out_dir, exist_ok=True)
    os.environ.setdefault('MPLBACKEND', 'Agg')
    # the example writes to ~/.prob_mbrl/results_*.pth.tar; redirect HOME so
    # the experience checkpoint lands in out_dir/.prob_mbrl/
    os.environ['HOME'] = out_dir
    setup_reference_path()
    import torch
    torch.set_num_threads(int(os.environ.get('REF_NUM_THREADS', '1')))

    import prob_mbrl.envs as renvs
    import prob_mbrl.utils as rutils
    renvs.Cartpole.render = lambda self, *a, **k: None
    rutils.plot_rollout = lambda *a, **k: None
    rutils.plot_trajectories = lambda *a, **k: None

    # UPSTREAM BUG workaround: MBDDPG.fit does ``zip(*trajs)`` over
    # rollout's ``[states, actions, rewards]`` lists (`MBDDPG.py:156-157`),
    # which transposes the wrong axis and crashes on the shape mismatch —
    # the stock example cannot run upstream at all. Pre-zipping the
    # trajectory lists into per-step (s, a, r) tuples makes fit's
    # ``zip(*trajs)`` recover exactly the per-kind stacks it expects
    # (states truncate from T+1 to T entries; fit only uses transitions).
    _orig_rollout = rutils.rollout

    def _rollout_zipped(*a, **k):
        return list(zip(*_orig_rollout(*a, **k)))

    import prob_mbrl.algorithms.MBDDPG as rmbddpg
    rmbddpg.utils.rollout = _rollout_zipped

    sys.argv = ['/root/reference/examples/mbddpg.py']
    runpy.run_path('/root/reference/examples/mbddpg.py', run_name='__main__')


if __name__ == '__main__':
    main()
