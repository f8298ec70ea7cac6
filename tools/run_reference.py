"""Run the PyTorch reference (/root/reference) examples in this image.

Applies the compatibility shims (classic-gym API, collections.Iterable) and
then executes a reference example script with the given argv, e.g.::

    python tools/run_reference.py deep_pilco_no_mm --ps_iters 40 -s 1 \
        -o /root/repo/runs/ref_no_mm_s1

Used to produce the missing reference baseline numbers (BASELINE.md) and the
learning curves the parity analysis in RESULTS.md compares against. This is
test/benchmark tooling only — no framework code imports it.
"""
import collections
import collections.abc
import os
import runpy
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def setup_reference_path():
    """Make `import prob_mbrl` resolve to /root/reference with shims."""
    # classic-gym shim must win over any installed gym
    sys.path.insert(0, os.path.join(HERE, 'ref_shims'))
    sys.path.insert(0, '/root/reference')
    # py>=3.10: collections.Iterable moved to collections.abc
    for name in ('Iterable', 'Mapping', 'Sequence', 'Callable'):
        if not hasattr(collections, name):
            setattr(collections, name, getattr(collections.abc, name))
    _patch_torch_compat()


def _patch_torch_compat():
    """Shims for reference code written against torch<=1.4 APIs.

    * ``ScalingTransform.__init__`` does ``self.event_dim = event_dim``
      (`conditional_density.py:30`); modern torch made ``Transform.event_dim``
      a read-only property derived from ``domain``. Give the subclass a
      settable property that also swaps in the matching independent
      constraint so TransformedDistribution shape logic stays consistent.
    """
    import torch
    from torch.distributions import constraints

    def _set(self, v):
        self.__dict__['_event_dim'] = int(v)
        dom = (constraints.independent(constraints.real, int(v))
               if v else constraints.real)
        self.__dict__['domain'] = dom
        self.__dict__['codomain'] = dom

    try:
        from prob_mbrl.models.conditional_density import ScalingTransform
        ScalingTransform.event_dim = property(
            lambda self: self.__dict__.get('_event_dim', 0), _set)
    except Exception:  # pragma: no cover - reference import failure
        pass


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 1
    example = sys.argv[1]
    if not example.endswith('.py'):
        example += '.py'
    script = os.path.join('/root/reference/examples', example)
    os.environ.setdefault('MPLBACKEND', 'Agg')
    setup_reference_path()
    import torch
    torch.set_num_threads(int(os.environ.get('REF_NUM_THREADS', '2')))
    sys.argv = [script] + sys.argv[2:]
    runpy.run_path(script, run_name='__main__')
    return 0


if __name__ == '__main__':
    sys.exit(main())
