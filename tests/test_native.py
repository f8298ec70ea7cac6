"""Native C++ sum tree vs the pure-Python implementation."""
import numpy as np
import pytest

from prob_mbrl_tpu import native
from prob_mbrl_tpu.utils.experience import SumTree

pytestmark = pytest.mark.skipif(not native.available(),
                                reason='no native toolchain')


def _filled_pair(n=100, max_size=128, seed=3):
    rng = np.random.RandomState(seed)
    py = SumTree(max_size)
    cc = native.NativeSumTree(max_size, seed=7)
    prios = rng.rand(n) + 0.01
    for i, p in enumerate(prios):
        py.append(i, p)
        cc.append(i, p)
    return py, cc


def test_native_matches_python_retrieval():
    py, cc = _filled_pair()
    targets = np.linspace(0.0, py.tree[0] * 0.999, 33)
    pi, pp, pd = py.get_batch(targets)
    ci, cp, cd = cc.get_batch(targets)
    np.testing.assert_array_equal(ci, pi)
    np.testing.assert_allclose(cp, pp, rtol=1e-12)
    assert cd == pd


def test_native_update_and_renormalize():
    py, cc = _filled_pair()
    for t in (py, cc):
        t.update(t.max_size - 1 + 5, 3.5)
        t.renormalize()
    assert np.isclose(cc.total, py.tree[0])
    assert np.isclose(cc.norm_factor, py.norm_factor)
    assert np.isclose(cc.max_p, py.max_p)
    # post-renormalize retrieval still agrees
    targets = np.linspace(0.0, py.tree[0] * 0.999, 17)
    np.testing.assert_array_equal(cc.get_batch(targets)[0],
                                  py.get_batch(targets)[0])


def test_native_sample_statistics():
    """Stratified sampling visits high-priority leaves proportionally."""
    cc = native.NativeSumTree(64, seed=11)
    for i in range(64):
        cc.append(i, 10.0 if i == 3 else 0.1)
    samples, idxs, weights = cc.sample(1000, beta=0.5)
    frac = np.mean(np.asarray(samples) == 3)
    expect = 10.0 / (10.0 + 63 * 0.1)
    assert abs(frac - expect) < 0.1
    assert weights.max() == 1.0
    assert (weights > 0).all()
    assert cc.max_count > 1


def test_native_ring_overwrite():
    cc = native.NativeSumTree(8, seed=0)
    for i in range(12):
        cc.append(i, 1.0)
    assert cc.size == 8
    # oldest entries were overwritten in ring order
    assert sorted(cc.data) == list(range(4, 12))


def test_make_sum_tree_fallback():
    t = native.make_sum_tree(16, prefer_native=False)
    assert isinstance(t, SumTree)
    t2 = native.make_sum_tree(16)
    assert isinstance(t2, native.NativeSumTree)
