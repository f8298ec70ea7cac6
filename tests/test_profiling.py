"""Profiling helpers: section timing, annotations, trace capture."""
import os

import jax
import jax.numpy as jnp

from prob_mbrl_tpu.utils import profiling


def test_section_and_annotation():
    res = {}
    with profiling.section('work', res):
        with profiling.annotate('span'):
            jnp.dot(jnp.ones((32, 32)), jnp.ones((32, 32))).block_until_ready()
    assert res['work'] > 0
    with profiling.section('work', res):
        pass
    assert res['work'] > 0  # accumulates


def test_trace_capture(tmp_path):
    logdir = str(tmp_path / 'trace')
    with profiling.trace(logdir):
        jnp.sum(jnp.arange(128.0)).block_until_ready()
    # jax writes plugins/profile/<ts>/*.trace.json.gz (or .pb) under logdir
    found = []
    for root, _, files in os.walk(logdir):
        found.extend(files)
    assert found, 'trace produced no files'


def test_device_memory_stats():
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)
