"""Profiling/tracing helpers (the TPU-native observability layer).

The reference has no tracing or profiling subsystem (SURVEY.md §5: tqdm bars
are the only runtime introspection; its one `torch.jit.trace` cache is dead
code at `prob_mbrl/utils/rollout.py:32-50`). On TPU the native story is
``jax.profiler``: capture a trace around any hot region and inspect it with
TensorBoard/XProf or Perfetto. These wrappers keep that one import away and
add a wall-clock section timer that plays well with async dispatch.
"""
import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir='/tmp/prob_mbrl_tpu_trace', create_perfetto_link=False):
    """Capture a jax.profiler trace of the enclosed region.

    Example::

        with profiling.trace('/tmp/trace'):
            opt(pol_params, opt_state, ...)  # any jitted work
    """
    jax.profiler.start_trace(logdir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named trace span (shows up in the profiler timeline).

    Usable as decorator or context manager: ``with annotate('rollout'): ...``
    """
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def section(name, results=None, sync=True):
    """Wall-clock timer that blocks on async dispatch before stopping.

    ``results`` (optional dict) accumulates ``name -> seconds``.
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync:
            # drain the dispatch queue so the measurement covers device work
            jax.effects_barrier()
        dt = time.perf_counter() - t0
        if results is not None:
            results[name] = results.get(name, 0.0) + dt


def device_memory_stats(device=None):
    """Per-device HBM usage (bytes) when the backend exposes it, else {}."""
    d = device or jax.devices()[0]
    stats = getattr(d, 'memory_stats', lambda: None)()
    return stats or {}
