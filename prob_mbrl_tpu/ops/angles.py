"""Angle embedding: theta -> (sin(theta), cos(theta)).

TPU-native equivalent of the reference `prob_mbrl/utils/angles.py:7-42`.
The reference caches index tensors keyed on (dtype, device, width, dims); under
jit the gather indices are static Python data, so no cache is needed — XLA
constant-folds them.

Layout matches the reference: non-angle dims first (in their original relative
order), then sin of the angle dims, then cos of the angle dims.
"""
import numpy as np
import jax.numpy as jnp


def complement_dims(width, dims):
    """Indices of the non-angle dimensions, preserving order."""
    dims = set(int(d) for d in dims)
    return tuple(i for i in range(width) if i not in dims)


def embedded_size(width, dims):
    """Size of the embedded representation: width + len(dims)."""
    return width + len(tuple(dims))


def to_complex(x, dims):
    """Embed angular dimensions of ``x`` as (sin, cos) pairs.

    Args:
      x: [..., D] array (jnp or np).
      dims: static sequence of angular dim indices.

    Returns:
      [..., D + len(dims)] array laid out as [others, sin(angles), cos(angles)].
    """
    dims = tuple(int(d) for d in dims)
    if len(dims) == 0:
        return x
    odims = complement_dims(x.shape[-1], dims)
    if isinstance(x, np.ndarray):
        angles = x[..., list(dims)]
        others = x[..., list(odims)]
        return np.concatenate([others, np.sin(angles), np.cos(angles)], -1)
    # static per-dim slices instead of a gather: identical semantics, but
    # slices+concat lower everywhere (incl. Mosaic, whose gather support is
    # partial — the fused rollout kernel traces through this function)
    angles = jnp.concatenate([x[..., d:d + 1] for d in dims], -1)
    others = (jnp.concatenate([x[..., d:d + 1] for d in odims], -1)
              if odims else x[..., :0])
    return jnp.concatenate([others, jnp.sin(angles), jnp.cos(angles)], -1)
