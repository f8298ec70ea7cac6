"""Masked autoregressive flow (MAF) initial-state model.

The reference uses the `nflows` package's MAF for its initial-state
distribution with noise-conditioned smoothing
(`examples/transformer_models.py:292-330,521-531`). This is a from-scratch
JAX MAF: a stack of MADE blocks (masked dense nets predicting per-dim
(mu, log_scale) autoregressively) with reversed dim orderings between
blocks and a standard-normal base.

Density direction (training) is parallel: one masked forward per block.
Sampling inverts each block dimension-by-dimension (D small for state
spaces) with a ``fori``-free static loop.
"""
import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp

_LOG2PI = math.log(2.0 * math.pi)


def _made_masks(D, hidden, reverse=False):
    """Degree-based MADE masks for a [D -> hidden -> hidden -> 2D] net."""
    in_deg = jnp.arange(1, D + 1)
    if reverse:
        in_deg = in_deg[::-1]
    h_deg = (jnp.arange(hidden) % max(1, D - 1)) + 1
    out_deg = jnp.concatenate([in_deg, in_deg])  # (mu, log_s) per dim
    m1 = (h_deg[None, :] >= in_deg[:, None]).astype(jnp.float32)   # [D, H]
    m2 = (h_deg[None, :] >= h_deg[:, None]).astype(jnp.float32)    # [H, H]
    m3 = (out_deg[None, :] > h_deg[:, None]).astype(jnp.float32)   # [H, 2D]
    return m1, m2, m3, in_deg


@dataclasses.dataclass(frozen=True)
class MAFSpec:
    dims: int
    n_blocks: int = 5
    hidden: int = 64
    max_log_scale: float = 5.0

    def init(self, key, dtype=jnp.float32):
        params = []
        for b in range(self.n_blocks):
            k = jax.random.fold_in(key, b)
            k1, k2, k3 = jax.random.split(k, 3)
            D, H = self.dims, self.hidden
            params.append({
                'w1': 0.1 * jax.random.normal(k1, (D, H), dtype),
                'b1': jnp.zeros((H,), dtype),
                'w2': 0.1 * jax.random.normal(k2, (H, H), dtype),
                'b2': jnp.zeros((H,), dtype),
                'w3': 0.01 * jax.random.normal(k3, (H, 2 * D), dtype),
                'b3': jnp.zeros((2 * D,), dtype),
            })
        return params

    def _block_params(self, p, x, reverse):
        m1, m2, m3, _ = _made_masks(self.dims, self.hidden, reverse)
        h = jax.nn.relu(jnp.dot(x, p['w1'] * m1) + p['b1'])
        h = jax.nn.relu(jnp.dot(h, p['w2'] * m2) + p['b2'])
        out = jnp.dot(h, p['w3'] * m3) + p['b3']
        mu, log_s = out[..., :self.dims], out[..., self.dims:]
        log_s = jnp.clip(log_s, -self.max_log_scale, self.max_log_scale)
        return mu, log_s

    def log_prob(self, params, x):
        """Exact log density: parallel masked passes, one per block."""
        log_det = 0.0
        z = x
        for b, p in enumerate(params):
            mu, log_s = self._block_params(p, z, reverse=bool(b % 2))
            z = (z - mu) * jnp.exp(-log_s)
            log_det = log_det - jnp.sum(log_s, -1)
        base = -0.5 * jnp.sum(z ** 2 + _LOG2PI, -1)
        return base + log_det

    def sample(self, params, key, n_samples):
        """Invert the flow: sequential per-dimension solve per block."""
        z = jax.random.normal(key, (n_samples, self.dims))
        for b in range(self.n_blocks - 1, -1, -1):
            p = params[b]
            reverse = bool(b % 2)
            order = (jnp.arange(self.dims)[::-1] if reverse
                     else jnp.arange(self.dims))
            x = jnp.zeros_like(z)
            # autoregressive inversion: dim with degree d depends only on
            # dims with smaller degree, so fill in degree order
            for d in range(self.dims):
                mu, log_s = self._block_params(p, x, reverse)
                x_new = mu + z * jnp.exp(log_s)
                idx = order[d]
                x = x.at[:, idx].set(x_new[:, idx])
            z = x
        return z
