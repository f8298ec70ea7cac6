"""Fused Pallas MLP kernel vs the reference (unfused XLA) path.

Runs in interpreter mode off-TPU (`fused_mlp` auto-selects), so these tests
validate the kernel logic on the CPU mesh used by the rest of the suite.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from prob_mbrl_tpu import models
from prob_mbrl_tpu.ops.pallas import fused_mlp_supported


def _spec(**kw):
    base = dict(input_dims=5, output_dims=4, hidden_dims=(32, 32),
                nonlin='relu')
    base.update(kw)
    return models.MLPSpec(**base)


def _pair(spec):
    return spec, dataclasses.replace(spec, fused=True)


@pytest.mark.parametrize('dropout,nonlin', [
    (None, 'relu'),
    (models.bdropout(0.3), 'swish'),
    (models.cdropout(0.2), 'sin'),
    (models.cdropout(0.2), 'tanh'),
])
def test_fused_matches_unfused_forward(dropout, nonlin):
    spec, fspec = _pair(_spec(dropout=dropout, nonlin=nonlin))
    key = jax.random.PRNGKey(0)
    params = spec.init(key)
    x = jax.random.normal(jax.random.PRNGKey(1), (37, 5))
    noise = (spec.sample_noise(jax.random.PRNGKey(2), (37,))
             if dropout is not None else None)
    y_ref = spec.apply(params, x, noise, train=True)
    y_fused = fspec.apply(params, x, noise, train=True)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize('dropout', [
    models.bdropout(0.3),
    models.cdropout(0.2),
])
def test_fused_matches_unfused_grads(dropout):
    """Gradients wrt params AND x agree — including concrete-dropout
    straight-through grads into logit_p flowing through the kernel's
    d(mask) output."""
    spec, fspec = _pair(_spec(dropout=dropout, nonlin='swish'))
    params = spec.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (23, 5))
    noise = spec.sample_noise(jax.random.PRNGKey(2), (23,))

    def loss(s):
        def f(p, xx):
            return jnp.sum(jnp.sin(s.apply(p, xx, noise, train=True)) ** 2)
        return jax.grad(f, argnums=(0, 1))(params, x)

    g_ref, gx_ref = loss(spec)
    g_fused, gx_fused = loss(fspec)
    np.testing.assert_allclose(np.asarray(gx_fused), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-5)
    def check(kp, a, b):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=jax.tree_util.keystr(kp))

    jax.tree_util.tree_map_with_path(check, g_ref, g_fused)


def test_fused_batch_tiling_masks_padded_rows():
    """Odd batch sizes exercise the row-validity masking in both kernels."""
    spec, fspec = _pair(_spec(dropout=models.bdropout(0.5),
                              hidden_dims=(16,)))
    params = spec.init(jax.random.PRNGKey(0))
    for B in (1, 7, 100):
        x = jax.random.normal(jax.random.PRNGKey(B), (B, 5))
        noise = spec.sample_noise(jax.random.PRNGKey(B + 1), (B,))
        y_ref = spec.apply(params, x, noise, train=True)
        y = fspec.apply(params, x, noise, train=True)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=1e-5, atol=1e-5)


def test_fused_supported_gating():
    assert fused_mlp_supported(2, ('relu', 'swish'))
    assert not fused_mlp_supported(2, ('relu',), layer_norm=True)
    assert not fused_mlp_supported(2, ('relu',), spectral_norm=True)
    assert not fused_mlp_supported(2, ('hhsinlu', 'hhsinlu'))
    assert not fused_mlp_supported(0, ())


def test_fused_rejects_unsupported_config():
    spec = _spec(layer_norm=True, fused=True)
    params_key = jax.random.PRNGKey(0)
    params = spec.init(params_key)
    x = jnp.ones((4, 5))
    with pytest.raises(ValueError):
        spec.apply(params, x)


def test_fused_leading_batch_dims():
    spec, fspec = _pair(_spec(dropout=models.bdropout(0.4)))
    params = spec.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 11, 5))
    noise = spec.sample_noise(jax.random.PRNGKey(2), (3, 11))
    y_ref = spec.apply(params, x, noise, train=True)
    y = fspec.apply(params, x, noise, train=True)
    assert y.shape == (3, 11, 4)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-5)
