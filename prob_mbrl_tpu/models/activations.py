"""Activation functions (reference: `prob_mbrl/models/activations.py:4-39`).

Represented as named pure functions so MLP specs stay hashable/static under jit.
"""
import jax
import jax.numpy as jnp
import numpy as np


def relu(x):
    return jax.nn.relu(x)


def swish(x):
    """x * sigmoid(x) (`activations.py:4-6`)."""
    return x * jax.nn.sigmoid(x)


def exp_rbf(x):
    """exp(-0.5 x^2) RBF activation (`activations.py:9-11`)."""
    return jnp.exp(-0.5 * x ** 2)


def sin(x):
    return jnp.sin(x)


def sinlu(x):
    """relu(x) - sin(relu(-x)) (`activations.py:19-25`)."""
    return jax.nn.relu(x) - jnp.sin(jax.nn.relu(-x))


def hh_sinlu(x):
    """Half sin / half relu with alternating signs (`activations.py:28-39`).

    Multiplies features by alternating (-1, +1), applies sin to the first half
    and relu to the second half of the feature axis.
    """
    n = x.shape[-1]
    # numpy: static constant traced in every MLP forward (see ops/math.py)
    signs = (2 * (np.arange(n) % 2) - 1).astype(np.float32)
    x = x * signs
    half = n // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([jnp.sin(x1), jax.nn.relu(x2)], -1)


def tanh(x):
    return jnp.tanh(x)


def identity(x):
    return x


ACTIVATIONS = {
    'relu': relu,
    'swish': swish,
    'exp': exp_rbf,
    'sin': sin,
    'sinlu': sinlu,
    'hhsinlu': hh_sinlu,
    'tanh': tanh,
    'identity': identity,
}


def get(name):
    if callable(name):
        return name
    return ACTIVATIONS[name]
