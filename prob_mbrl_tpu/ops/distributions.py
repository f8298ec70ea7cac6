"""Minimal reparameterized distributions for the conditional-density API.

JAX-native stand-ins for the ``torch.distributions`` objects the reference's
v2 API builds (`prob_mbrl/models/conditional_density.py:91-335`): full-cov
multivariate normals, straight-through relaxed mixtures/categoricals, and the
row-vector affine (whitening) transform. Instances are lightweight containers
of traced arrays, built and consumed inside jitted functions; sampling is
explicit-key (``rsample(key, ...)``) instead of stateful.
"""
import math

import jax
import jax.numpy as jnp

_LOG2PI = math.log(2.0 * math.pi)


def _tri_solve(L, b, lower=True):
    """solve L x = b with batch-dim broadcasting (triangular_solve requires
    matching batch ranks)."""
    batch = jnp.broadcast_shapes(L.shape[:-2], b.shape[:-2])
    L = jnp.broadcast_to(L, batch + L.shape[-2:])
    b = jnp.broadcast_to(b, batch + b.shape[-2:])
    return jax.scipy.linalg.solve_triangular(L, b, lower=lower)


class MultivariateNormalTril:
    """N(mu, L L^T) with lower-triangular scale ``L`` (batched)."""

    def __init__(self, mu, scale_tril):
        self.mu = mu
        self.scale_tril = scale_tril

    @property
    def event_dim(self):
        return self.mu.shape[-1]

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.mu.shape
        eps = jax.random.normal(key, shape, self.mu.dtype)
        return self.mu + jnp.einsum('...ij,...j->...i', self.scale_tril, eps)

    def log_prob(self, y):
        D = self.mu.shape[-1]
        diff = y - self.mu
        sol = _tri_solve(self.scale_tril, diff[..., None])[..., 0]
        maha = jnp.sum(sol ** 2, -1)
        logdet = jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1))),
            -1)
        return -0.5 * (maha + D * _LOG2PI) - logdet


class Normal:
    """Independent N(mu, std^2) treated with elementwise log_prob."""

    def __init__(self, mu, std):
        self.mu = mu
        self.std = std

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.mu.shape
        return self.mu + self.std * jax.random.normal(key, shape,
                                                      self.mu.dtype)

    def log_prob(self, y):
        z = (y - self.mu) / self.std
        return -0.5 * (z ** 2 + _LOG2PI) - jnp.log(self.std)


class Categorical:
    def __init__(self, logits):
        self.logits = logits

    @property
    def log_probs(self):
        return jax.nn.log_softmax(self.logits, -1)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.logits.shape[:-1]
        return jax.random.categorical(key, self.logits, -1, shape)

    def log_prob(self, k):
        return jnp.take_along_axis(self.log_probs, k[..., None], -1)[..., 0]


class OneHotCategorical(Categorical):
    def sample(self, key, sample_shape=()):
        k = super().sample(key, sample_shape)
        return jax.nn.one_hot(k, self.logits.shape[-1], dtype=self.logits.dtype)

    def log_prob(self, one_hot):
        return jnp.sum(self.log_probs * one_hot, -1)


class RelaxedOneHotCategorical:
    """Gumbel-softmax (concrete) distribution on the simplex."""

    def __init__(self, temperature, logits):
        self.temperature = temperature
        self.logits = logits

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.logits.shape
        g = jax.random.gumbel(key, shape, self.logits.dtype)
        return jax.nn.softmax((self.logits + g) / self.temperature, -1)

    def log_prob(self, y):
        # Maddison et al. 2016, eq. 6
        K = self.logits.shape[-1]
        t = self.temperature
        score = self.logits - (t + 0.0) * jnp.log(y)
        score = score - jax.scipy.special.logsumexp(score, -1, keepdims=True)
        log_norm = (jax.scipy.special.gammaln(jnp.asarray(float(K)))
                    + (K - 1) * jnp.log(t))
        return jnp.sum(score - jnp.log(y), -1) + log_norm


def straight_through_onehot(simplex):
    """Hard argmax one-hot forward, identity-to-simplex backward
    (`conditional_density.py:250-259`)."""
    hard = jax.nn.one_hot(jnp.argmax(simplex, -1), simplex.shape[-1],
                          dtype=simplex.dtype)
    return jax.lax.stop_gradient(hard - simplex) + simplex


class MixtureSameFamily:
    """Mixture with straight-through relaxed (reparameterized) sampling
    (`conditional_density.py:225-267` RelaxedMixtureSameFamily).

    ``mixture``: Categorical over components (logits [..., K]).
    ``components``: a distribution whose batch shape ends with the component
    axis K and whose samples/means have an extra trailing event axis.
    """

    def __init__(self, mixture, components, temperature=0.1):
        self.mixture = mixture
        self.components = components
        self.temperature = temperature

    def rsample(self, key, sample_shape=()):
        k_mix, k_comp = jax.random.split(key)
        relaxed = RelaxedOneHotCategorical(self.temperature,
                                           self.mixture.logits)
        simplex = relaxed.rsample(k_mix, sample_shape)  # [..., K]
        onehot = straight_through_onehot(simplex)
        comp_samples = self.components.rsample(k_comp, sample_shape)
        return jnp.sum(comp_samples * onehot[..., None], -2)

    def log_prob(self, y):
        comp_lp = self.components.log_prob(y[..., None, :])  # [..., K]
        mix_lp = self.mixture.log_probs
        return jax.scipy.special.logsumexp(mix_lp + comp_lp, -1)


class AffineTril:
    """y = x @ L^T + loc of a base distribution (so cov(y) = L cov(x) L^T),
    the role of the reference's ScalingTransform + TransformedDistribution
    (`conditional_density.py:10-88,151-163`). NOTE: the reference multiplies
    row vectors by the *untransposed* lower factor (`:67-68`), which is
    self-consistent but does not decorrelate; this implementation uses the
    standard convention so whitened inputs really are white."""

    def __init__(self, base, loc, L):
        self.base = base
        self.loc = loc
        self.L = L

    def rsample(self, key, sample_shape=()):
        x = self.base.rsample(key, sample_shape)
        return jnp.matmul(x, jnp.swapaxes(self.L, -1, -2)) + self.loc

    def log_prob(self, y):
        # invert y = L x (column convention): solve the lower system
        x = _tri_solve(self.L, (y - self.loc)[..., None])[..., 0]
        lp = self.base.log_prob(x)
        logdet = jnp.sum(jnp.log(jnp.abs(jnp.diagonal(self.L, axis1=-2,
                                                      axis2=-1))), -1)
        return lp - logdet
