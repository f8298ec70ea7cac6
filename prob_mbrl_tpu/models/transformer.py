"""Transformer sequence-model dynamics for MBRL.

TPU-native redesign of the reference's prototype sequence-model MBRL
(`examples/transformer_models.py:146-268`): a transformer encoder processes
the interleaved [s_1..s_T, a_1..a_T] token streams (shared positional
encoding per timestep, causal + padding masks), and the per-timestep output
embedding (mean over the two streams) feeds factorized
next-state / reward / done density heads (chained conditioning, `:246-268`).

Differences from the reference by design: pure init/apply pytree params
(no nn.Module state), batch-first [B, T, ...] layout throughout, masks as
additive float arrays built from timestep ids, and fully static shapes so
the autoregressive imagined rollout compiles to a ``lax.scan`` with a fixed
context window.
"""
import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .conditional_density import GaussianDN, SoftmaxDN, density_network_mlp
from .mlp import MLPSpec


def positional_encoding(T, d_model, dtype=jnp.float32):
    """Sinusoidal PE table [T, d_model] (`transformer_models.py:148-165`)."""
    pos = jnp.arange(T, dtype=dtype)[:, None]
    div = jnp.exp(jnp.arange(0, d_model, 2, dtype=dtype)
                  * (-math.log(10000.0) / d_model))
    pe = jnp.zeros((T, d_model), dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


def causal_mask_from_times(q_times, k_times):
    """Additive mask [Q, K]: -inf where key timestep > query timestep
    (`transformer_models.py:176-184`)."""
    blocked = k_times[None, :] > q_times[:, None]
    return jnp.where(blocked, -jnp.inf, 0.0)


def padding_mask_from_lengths(times, seqlens):
    """Additive mask [B, K]: -inf where the token's timestep is beyond the
    episode length (`transformer_models.py:186-188`)."""
    blocked = times[None, :] >= seqlens[:, None]
    return jnp.where(blocked, -jnp.inf, 0.0)


def _linear_init(key, din, dout, dtype):
    std = math.sqrt(2.0 / (din + dout))
    kw, kb = jax.random.split(key)
    return {'w': std * jax.random.normal(kw, (din, dout), dtype),
            'b': jnp.zeros((dout,), dtype)}


def _linear(p, x):
    return jnp.dot(x, p['w']) + p['b']


def _layer_norm(p, x, eps=1e-5):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p['scale'] + p['bias']


@dataclasses.dataclass(frozen=True)
class TransformerEncoderSpec:
    """Post-norm transformer encoder (torch ``TransformerEncoderLayer``
    semantics, as built at `transformer_models.py:191-206`)."""
    d_model: int = 128
    n_heads: int = 4
    n_layers: int = 4
    d_ff: int = 256

    def init(self, key, dtype=jnp.float32):
        params = []
        for i in range(self.n_layers):
            k = jax.random.fold_in(key, i)
            ks = jax.random.split(k, 6)
            d = self.d_model
            params.append({
                'qkv': _linear_init(ks[0], d, 3 * d, dtype),
                'proj': _linear_init(ks[1], d, d, dtype),
                'ff1': _linear_init(ks[2], d, self.d_ff, dtype),
                'ff2': _linear_init(ks[3], self.d_ff, d, dtype),
                'ln1': {'scale': jnp.ones((d,), dtype),
                        'bias': jnp.zeros((d,), dtype)},
                'ln2': {'scale': jnp.ones((d,), dtype),
                        'bias': jnp.zeros((d,), dtype)},
            })
        return params

    def apply(self, params, x, attn_mask=None, pad_mask=None):
        """x: [B, S, d_model]; attn_mask: [S, S] additive; pad_mask: [B, S]
        additive (keys)."""
        B, S, d = x.shape
        H = self.n_heads
        hd = d // H
        mask = 0.0
        if attn_mask is not None:
            mask = mask + attn_mask[None, None]          # [1, 1, S, S]
        if pad_mask is not None:
            mask = mask + pad_mask[:, None, None, :]     # [B, 1, 1, S]
        for p in params:
            qkv = _linear(p['qkv'], x).reshape(B, S, 3, H, hd)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            logits = jnp.einsum('bhqd,bhkd->bhqk', q, k) / math.sqrt(hd)
            if attn_mask is not None or pad_mask is not None:
                logits = logits + mask
            # guard fully-masked rows (all -inf -> NaN softmax)
            w = jax.nn.softmax(logits, -1)
            w = jnp.where(jnp.isnan(w), 0.0, w)
            att = jnp.einsum('bhqk,bhkd->bhqd', w, v)
            att = att.transpose(0, 2, 1, 3).reshape(B, S, d)
            x = _layer_norm(p['ln1'], x + _linear(p['proj'], att))
            ff = _linear(p['ff2'], jax.nn.relu(_linear(p['ff1'], x)))
            x = _layer_norm(p['ln2'], x + ff)
        return x


@dataclasses.dataclass(frozen=True)
class NextStateRewardDoneHeads:
    """Factorized output heads with chained conditioning
    (`transformer_models.py:246-268`): p(s'|e), p(r|e, raw_s),
    p(done|e, raw_s, raw_r)."""
    embedding_size: int
    state_dims: int

    def __post_init__(self):
        E, D = self.embedding_size, self.state_dims
        object.__setattr__(self, 'ps', density_network_mlp(
            E, D, hids=(), dropout=None, input_dropout=0.1))
        object.__setattr__(self, 'pr', density_network_mlp(
            E + GaussianDN.n_params(D), 1, hids=(), dropout=None,
            input_dropout=0.1))
        object.__setattr__(self, 'pdone', density_network_mlp(
            E + GaussianDN.n_params(D) + GaussianDN.n_params(1), 2,
            density_model=SoftmaxDN, hids=(), dropout=None,
            input_dropout=0.1, one_hot=False))

    def init(self, key, dtype=jnp.float32):
        ks = jax.random.split(key, 3)
        return {'ps': self.ps.init(ks[0], dtype),
                'pr': self.pr.init(ks[1], dtype),
                'pdone': self.pdone.init(ks[2], dtype)}

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        ks = jax.random.split(key, 3)
        return {'ps': self.ps.sample_noise(ks[0], batch_shape, dtype),
                'pr': self.pr.sample_noise(ks[1], batch_shape, dtype),
                'pdone': self.pdone.sample_noise(ks[2], batch_shape, dtype)}

    def regularization_loss(self, params):
        return (self.ps.regularization_loss(params['ps'])
                + self.pr.regularization_loss(params['pr'])
                + self.pdone.regularization_loss(params['pdone']))

    def apply(self, params, emb, scaling=None, noise=None, temperature=1.0):
        """emb [..., E] -> (ps, pr, pdone) distribution triple."""
        def raw(model, mp, x, n):
            mlp_noise = n.get('mlp') if n is not None else None
            return model.mlp.apply(mp, x, mlp_noise)

        n = noise or {}
        s_sc = scaling.get('s') if scaling else None
        r_sc = scaling.get('r') if scaling else None
        raw_s = raw(self.ps, params['ps'], emb, n.get('ps'))
        ps = self.ps.get_dist(raw_s, temperature)
        if s_sc is not None:
            from ..ops.distributions import AffineTril
            ps = AffineTril(ps, s_sc['mean'], s_sc['L'])
        x = jnp.concatenate([emb, raw_s], -1)
        raw_r = raw(self.pr, params['pr'], x, n.get('pr'))
        pr = self.pr.get_dist(raw_r, temperature)
        if r_sc is not None:
            from ..ops.distributions import AffineTril
            pr = AffineTril(pr, r_sc['mean'], r_sc['L'])
        x = jnp.concatenate([x, raw_r], -1)
        raw_d = raw(self.pdone, params['pdone'], x, n.get('pdone'))
        pdone = self.pdone.get_dist(raw_d, temperature)
        return ps, pr, pdone


@dataclasses.dataclass(frozen=True)
class TransformerDynamicsModel:
    """Sequence dynamics: (state seq, action seq) -> per-step output dists
    (`transformer_models.py:191-244` DynamicsModel)."""
    state_dims: int
    action_dims: int
    embedding_size: int = 128
    encoder: Optional[TransformerEncoderSpec] = None
    max_horizon: int = 64

    def __post_init__(self):
        if self.encoder is None:
            object.__setattr__(self, 'encoder', TransformerEncoderSpec(
                d_model=self.embedding_size))
        object.__setattr__(self, 'heads', NextStateRewardDoneHeads(
            self.embedding_size, self.state_dims))

    def init(self, key, dtype=jnp.float32):
        ks = jax.random.split(key, 4)
        return {
            's_proj': _linear_init(ks[0], self.state_dims,
                                   self.embedding_size, dtype),
            'a_proj': _linear_init(ks[1], self.action_dims,
                                   self.embedding_size, dtype),
            'encoder': self.encoder.init(ks[2], dtype),
            'heads': self.heads.init(ks[3], dtype),
        }

    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        return {'heads': self.heads.sample_noise(key, batch_shape, dtype)}

    def regularization_loss(self, params):
        return self.heads.regularization_loss(params['heads'])

    def apply(self, params, states, actions, seqlens=None, scaling=None,
              noise=None, temperature=1.0):
        """states [B, T, D], actions [B, T, U] -> (ps, pr, pdone) over
        [B, T, ...]: distributions of s_{t+1}, r_t, done_t given history
        up to t.
        """
        B, T, D = states.shape
        pe = positional_encoding(T, self.embedding_size, states.dtype)
        s_emb = _linear(params['s_proj'], states) + pe[None]
        a_emb = _linear(params['a_proj'], actions) + pe[None]
        # token stream: [s_1..s_T, a_1..a_T] (`transformer_models.py:222-226`)
        x = jnp.concatenate([s_emb, a_emb], 1)          # [B, 2T, E]
        times = jnp.concatenate([jnp.arange(T), jnp.arange(T)])
        attn_mask = causal_mask_from_times(times, times)
        pad_mask = (padding_mask_from_lengths(times, seqlens)
                    if seqlens is not None else None)
        out = self.encoder.apply(params['encoder'], x, attn_mask, pad_mask)
        # combine per-timestep stream embeddings (`:237-239`)
        emb = 0.5 * (out[:, :T] + out[:, T:])
        h_noise = noise.get('heads') if noise is not None else None
        return self.heads.apply(params['heads'], emb, scaling, h_noise,
                                temperature)
