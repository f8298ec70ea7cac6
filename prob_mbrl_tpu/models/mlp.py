"""Dropout-regularized MLPs as pure init/apply functions.

TPU-first redesign of the reference MLP factory + BSequential container
(`prob_mbrl/models/core.py:15-99`, `prob_mbrl/models/modules.py:198-274`).

Per hidden layer: Linear -> [LayerNorm] -> nonlin -> [Dropout]; optional input
dropout; final Linear projection. Regularization pairs each dropout with the
*next* Linear's weights (Gal & Ghahramani: the dropout preceding a weight
matrix regularizes that matrix) — input dropout regularizes the first Linear,
the dropout after hidden layer i regularizes Linear i+1, the last hidden
dropout regularizes the output Linear. This mirrors the reference's
``BSequential.regularization_loss`` pairing (`modules.py:248-268`).

Everything is shape-static and batch-polymorphic: ``apply`` maps
[..., input_dims] -> [..., output_dims]; dropout noise must carry matching
batch dims (per-particle masks are just noise with a leading particle axis).

Matmuls hit the MXU; ``compute_dtype`` lets callers run the linear layers in
bfloat16 while keeping parameters and reductions in float32.
"""
import dataclasses
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from . import activations as act_lib
from .dropout import BernoulliDropoutSpec, ConcreteDropoutSpec, DropoutSpec


@dataclasses.dataclass(frozen=True)
class MLPSpec:
    input_dims: int
    output_dims: int
    hidden_dims: Tuple[int, ...] = (200, 200)
    nonlin: Union[str, Tuple[str, ...]] = 'relu'
    output_nonlin: Optional[str] = None
    dropout: Union[Optional[DropoutSpec],
                   Tuple[Optional[DropoutSpec], ...]] = None
    input_dropout: Optional[DropoutSpec] = None
    layer_norm: bool = False
    hidden_biases: bool = True
    output_biases: bool = True
    weight_gain: float = 1.4142135623730951  # relu gain, sqrt(2)
    bias_init_scale: float = 0.1  # uniform(-scale, scale)
    compute_dtype: Optional[str] = None  # e.g. 'bfloat16' for MXU-friendly math
    # spectral normalization of the linear weights (`modules.py:277-344`):
    # w_sn = max_K * sigmoid(scale) * w / sigma(w), sigma from power iteration
    spectral_norm: bool = False
    spectral_norm_output: bool = False
    sn_max_K: float = 10.0
    sn_iters: int = 1
    # Fused Pallas kernel for the whole Linear/activation/mask chain
    # (`ops.pallas.fused_mlp`). Opt-in: measured on v5e at the deep-PILCO
    # shapes (100-1000 particles x [200, 200]), XLA's per-layer kernels
    # pipeline better than the monolithic kernel, so auto mode keeps the
    # XLA path. True = force the fused kernel (interpret-mode off-TPU).
    fused: Optional[bool] = None

    def __post_init__(self):
        object.__setattr__(self, 'hidden_dims', tuple(self.hidden_dims))
        n = len(self.hidden_dims)
        nl = self.nonlin
        if isinstance(nl, str) or callable(nl):
            nl = (nl,) * n
        object.__setattr__(self, 'nonlin', tuple(nl))
        dp = self.dropout
        if dp is None or isinstance(dp, (BernoulliDropoutSpec,
                                         ConcreteDropoutSpec)):
            dp = (dp,) * n
        object.__setattr__(self, 'dropout', tuple(dp))

    # ---- init -------------------------------------------------------------
    def init(self, key, dtype=jnp.float32):
        """Initialize parameters: xavier-normal weights (relu gain), uniform biases.

        Matches the reference initializers (`core.py:20-22`).
        """
        dims = (self.input_dims,) + self.hidden_dims
        params = {}
        n_layers = len(self.hidden_dims) + 1
        keys = jax.random.split(key, 2 * n_layers + len(self.hidden_dims) + 1)
        ki = iter(range(len(keys)))

        def linear(kw, kb, din, dout, bias, sn=False):
            std = self.weight_gain * jnp.sqrt(2.0 / (din + dout))
            p = {'w': std * jax.random.normal(keys[kw], (din, dout), dtype)}
            if bias:
                p['b'] = jax.random.uniform(
                    keys[kb], (dout,), dtype,
                    -self.bias_init_scale, self.bias_init_scale)
            if sn:
                # power-iteration buffers + trainable log-scale
                # (`modules.py:308-320`)
                u = jax.random.normal(jax.random.fold_in(keys[kw], 1),
                                      (din,), dtype)
                p['sn_u'] = u / (jnp.linalg.norm(u) + 1e-12)
                p['sn_scale'] = jnp.zeros((1,), dtype)
            return p

        if self.input_dropout is not None:
            params['drop_in'] = self.input_dropout.init(self.input_dims, dtype)
        for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
            params[f'linear_{i}'] = linear(next(ki), next(ki), din, dout,
                                           self.hidden_biases,
                                           sn=self.spectral_norm)
            if self.layer_norm:
                params[f'ln_{i}'] = {'scale': jnp.ones((dout,), dtype),
                                     'bias': jnp.zeros((dout,), dtype)}
            if self.dropout[i] is not None:
                params[f'drop_{i}'] = self.dropout[i].init(dout, dtype)
        params['linear_out'] = linear(next(ki), next(ki), dims[-1],
                                      self.output_dims, self.output_biases,
                                      sn=self.spectral_norm_output)
        return params

    # ---- noise ------------------------------------------------------------
    def sample_noise(self, key, batch_shape, dtype=jnp.float32):
        """Sample the dropout noise pytree for a given batch shape.

        Reusing the returned pytree across calls reproduces the reference's
        persistent-mask semantics (PEGASUS); sampling from a fresh key is
        ``resample()``.
        """
        noise = {}
        n = len(self.hidden_dims) + 1
        keys = jax.random.split(key, n)
        if self.input_dropout is not None:
            noise['drop_in'] = self.input_dropout.sample_noise(
                keys[-1], batch_shape, self.input_dims, dtype)
        for i, (spec, width) in enumerate(zip(self.dropout, self.hidden_dims)):
            if spec is not None:
                noise[f'drop_{i}'] = spec.sample_noise(
                    keys[i], batch_shape, width, dtype)
        return noise

    # ---- forward ----------------------------------------------------------
    def _use_fused(self):
        if self.fused is False:
            return False
        from ..ops.pallas import fused_mlp_supported
        ok = fused_mlp_supported(len(self.hidden_dims), self.nonlin,
                                 self.layer_norm,
                                 self.spectral_norm or self.spectral_norm_output)
        if self.fused is True:
            if not ok:
                raise ValueError('fused=True but MLP config is not supported '
                                 'by the fused Pallas kernel')
            return True
        # auto mode stays on the XLA path (measured faster at these shapes);
        # note pallas_call is also opaque to GSPMD, so fusing under a
        # multi-device sharding would force gathers — fused=True users on
        # multi-chip should call it inside shard_map (local shapes).
        return False

    def _apply_fused(self, params, x, noise, train):
        """Single-kernel fused forward (`ops.pallas.fused_mlp`)."""
        from ..ops.pallas import fused_mlp
        h = x
        if self.input_dropout is not None and noise is not None:
            h = self.input_dropout.apply(params.get('drop_in', {}),
                                         noise['drop_in'], h, train)
        n = len(self.hidden_dims)
        ws = [params[f'linear_{i}']['w'] for i in range(n)]
        ws.append(params['linear_out']['w'])
        bs = [params[f'linear_{i}'].get('b') for i in range(n)]
        bs.append(params['linear_out'].get('b'))
        masks = []
        for i, spec in enumerate(self.dropout):
            if spec is not None and noise is not None:
                m = spec.mask(params.get(f'drop_{i}', {}), noise[f'drop_{i}'],
                              h.dtype, train)
                masks.append(jnp.broadcast_to(
                    m, h.shape[:-1] + (self.hidden_dims[i],)))
            else:
                masks.append(None)
        batch_shape = h.shape[:-1]
        h2 = h.reshape(-1, h.shape[-1])
        masks = [m if m is None else m.reshape(-1, m.shape[-1])
                 for m in masks]
        out = fused_mlp(h2, tuple(ws), tuple(bs), tuple(masks), self.nonlin,
                        compute_dtype=self.compute_dtype)
        out = out.reshape(batch_shape + (self.output_dims,))
        if self.output_nonlin is not None:
            out = act_lib.get(self.output_nonlin)(out)
        return out

    def apply(self, params, x, noise=None, train=False):
        """Forward pass. ``noise=None`` disables dropout (deterministic mean net)."""
        if self._use_fused():
            return self._apply_fused(params, x, noise, train)
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None

        def linear(p, h):
            w, b = p['w'], p.get('b')
            if 'sn_u' in p:
                # spectral normalization (`modules.py:324-341`): u/v power
                # iterations from the stored buffer under stop_gradient,
                # differentiable through sigma = u^T w v
                u = jax.lax.stop_gradient(p['sn_u'])
                w_ng = jax.lax.stop_gradient(w)
                for _ in range(self.sn_iters):
                    v = w_ng.T @ u
                    v = v / (jnp.linalg.norm(v) + 1e-12)
                    u = w_ng @ v
                    u = u / (jnp.linalg.norm(u) + 1e-12)
                sigma = u @ (w @ v)
                K = self.sn_max_K * jax.nn.sigmoid(p['sn_scale'])
                w = K * w / sigma
            if cdt is not None:
                # bf16 END-TO-END: bf16 operands, f32 accumulate, and the
                # caller narrows the epilogue back to bf16 so every
                # fusion-boundary buffer between layers is half-width.
                # Round-5 trace finding (BASELINE.md): at [B=4096, 200]
                # widths these matmuls are bandwidth/fixed-cost bound, not
                # MXU-pass bound — casting only the dot INPUTS (the old
                # scheme, f32 boundaries) made the matmul fusions 17%
                # SLOWER than plain f32 (the converts add traffic, the
                # 3x-fewer MXU passes save nothing). The accumulator stays
                # f32 (Mosaic requires 32-bit matmul acc in-kernel; XLA
                # fuses the downcast into the epilogue either way).
                h = jnp.dot(h.astype(cdt), w.astype(cdt),
                            preferred_element_type=jnp.float32)
            else:
                h = jnp.dot(h, w)
            if b is not None:
                h = h + b
            return h

        def renarrow(h):
            # elementwise libs (dropout masks, LN params) are f32 and
            # promote; re-narrow so the next fusion boundary stays cdt
            return h.astype(cdt) if cdt is not None else h

        h = x
        if self.input_dropout is not None and noise is not None:
            h = self.input_dropout.apply(params.get('drop_in', {}),
                                         noise['drop_in'], h, train)
        for i, width in enumerate(self.hidden_dims):
            h = renarrow(linear(params[f'linear_{i}'], h))
            if self.layer_norm:
                # LN statistics in f32: bf16 mean/var over 100s of lanes
                # loses ~2 decimal digits
                h32 = h.astype(jnp.float32)
                ln = params[f'ln_{i}']
                mu = jnp.mean(h32, -1, keepdims=True)
                var = jnp.var(h32, -1, keepdims=True)
                h32 = (h32 - mu) * jax.lax.rsqrt(var + 1e-5)
                h = renarrow(h32 * ln['scale'] + ln['bias'])
            h = act_lib.get(self.nonlin[i])(h)
            spec = self.dropout[i]
            if spec is not None and noise is not None:
                h = renarrow(spec.apply(params.get(f'drop_{i}', {}),
                                        noise[f'drop_{i}'], h, train))
        h = linear(params['linear_out'], h)
        if self.output_nonlin is not None:
            h = act_lib.get(self.output_nonlin)(h)
        # head consumers (density math, stats scaling) run in f32
        return h.astype(jnp.float32) if cdt is not None else h

    # ---- regularization ---------------------------------------------------
    def regularization_loss(self, params):
        """Sum of dropout regularizers, each paired with the next Linear."""
        reg = 0.0
        n_hidden = len(self.hidden_dims)

        def next_linear(i):
            # dropout after hidden layer i regularizes linear i+1 (or out)
            name = f'linear_{i + 1}' if i + 1 < n_hidden + 1 else 'linear_out'
            if i + 1 == n_hidden:
                name = 'linear_out'
            p = params[name]
            return p['w'], p.get('b')

        if self.input_dropout is not None:
            first = params['linear_0'] if n_hidden else params['linear_out']
            reg = reg + self.input_dropout.regularizer(
                params.get('drop_in', {}), first['w'], first.get('b'))
        for i, spec in enumerate(self.dropout):
            if spec is not None:
                w, b = next_linear(i)
                reg = reg + spec.regularizer(params.get(f'drop_{i}', {}), w, b)
        return reg
