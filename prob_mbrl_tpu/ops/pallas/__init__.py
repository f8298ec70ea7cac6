"""Pallas TPU kernels for the framework's hot ops."""
from .fused_mlp import fused_mlp, fused_mlp_supported

__all__ = ['fused_mlp', 'fused_mlp_supported']
