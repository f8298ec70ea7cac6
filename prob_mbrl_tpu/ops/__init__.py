from .losses import (gaussian_log_likelihood, gaussian_mixture_log_likelihood,
                     quadratic_loss, quadratic_saturating_loss)
from .angles import to_complex, complement_dims, embedded_size
from .math import softplus_upper_clip, safe_cholesky, clip_grad_norm
from .moment_matching import (mm_resample, mm_resample_infer_ns, grouped,
                              particle_moments, sample_mm_mixing,
                              mm_resample_mix, grouped_mix)

__all__ = [
    'gaussian_log_likelihood', 'gaussian_mixture_log_likelihood',
    'quadratic_loss', 'quadratic_saturating_loss', 'to_complex',
    'complement_dims', 'embedded_size', 'softplus_upper_clip', 'safe_cholesky',
    'clip_grad_norm', 'mm_resample', 'mm_resample_infer_ns', 'grouped',
    'particle_moments', 'sample_mm_mixing', 'mm_resample_mix', 'grouped_mix',
]
from . import distributions
from .math import small_cholesky
