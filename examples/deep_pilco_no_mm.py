"""MC-PILCO with sampled-particle propagation (no moment matching).

TPU-native counterpart of `examples/deep_pilco_no_mm.py` (reference diff vs
the MM variant: ``mm_*=False``, pol_lr 1e-4 — SURVEY.md §2.6).
"""
from deep_pilco_common import main

if __name__ == '__main__':
    main(mm_states=False, mm_rewards=False, name='mc_pilco_no_mm',
         arg_overrides=dict(pol_lr=1e-4))
