"""MC-PILCO with sampled-particle propagation (no moment matching).

TPU-native counterpart of `examples/deep_pilco_no_mm.py` (reference diff vs
the MM variant: ``mm_*=False``, pol_lr 1e-4, init-state noise 1e-1*std —
SURVEY.md §2.6, `deep_pilco_no_mm.py:41,261`).
"""
from deep_pilco_common import main

if __name__ == '__main__':
    main(mm_states=False, mm_rewards=False, name='mc_pilco_no_mm',
         init_state_noise_mult=1e-1, arg_overrides=dict(pol_lr=1e-4))
