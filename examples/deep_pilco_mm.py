"""MC-PILCO with moment-matched particle propagation.

TPU-native counterpart of `examples/deep_pilco_mm.py` (reference defaults:
``mm_states=mm_rewards=True``, pol_lr 1e-3, init-state noise 1e-2*std —
`deep_pilco_mm.py:253-256,261`).
"""
from deep_pilco_common import main

if __name__ == '__main__':
    main(mm_states=True, mm_rewards=True, name='mc_pilco_mm',
         init_state_noise_mult=1e-2, arg_overrides=dict(pol_lr=1e-3))
