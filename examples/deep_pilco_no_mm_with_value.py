"""MC-PILCO (no MM) with a TD(H) fitted-value terminal bootstrap.

TPU-native counterpart of `examples/deep_pilco_no_mm_with_value.py`: a
CDropout critic with target network is fitted on imagined rollouts
(seed-matched dropout masks, Polyak tau=0.005 —
`deep_pilco_no_mm_with_value.py:14-68`) and used as the terminal value in
the MC-PILCO loss (`mc_pilco.py:137-140`).
"""
from deep_pilco_common import main

if __name__ == '__main__':
    main(mm_states=False, mm_rewards=False, use_value=True,
         name='mc_pilco_no_mm_value', arg_overrides=dict(pol_lr=1e-4))
