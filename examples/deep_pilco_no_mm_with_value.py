"""MC-PILCO (no MM) with a TD(H) fitted-value terminal bootstrap.

TPU-native counterpart of `examples/deep_pilco_no_mm_with_value.py`: a
CDropout critic with target network is refit on EVERY policy-opt iteration
inside the jitted scan — from the same imagined trajectory used for the
policy loss, with seed-matched dropout masks and Polyak tau=0.005
(`deep_pilco_no_mm_with_value.py:14-68,380-400`) — and the live critic is
the terminal value in the MC-PILCO loss (`mc_pilco.py:137-140`).
"""
from deep_pilco_common import main

if __name__ == '__main__':
    main(mm_states=False, mm_rewards=False, use_value=True,
         name='mc_pilco_no_mm_value', init_state_noise_mult=1e-1,
         arg_overrides=dict(pol_lr=1e-4))
