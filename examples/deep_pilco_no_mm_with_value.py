"""MC-PILCO (no MM) with a TD(H) fitted-value terminal bootstrap.

TPU-native counterpart of `examples/deep_pilco_no_mm_with_value.py`: a
CDropout MSE critic is refit on EVERY policy-opt iteration inside the
jitted scan — from the same imagined trajectory used for the policy loss —
and the live critic is the terminal value in the MC-PILCO loss
(`mc_pilco.py:137-140`). Defaults replicate the reference semantics
exactly: NO target network (the reference driver never passes V_target,
`deep_pilco_no_mm_with_value.py:26,332` -> val_polyak=1.0) and critic
dropout masks frozen per PEGASUS epoch, shared between the TD(H) update
and the terminal-bootstrap evaluation (the resample=False cached-mask
path, `:24,37-41` -> --val_mask_mode epoch). With these semantics the
variant solves cartpole at full scale (RESULTS.md round 4); round 3's
polyak-0.005 target + per-iteration masks collapsed it.
"""
from deep_pilco_common import main

if __name__ == '__main__':
    main(mm_states=False, mm_rewards=False, use_value=True,
         name='mc_pilco_no_mm_value', init_state_noise_mult=1e-1,
         arg_overrides=dict(pol_lr=1e-4))
