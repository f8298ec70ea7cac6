"""gym.utils.seeding shim: classic-gym RandomState semantics."""
import numpy as np


def np_random(seed=None):
    if seed is not None:
        seed = int(seed)
    rng = np.random.RandomState(seed)
    return rng, seed
