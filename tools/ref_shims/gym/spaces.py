"""gym.spaces shim: Box only (the reference uses nothing else)."""
import numpy as np


class Box:
    def __init__(self, low, high, shape=None, dtype=np.float32):
        if shape is None:
            low = np.asarray(low, dtype)
            high = np.asarray(high, dtype)
            shape = low.shape
        else:
            low = np.full(shape, low, dtype)
            high = np.full(shape, high, dtype)
        self.low, self.high = low, high
        self.shape = tuple(shape)
        self.dtype = dtype
        self._rng = np.random.RandomState()

    def seed(self, seed=None):
        self._rng = np.random.RandomState(seed)
        return [seed]

    def sample(self):
        return self._rng.uniform(self.low, self.high).astype(self.dtype)

    def contains(self, x):
        x = np.asarray(x)
        return bool(np.all(x >= self.low) and np.all(x <= self.high))
