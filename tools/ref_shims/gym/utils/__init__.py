"""gym.utils shim: seeding + EzPickle."""
from . import seeding  # noqa: F401


class EzPickle:
    def __init__(self, *args, **kwargs):
        self._ezpickle_args = args
        self._ezpickle_kwargs = kwargs

    def __getstate__(self):
        return {'args': self._ezpickle_args, 'kwargs': self._ezpickle_kwargs}

    def __setstate__(self, d):
        out = type(self)(*d['args'], **d['kwargs'])
        self.__dict__.update(out.__dict__)
