from .base import (AnalyticModel, Box, ExpQuadTipReward, GymEnv, Integrator,
                   integrate)
from .cartpole import Cartpole, CartpoleModel, cartpole_reward
from .pendulum import Pendulum, PendulumModel, pendulum_reward
from .double_cartpole import (DoubleCartpole, DoubleCartpoleModel,
                              double_cartpole_reward)
from .cart_acrobot import CartAcrobot, CartAcrobotModel
from .rendezvous import Rendezvous, RendezvousModel, RendezvousReward

try:  # Box2D-backed lunar lander: optional (requires box2d-py)
    from .lunar_lander import LunarLander  # noqa: F401
    _HAS_LUNAR_LANDER = True
except ImportError:  # pragma: no cover
    _HAS_LUNAR_LANDER = False

__all__ = [
    'AnalyticModel', 'Box', 'ExpQuadTipReward', 'GymEnv', 'Integrator',
    'integrate', 'Cartpole', 'CartpoleModel', 'cartpole_reward', 'Pendulum',
    'PendulumModel', 'pendulum_reward', 'DoubleCartpole',
    'DoubleCartpoleModel', 'double_cartpole_reward', 'CartAcrobot',
    'CartAcrobotModel', 'Rendezvous', 'RendezvousModel', 'RendezvousReward',
]
if _HAS_LUNAR_LANDER:
    __all__.append('LunarLander')


def make(name, **kwargs):
    """Construct an environment by registry name (`utils/experiments.py:57-67`)."""
    registry = {
        'Cartpole': Cartpole,
        'Pendulum': Pendulum,
        'DoubleCartpole': DoubleCartpole,
        'CartAcrobot': CartAcrobot,
        'Rendezvous': Rendezvous,
    }
    if _HAS_LUNAR_LANDER:
        registry['LunarLander'] = LunarLander
    if name not in registry:
        raise KeyError(f'unknown env {name!r}; available: '
                       f'{sorted(registry)}')
    return registry[name](**kwargs)
