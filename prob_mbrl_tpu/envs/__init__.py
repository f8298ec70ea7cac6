from .base import (AnalyticModel, Box, ExpQuadTipReward, GymEnv, Integrator,
                   integrate)
from .cartpole import Cartpole, CartpoleModel, cartpole_reward
from .pendulum import Pendulum, PendulumModel, pendulum_reward
from .double_cartpole import (DoubleCartpole, DoubleCartpoleModel,
                              double_cartpole_reward)
from .cart_acrobot import CartAcrobot, CartAcrobotModel
from .rendezvous import Rendezvous, RendezvousModel, RendezvousReward
from .jax_lander import JaxLunarLander, JaxLanderModel, lander_reward

try:  # Box2D-backed lunar lander: optional (requires box2d-py)
    from .lunar_lander import LunarLander  # noqa: F401
    _HAS_LUNAR_LANDER = True
except ImportError:  # pragma: no cover
    LunarLander = JaxLunarLander  # JAX-native lander is the default backend
    _HAS_LUNAR_LANDER = False

__all__ = [
    'AnalyticModel', 'Box', 'ExpQuadTipReward', 'GymEnv', 'Integrator',
    'integrate', 'Cartpole', 'CartpoleModel', 'cartpole_reward', 'Pendulum',
    'PendulumModel', 'pendulum_reward', 'DoubleCartpole',
    'DoubleCartpoleModel', 'double_cartpole_reward', 'CartAcrobot',
    'CartAcrobotModel', 'Rendezvous', 'RendezvousModel', 'RendezvousReward',
    'JaxLunarLander', 'JaxLanderModel', 'lander_reward', 'LunarLander',
]


def make(name, **kwargs):
    """Construct an environment by registry name (`utils/experiments.py:57-67`)."""
    registry = {
        'Cartpole': Cartpole,
        'Pendulum': Pendulum,
        'DoubleCartpole': DoubleCartpole,
        'CartAcrobot': CartAcrobot,
        'Rendezvous': Rendezvous,
        'LunarLander': LunarLander,
    }
    if name not in registry:
        raise KeyError(f'unknown env {name!r}; available: '
                       f'{sorted(registry)}')
    return registry[name](**kwargs)
