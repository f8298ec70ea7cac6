from .activations import ACTIVATIONS
from .dropout import (BernoulliDropoutSpec, ConcreteDropoutSpec, bdropout,
                      cdropout)
from .mlp import MLPSpec
from .densities import (DiagGaussianDensity, GaussianMixtureDensity,
                        CategoricalDensity, TanhSquashedDensity)
from .regressor import (Regressor, Policy, DynamicsModel, fit_stats,
                        init_stats)

__all__ = [
    'ACTIVATIONS', 'BernoulliDropoutSpec', 'ConcreteDropoutSpec', 'bdropout',
    'cdropout', 'MLPSpec', 'DiagGaussianDensity', 'GaussianMixtureDensity',
    'CategoricalDensity', 'TanhSquashedDensity', 'Regressor', 'Policy',
    'DynamicsModel', 'fit_stats', 'init_stats',
]
from .conditional_density import (ConditionalDensityModel, GaussianDN,
                                  GaussianMDN, SoftmaxDN,
                                  RelaxedSoftmaxDN, density_network_mlp,
                                  mixture_density_network_mlp,
                                  fit_scaling, whiten)
from .transformer import (TransformerDynamicsModel,
                          TransformerEncoderSpec,
                          NextStateRewardDoneHeads)
from .flows import MAFSpec
from .ensembles import (ModelEnsemble, bootstrap_masks,
                        make_ensemble_train_fn, RandomPriorMLP)
