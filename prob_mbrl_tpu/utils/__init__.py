"""Training/rollout runtime utilities (reference layer: `prob_mbrl/utils/`)."""
from .rollout import (rollout, make_rollout_fn, get_z_rnd,
                      rollout_with_values, rollout_with_Qvalues)
from .train_regressor import (make_train_fn, train_regressor,
                              init_priority_state,
                              normalize_dataset)
from .experience import ExperienceDataset, SumTree
from .apply_controller import apply_controller
from .core import polyak_averaging, sin_squashing_fn, tile

__all__ = [
    'rollout', 'make_rollout_fn', 'get_z_rnd', 'make_train_fn',
    'train_regressor', 'normalize_dataset', 'ExperienceDataset', 'SumTree',
    'apply_controller', 'polyak_averaging', 'sin_squashing_fn', 'tile',
]
from .train_model import make_train_model_fn, train_model
from .experiments import (get_argument_parser, init_env,
                          init_output_folder, load_csv)
from .checkpoint import (save_checkpoint, load_checkpoint, save_pytree,
                         load_pytree)
from .plotting import (plot_sample, plot_mean_var, plot_trajectories,
                       plot_rollout)
from . import profiling
