"""Checkpoint / resume: params, optimizer state, experience, RNG keys, flags.

The reference checkpoints ``state_dict``s under fixed names per run dir
(`examples/deep_pilco_mm.py:78-86,228-229,265-266`; tolerant reload at
`prob_mbrl/utils/core.py:200-226`). The TPU-native equivalent saves whole
pytrees via orbax when available, falling back to a numpy flat-dict format;
filenames mirror the reference so runs stay recognizable:

  latest_dynamics / latest_policy / latest_critic  (pytrees)
  experience.pkl                                   (ExperienceDataset)
  args.json                                        (flags)
"""
import json
import os
import pickle
import warnings

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except Exception:  # pragma: no cover
    _HAS_ORBAX = False


def save_pytree(path, tree):
    """Save a pytree of arrays (orbax if present, else npz of flat leaves)."""
    tree = jax.tree_util.tree_map(np.asarray, tree)
    if _HAS_ORBAX:
        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, tree, force=True)
    else:
        flat, treedef = jax.tree_util.tree_flatten(tree)
        with open(path + '.pkl', 'wb') as f:
            pickle.dump({'leaves': flat, 'treedef_repr': str(treedef),
                         'tree': tree}, f)


def load_pytree(path):
    if _HAS_ORBAX and os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path))
    with open(path + '.pkl', 'rb') as f:
        return pickle.load(f)['tree']


def save_checkpoint(results_folder, dyn_params=None, pol_params=None,
                    critic_params=None, exp=None, args=None, extra=None):
    """Save whatever is given under the reference's fixed names."""
    os.makedirs(results_folder, exist_ok=True)
    named = {'latest_dynamics': dyn_params, 'latest_policy': pol_params,
             'latest_critic': critic_params}
    if extra:
        named.update(extra)
    for name, tree in named.items():
        if tree is not None:
            save_pytree(os.path.join(results_folder, name), tree)
    if exp is not None:
        exp.save(os.path.join(results_folder, 'experience.pkl'))
    if args is not None:
        d = args if isinstance(args, dict) else vars(args)
        with open(os.path.join(results_folder, 'args.json'), 'w') as f:
            json.dump(d, f, indent=2, default=str)


def load_checkpoint(results_folder, exp=None):
    """Tolerant reload (`utils/core.py:200-226`): missing pieces warn.

    Returns dict with whichever of dyn/pol/critic/exp/args were found.
    """
    out = {}
    for key, name in [('dyn', 'latest_dynamics'), ('pol', 'latest_policy'),
                      ('critic', 'latest_critic')]:
        path = os.path.join(results_folder, name)
        try:
            out[key] = load_pytree(path)
        except Exception as e:
            warnings.warn(f'could not load {name}: {e}')
    exp_path = os.path.join(results_folder, 'experience.pkl')
    if exp is not None and os.path.exists(exp_path):
        try:
            exp.load(exp_path)
            out['exp'] = exp
        except Exception as e:
            warnings.warn(f'could not load experience: {e}')
    args_path = os.path.join(results_folder, 'args.json')
    if os.path.exists(args_path):
        with open(args_path) as f:
            out['args'] = json.load(f)
    return out
