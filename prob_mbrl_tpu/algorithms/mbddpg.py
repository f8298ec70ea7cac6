"""Model-based DDPG (actor-critic on a learned dropout-BNN dynamics model).

TPU-first redesign of `prob_mbrl/algorithms/MBDDPG.py:18-238`. One DDPG
iteration — imagined rollout from perturbed replay states, transition
flattening, the full shuffled-minibatch sweep of TD(0) critic updates and
deterministic-policy-gradient actor updates, and the Polyak target refresh —
compiles to a single XLA program; ``fit`` scans it ``iterations`` times from
the host with fresh replay samples.

Model shapes mirror the reference:
  * Actor: BDropout(0.1) MLP [200, 200], relu, tanh output, squashed to the
    action bounds by the Policy wrapper (`MBDDPG.py:18-43`); exploration noise
    is added to rollout actions through the rollout's ``action_eps`` input.
  * Critic: CDropout(0.1) MLP [200, 200] on concat(state, action) -> scalar
    (`MBDDPG.py:46-58`).
  * Dynamics: CDropout(0.5, temp 0.1) MLP with diag-Gaussian (or mixture)
    density head, learned reward unless a reward_func is given
    (`MBDDPG.py:61-107`).

Update equations (`MBDDPG.py:175-221`):
  ``target_Q = r + gamma * Q_tgt(s', pi_tgt(s'))`` (detached)
  ``critic_loss = mse(Q(s, a), target_Q) + reg/N``
  ``actor_loss = -mean Q(s, pi(s))``
  Polyak tau=0.005 on both target networks per iteration.

The reference's transition-flattening code is broken as written
(`MBDDPG.py:155-162` unpacks ``zip(*trajs)`` into 3 names, which only works
for a 3-step rollout); the obvious intent — (s_t, a_t, r_t, s_{t+1}) tuples
flattened over time x particles — is implemented here.
"""
import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..models import (MLPSpec, Regressor, Policy, DynamicsModel,
                      DiagGaussianDensity, GaussianMixtureDensity,
                      bdropout, cdropout)
from ..utils.rollout import rollout as rollout_fn
from ..utils.core import polyak_averaging
from ..utils.train_regressor import train_regressor


def make_actor(state_dim, action_dim, max_action, pol_shape=(200, 200)):
    """Actor spec (`MBDDPG.py:18-43`): BDropout MLP with tanh output."""
    mlp = MLPSpec(state_dim, action_dim, pol_shape, nonlin='relu',
                  output_nonlin='tanh', dropout=bdropout(0.1))
    max_u = (tuple(max_action) if np.ndim(max_action)
             else (float(max_action),) * action_dim)
    return Policy(mlp=mlp, output_density=None, max_u=max_u)


def make_critic(state_dim, action_dim, critic_hidden=(200, 200)):
    """Critic spec (`MBDDPG.py:46-58`): CDropout MLP, scalar output."""
    mlp = MLPSpec(state_dim + action_dim, 1, critic_hidden, nonlin='relu',
                  dropout=cdropout(0.1))
    return Regressor(mlp=mlp, output_density=None)


def make_dyn_model(state_dim, action_dim, reward_func=None, dyn_components=1,
                   dyn_shape=(200, 200)):
    """Dynamics spec (`MBDDPG.py:61-107`)."""
    learn_reward = reward_func is None
    out_dim = state_dim + 1 if learn_reward else state_dim
    if dyn_components > 1:
        density = GaussianMixtureDensity(out_dim, dyn_components)
    else:
        density = DiagGaussianDensity(out_dim)
    mlp = MLPSpec(state_dim + action_dim, density.n_inputs, dyn_shape,
                  nonlin='relu', dropout=cdropout(0.5, temperature=0.1))
    reg = Regressor(mlp=mlp, output_density=density)
    return DynamicsModel(regressor=reg, reward_func=reward_func)


def make_ddpg_iteration_fn(actor, critic, dyn, actor_opt, critic_opt,
                           horizon, batch_size=100, discount=0.99, tau=0.005,
                           expl_noise=1.0, x0_noise=0.1):
    """Build the jitted per-iteration DDPG update (`MBDDPG.py:144-227`).

    Returns ``iteration(actor_params, actor_tgt, a_opt_state, critic_params,
    critic_tgt, c_opt_state, critic_stats, dyn_params, dyn_stats, x0_pool,
    key)`` -> same state tuple + metrics {actor_loss, critic_loss}.
    """
    U = len(actor.max_u)

    def critic_apply(params, stats, s, a, noise):
        x = jnp.concatenate([s, a], -1)
        return critic.apply(params, stats, x, noise)

    def critic_loss_fn(params, stats, s, a, targets, noise, N):
        q = critic_apply(params, stats, s, a, noise)
        loss = jnp.mean((q - targets) ** 2)
        return loss + critic.regularization_loss(params) / N

    def actor_loss_fn(params, critic_params, stats, s, a_noise, q_noise):
        pi = actor.apply(params, s, a_noise, return_samples=True)
        q = critic_apply(critic_params, stats, s, pi, q_noise)
        return -jnp.mean(q)

    @jax.jit
    def iteration(actor_params, actor_tgt, a_opt_state, critic_params,
                  critic_tgt, c_opt_state, critic_stats, dyn_params,
                  dyn_stats, x0_pool, key):
        kx, kn, ke, kr, kp, ks = jax.random.split(key, 6)
        B = batch_size
        # x0: replay states + 0.1 * std perturbation (`MBDDPG.py:146-150`)
        idx = jax.random.randint(kx, (B,), 0, x0_pool.shape[0])
        x0 = x0_pool[idx]
        x0 = x0 + x0_noise * jnp.std(x0_pool, 0) * jax.random.normal(
            kn, x0.shape)

        # imagined rollout with exploration noise on the actions
        dyn_noise = dyn.sample_noise(kr, (B,))
        actor_noise = {'mlp': actor.mlp.sample_noise(kp, (B,))}
        action_eps = expl_noise * jax.random.normal(ke, (horizon, B, U))
        states, actions, rewards = rollout_fn(
            x0, dyn, actor, horizon, dyn_params, dyn_stats, actor_params,
            dyn_noise, actor_noise, action_eps=action_eps)[:3]
        # flatten transitions, detached (`MBDDPG.py:152-162`)
        D = states.shape[-1]
        s = jax.lax.stop_gradient(states[:-1].reshape(-1, D))
        s_next = jax.lax.stop_gradient(states[1:].reshape(-1, D))
        a = jax.lax.stop_gradient(actions.reshape(-1, U))
        r = jax.lax.stop_gradient(rewards.reshape(-1, 1))
        N = s.shape[0]

        # shuffled minibatch sweep (`MBDDPG.py:164-207`)
        perm = jax.random.permutation(ks, N)
        n_batches = N // B
        batches = {
            's': s[perm][:n_batches * B].reshape(n_batches, B, D),
            'sn': s_next[perm][:n_batches * B].reshape(n_batches, B, D),
            'a': a[perm][:n_batches * B].reshape(n_batches, B, U),
            'r': r[perm][:n_batches * B].reshape(n_batches, B, 1),
            'keys': jax.random.split(jax.random.fold_in(key, 1), n_batches),
        }

        def minibatch_step(carry, mb):
            actor_params, a_opt_state, critic_params, c_opt_state = carry
            k1, k2, k3, k4 = jax.random.split(mb['keys'], 4)
            q_noise = critic.sample_noise(k1, (B,))
            qt_noise = critic.sample_noise(k2, (B,))
            at_noise = {'mlp': actor.mlp.sample_noise(k3, (B,))}
            an_noise = {'mlp': actor.mlp.sample_noise(k4, (B,))}

            # TD(0) target from the frozen nets
            pi_tgt = actor.apply(actor_tgt, mb['sn'], at_noise,
                                 return_samples=True)
            q_tgt = critic_apply(critic_tgt, critic_stats, mb['sn'], pi_tgt,
                                 qt_noise)
            targets = mb['r'] + discount * jax.lax.stop_gradient(q_tgt)

            c_loss, c_grads = jax.value_and_grad(critic_loss_fn)(
                critic_params, critic_stats, mb['s'], mb['a'], targets,
                q_noise, N)
            c_updates, c_opt_state = critic_opt.update(
                c_grads, c_opt_state, critic_params)
            critic_params = optax.apply_updates(critic_params, c_updates)

            a_loss, a_grads = jax.value_and_grad(actor_loss_fn)(
                actor_params, critic_params, critic_stats, mb['s'], an_noise,
                q_noise)
            a_updates, a_opt_state = actor_opt.update(
                a_grads, a_opt_state, actor_params)
            actor_params = optax.apply_updates(actor_params, a_updates)
            carry = (actor_params, a_opt_state, critic_params, c_opt_state)
            return carry, {'actor_loss': a_loss, 'critic_loss': c_loss}

        (actor_params, a_opt_state, critic_params, c_opt_state), losses = (
            jax.lax.scan(minibatch_step,
                         (actor_params, a_opt_state, critic_params,
                          c_opt_state), batches))

        # Polyak target refresh (`MBDDPG.py:209-221`)
        critic_tgt = polyak_averaging(critic_params, critic_tgt, tau)
        actor_tgt = polyak_averaging(actor_params, actor_tgt, tau)
        metrics = {'actor_loss': losses['actor_loss'][-1],
                   'critic_loss': losses['critic_loss'][-1],
                   'mean_reward': jnp.mean(r)}
        return (actor_params, actor_tgt, a_opt_state, critic_params,
                critic_tgt, c_opt_state, metrics)

    return iteration


class MBDDPG:
    """Host-side MBDDPG agent bundling specs, params and optimizers
    (`MBDDPG.py:110-238`)."""

    def __init__(self, state_dim, action_dim, max_action, reward_func=None,
                 dyn_components=1, seed=0):
        self.state_dim = state_dim
        self.action_dim = action_dim
        self.actor = make_actor(state_dim, action_dim, max_action)
        self.critic = make_critic(state_dim, action_dim)
        self.dyn = make_dyn_model(state_dim, action_dim, reward_func,
                                  dyn_components)

        key = jax.random.PRNGKey(seed)
        ka, kc, kd = jax.random.split(key, 3)
        self.actor_params = self.actor.init(ka)
        self.actor_target = jax.tree_util.tree_map(jnp.copy,
                                                   self.actor_params)
        self.critic_params = self.critic.init(kc)
        self.critic_target = jax.tree_util.tree_map(jnp.copy,
                                                    self.critic_params)
        self.critic_stats = self.critic.init_stats()
        self.dyn_params = self.dyn.init(kd)
        self.dyn_stats = self.dyn.init_stats()

        self.actor_opt = optax.adam(1e-3)
        self.critic_opt = optax.adam(1e-3)
        self.dyn_opt = optax.adam(1e-3)
        self.actor_opt_state = self.actor_opt.init(self.actor_params)
        self.critic_opt_state = self.critic_opt.init(self.critic_params)
        self.dyn_opt_state = None
        self._key = jax.random.fold_in(key, 0xDD9)
        self._iteration_fn = None

    def __call__(self, state, **kwargs):
        """Greedy action for a single state (`MBDDPG.py:131-133`)."""
        s = jnp.asarray(state, jnp.float32).reshape(1, -1)
        u = self.actor.apply(self.actor_params, s, noise=None,
                             return_samples=True)
        return np.asarray(u).flatten()

    def fit_dynamics(self, exp, batch_size=100, iterations=2000):
        """Train the dynamics model from experience (`MBDDPG.py:91-107`)."""
        X, Y = exp.get_dynmodel_dataset(
            deltas=True, return_costs=self.dyn.reward_func is None)
        self.dyn_stats = self.dyn.fit_stats(jnp.asarray(X), jnp.asarray(Y))
        self._key, k = jax.random.split(self._key)
        dp, self.dyn_opt_state, metrics = train_regressor(
            self.dyn.regressor, self.dyn_params, self.dyn_stats,
            jnp.asarray(X), jnp.asarray(Y), k, iters=iterations,
            batchsize=batch_size, optimizer=self.dyn_opt)
        self.dyn_params = dp
        return metrics

    def fit(self, exp, horizon, iterations, model_fit_iters=2000,
            batch_size=100, discount=0.99, tau=0.005, callback=None):
        """Full fit: dynamics, then DDPG iterations (`MBDDPG.py:135-227`)."""
        self.fit_dynamics(exp, batch_size, model_fit_iters)
        if self._iteration_fn is None:
            self._iteration_fn = make_ddpg_iteration_fn(
                self.actor, self.critic, self.dyn, self.actor_opt,
                self.critic_opt, horizon, batch_size, discount, tau)
        x0_pool = jnp.asarray(exp.sample_states(4096, timestep=None))
        history = []
        for it in range(iterations):
            self._key, k = jax.random.split(self._key)
            (self.actor_params, self.actor_target, self.actor_opt_state,
             self.critic_params, self.critic_target, self.critic_opt_state,
             metrics) = self._iteration_fn(
                self.actor_params, self.actor_target, self.actor_opt_state,
                self.critic_params, self.critic_target, self.critic_opt_state,
                self.critic_stats, self.dyn_params, self.dyn_stats, x0_pool,
                k)
            history.append(jax.tree_util.tree_map(np.asarray, metrics))
            if callable(callback):
                callback(it, metrics)
        return history
