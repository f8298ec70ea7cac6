"""Sequence-model MBRL: transformer dynamics + MAF initial-state flow.

TPU-native counterpart of the reference prototype
(`examples/transformer_models.py`): a transformer-encoder dynamics model is
fitted to sliding windows of (state, action) -> (next state, reward, done)
sequences; a masked autoregressive flow models the initial-state
distribution; a sigmoid-squashed stochastic policy is optimized by
backpropagating through autoregressive imagined rollouts.

The reference targets Hopper-v2 (mujoco, unavailable); this driver runs on
the analytic Cartpole, which exercises the same machinery.
"""
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from prob_mbrl_tpu import models  # noqa: E402
from prob_mbrl_tpu.models.transformer import TransformerDynamicsModel  # noqa: E402
from prob_mbrl_tpu.models.flows import MAFSpec  # noqa: E402
from prob_mbrl_tpu.models.conditional_density import fit_scaling  # noqa: E402
from prob_mbrl_tpu.utils import ExperienceDataset, apply_controller  # noqa: E402
from prob_mbrl_tpu.utils.experiments import (get_argument_parser,
                                             init_env)  # noqa: E402


def sliding_windows(exp, T):
    """[N, T, ...] (state, action, next_state, reward, done, length) windows
    (`transformer_models.py:89-117` pandas dataset, numpy here)."""
    S, A, NS, R, DN, L = [], [], [], [], [], []
    for ep in range(exp.n_episodes()):
        s = np.asarray(exp.states[ep], np.float32)
        a = np.asarray(exp.actions[ep], np.float32).reshape(len(s), -1)
        r = np.asarray(exp.rewards[ep], np.float32).reshape(len(s), -1)
        d = np.asarray(exp.done[ep], np.float32).reshape(len(s), -1) \
            if exp.done[ep] else np.zeros((len(s), 1), np.float32)
        H = len(s) - 1
        if H < 1:
            continue
        for start in range(0, max(1, H - 1)):
            end = min(start + T, H)
            n = end - start
            pad = T - n
            def padded(x, w):
                return np.concatenate(
                    [x[start:end], np.zeros((pad,) + x.shape[1:],
                                            np.float32)], 0)[None]
            S.append(padded(s, T))
            A.append(padded(a, T))
            NS.append(padded(s[1:], T))
            R.append(padded(r, T))
            DN.append(padded(d, T))
            L.append(n)
    return (np.concatenate(S), np.concatenate(A), np.concatenate(NS),
            np.concatenate(R), np.concatenate(DN),
            np.asarray(L, np.int32))


def make_dyn_train_fn(dyn, optimizer, reg_weight=1e-3):
    def loss_fn(params, scaling, s, a, ns, r, d, lens, noise):
        ps, pr, pdone = dyn.apply(params, s, a, seqlens=lens,
                                  scaling=scaling, noise=noise)
        T = s.shape[1]
        valid = (jnp.arange(T)[None, :] < lens[:, None]).astype(jnp.float32)
        lp_s = ps.log_prob(ns) * valid
        lp_r = pr.log_prob(r) * valid
        lp_d = pdone.log_prob(d[..., 0].astype(jnp.int32)) * valid
        n_valid = jnp.maximum(jnp.sum(valid), 1.0)
        E_lml = jnp.sum(lp_s + lp_r + lp_d) / n_valid
        return -E_lml + reg_weight * dyn.regularization_loss(params), E_lml

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    @jax.jit
    def step(params, opt_state, scaling, s, a, ns, r, d, lens, key):
        noise = dyn.sample_noise(key, (s.shape[0], 1))
        (loss, E_lml), grads = grad_fn(params, scaling, s, a, ns, r, d,
                                       lens, noise)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, E_lml

    return step


def make_policy(D, U, limits):
    """Sigmoid-squashed stochastic policy (`transformer_models.py:270-290`)."""
    density = models.DiagGaussianDensity(U)
    mlp = models.MLPSpec(D, density.n_inputs, (64, 64),
                         dropout=models.bdropout(0.1))
    low, high = limits

    def apply(params, x, noise=None):
        u = mlp.apply(params, x, noise.get('mlp') if noise else None)
        if noise is not None and 'density' in noise:
            u = density.apply(u, noise['density'], return_samples=True)
        else:
            u = density.apply(u, None, return_samples=False)[0]  # mean
        return low + (high - low) * jax.nn.sigmoid(u)

    spec = models.Policy(mlp=mlp, output_density=density)  # for noise mgmt
    return spec, apply


def imagined_rollout(dyn, dyn_params, scaling, pol_apply, pol_params,
                     pol_noise, x0, T, key):
    """Autoregressive imagined rollout with a growing (static-size) context
    (`transformer_models.py:497-545`), jit-compatible."""
    B, D = x0.shape
    U = dyn.action_dims
    states = jnp.zeros((B, T + 1, D)).at[:, 0].set(x0)
    actions = jnp.zeros((B, T, U))
    rewards = jnp.zeros((B, T, 1))
    h_noise = dyn.sample_noise(jax.random.fold_in(key, 0), (B, 1))

    def step(carry, t):
        states, actions, rewards = carry
        a_t = pol_apply(pol_params, states[:, t], pol_noise)
        actions = actions.at[:, t].set(a_t)
        lens = jnp.full((B,), t + 1)
        ps, pr, _ = dyn.apply(dyn_params, states[:, :-1], actions,
                              seqlens=lens, scaling=scaling, noise=h_noise)
        k_t = jax.random.fold_in(key, t + 1)
        s_next = ps.rsample(k_t)[:, t]
        r_t = pr.rsample(jax.random.fold_in(k_t, 1))[:, t]
        states = states.at[:, t + 1].set(s_next)
        rewards = rewards.at[:, t].set(r_t)
        return (states, actions, rewards), None

    (states, actions, rewards), _ = jax.lax.scan(
        step, (states, actions, rewards), jnp.arange(T))
    return states, actions, rewards


def main():
    parser = get_argument_parser('transformer_models')
    parser.set_defaults(pred_H=16, control_H=40, dyn_opt_iters=400,
                        pol_opt_iters=100, ps_iters=10)
    parser.add_argument('--embedding_size', type=int, default=64)
    parser.add_argument('--window', type=int, default=16)
    args = parser.parse_args()

    env = init_env(args.env, args.seed)
    D, U = env.observation_size, env.action_size
    low = jnp.asarray(env.action_space.low, jnp.float32)
    high = jnp.asarray(env.action_space.high, jnp.float32)

    dyn = TransformerDynamicsModel(D, U, embedding_size=args.embedding_size,
                                   max_horizon=args.window)
    key = jax.random.PRNGKey(args.seed)
    key, kd, kp, kf = jax.random.split(key, 4)
    dyn_params = dyn.init(kd)
    dyn_opt = optax.adam(3e-4)
    dyn_opt_state = dyn_opt.init(dyn_params)
    dyn_step = make_dyn_train_fn(dyn, dyn_opt)

    pol_spec, pol_apply = make_policy(D, U, (low, high))
    pol_params = pol_spec.mlp.init(kp)
    pol_opt = optax.adam(1e-3)
    pol_opt_state = pol_opt.init(pol_params)

    flow = MAFSpec(dims=D, n_blocks=4, hidden=64)
    flow_params = flow.init(kf)
    flow_opt = optax.adam(1e-3)
    flow_opt_state = flow_opt.init(flow_params)

    @jax.jit
    def flow_step(params, opt_state, x0s, key):
        # noise-conditioned smoothing (`transformer_models.py:521-531`):
        # jitter the empirical x0s so the flow doesn't collapse onto them
        def loss_fn(params):
            x = x0s + 0.01 * jax.random.normal(key, x0s.shape)
            return -jnp.mean(flow.log_prob(params, x))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = flow_opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def pol_step(pol_params, opt_state, dyn_params, scaling, x0, key):
        kn, kr = jax.random.split(key)
        pol_noise = pol_spec.sample_noise(kn, (x0.shape[0],))

        def loss_fn(pol_params):
            _, _, rewards = imagined_rollout(
                dyn, dyn_params, scaling, pol_apply, pol_params, pol_noise,
                x0, args.pred_H, kr)
            return -jnp.mean(jnp.sum(rewards, 1))

        loss, grads = jax.value_and_grad(loss_fn)(pol_params)
        updates, opt_state = pol_opt.update(grads, opt_state, pol_params)
        return optax.apply_updates(pol_params, updates), opt_state, loss

    exp = ExperienceDataset()
    rnd = np.random.RandomState(args.seed)
    for _ in range(max(2, args.n_initial_epi)):
        def rnd_pol(x, t=0):
            return rnd.uniform(env.action_space.low, env.action_space.high)
        exp.append_episode(*apply_controller(env, rnd_pol, args.control_H))

    pol_fwd = jax.jit(lambda p, x: pol_apply(p, x, None))

    for it in range(args.ps_iters):
        S, A, NS, R, DN, L = sliding_windows(exp, args.window)
        scaling = {
            's': fit_scaling(jnp.asarray(NS.reshape(-1, D))),
            'r': fit_scaling(jnp.asarray(R.reshape(-1, 1))),
        }
        n = S.shape[0]
        for i in range(args.dyn_opt_iters):
            key, kb, kt = jax.random.split(key, 3)
            idx = jax.random.randint(kb, (min(32, n),), 0, n)
            dyn_params, dyn_opt_state, loss, E_lml = dyn_step(
                dyn_params, dyn_opt_state, scaling,
                jnp.asarray(S[idx]), jnp.asarray(A[idx]),
                jnp.asarray(NS[idx]), jnp.asarray(R[idx]),
                jnp.asarray(DN[idx]), jnp.asarray(L[idx]), kt)
        x0s = jnp.asarray(np.stack([np.asarray(ep[0]) for ep in exp.states
                                    if len(ep)]), jnp.float32)
        for i in range(200):
            key, kt = jax.random.split(key)
            flow_params, flow_opt_state, flow_loss = flow_step(
                flow_params, flow_opt_state, x0s, kt)
        for i in range(args.pol_opt_iters):
            key, kx, kt = jax.random.split(key, 3)
            x0 = flow.sample(flow_params, kx, 25)
            pol_params, pol_opt_state, pol_loss = pol_step(
                pol_params, pol_opt_state, dyn_params, scaling, x0, kt)

        ret = apply_controller(
            env, lambda x, t=0: np.asarray(
                pol_fwd(pol_params,
                        jnp.asarray(x, jnp.float32).reshape(1, -1))
            ).flatten(), args.control_H)
        exp.append_episode(*ret)
        ep_ret = float(np.sum([np.sum(r) for r in ret[2]]))
        print(f'[transformer] it {it}: dyn E_lml={float(E_lml):.3f} '
              f'flow_loss={float(flow_loss):.3f} '
              f'pol_loss={float(pol_loss):.3f} real_return={ep_ret:.3f}')


if __name__ == '__main__':
    main()
