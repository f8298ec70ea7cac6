"""Optimizer tests: RAdam rectification schedule, SdLBFGS damped two-loop.

Oracles: a straight numpy transcription of the reference update equations
(`prob_mbrl/thirdparty/radam.py:50-88`, `sdlbfgs.py:152-238`) stepped in
lockstep, plus convergence sanity on quadratics.
"""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from prob_mbrl_tpu.optim import radam, sdlbfgs


def quad_grad(x, A, b):
    return A @ x - b


class TestRAdam:
    def test_matches_reference_equations(self):
        lr, b1, b2, eps = 1e-2, 0.9, 0.999, 1e-8
        rng = np.random.RandomState(0)
        A = np.diag([1.0, 10.0, 100.0])
        b = rng.randn(3)
        x_np = np.ones(3)
        mu = np.zeros(3)
        nu = np.zeros(3)

        opt = radam(lr, b1, b2, eps)
        x_jax = jnp.ones(3)
        state = opt.init(x_jax)

        for step in range(1, 12):
            g = quad_grad(x_np, A, b)
            # reference equations (radam.py:50-88)
            nu = b2 * nu + (1 - b2) * g * g
            mu = b1 * mu + (1 - b1) * g
            beta2_t = b2 ** step
            n_sma_max = 2 / (1 - b2) - 1
            n_sma = n_sma_max - 2 * step * beta2_t / (1 - beta2_t)
            if n_sma >= 5:
                step_size = lr * np.sqrt(
                    (1 - beta2_t) * (n_sma - 4) / (n_sma_max - 4)
                    * (n_sma - 2) / n_sma * n_sma_max / (n_sma_max - 2)) \
                    / (1 - b1 ** step)
                x_np = x_np - step_size * mu / (np.sqrt(nu) + eps)
            else:
                x_np = x_np - lr / (1 - b1 ** step) * mu

            gj = jnp.asarray(quad_grad(np.asarray(x_jax), A, b))
            updates, state = opt.update(gj, state, x_jax)
            x_jax = optax.apply_updates(x_jax, updates)
            np.testing.assert_allclose(np.asarray(x_jax), x_np, rtol=1e-4,
                                       atol=1e-5)

    def test_converges_on_quadratic(self):
        A = jnp.diag(jnp.asarray([1.0, 50.0]))
        b = jnp.asarray([1.0, -2.0])
        opt = radam(5e-2)
        x = jnp.zeros(2)
        state = opt.init(x)
        for _ in range(500):
            u, state = opt.update(A @ x - b, state, x)
            x = optax.apply_updates(x, u)
        np.testing.assert_allclose(np.asarray(x),
                                   np.linalg.solve(np.asarray(A), b),
                                   atol=1e-2)


class TestSdLBFGS:
    def test_first_step_is_normalized_gradient_descent(self):
        opt = sdlbfgs(learning_rate=0.5, lr_decay=True)
        x = jnp.asarray([3.0, 4.0])
        state = opt.init(x)
        g = jnp.asarray([3.0, 4.0])
        u, state = opt.update(g, state, x)
        # d = -g/||g||, t = lr/sqrt(1)
        np.testing.assert_allclose(np.asarray(u), -0.5 * np.asarray(g) / 5.0,
                                   rtol=1e-5)

    def test_matches_reference_equations(self):
        lr, m = 0.1, 4
        rng = np.random.RandomState(1)
        A = np.diag([1.0, 5.0, 25.0])
        b = rng.randn(3)

        # numpy transcription of sdlbfgs.py:152-238 (max_iter=1 per call)
        x_np = np.ones(3)
        old_dirs, old_stps = [], []
        prev_g, d_prev, t_prev = None, None, None
        n_iter = 0

        opt = sdlbfgs(lr, history_size=m, lr_decay=True)
        x_jax = jnp.ones(3)
        state = opt.init(x_jax)

        for _ in range(10):
            g = quad_grad(x_np, A, b)
            n_iter += 1
            if n_iter == 1:
                d = -g
            else:
                y = g - prev_g
                s = d_prev * t_prev
                ys = y @ s
                sHs = s @ s
                theta = (0.75 * sHs / (sHs - ys)
                         if ys < 0.25 * sHs else 1.0)
                y_bar = theta * y + (1 - theta) * s
                if len(old_dirs) == m:
                    old_dirs.pop(0)
                    old_stps.pop(0)
                old_dirs.append(s)
                old_stps.append(y_bar)
                ro = [1.0 / (old_stps[i] @ old_dirs[i])
                      for i in range(len(old_dirs))]
                q = -g.copy()
                al = [0.0] * len(old_dirs)
                for i in range(len(old_dirs) - 1, -1, -1):
                    al[i] = (old_dirs[i] @ q) * ro[i]
                    q = q - al[i] * old_stps[i]
                r = q.copy()
                for i in range(len(old_dirs)):
                    be = (old_stps[i] @ r) * ro[i]
                    r = r + (al[i] - be) * old_dirs[i]
                d = r
            d = d / np.linalg.norm(d)
            t = lr / np.sqrt(n_iter)
            prev_g, d_prev, t_prev = g.copy(), d.copy(), t
            x_np = x_np + t * d

            gj = jnp.asarray(quad_grad(np.asarray(x_jax), A, b))
            u, state = opt.update(gj, state, x_jax)
            x_jax = optax.apply_updates(x_jax, u)
            np.testing.assert_allclose(np.asarray(x_jax), x_np, rtol=1e-4,
                                       atol=1e-6)

    def test_beats_sgd_on_ill_conditioned_quadratic(self):
        A = jnp.diag(jnp.asarray([1.0, 100.0]))
        b = jnp.asarray([1.0, 1.0])
        x_star = np.linalg.solve(np.asarray(A), np.asarray(b))

        def run(opt, steps=60):
            x = jnp.zeros(2)
            state = opt.init(x)
            for _ in range(steps):
                u, state = opt.update(A @ x - b, state, x)
                x = optax.apply_updates(x, u)
            return np.linalg.norm(np.asarray(x) - x_star)

        err_lbfgs = run(sdlbfgs(0.2, lr_decay=True))
        err_sgd = run(optax.sgd(5e-3))
        assert err_lbfgs < err_sgd

    def test_jits_and_scans(self):
        opt = sdlbfgs(0.1, history_size=3)
        A = jnp.diag(jnp.asarray([1.0, 4.0]))
        b = jnp.asarray([1.0, 1.0])

        @jax.jit
        def run(x):
            state = opt.init(x)

            def step(carry, _):
                x, state = carry
                u, state = opt.update(A @ x - b, state, x)
                return (optax.apply_updates(x, u), state), None

            (x, _), _ = jax.lax.scan(step, (x, state), None, length=50)
            return x

        x = run(jnp.zeros(2))
        assert np.all(np.isfinite(np.asarray(x)))
