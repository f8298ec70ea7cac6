"""Numerical parity against the PyTorch reference at /root/reference.

SURVEY §7 "hard parts": gradient parity of the STE dropout chain
(`modules.py:102-160`), moment-matching forward+backward (`rollout.py:6-29`),
density heads (`densities.py:87-254`), the Regressor normalization chain
(`core.py:136-187`) and the transcribed analytic env dynamics
(`cartpole/model.py:114-139`, `double_cartpole/model.py:152-175`,
`cart_acrobot/model.py:108-185`, `pendulum/model.py:82-129`,
`rendezvous/model.py`).

Method: build the torch reference module, copy its weights into the JAX
spec's params pytree (torch Linear stores [dout, din]; ours [din, dout]),
pin identical dropout masks / reparameterization noise on both sides, and
assert forward and gradient closeness at float32 tolerances.

Skipped wholesale when /root/reference or torch is unavailable.
"""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, 'tools'))

torch = pytest.importorskip('torch')

if not os.path.isdir('/root/reference/prob_mbrl'):
    pytest.skip('torch reference not available', allow_module_level=True)

from run_reference import setup_reference_path  # noqa: E402

setup_reference_path()

# torch>=1.9 removed torch.solve (the remaining stub raises); the reference's
# double-cartpole/cart-acrobot dynamics use torch.solve(B, A) == solve A X = B
# (`double_cartpole/model.py:174`)
torch.solve = lambda b, A: (torch.linalg.solve(A, b),)

from prob_mbrl import models as ref_models  # noqa: E402
from prob_mbrl.models import modules as ref_modules  # noqa: E402
from prob_mbrl.utils.rollout import (mm_resample_,  # noqa: E402
                                     mm_resample_infer_ns_)
from prob_mbrl.utils import angles as ref_angles  # noqa: E402
from prob_mbrl import losses as ref_losses  # noqa: E402

from prob_mbrl_tpu import models, ops, envs  # noqa: E402
from prob_mbrl_tpu.ops import moment_matching as mm  # noqa: E402
from prob_mbrl_tpu.ops.angles import to_complex  # noqa: E402
from prob_mbrl_tpu.ops.losses import gaussian_log_likelihood  # noqa: E402

RTOL, ATOL = 1e-4, 1e-5


def t2n(x):
    return x.detach().cpu().numpy()


def copy_linear(torch_linear, p):
    """Set our linear params {'w','b'} from a torch Linear (transposed)."""
    p['w'] = jnp.asarray(t2n(torch_linear.weight).T)
    if torch_linear.bias is not None:
        p['b'] = jnp.asarray(t2n(torch_linear.bias))
    return p


def build_pair_mlp(din, dout, hidden, dropout='none', rate=0.1, seed=0):
    """Matching (torch BSequential, MLPSpec+params) pair."""
    torch.manual_seed(seed)
    if dropout == 'bdrop':
        ref_drops = [ref_modules.BDropout(rate) for _ in hidden]
        spec_drop = models.bdropout(rate)
    elif dropout == 'cdrop':
        ref_drops = [ref_modules.CDropout(rate * np.ones(h)) for h in hidden]
        spec_drop = models.cdropout(rate)
    else:
        ref_drops = [None for _ in hidden]
        spec_drop = None
    ref = ref_models.mlp(din, dout, list(hidden), dropout_layers=ref_drops,
                         nonlin=torch.nn.ReLU)
    spec = models.MLPSpec(din, dout, tuple(hidden), dropout=spec_drop)
    params = spec.init(jax.random.PRNGKey(seed))
    for i in range(len(hidden)):
        copy_linear(getattr(ref, f'fc{i}'), params[f'linear_{i}'])
    copy_linear(ref.fc_out, params['linear_out'])
    if dropout == 'cdrop':
        for i, d in enumerate(ref_drops):
            params[f'drop_{i}']['logit_p'] = jnp.asarray(t2n(d.logit_p))
    return ref, spec, params


class TestMLPParity:
    def test_forward_and_grads_no_dropout(self):
        din, dout, hidden = 5, 6, (32, 32)
        ref, spec, params = build_pair_mlp(din, dout, hidden)
        x = np.random.RandomState(0).randn(7, din).astype(np.float32)

        xt = torch.tensor(x, requires_grad=True)
        yt = ref(xt)
        yt.sum().backward()

        def f(params, x):
            return spec.apply(params, x, noise=None).sum()

        y = spec.apply(params, jnp.asarray(x), noise=None)
        np.testing.assert_allclose(np.asarray(y), t2n(yt), rtol=RTOL,
                                   atol=ATOL)
        gx = jax.grad(f, argnums=1)(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(gx), t2n(xt.grad), rtol=RTOL,
                                   atol=ATOL)
        gp = jax.grad(f)(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(gp['linear_0']['w']),
                                   t2n(ref.fc0.weight.grad).T,
                                   rtol=RTOL, atol=ATOL)
        np.testing.assert_allclose(np.asarray(gp['linear_out']['b']),
                                   t2n(ref.fc_out.bias.grad),
                                   rtol=RTOL, atol=ATOL)

    def test_bdropout_forward_and_grads_pinned_masks(self):
        """BDropout semantics (`modules.py:46-61`): x * mask / p."""
        din, dout, hidden = 4, 3, (16, 16)
        rate = 0.3
        B = 8
        ref, spec, params = build_pair_mlp(din, dout, hidden, 'bdrop', rate)
        rng = np.random.RandomState(1)
        x = rng.randn(B, din).astype(np.float32)
        masks = [rng.rand(B, h) < (1 - rate) for h in hidden]

        for i, m in enumerate(masks):
            drop = getattr(ref, f'drop{i}')
            drop.noise.data = torch.tensor(m.astype(np.float32))
        xt = torch.tensor(x, requires_grad=True)
        yt = ref(xt, resample=False)
        yt.sum().backward()

        # our mask = (u < p)/p: pick u to reproduce the same hard mask
        noise = {f'drop_{i}': {'u': jnp.asarray(
            np.where(m, 0.0, 1.0).astype(np.float32))}
            for i, m in enumerate(masks)}

        def f(params, x):
            return spec.apply(params, x, noise=noise).sum()

        y = spec.apply(params, jnp.asarray(x), noise=noise)
        np.testing.assert_allclose(np.asarray(y), t2n(yt), rtol=RTOL,
                                   atol=ATOL)
        gx = jax.grad(f, argnums=1)(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(gx), t2n(xt.grad), rtol=RTOL,
                                   atol=ATOL)
        gp = jax.grad(f)(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(gp['linear_1']['w']),
                                   t2n(ref.fc1.weight.grad).T,
                                   rtol=RTOL, atol=ATOL)

    def test_cdropout_ste_forward_and_grads(self):
        """Concrete-dropout straight-through chain (`modules.py:102-160`):
        forward uses hard Bernoulli masks, backward flows through the
        sigmoid-relaxed probs into x, the weights AND logit_p."""
        din, dout, hidden = 4, 3, (12, 12)
        rate = 0.25
        B = 6
        ref, spec, params = build_pair_mlp(din, dout, hidden, 'cdrop', rate)
        rng = np.random.RandomState(2)
        x = rng.randn(B, din).astype(np.float32)
        us = [rng.rand(B, h).astype(np.float32) for h in hidden]

        ref.train()
        for i, u in enumerate(us):
            drop = getattr(ref, f'drop{i}')
            drop.noise.data = torch.tensor(u)
            # pre-shape the concrete_noise buffer: CDropout.forward redraws
            # self.noise whenever this buffer's shape mismatches the batch
            # (`modules.py:140-148`), which would discard the pinned uniforms
            drop.concrete_noise.data = torch.zeros_like(torch.tensor(u))
        xt = torch.tensor(x, requires_grad=True)
        torch.manual_seed(123)  # drives the internal hard bernoulli draw
        yt = ref(xt, resample=False)
        yt.sum().backward()

        # recover the hard masks torch drew: the forward value of
        # concrete_noise is exactly the hard sample
        noise = {}
        for i, u in enumerate(us):
            hard = t2n(getattr(ref, f'drop{i}').concrete_noise) > 0.5
            noise[f'drop_{i}'] = {
                'u': jnp.asarray(u),
                'u_hard': jnp.asarray(np.where(hard, 0.0, 1.0)
                                      .astype(np.float32))}

        def f(params, x):
            return spec.apply(params, x, noise=noise, train=True).sum()

        y = spec.apply(params, jnp.asarray(x), noise=noise, train=True)
        np.testing.assert_allclose(np.asarray(y), t2n(yt), rtol=RTOL,
                                   atol=ATOL)
        gx = jax.grad(f, argnums=1)(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(gx), t2n(xt.grad), rtol=RTOL,
                                   atol=ATOL)
        gp = jax.grad(f)(params, jnp.asarray(x))
        for i in range(len(hidden)):
            np.testing.assert_allclose(
                np.asarray(gp[f'drop_{i}']['logit_p']),
                t2n(getattr(ref, f'drop{i}').logit_p.grad),
                rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(gp['linear_out']['w']),
                                   t2n(ref.fc_out.weight.grad).T,
                                   rtol=RTOL, atol=ATOL)

    def test_regularization_loss_parity(self):
        for kind in ('bdrop', 'cdrop'):
            ref, spec, params = build_pair_mlp(4, 3, (12, 12), kind, 0.2)
            r_ref = float(t2n(ref.regularization_loss()))
            r = float(spec.regularization_loss(params))
            np.testing.assert_allclose(r, r_ref, rtol=1e-5)


class TestDensityParity:
    def test_diag_gaussian_sample_and_log_prob(self):
        D, B = 3, 10
        rng = np.random.RandomState(3)
        raw = rng.randn(B, 2 * D).astype(np.float32)
        z = rng.randn(B, D).astype(np.float32)
        my = rng.randn(1, D).astype(np.float32)
        Sy = np.abs(rng.randn(1, D)).astype(np.float32) + 0.5
        y = rng.randn(B, D).astype(np.float32)

        ref = ref_models.DiagGaussianDensity(D)
        ref.z.data = torch.tensor(z)
        s_ref = ref(torch.tensor(raw),
                    scaling_params=(torch.tensor(my), torch.tensor(Sy)),
                    return_samples=True, resample_noise=False)
        m_ref, ls_ref = ref(torch.tensor(raw))
        lp_ref = ref.log_prob(torch.tensor(y), m_ref, ls_ref)

        ours = models.DiagGaussianDensity(D)
        s = ours.sample(jnp.asarray(raw), {'z': jnp.asarray(z)},
                        scaling_params=(jnp.asarray(my), jnp.asarray(Sy)))
        np.testing.assert_allclose(np.asarray(s), t2n(s_ref), rtol=RTOL,
                                   atol=ATOL)
        m, ls = ours.distribution(jnp.asarray(raw))
        np.testing.assert_allclose(np.asarray(m), t2n(m_ref), rtol=RTOL,
                                   atol=ATOL)
        np.testing.assert_allclose(np.asarray(ls), t2n(ls_ref), rtol=RTOL,
                                   atol=ATOL)
        lp = ours.log_prob(jnp.asarray(y), m, ls)
        np.testing.assert_allclose(np.asarray(lp), t2n(lp_ref), rtol=RTOL,
                                   atol=1e-4)

    def test_gaussian_losses_parity(self):
        B, D = 12, 4
        rng = np.random.RandomState(4)
        y = rng.randn(B, D).astype(np.float32)
        m = rng.randn(B, D).astype(np.float32)
        ls = (0.3 * rng.randn(B, D)).astype(np.float32)
        ref = ref_losses.gaussian_log_likelihood(
            torch.tensor(y), torch.tensor(m), torch.tensor(ls))
        ours = gaussian_log_likelihood(jnp.asarray(y), jnp.asarray(m),
                                       jnp.asarray(ls))
        np.testing.assert_allclose(np.asarray(ours), t2n(ref), rtol=RTOL,
                                   atol=1e-4)

    def test_mixture_log_prob_parity(self):
        """Mixture log-likelihood vs the reference head (`densities.py:237-254`)."""
        B, D, K = 9, 3, 4
        rng = np.random.RandomState(5)
        raw = rng.randn(B, 2 * D * K + K + 1).astype(np.float32)
        y = rng.randn(B, D).astype(np.float32)

        ref = ref_models.GaussianMixtureDensity(D, K)
        m_ref, ls_ref, pi_ref = ref(torch.tensor(raw))
        lp_ref = ref.log_prob(torch.tensor(y), m_ref, ls_ref, pi_ref)

        ours = models.GaussianMixtureDensity(D, K)
        m, ls, pi = ours.distribution(jnp.asarray(raw))
        np.testing.assert_allclose(np.asarray(m), t2n(m_ref), rtol=RTOL,
                                   atol=ATOL)
        np.testing.assert_allclose(np.asarray(ls), t2n(ls_ref), rtol=RTOL,
                                   atol=ATOL)
        np.testing.assert_allclose(np.asarray(pi), t2n(pi_ref), rtol=RTOL,
                                   atol=ATOL)
        lp = ours.log_prob(jnp.asarray(y), m, ls, pi)
        np.testing.assert_allclose(np.asarray(lp), t2n(lp_ref), rtol=1e-3,
                                   atol=1e-4)


class TestMomentMatchingParity:
    def _pair(self, seed=6, B=32, D=4):
        rng = np.random.RandomState(seed)
        samples = (rng.randn(B, D) * [0.5, 1.0, 2.0, 0.1] + 1.0
                   ).astype(np.float32)
        z = rng.randn(B, D).astype(np.float32)
        return samples, z

    def test_mm_resample_forward_and_grad(self):
        samples, z = self._pair()
        st = torch.tensor(samples, requires_grad=True)
        out_ref = mm_resample_(st, torch.tensor(z), 1e-12)
        out_ref.sum().backward()

        def f(s):
            return mm.mm_resample(s, jnp.asarray(z), 1e-12).sum()

        out = mm.mm_resample(jnp.asarray(samples), jnp.asarray(z), 1e-12)
        np.testing.assert_allclose(np.asarray(out), t2n(out_ref), rtol=1e-4,
                                   atol=1e-4)
        g = jax.grad(f)(jnp.asarray(samples))
        np.testing.assert_allclose(np.asarray(g), t2n(st.grad), rtol=1e-3,
                                   atol=1e-4)

    def test_mm_resample_infer_ns_forward_and_grad(self):
        samples, z = self._pair(seed=7)
        st = torch.tensor(samples, requires_grad=True)
        out_ref = mm_resample_infer_ns_(st, torch.tensor(z), 1e-12)
        (out_ref * torch.tensor(z)).sum().backward()

        def f(s):
            return (mm.mm_resample_infer_ns(s, jnp.asarray(z), 1e-12)
                    * jnp.asarray(z)).sum()

        out = mm.mm_resample_infer_ns(jnp.asarray(samples), jnp.asarray(z),
                                      1e-12)
        np.testing.assert_allclose(np.asarray(out), t2n(out_ref), rtol=1e-4,
                                   atol=1e-4)
        g = jax.grad(f)(jnp.asarray(samples))
        np.testing.assert_allclose(np.asarray(g), t2n(st.grad), rtol=1e-3,
                                   atol=1e-4)


class TestRegressorChainParity:
    def test_normalized_forward(self):
        """Full Regressor chain: whiten -> MLP -> density un-whiten
        (`core.py:169-187`), torch vs JAX with copied weights. Inputs are
        pre-embedded (the drivers' configuration: env observations already
        carry sin/cos, so dyn/pol use angle_dims=[]; the reference's
        tensor-dims ``to_complex`` path is broken anyway —
        `utils/angles.py:29-37` UnboundLocalError for tensor dims)."""
        E = 5
        din = 6
        rng = np.random.RandomState(8)
        X = rng.randn(50, din).astype(np.float32)
        Y = rng.randn(50, E).astype(np.float32)
        x = rng.randn(6, din).astype(np.float32)

        ref_net = ref_models.mlp(din, 2 * E, [24, 24],
                                 dropout_layers=[None, None],
                                 nonlin=torch.nn.ReLU)
        ref_reg = ref_models.Regressor(
            ref_net, output_density=ref_models.DiagGaussianDensity(E)).float()
        ref_reg.set_dataset(torch.tensor(X), torch.tensor(Y))
        m_ref, ls_ref = ref_reg(torch.tensor(x), normalize=True)

        spec_mlp = models.MLPSpec(din, 2 * E, (24, 24))
        reg = models.Regressor(mlp=spec_mlp,
                               output_density=models.DiagGaussianDensity(E))
        params = {'mlp': spec_mlp.init(jax.random.PRNGKey(0))}
        for i in range(2):
            copy_linear(getattr(ref_net, f'fc{i}'),
                        params['mlp'][f'linear_{i}'])
        copy_linear(ref_net.fc_out, params['mlp']['linear_out'])
        stats = reg.fit_stats(jnp.asarray(X), jnp.asarray(Y))
        m, ls = reg.apply(params, stats, jnp.asarray(x), noise=None,
                          normalize=True)
        np.testing.assert_allclose(np.asarray(m), t2n(m_ref), rtol=1e-4,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(ls), t2n(ls_ref), rtol=1e-4,
                                   atol=1e-4)

    def test_to_complex_parity(self):
        rng = np.random.RandomState(9)
        x = rng.randn(7, 6).astype(np.float32)
        for dims in ([0], [2], [2, 4]):
            ref = ref_angles.to_complex(torch.tensor(x), dims)
            ours = to_complex(jnp.asarray(x), tuple(dims))
            np.testing.assert_allclose(np.asarray(ours), t2n(ref),
                                       rtol=RTOL, atol=ATOL)


class TestEnvDynamicsParity:
    """Analytic dynamics RHS parity on random states/actions."""

    def _check(self, ref_model, our_model, D, U, u_scale=10.0, seed=10,
               state_scale=1.0, batched_ref=True):
        rng = np.random.RandomState(seed)
        z = (state_scale * rng.randn(16, D)).astype(np.float32)
        u = (u_scale * rng.randn(16, U)).astype(np.float32)
        with torch.enable_grad():
            if batched_ref:
                dz_ref = ref_model.dynamics(torch.tensor(z),
                                            torch.tensor(u), 0)
            else:
                # the reference double-cartpole/cart-acrobot dynamics stack
                # scalar mass terms with per-sample angle terms
                # (`double_cartpole/model.py:152-163`) and therefore only
                # support UNBATCHED states — evaluate per-sample
                dz_ref = torch.stack([
                    ref_model.dynamics(torch.tensor(z[i]),
                                       torch.tensor(u[i]), 0).flatten()
                    for i in range(z.shape[0])])
        dz = our_model.dynamics(jnp.asarray(z), jnp.asarray(u))
        np.testing.assert_allclose(np.asarray(dz), t2n(dz_ref), rtol=1e-4,
                                   atol=2e-4)

    def test_cartpole(self):
        from prob_mbrl.envs.cartpole.model import CartpoleModel as RefM
        from prob_mbrl_tpu.envs.cartpole import CartpoleModel
        self._check(RefM(), CartpoleModel(), 4, 1)

    def test_pendulum(self):
        from prob_mbrl.envs.pendulum.model import PendulumModel as RefM
        from prob_mbrl_tpu.envs.pendulum import PendulumModel
        self._check(RefM(), PendulumModel(), 2, 1, u_scale=2.0)

    def test_double_cartpole(self):
        from prob_mbrl.envs.double_cartpole.model import (
            DoubleCartpoleModel as RefM)
        from prob_mbrl_tpu.envs.double_cartpole import DoubleCartpoleModel
        self._check(RefM(), DoubleCartpoleModel(), 6, 1, batched_ref=False)

    def test_cart_acrobot(self):
        from prob_mbrl.envs.cart_acrobot.model import CartAcrobotModel as RefM
        from prob_mbrl_tpu.envs.cart_acrobot import CartAcrobotModel
        self._check(RefM(), CartAcrobotModel(), 6, 1, batched_ref=False)

    def test_rendezvous(self):
        from prob_mbrl.envs.rendezvous.model import RendezvousModel as RefM
        from prob_mbrl_tpu.envs.rendezvous import RendezvousModel
        self._check(RefM(), RendezvousModel(), 8, 4, u_scale=1.0)

    def test_cartpole_reward(self):
        from prob_mbrl.envs.cartpole.env import CartpoleReward
        env = envs.Cartpole()
        ref_r = CartpoleReward(pole_length=torch.tensor(0.5))
        rng = np.random.RandomState(11)
        x = rng.randn(12, 4).astype(np.float32)
        u = (10 * rng.randn(12, 1)).astype(np.float32)
        xa = to_complex(jnp.asarray(x), (2,))
        r = env.reward_func(xa, jnp.asarray(u))
        r_ref = ref_r(torch.tensor(x), torch.tensor(u))
        np.testing.assert_allclose(np.asarray(r), t2n(r_ref), rtol=1e-4,
                                   atol=1e-5)


class TestOptimizerParity:
    def test_radam_matches_reference_steps(self):
        """Our optax RAdam vs thirdparty/radam.py on an identical quadratic."""
        from prob_mbrl.thirdparty.radam import RAdam as RefRAdam
        from prob_mbrl_tpu.optim import radam

        w0 = np.random.RandomState(12).randn(5).astype(np.float32)
        target = np.arange(5, dtype=np.float32)

        wt = torch.tensor(w0.copy(), requires_grad=True)
        opt_ref = RefRAdam([wt], lr=1e-2)
        for _ in range(8):
            opt_ref.zero_grad()
            ((wt - torch.tensor(target)) ** 2).sum().backward()
            opt_ref.step()

        opt = radam(1e-2)
        w = jnp.asarray(w0)
        state = opt.init(w)
        for _ in range(8):
            g = jax.grad(lambda w: ((w - jnp.asarray(target)) ** 2).sum())(w)
            updates, state = opt.update(g, state, w)
            import optax
            w = optax.apply_updates(w, updates)
        np.testing.assert_allclose(np.asarray(w), t2n(wt), rtol=1e-5,
                                   atol=1e-6)


class TestLunarLanderParity:
    """Exact trajectory parity of the Box2D lander vs the reference env.

    Both sides use RandomState seeding (classic-gym semantics) and the same
    Box2D build, so equal seeds must give bitwise-equal uniform draws and
    hence numerically equal trajectories (`lunar_lander.py:137-357`).
    """

    def _pair(self, seed):
        Box2D = pytest.importorskip('Box2D')  # noqa: F841
        from prob_mbrl.envs.lunar_lander import (LunarLanderContinuous as
                                                 RefLander)
        from prob_mbrl_tpu.envs.lunar_lander import LunarLanderContinuous
        ref, ours = RefLander(), LunarLanderContinuous()
        # The reference spawns decorative exhaust-particle bodies
        # (`lunar_lander.py:234-252`) whose construction trips a numpy-scalar
        # TypeError in this Box2D build; they are collision-masked to terrain
        # only and never touch the lander, so stubbing them out leaves the
        # lander trajectory unchanged — which this parity test then proves.
        import types
        ref._create_particle = lambda *a, **k: types.SimpleNamespace(
            ApplyLinearImpulse=lambda *a2, **k2: None, ttl=0.0)
        ref.seed(seed)
        ours.seed(seed)
        return ref, ours

    @staticmethod
    def _coerce_impulse_args(body):
        # this Box2D build rejects numpy float32 scalars in b2Vec2 tuples;
        # coerce to python floats (identical values, no behavior change)
        orig = body.ApplyLinearImpulse
        body.ApplyLinearImpulse = lambda imp, pos, wake: orig(
            (float(imp[0]), float(imp[1])),
            (float(pos[0]), float(pos[1])), wake)

    def test_trajectory_parity_heuristic(self):
        from prob_mbrl.envs.lunar_lander import heuristic
        for seed in (0, 7):
            ref, ours = self._pair(seed)
            s_ref, s_ours = ref.reset(), ours.reset()
            self._coerce_impulse_args(ref.lander)
            np.testing.assert_allclose(s_ours, s_ref, rtol=1e-6, atol=1e-6)
            for t in range(250):
                a = heuristic(ref, s_ref)
                s_ref, r_ref, d_ref, _ = ref.step(a)
                s_ours, r_ours, d_ours, _ = ours.step(a)
                np.testing.assert_allclose(s_ours, s_ref, rtol=1e-5,
                                           atol=1e-5, err_msg=f't={t}')
                # shaping multiplies state by 100, so the 1e-5 state
                # tolerance legitimately amplifies into the reward
                assert abs(r_ours - r_ref) < 5e-3, (t, r_ours, r_ref)
                assert d_ours == d_ref, t
                if d_ref:
                    break

    def test_parameterization_changes_dynamics(self):
        # the ctor knobs must actually reach the physics
        from prob_mbrl_tpu.envs.lunar_lander import LunarLanderContinuous
        weak = LunarLanderContinuous(main_engine_power=1.0)
        strong = LunarLanderContinuous(main_engine_power=30.0)
        weak.seed(3)
        strong.seed(3)
        sw, ss = weak.reset(), strong.reset()
        np.testing.assert_allclose(sw, ss, atol=1e-6)  # same world, same kick
        for _ in range(12):
            sw = weak.step([1.0, 0.0])[0]
            ss = strong.step([1.0, 0.0])[0]
        assert ss[3] > sw[3]  # stronger main engine -> larger upward velocity
