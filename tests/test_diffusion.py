"""Diffusion-core tests: schedule values, q_sample/p_sample algebra, the
scan samplers vs a numpy step-by-step oracle of the reference math, and CFG
semantics (zeroed-cond uncond branch, +-5 / +-10 clamps)."""

import jax
import jax.numpy as jnp
import numpy as np

from lm2a_tpu.core.config import DiffusionConfig
from lm2a_tpu.diffusion import (
    ddim_sample,
    ddpm_sample,
    diffusion_loss,
    guided_eps,
    make_schedule,
    p_sample_step,
    q_sample,
)


def np_schedule(T=1000, lo=1e-4, hi=0.02):
    betas = np.linspace(lo, hi, T, dtype=np.float64)
    alphas = 1 - betas
    return betas, alphas, np.cumprod(alphas)


class TestSchedule:
    def test_values(self):
        s = make_schedule(DiffusionConfig())
        b, a, ab = np_schedule()
        assert s.timesteps == 1000
        np.testing.assert_allclose(np.asarray(s.betas), b, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(s.alpha_bars), ab, rtol=1e-4)
        assert abs(float(s.betas[0]) - 1e-4) < 1e-9 and abs(float(s.betas[-1]) - 0.02) < 1e-7

    def test_short_schedule(self):
        s = make_schedule(DiffusionConfig(timesteps=50))
        assert s.timesteps == 50
        assert abs(float(s.betas[0]) - 1e-4) < 1e-9 and abs(float(s.betas[-1]) - 0.02) < 1e-7


class TestQSample:
    def test_algebra(self):
        s = make_schedule(DiffusionConfig(timesteps=10))
        x0 = jnp.ones((2, 4, 3))
        noise = jnp.full((2, 4, 3), 2.0)
        t = jnp.array([0, 9])
        out = np.asarray(q_sample(s, x0, t, noise))
        ab = np.asarray(s.alpha_bars)
        for i, ti in enumerate([0, 9]):
            expect = np.sqrt(ab[ti]) * 1.0 + np.sqrt(1 - ab[ti]) * 2.0
            np.testing.assert_allclose(out[i], expect, rtol=1e-5)

    def test_t0_mostly_signal(self):
        s = make_schedule(DiffusionConfig())
        x0 = jnp.ones((1, 4, 3))
        out = q_sample(s, x0, jnp.array([0]), jnp.zeros((1, 4, 3)))
        np.testing.assert_allclose(np.asarray(out), np.sqrt(1 - 1e-4), rtol=1e-5)


def linear_model(x, t, motion_f, text_f):
    """Deterministic stand-in denoiser: eps_hat = 0.3*x + 0.01*t + cond mean."""
    bias = 0.0
    if motion_f is not None:
        bias = bias + jnp.mean(motion_f, axis=-1, keepdims=True)
    if text_f is not None:
        bias = bias + jnp.mean(text_f, axis=-1, keepdims=True)
    return 0.3 * x + 0.01 * t.astype(jnp.float32)[:, None, None] + bias


def np_linear_model(x, t, motion, text):
    bias = 0.0
    if motion is not None:
        bias = bias + motion.mean(axis=-1, keepdims=True)
    if text is not None:
        bias = bias + text.mean(axis=-1, keepdims=True)
    return 0.3 * x + 0.01 * t[:, None, None] + bias


class TestDDPMSampler:
    def test_scan_matches_numpy_oracle(self):
        """Scan sampler == step-by-step numpy loop of the reference update."""
        T = 20
        s = make_schedule(DiffusionConfig(timesteps=T))
        shape = (2, 8, 5)
        rng = np.random.default_rng(0)
        x0 = rng.normal(size=shape).astype(np.float32)
        noises = rng.normal(size=(T,) + shape).astype(np.float32)

        out = ddpm_sample(
            linear_model, s, jax.random.key(0), shape,
            x_init=jnp.asarray(x0), noise_seq=jnp.asarray(noises),
        )

        b, a, ab = np_schedule(T)
        x = x0.copy().astype(np.float64)
        for i, t in enumerate(range(T - 1, -1, -1)):
            tb = np.full((shape[0],), t)
            eps = np_linear_model(x, tb, None, None)
            mean = (x - b[t] / np.sqrt(1 - ab[t]) * eps) / np.sqrt(a[t])
            x = mean + np.sqrt(b[t]) * noises[i] * (1.0 if t > 0 else 0.0)
        np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=2e-4)

    def test_p_sample_step_no_noise_at_t0(self):
        s = make_schedule(DiffusionConfig(timesteps=5))
        x = jnp.ones((2, 3, 2))
        eps = jnp.zeros_like(x)
        big_noise = jnp.full_like(x, 100.0)
        out = p_sample_step(s, x, jnp.array([0, 0]), eps, big_noise)
        # t=0 masks the noise entirely
        np.testing.assert_allclose(
            np.asarray(out), 1.0 / np.sqrt(1 - 1e-4), rtol=1e-5
        )

    def test_cfg_doubles_and_clamps(self):
        calls = {}

        def spy_model(x, t, m, l):
            calls["batch"] = x.shape[0]
            # uncond half sees zeroed conds -> returns 0; cond half returns 20
            is_cond = jnp.mean(jnp.abs(m), axis=(1, 2), keepdims=True) > 0
            return jnp.where(is_cond[..., None].squeeze(-1), 20.0, 0.0) * jnp.ones_like(x)

        motion = jnp.ones((1, 4, 2))
        text = jnp.ones((1, 4, 2))
        eps = guided_eps(spy_model, jnp.zeros((1, 4, 3)), jnp.array([5]), motion, text, 2.0)
        assert calls["batch"] == 2  # doubled batch, single forward
        # eps_diff = clip(20-0, +-5) = 5 -> eps = 0 + 2*5 = 10 -> clip +-10 = 10
        np.testing.assert_allclose(np.asarray(eps), 10.0)

    def test_no_guidance_single_batch(self):
        calls = {}

        def spy_model(x, t, m, l):
            calls["batch"] = x.shape[0]
            return jnp.zeros_like(x)

        guided_eps(spy_model, jnp.zeros((3, 4, 2)), jnp.zeros(3, dtype=jnp.int32),
                   jnp.ones((3, 4, 2)), jnp.ones((3, 4, 2)), 1.0)
        assert calls["batch"] == 3

    def test_numpy_scalar_weight_takes_static_path(self):
        """np.float32 is not a float subclass; a concrete numpy weight <= 1
        must still compile the single-batch path (ADVICE r2)."""
        calls = {}

        def spy_model(x, t, m, l):
            calls["batch"] = x.shape[0]
            return jnp.zeros_like(x)

        guided_eps(spy_model, jnp.zeros((3, 4, 2)), jnp.zeros(3, dtype=jnp.int32),
                   jnp.ones((3, 4, 2)), jnp.ones((3, 4, 2)), np.float32(1.0))
        assert calls["batch"] == 3
        guided_eps(spy_model, jnp.zeros((3, 4, 2)), jnp.zeros(3, dtype=jnp.int32),
                   jnp.ones((3, 4, 2)), jnp.ones((3, 4, 2)), np.float32(2.0))
        assert calls["batch"] == 6  # > 1 still takes the guided path

    def test_traced_weight_matches_static(self):
        """A traced guidance weight (the serving path: one compiled chain for
        every weight) is numerically identical to baking the float in."""
        def model(x, t, m, l):
            cond = jnp.mean(jnp.abs(m), axis=(1, 2), keepdims=True)[..., None]
            return jnp.tanh(x) + cond.squeeze(-1) * jnp.ones_like(x)

        x = jax.random.normal(jax.random.key(0), (2, 4, 3))
        t = jnp.array([5, 5])
        m = jax.random.normal(jax.random.key(1), (2, 4, 2))
        l = jax.random.normal(jax.random.key(2), (2, 4, 2))

        traced = jax.jit(
            lambda gw: guided_eps(model, x, t, m, l, gw))
        for w in (1.5, 2.1, 3.0):
            np.testing.assert_allclose(
                np.asarray(traced(jnp.float32(w))),
                np.asarray(guided_eps(model, x, t, m, l, w)),
                rtol=1e-6, atol=1e-6,
            )


class TestDDIM:
    def test_deterministic_when_eta_zero(self):
        s = make_schedule(DiffusionConfig(timesteps=100))
        shape = (1, 8, 4)
        x_init = jnp.ones(shape)
        a = ddim_sample(linear_model, s, jax.random.key(1), shape,
                        num_steps=10, eta=0.0, x_init=x_init)
        b = ddim_sample(linear_model, s, jax.random.key(2), shape,
                        num_steps=10, eta=0.0, x_init=x_init)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_matches_numpy_oracle(self):
        T, S = 100, 10
        s = make_schedule(DiffusionConfig(timesteps=T))
        shape = (1, 6, 3)
        rng = np.random.default_rng(3)
        x0 = rng.normal(size=shape).astype(np.float32)
        out = ddim_sample(linear_model, s, jax.random.key(0), shape,
                          num_steps=S, eta=0.0, x_init=jnp.asarray(x0))

        b, a, ab = np_schedule(T)
        ts = np.round(np.linspace(T - 1, 0, S)).astype(int)
        ts_prev = np.concatenate([ts[1:], [-1]])
        x = x0.astype(np.float64).copy()
        for t, tp in zip(ts, ts_prev):
            eps = np_linear_model(x, np.full((1,), t), None, None)
            ab_t = ab[t]
            ab_p = 1.0 if tp < 0 else ab[tp]
            x0p = np.clip((x - eps * np.sqrt(1 - ab_t)) / np.sqrt(ab_t), -2.0, 2.0)
            x = np.sqrt(ab_p) * x0p + np.sqrt(1 - ab_p) * eps
        np.testing.assert_allclose(np.asarray(out), x, rtol=2e-4, atol=2e-4)


class TestLoss:
    def test_loss_is_finite_and_scale_sane(self):
        s = make_schedule(DiffusionConfig(timesteps=50))

        def zero_model(x, t, m, l):
            return jnp.zeros_like(x)

        x0 = jax.random.normal(jax.random.key(0), (4, 16, 80))
        loss = diffusion_loss(zero_model, s, jax.random.key(1), x0, None, None)
        # predicting zero noise -> loss ~ E[eps^2] = 1
        assert 0.5 < float(loss) < 1.5

    def test_normalization_applied(self):
        s = make_schedule(DiffusionConfig(timesteps=50))
        seen = {}

        def capture_model(x, t, m, l):
            seen["x"] = x
            return jnp.zeros_like(x)

        x0 = jnp.full((2, 4, 3), 10.0)
        diffusion_loss(capture_model, s, jax.random.key(1), x0, None, None,
                       dataset_mean=10.0, dataset_std=2.0)
        # x0 normalized to 0 -> x_t is pure scaled noise, magnitude < ~5
        assert float(jnp.max(jnp.abs(seen["x"]))) < 6.0


class TestTelemetry:
    def test_collect_stats_shape_and_consistency(self):
        s = make_schedule(DiffusionConfig(timesteps=6))
        shape = (1, 8, 4)
        out, stats = ddpm_sample(
            linear_model, s, jax.random.key(0), shape, collect_stats=True
        )
        assert out.shape == shape
        assert stats.shape == (6, 8)
        # final step's x stats describe the returned sample
        np.testing.assert_allclose(float(stats[-1, 2]), float(np.mean(out)),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(stats[-1, 0]), float(np.min(out)),
                                   rtol=1e-4, atol=1e-5)
