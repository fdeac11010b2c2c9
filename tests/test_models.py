"""Model-layer tests: shapes, and numerical parity with torch semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lm2a_tpu.core.config import ModelConfig
from lm2a_tpu.models import (
    CondProjection,
    MultiheadAttention,
    UNet1D,
    UNet1DUltimate,
    build_cond_projection,
    build_denoiser,
    default_num_groups,
    sinusoidal_time_embed,
    upsample_linear_2x_align_corners,
)

TINY = ModelConfig(
    base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
    num_res_blocks=1, mid_blocks=1, attn_heads=2,
)


def _init_and_apply(model, x, t, motion, text):
    params = model.init(jax.random.key(0), x, t, motion, text)
    return params, model.apply(params, x, t, motion, text)


class TestShapes:
    def test_ultimate_shape_even_t(self):
        model = build_denoiser(TINY)
        x = jnp.zeros((2, 64, 80))
        t = jnp.array([3, 500])
        motion = jnp.zeros((2, 64, 8))
        text = jnp.zeros((2, 64, 8))
        _, out = _init_and_apply(model, x, t, motion, text)
        assert out.shape == (2, 64, 80)
        assert out.dtype == jnp.float32

    def test_ultimate_shape_canonical_516(self):
        """T=516 exercises the odd-length pad/truncate path (516->258->129)."""
        model = build_denoiser(TINY)
        x = jnp.zeros((1, 516, 80))
        t = jnp.array([0])
        motion = jnp.zeros((1, 516, 8))
        text = jnp.zeros((1, 516, 8))
        _, out = _init_and_apply(model, x, t, motion, text)
        assert out.shape == (1, 516, 80)

    def test_ultimate_unconditional(self):
        model = build_denoiser(TINY)
        x = jnp.zeros((1, 32, 80))
        t = jnp.array([1])
        params = model.init(jax.random.key(0), x, t, None, None)
        out = model.apply(params, x, t, None, None)
        assert out.shape == (1, 32, 80)

    def test_v1_shape(self):
        cfg = ModelConfig(arch="v1", base_dim=16, dim_mults=(1, 2), cond_dim=8,
                          time_emb_dim=16, attn_heads=2)
        model = build_denoiser(cfg)
        x = jnp.zeros((2, 64, 80))
        t = jnp.array([1, 2])
        motion = jnp.zeros((2, 64, 8))
        text = jnp.zeros((2, 64, 8))
        _, out = _init_and_apply(model, x, t, motion, text)
        assert out.shape == (2, 64, 80)

    def test_cond_projection(self):
        proj = build_cond_projection(ModelConfig(cond_dim=128))
        motion = jnp.zeros((2, 516, 234))
        lyrics = jnp.zeros((2, 516, 768))
        params = proj.init(jax.random.key(0), motion, lyrics)
        mf, tf = proj.apply(params, motion, lyrics)
        assert mf.shape == (2, 516, 128) and tf.shape == (2, 516, 128)

    def test_default_num_groups(self):
        assert default_num_groups(80) == 8
        assert default_num_groups(256) == 8
        assert default_num_groups(12) == 4
        assert default_num_groups(7) == 1


class TestTorchParity:
    def test_sinusoidal_embed_matches_reference_formula(self):
        import math
        t = jnp.array([0.0, 1.0, 17.0, 999.0])
        dim = 32
        ours = np.asarray(sinusoidal_time_embed(t, dim))
        half = dim // 2
        scale = math.log(10000) / (half - 1)
        freqs = np.exp(np.arange(half) * -scale)
        args = np.asarray(t)[:, None] * freqs[None, :]
        ref = np.concatenate([np.sin(args), np.cos(args)], axis=-1)
        # fp32 sin/cos of large args (t~1000) differs from fp64 in the ulps
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=5e-5)

    def test_mha_matches_torch(self):
        """Transfer torch nn.MultiheadAttention weights -> identical output."""
        torch = pytest.importorskip("torch")
        E, H, B, T, S = 16, 4, 2, 10, 12
        tm = torch.nn.MultiheadAttention(E, H, batch_first=True)
        tm.eval()
        rng = np.random.default_rng(0)
        q = rng.normal(size=(B, T, E)).astype(np.float32)
        k = rng.normal(size=(B, S, E)).astype(np.float32)
        with torch.no_grad():
            ref, _ = tm(torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(k))
        ref = ref.numpy()

        w_in = tm.in_proj_weight.detach().numpy()  # (3E, E)
        b_in = tm.in_proj_bias.detach().numpy()
        wq, wk, wv = w_in[:E], w_in[E : 2 * E], w_in[2 * E :]
        bq, bk, bv = b_in[:E], b_in[E : 2 * E], b_in[2 * E :]
        wo = tm.out_proj.weight.detach().numpy()
        bo = tm.out_proj.bias.detach().numpy()

        m = MultiheadAttention(E, H)
        params = {
            "params": {
                "q_proj": {"kernel": jnp.asarray(wq.T), "bias": jnp.asarray(bq)},
                "k_proj": {"kernel": jnp.asarray(wk.T), "bias": jnp.asarray(bk)},
                "v_proj": {"kernel": jnp.asarray(wv.T), "bias": jnp.asarray(bv)},
                "out_proj": {"kernel": jnp.asarray(wo.T), "bias": jnp.asarray(bo)},
            }
        }
        ours = np.asarray(m.apply(params, jnp.asarray(q), jnp.asarray(k), jnp.asarray(k)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_upsample_matches_torch_align_corners(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 9, 3)).astype(np.float32)
        ours = np.asarray(upsample_linear_2x_align_corners(jnp.asarray(x)))
        ref = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x).permute(0, 2, 1), scale_factor=2,
                mode="linear", align_corners=True,
            )
            .permute(0, 2, 1)
            .numpy()
        )
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)

    def test_groupnorm_matches_torch(self):
        torch = pytest.importorskip("torch")
        import flax.linen as fnn

        C, G = 24, 8
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 7, C)).astype(np.float32)
        tg = torch.nn.GroupNorm(G, C)
        with torch.no_grad():
            tg.weight.copy_(torch.from_numpy(rng.normal(size=C).astype(np.float32)))
            tg.bias.copy_(torch.from_numpy(rng.normal(size=C).astype(np.float32)))
            ref = tg(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
        gn = fnn.GroupNorm(num_groups=G, epsilon=1e-5)
        params = {
            "params": {
                "scale": jnp.asarray(tg.weight.detach().numpy()),
                "bias": jnp.asarray(tg.bias.detach().numpy()),
            }
        }
        ours = np.asarray(gn.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_conv_transpose_matches_torch(self):
        """flax ConvTranspose(k4 s2 pad(1,1)) == torch ConvTranspose1d(k4,s2,p1)."""
        torch = pytest.importorskip("torch")
        import flax.linen as fnn

        Cin, Cout, T = 3, 5, 8
        tm = torch.nn.ConvTranspose1d(Cin, Cout, 4, stride=2, padding=1)
        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, T, Cin)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
        # torch weight (Cin, Cout, K) -> flax kernel (K, Cin, Cout), spatially
        # flipped; torch's p=1 output length (2T) corresponds to flax (2,2).
        w = tm.weight.detach().numpy().transpose(2, 0, 1)[::-1].copy()
        fm = fnn.ConvTranspose(Cout, (4,), strides=(2,), padding=[(2, 2)])
        params = {
            "params": {
                "kernel": jnp.asarray(w),
                "bias": jnp.asarray(tm.bias.detach().numpy()),
            }
        }
        ours = np.asarray(fm.apply(params, jnp.asarray(x)))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_strided_conv_matches_torch(self):
        """flax Conv(k4 s2 pad(1,1)) == torch Conv1d(k4,s2,p1) (downsampler)."""
        torch = pytest.importorskip("torch")
        import flax.linen as fnn

        Cin, Cout, T = 3, 5, 16
        tm = torch.nn.Conv1d(Cin, Cout, 4, stride=2, padding=1)
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, T, Cin)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x).permute(0, 2, 1)).permute(0, 2, 1).numpy()
        # torch weight (Cout, Cin, K); flax Conv kernel (K, Cin, Cout)
        w = tm.weight.detach().numpy().transpose(2, 1, 0)
        fm = fnn.Conv(Cout, (4,), strides=(2,), padding=[(1, 1)])
        params = {
            "params": {
                "kernel": jnp.asarray(w),
                "bias": jnp.asarray(tm.bias.detach().numpy()),
            }
        }
        ours = np.asarray(fm.apply(params, jnp.asarray(x)))
        assert ours.shape == ref.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
class TestRemat:
    def test_remat_outputs_and_grads_match(self):
        import jax

        cfg = ModelConfig(base_dim=16, dim_mults=(1, 2), cond_dim=8,
                          time_emb_dim=16, num_res_blocks=1, mid_blocks=1,
                          attn_heads=2)
        cfg_r = ModelConfig(base_dim=16, dim_mults=(1, 2), cond_dim=8,
                            time_emb_dim=16, num_res_blocks=1, mid_blocks=1,
                            attn_heads=2, remat=True)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 32, 80)).astype(np.float32))
        t = jnp.array([1, 2])
        motion = jnp.asarray(rng.normal(size=(2, 32, 8)).astype(np.float32))
        text = jnp.asarray(rng.normal(size=(2, 32, 8)).astype(np.float32))

        m = build_denoiser(cfg)
        mr = build_denoiser(cfg_r)
        params = m.init(jax.random.key(0), x, t, motion, text)
        a = np.asarray(m.apply(params, x, t, motion, text))
        b = np.asarray(mr.apply(params, x, t, motion, text))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

        def loss(fn, p):
            return jnp.sum(fn.apply(p, x, t, motion, text) ** 2)

        ga = jax.grad(lambda p: loss(m, p))(params)
        gb = jax.grad(lambda p: loss(mr, p))(params)
        jax.tree.map(
            lambda u, v: np.testing.assert_allclose(
                np.asarray(u), np.asarray(v), rtol=1e-4, atol=1e-5
            ),
            ga, gb,
        )


class TestUncondConstantFold:
    """CFG fast path: uncond_rows constant-folds cross-attention exactly."""

    def _setup(self, arch):
        from lm2a_tpu.core.config import ModelConfig
        from lm2a_tpu.models.factory import build_denoiser

        cfg = ModelConfig(
            arch=arch, base_dim=16, dim_mults=(1, 2), cond_dim=8,
            time_emb_dim=16, num_res_blocks=1, mid_blocks=1, attn_heads=2,
        )
        den = build_denoiser(cfg, "float32")
        key = jax.random.key(0)
        b, t = 2, 24
        x = jax.random.normal(key, (2 * b, t, 80), jnp.float32)
        tt = jnp.full((2 * b,), 5, jnp.int32)
        m = jax.random.normal(jax.random.key(1), (b, t, cfg.cond_dim))
        l = jax.random.normal(jax.random.key(2), (b, t, cfg.cond_dim))
        # doubled CFG batch: first half zero-conditioned
        m2 = jnp.concatenate([jnp.zeros_like(m), m], axis=0)
        l2 = jnp.concatenate([jnp.zeros_like(l), l], axis=0)
        params = den.init(key, x, tt, m2, l2)
        return den, params, x, tt, m2, l2, b

    @pytest.mark.parametrize("arch", ["ultimate", "v1"])
    def test_matches_plain_forward(self, arch):
        den, params, x, tt, m2, l2, b = self._setup(arch)
        plain = den.apply(params, x, tt, m2, l2)
        fast = den.apply(params, x, tt, m2, l2, uncond_rows=b)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(plain), rtol=1e-4, atol=1e-5
        )

    def test_param_structure_unchanged(self):
        """uncond_rows is trace-time only: same params serve both paths."""
        den, params, x, tt, m2, l2, b = self._setup("ultimate")
        import jax as _jax

        shapes_plain = _jax.tree.map(lambda a: a.shape, params)
        params2 = den.init(
            jax.random.key(0), x, tt, m2, l2, uncond_rows=b
        )
        shapes_fast = _jax.tree.map(lambda a: a.shape, params2)
        assert shapes_plain == shapes_fast

    def test_guided_eps_uncond_fast_matches(self):
        from lm2a_tpu.core.config import DiffusionConfig
        from lm2a_tpu.diffusion import make_schedule
        from lm2a_tpu.diffusion.gaussian import guided_eps

        den, params, x, tt, m2, l2, b = self._setup("ultimate")
        m, l = m2[b:], l2[b:]
        xb, tb = x[:b], tt[:b]

        def model_fn(xx, t_, mm, ll, **kw):
            return den.apply(params, xx, t_, mm, ll, **kw)

        slow = guided_eps(model_fn, xb, tb, m, l, 2.1, uncond_fast=False)
        fast = guided_eps(model_fn, xb, tb, m, l, 2.1, uncond_fast=True)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(slow), rtol=1e-4, atol=1e-5
        )


class TestFoldedAttention:
    """Serving-only folded cross-attention algebra: same params, same math.

    The fold (merged Q matmul, branch-stacked cores, out/fuse projections
    collapsed into one matmul of hoisted weight products) is an exact linear
    rewrite of ``CrossAttentionFusion`` — equality up to float reassociation.
    """

    def test_module_matches_unfolded(self):
        from lm2a_tpu.models.attention import CrossAttentionFusion

        m = CrossAttentionFusion(mel_dim=64, cond_dim=32, num_heads=4)
        mf = CrossAttentionFusion(mel_dim=64, cond_dim=32, num_heads=4,
                                  folded=True)
        key = jax.random.key(0)
        h = jax.random.normal(key, (2, 37, 64))
        mo = jax.random.normal(jax.random.key(1), (2, 37, 32))
        tx = jax.random.normal(jax.random.key(2), (2, 37, 32))
        params = m.init(key, h, mo, tx)
        np.testing.assert_allclose(
            np.asarray(mf.apply(params, h, mo, tx)),
            np.asarray(m.apply(params, h, mo, tx)),
            rtol=1e-4, atol=1e-5,
        )

    @pytest.mark.parametrize("arch", ["ultimate", "v1"])
    def test_unet_matches_with_uncond_fold(self, arch):
        """Full UNet, folded vs plain, including the uncond_rows const path."""
        import dataclasses as dc

        from lm2a_tpu.core.config import ModelConfig
        from lm2a_tpu.models.factory import build_denoiser

        cfg = ModelConfig(
            arch=arch, base_dim=16, dim_mults=(1, 2), cond_dim=8,
            time_emb_dim=16, num_res_blocks=1, mid_blocks=1, attn_heads=2,
        )
        den = build_denoiser(cfg, "float32")
        denf = build_denoiser(dc.replace(cfg, folded_attention=True), "float32")
        key = jax.random.key(0)
        x = jax.random.normal(key, (3, 24, 80), jnp.float32)
        tt = jnp.array([5, 100, 900], jnp.int32)
        mo = jax.random.normal(jax.random.key(1), (3, 24, cfg.cond_dim))
        tx = jax.random.normal(jax.random.key(2), (3, 24, cfg.cond_dim))
        mo = mo.at[0].set(0.0)
        tx = tx.at[0].set(0.0)
        params = den.init(key, x, tt, mo, tx)
        plain = den.apply(params, x, tt, mo, tx, uncond_rows=1)
        folded = denf.apply(params, x, tt, mo, tx, uncond_rows=1)
        np.testing.assert_allclose(
            np.asarray(folded), np.asarray(plain), rtol=1e-4, atol=1e-5
        )

    def test_init_param_structure_unchanged(self):
        """folded init runs the regular path: identical parameter tree."""
        import dataclasses as dc

        from lm2a_tpu.core.config import ModelConfig
        from lm2a_tpu.models.factory import build_denoiser

        cfg = ModelConfig(
            base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
            num_res_blocks=1, mid_blocks=1, attn_heads=2,
        )
        key = jax.random.key(0)
        x = jax.random.normal(key, (1, 24, 80), jnp.float32)
        tt = jnp.zeros((1,), jnp.int32)
        mo = jax.random.normal(key, (1, 24, cfg.cond_dim))
        tx = jax.random.normal(key, (1, 24, cfg.cond_dim))
        p0 = build_denoiser(cfg, "float32").init(key, x, tt, mo, tx)
        p1 = build_denoiser(
            dc.replace(cfg, folded_attention=True), "float32"
        ).init(key, x, tt, mo, tx)
        assert jax.tree.map(lambda a: a.shape, p0) == \
            jax.tree.map(lambda a: a.shape, p1)
