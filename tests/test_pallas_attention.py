"""Pallas fused attention: parity vs the XLA reference core (interpret mode
on CPU), gradients through the custom VJP, and model-level equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lm2a_tpu.core.config import ModelConfig
from lm2a_tpu.models import MultiheadAttention, build_denoiser
from lm2a_tpu.ops.pallas_attention import attention_core, attention_core_reference


class TestKernelParity:
    @pytest.mark.parametrize("shape", [
        (2, 4, 16, 32),     # aligned
        (1, 8, 66, 32),     # unaligned T (pad path)
        (2, 2, 516, 32),    # canonical mel length
        (1, 4, 33, 64),     # different head dim
    ])
    def test_matches_reference(self, shape):
        b, h, t, hd = shape
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
        ours = np.asarray(attention_core(q, k, v))
        ref = np.asarray(attention_core_reference(q, k, v))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_cross_attention_kv_shorter(self):
        rng = np.random.default_rng(1)
        q = jnp.asarray(rng.normal(size=(1, 2, 20, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 2, 13, 32)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 2, 13, 32)).astype(np.float32))
        ours = np.asarray(attention_core(q, k, v))
        ref = np.asarray(attention_core_reference(q, k, v))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_gradients_match_reference(self):
        rng = np.random.default_rng(2)
        q = jnp.asarray(rng.normal(size=(1, 2, 12, 32)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(1, 2, 12, 32)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(1, 2, 12, 32)).astype(np.float32))

        def loss_fused(q, k, v):
            return jnp.sum(attention_core(q, k, v) ** 2)

        def loss_ref(q, k, v):
            return jnp.sum(attention_core_reference(q, k, v) ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)


class TestModelIntegration:
    def test_mha_fused_equals_unfused(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 18, 16)).astype(np.float32))
        kv = jnp.asarray(rng.normal(size=(2, 18, 16)).astype(np.float32))
        m_ref = MultiheadAttention(16, 4, fused=False)
        m_fused = MultiheadAttention(16, 4, fused=True)
        params = m_ref.init(jax.random.key(0), x, kv, kv)
        a = np.asarray(m_ref.apply(params, x, kv, kv))
        b = np.asarray(m_fused.apply(params, x, kv, kv))
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_unet_fused_equals_unfused(self):
        cfg = ModelConfig(base_dim=16, dim_mults=(1, 2), cond_dim=8,
                          time_emb_dim=16, num_res_blocks=1, mid_blocks=1,
                          attn_heads=2)
        cfg_fused = ModelConfig(base_dim=16, dim_mults=(1, 2), cond_dim=8,
                                time_emb_dim=16, num_res_blocks=1, mid_blocks=1,
                                attn_heads=2, fused_attention=True)
        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(1, 36, 80)).astype(np.float32))
        t = jnp.array([7])
        motion = jnp.asarray(rng.normal(size=(1, 36, 8)).astype(np.float32))
        text = jnp.asarray(rng.normal(size=(1, 36, 8)).astype(np.float32))

        model = build_denoiser(cfg)
        model_fused = build_denoiser(cfg_fused)
        params = model.init(jax.random.key(0), x, t, motion, text)
        a = np.asarray(model.apply(params, x, t, motion, text))
        b = np.asarray(model_fused.apply(params, x, t, motion, text))
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


class TestStreamingFlash:
    """Online-softmax streaming kernel (S > STREAMING_S_THRESHOLD)."""

    def test_matches_reference_long_s(self):
        from lm2a_tpu.ops.pallas_attention import (
            _attention_pallas_streaming,
            attention_core_reference,
        )

        key = jax.random.key(0)
        kq, kk, kv = jax.random.split(key, 3)
        b, h, t, s, hd = 1, 2, 300, 1400, 16  # ragged: exercises padding+mask
        q = jax.random.normal(kq, (b, h, t, hd), jnp.float32)
        k = jax.random.normal(kk, (b, h, s, hd), jnp.float32)
        v = jax.random.normal(kv, (b, h, s, hd), jnp.float32)
        ref = attention_core_reference(q, k, v)
        out = _attention_pallas_streaming(q, k, v, interpret=True,
                                          block_t=128, block_s=512)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_dispatch_threshold(self):
        """attention_core routes long-S shapes through the streaming path."""
        from lm2a_tpu.ops import pallas_attention as pa

        key = jax.random.key(1)
        kq, kk, kv = jax.random.split(key, 3)
        b, h, t, s, hd = 1, 2, 64, pa.STREAMING_S_THRESHOLD + 256, 8
        q = jax.random.normal(kq, (b, h, t, hd), jnp.float32)
        k = jax.random.normal(kk, (b, h, s, hd), jnp.float32)
        v = jax.random.normal(kv, (b, h, s, hd), jnp.float32)
        out = pa.attention_core(q, k, v)
        ref = pa.attention_core_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_grad_matches_reference(self):
        from lm2a_tpu.ops import pallas_attention as pa

        key = jax.random.key(2)
        kq, kk, kv = jax.random.split(key, 3)
        b, h, t, s, hd = 1, 1, 40, pa.STREAMING_S_THRESHOLD + 16, 8
        q = jax.random.normal(kq, (b, h, t, hd), jnp.float32)
        k = jax.random.normal(kk, (b, h, s, hd), jnp.float32)
        v = jax.random.normal(kv, (b, h, s, hd), jnp.float32)

        def f_fused(q, k, v):
            return jnp.sum(pa.attention_core(q, k, v) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(pa.attention_core_reference(q, k, v) ** 2)

        g1 = jax.grad(f_fused, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-4, atol=1e-4)
