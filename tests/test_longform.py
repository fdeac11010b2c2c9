"""Long-form windowed generation: stitching math and end-to-end shape."""

import jax
import numpy as np
import pytest

from lm2a_tpu.core.config import (
    DiffusionConfig,
    LM2AConfig,
    ModelConfig,
    TrainConfig,
)
from lm2a_tpu.inference import load_models
from lm2a_tpu.inference.longform import crossfade_stitch, generate_long, window_conditions
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser
from lm2a_tpu.training import init_train_state, save_checkpoint

CFG = LM2AConfig(
    model=ModelConfig(base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
                      num_res_blocks=1, mid_blocks=1, attn_heads=2,
                      motion_dim=234, text_dim=768),
    diffusion=DiffusionConfig(timesteps=4),
    train=TrainConfig(batch_size=2),
)


class TestStitch:
    def test_constant_windows_stitch_constant(self):
        w = np.ones((3, 80, 20), dtype=np.float32) * 5.0
        out = crossfade_stitch(w, hop_frames=12)
        assert out.shape == (80, 12 * 2 + 20)
        np.testing.assert_allclose(out, 5.0, rtol=1e-6)

    def test_no_overlap_concatenates(self):
        w = np.stack([np.full((2, 10), i, dtype=np.float32) for i in range(3)])
        out = crossfade_stitch(w, hop_frames=10)
        assert out.shape == (2, 30)
        np.testing.assert_array_equal(out[:, :10], 0.0)
        np.testing.assert_array_equal(out[:, 20:], 2.0)

    def test_crossfade_is_monotone_between_levels(self):
        a = np.zeros((1, 1, 20), dtype=np.float32)
        b = np.ones((1, 1, 20), dtype=np.float32)
        w = np.concatenate([a, b], axis=0)
        out = crossfade_stitch(w, hop_frames=12)[0]
        overlap = out[12:20]
        assert (np.diff(overlap) >= -1e-6).all()
        assert out[11] == pytest.approx(0.0) and out[20] == pytest.approx(1.0)


class TestWindows:
    def test_tail_padding_holds_last_frame(self):
        motion = np.arange(50, dtype=np.float32)[:, None].repeat(3, axis=1)
        wins = window_conditions(motion, [np.zeros(4)], 3, 30, 15)
        assert len(wins) == 3
        seg, lyr = wins[2]
        assert seg.shape == (30, 3)
        assert (seg[-10:] == seg[19]).all()  # held last real frame
        assert lyr.shape == (30, 4)


class TestGenerateLong:
    def test_end_to_end_shape(self, tmp_path):
        denoiser = build_denoiser(CFG.model)
        cond_proj = build_cond_projection(CFG.model)
        state, _ = init_train_state(denoiser, cond_proj, CFG, jax.random.key(0), seq_len=32)
        ckpt_dir = str(tmp_path / "ck")
        save_checkpoint(ckpt_dir, state, CFG, dataset_mean=0.0, dataset_std=1.0)
        models = load_models(ckpt_dir + "/ckpt_step_0")

        rng = np.random.default_rng(0)
        total_seconds = 4.0
        motion = rng.normal(size=(int(total_seconds * 30) + 30, 234)).astype(np.float32)
        lyrics = [rng.normal(size=768).astype(np.float32) for _ in range(3)]
        mel = generate_long(
            models, motion, lyrics,
            total_seconds=total_seconds, window_seconds=1.5, overlap_seconds=0.5,
            steps=4, guidance_weight=1.5, batch_size=2,
        )
        mel_fps = 22050 / 256
        assert mel.shape == (80, int(round(total_seconds * mel_fps)))
        assert np.isfinite(mel).all()


@pytest.mark.slow
class TestSinglePass:
    def test_streaming_attention_swaps_in_above_threshold(self):
        """with_streaming_attention returns a fused-attention copy only for
        long sequences, sharing the checkpoint params."""
        from lm2a_tpu.inference.longform import with_streaming_attention
        from lm2a_tpu.inference.sample import LoadedModels
        from lm2a_tpu.core.config import LM2AConfig
        from lm2a_tpu.models.factory import build_denoiser

        cfg = LM2AConfig()
        models = LoadedModels(
            cfg=cfg, denoiser=build_denoiser(cfg.model, "bfloat16"),
            cond_proj=object(), unet_params={"p": 1}, proj_params={"q": 2},
            dataset_mean=-4.0, dataset_std=1.9, timesteps=1000,
        )
        same = with_streaming_attention(models, 516)
        assert same is models
        # below the measured XLA/Pallas break-even the XLA path stays
        mid = with_streaming_attention(models, 4096)
        assert mid is models
        long = with_streaming_attention(models, 16384)
        assert long is not models
        assert long.cfg.model.fused_attention
        assert long.unet_params is models.unet_params
        assert long.proj_params is models.proj_params

    def test_single_pass_generates_full_length(self):
        """Tiny model, CPU: one-window generation produces the right shape
        and finite values (the fused path is exercised in interpret mode
        when T exceeds the kernel threshold)."""
        import dataclasses

        import lm2a_tpu.ops.pallas_attention as pa
        from lm2a_tpu.core.config import (
            DiffusionConfig, LM2AConfig, ModelConfig,
        )
        from lm2a_tpu.inference.longform import generate_single_pass
        from lm2a_tpu.inference.sample import LoadedModels
        from lm2a_tpu.models.factory import (
            build_cond_projection, build_denoiser,
        )

        cfg = LM2AConfig(
            model=ModelConfig(base_dim=16, dim_mults=(1, 2), cond_dim=8,
                              time_emb_dim=16, num_res_blocks=1, mid_blocks=1,
                              attn_heads=2, motion_dim=12, text_dim=24),
            diffusion=DiffusionConfig(timesteps=4),
        )
        den = build_denoiser(cfg.model, "bfloat16")
        proj = build_cond_projection(cfg.model, "bfloat16")
        T = 160  # > patched threshold below -> streaming path engaged
        rng = np.random.default_rng(0)
        motion = rng.normal(size=(90, 12)).astype(np.float32)
        lyrics = rng.normal(size=(90, 24)).astype(np.float32)
        import jax
        import jax.numpy as jnp
        x = jnp.zeros((1, T, 80))
        uv = den.init(jax.random.key(0), x, jnp.zeros((1,), jnp.int32),
                      jnp.zeros((1, T, 8)), jnp.zeros((1, T, 8)))
        pv = proj.init(jax.random.key(1), jnp.zeros((1, T, 12)),
                       jnp.zeros((1, T, 24)))
        models = LoadedModels(
            cfg=cfg, denoiser=den, cond_proj=proj,
            unet_params=uv, proj_params=pv,
            dataset_mean=-4.0, dataset_std=1.9, timesteps=4,
        )
        orig = pa.STREAMING_S_THRESHOLD
        pa.STREAMING_S_THRESHOLD = 96
        try:
            sr, hop = 22050, 256
            mel = generate_single_pass(
                models, motion, lyrics, total_seconds=T * hop / sr,
                guidance_weight=2.0, seed=3,
            )
        finally:
            pa.STREAMING_S_THRESHOLD = orig
        assert mel.shape == (80, T)
        assert np.isfinite(mel).all()
