"""Config serialization tests."""

import pytest

from lm2a_tpu.core.config import (
    DiffusionConfig,
    LM2AConfig,
    ModelConfig,
    TrainConfig,
    config_from_dict,
    config_from_json,
    config_to_dict,
    config_to_json,
)


class TestRoundtrip:
    def test_json_roundtrip(self):
        cfg = LM2AConfig(
            model=ModelConfig(arch="v1", base_dim=64, dim_mults=(1, 2, 4, 8),
                              fused_attention=True),
            diffusion=DiffusionConfig(timesteps=250),
            train=TrainConfig(lr=1e-3, lr_decay_steps=(10, 20),
                              lr_decay_factors=(0.5, 0.5)),
        )
        back = config_from_json(config_to_json(cfg))
        assert back == cfg
        assert isinstance(back.model.dim_mults, tuple)
        assert isinstance(back.train.lr_decay_steps, tuple)

    def test_defaults_match_reference(self):
        cfg = LM2AConfig()
        assert cfg.train.batch_size == 16
        assert cfg.train.lr == 2e-4
        assert cfg.train.weight_decay == 1e-4
        assert cfg.train.epochs == 500
        assert cfg.train.ema_decay == 0.999
        assert cfg.train.grad_clip == 1.0
        assert cfg.train.cond_drop_prob == 0.2
        assert cfg.diffusion.timesteps == 1000
        assert cfg.model.base_dim == 256
        assert cfg.model.dim_mults == (1, 2, 4)
        assert cfg.model.cond_dim == 128
        assert cfg.model.time_emb_dim == 256
        assert cfg.model.motion_dim == 234
        assert cfg.mel.n_fft == 1024 and cfg.mel.hop_size == 256

    def test_unknown_keys_ignored(self):
        d = config_to_dict(LM2AConfig())
        d["model"]["future_field"] = 42
        d["brand_new_section"] = {"x": 1}
        cfg = config_from_dict(d)
        assert cfg.model.base_dim == 256

    def test_missing_sections_defaulted(self):
        cfg = config_from_dict({"model": {"base_dim": 32}})
        assert cfg.model.base_dim == 32
        assert cfg.train.lr == 2e-4
