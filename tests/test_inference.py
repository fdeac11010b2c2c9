"""Inference pipeline tests: sample_from_npz against both checkpoint formats."""

import os
import sys

import jax
import numpy as np
import pytest

from lm2a_tpu.core.config import (
    DiffusionConfig,
    LM2AConfig,
    ModelConfig,
    TrainConfig,
)
from lm2a_tpu.data import Sample, save_sample
from lm2a_tpu.inference import load_models, sample_from_npz
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser
from lm2a_tpu.training import init_train_state, save_checkpoint

CFG = LM2AConfig(
    model=ModelConfig(
        base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
        num_res_blocks=1, mid_blocks=1, attn_heads=2,
        motion_dim=234, text_dim=768,
    ),
    diffusion=DiffusionConfig(timesteps=8),
    train=TrainConfig(batch_size=2),
)


@pytest.fixture
def clip_npz(tmp_path):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "clip.npz")
    save_sample(
        p,
        Sample(
            mel=rng.normal(size=(80, 48)).astype(np.float32),
            motion=rng.normal(size=(16, 234)).astype(np.float32),
            lyrics=rng.normal(size=(16, 768)).astype(np.float32),
        ),
    )
    return p


@pytest.fixture
def orbax_ckpt(tmp_path):
    denoiser = build_denoiser(CFG.model)
    cond_proj = build_cond_projection(CFG.model)
    state, _ = init_train_state(denoiser, cond_proj, CFG, jax.random.key(0), seq_len=48)
    ckpt_dir = str(tmp_path / "ckpts")
    save_checkpoint(ckpt_dir, state, CFG, epoch=0, dataset_mean=-4.6, dataset_std=1.86)
    return os.path.join(ckpt_dir, "ckpt_step_0")


class TestOrbaxPath:
    def test_sample_from_npz(self, clip_npz, orbax_ckpt, tmp_path):
        out_dir = str(tmp_path / "out")
        out = sample_from_npz(
            clip_npz, orbax_ckpt, out_dir,
            steps=8, guidance_weight=2.1, save_png=False,
        )
        assert os.path.exists(out)
        d = np.load(out)
        assert d["mel"].shape == (80, 48)
        assert np.isfinite(d["mel"]).all()
        assert d["motion"].shape == (48, 234)  # interp-resampled to mel T
        assert d["lyrics"].shape == (48, 768)
        assert d["motion_proj"].shape == (1, 48, 8)
        assert int(d["sr"]) == 22050

    def test_config_and_stats_travel_in_checkpoint(self, orbax_ckpt):
        models = load_models(orbax_ckpt)
        assert models.cfg.model.base_dim == 16
        assert models.dataset_mean == pytest.approx(-4.6)
        assert models.dataset_std == pytest.approx(1.86)
        assert models.timesteps == 8

    def test_deterministic_given_seed(self, clip_npz, orbax_ckpt, tmp_path):
        models = load_models(orbax_ckpt)
        a = sample_from_npz(clip_npz, orbax_ckpt, str(tmp_path / "a"),
                            steps=8, seed=7, save_png=False, models=models)
        b = sample_from_npz(clip_npz, orbax_ckpt, str(tmp_path / "b"),
                            steps=8, seed=7, save_png=False, models=models)
        np.testing.assert_array_equal(np.load(a)["mel"], np.load(b)["mel"])

    def test_distilled_ckpt_defaults_to_its_own_grid(self, clip_npz,
                                                     tmp_path):
        """A distilled student's metadata drives serving defaults (round-4
        VERDICT #7): method resolves to ddim at distilled_steps, guidance to
        1.0 (the CFG fold is baked into its eps) — with no CLI flags."""
        from lm2a_tpu.inference.sample import (
            _resolve_run_params,
            resolve_method,
        )

        denoiser = build_denoiser(CFG.model)
        cond_proj = build_cond_projection(CFG.model)
        state, _ = init_train_state(denoiser, cond_proj, CFG,
                                    jax.random.key(0), seq_len=48)
        ckpt_dir = str(tmp_path / "student")
        save_checkpoint(ckpt_dir, state, CFG, epoch=0, dataset_mean=-4.6,
                        dataset_std=1.86,
                        extra={"distilled_steps": 4, "folded_guidance": 2.1})
        ckpt = os.path.join(ckpt_dir, "ckpt_step_0")

        models = load_models(ckpt)
        assert models.distilled_steps == 4
        assert models.folded_guidance == pytest.approx(2.1)
        _, gw = _resolve_run_params(models, None, None)
        assert gw == 1.0  # single-forward serving
        assert resolve_method(models, None, None) == ("ddim", 4)
        # explicit values still win
        assert resolve_method(models, "ddpm", None) == ("ddpm", None)
        assert resolve_method(models, None, 8) == ("ddim", 8)

        # end-to-end: no method/steps flags, the student's grid serves
        out = sample_from_npz(clip_npz, ckpt, str(tmp_path / "out"),
                              save_png=False, models=models)
        d = np.load(out)
        assert d["mel"].shape == (80, 48)
        assert np.isfinite(d["mel"]).all()


@pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
class TestTorchCheckpointPath:
    def test_sample_from_reference_torch_ckpt(self, clip_npz, tmp_path):
        torch = pytest.importorskip("torch")
        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from models.embedding import CondProjection as TCP
        from models.unet1d_ultimate import UNet1D_ultimate as TUNet

        torch.manual_seed(0)
        tm = TUNet(in_dim=80, base_dim=16, dim_mults=(1, 2), cond_dim=8,
                   time_emb_dim=16, num_res_blocks=1, mid_blocks=1, attn_heads=2)
        tp = TCP(motion_dim=234, text_dim=768, out_dim=8)
        ckpt = {
            "step": 5, "epoch": 1,
            "unet": tm.state_dict(), "cond_proj": tp.state_dict(),
            "ema_unet": tm.state_dict(), "ema_cond_proj": tp.state_dict(),
            "dataset_mean": -4.0, "dataset_std": 2.0,
        }
        pt = str(tmp_path / "ref.pt")
        torch.save(ckpt, pt)

        out = sample_from_npz(
            clip_npz, pt, str(tmp_path / "out"),
            steps=8, guidance_weight=1.0, save_png=False, cfg=CFG,
        )
        d = np.load(out)
        assert d["mel"].shape == (80, 48)
        assert np.isfinite(d["mel"]).all()


class TestBatchedGeneration:
    def test_multi_clip_batch(self, orbax_ckpt, tmp_path):
        from lm2a_tpu.inference import sample_batch_from_npz

        rng = np.random.default_rng(1)
        paths = []
        for i in range(3):
            p = str(tmp_path / f"clip{i}.npz")
            save_sample(p, Sample(
                mel=rng.normal(size=(80, 48)).astype(np.float32),
                motion=rng.normal(size=(16, 234)).astype(np.float32),
                lyrics=rng.normal(size=(16, 768)).astype(np.float32),
            ))
            paths.append(p)
        out = sample_batch_from_npz(
            paths, orbax_ckpt, str(tmp_path / "out"),
            steps=8, guidance_weight=2.1, batch_size=2,
        )
        assert len(out) == 3
        for p in out:
            d = np.load(p)
            assert d["mel"].shape == (80, 48)
            assert np.isfinite(d["mel"]).all()
        # different conditions must give different outputs
        a = np.load(out[0])["mel"]
        b = np.load(out[1])["mel"]
        assert not np.allclose(a, b)


class TestRunParamPrecedence:
    """Reference precedence (sample.py:118-120,140): checkpoint timesteps /
    guidance_weight fill in when the CLI passes none; explicit values win."""

    def _models(self, timesteps=40, guidance=None):
        from lm2a_tpu.inference.sample import LoadedModels

        return LoadedModels(
            cfg=CFG, denoiser=None, cond_proj=None, unet_params={},
            proj_params={}, dataset_mean=0.0, dataset_std=1.0,
            timesteps=timesteps, guidance_weight=guidance,
        )

    def test_ckpt_values_used_when_cli_omits(self):
        from lm2a_tpu.inference.sample import _resolve_run_params

        steps, g = _resolve_run_params(self._models(40, 2.5), None, None)
        assert steps == 40 and g == 2.5

    def test_explicit_cli_wins(self):
        from lm2a_tpu.inference.sample import _resolve_run_params

        steps, g = _resolve_run_params(self._models(40, 2.5), 12, 1.0)
        assert steps == 12 and g == 1.0

    def test_guidance_defaults_to_one(self):
        from lm2a_tpu.inference.sample import _resolve_run_params

        _, g = _resolve_run_params(self._models(40, None), None, None)
        assert g == 1.0

    def test_ddim_steps_explicit_and_capped(self, capsys):
        from lm2a_tpu.inference.sample import _ddim_num_steps

        assert _ddim_num_steps(1000, 200) == 200
        assert _ddim_num_steps(1000, None) == 50  # logged cap
        assert _ddim_num_steps(30, None) == 30

    @pytest.mark.skipif(not os.path.isdir("/root/reference"), reason="no reference")
    def test_torch_ckpt_meta_drives_defaults(self, tmp_path):
        """A reference-format checkpoint carrying timesteps/guidance_weight
        sets the sampling defaults after load_models (reference
        sample.py:118-120,140)."""
        torch = pytest.importorskip("torch")
        from lm2a_tpu.inference.sample import _resolve_run_params

        if "/root/reference" not in sys.path:
            sys.path.insert(0, "/root/reference")
        from models.embedding import CondProjection as TCP
        from models.unet1d_ultimate import UNet1D_ultimate as TUNet

        torch.manual_seed(0)
        tm = TUNet(in_dim=80, base_dim=16, dim_mults=(1, 2), cond_dim=8,
                   time_emb_dim=16, num_res_blocks=1, mid_blocks=1, attn_heads=2)
        tp = TCP(motion_dim=234, text_dim=768, out_dim=8)
        ckpt = {
            "unet": tm.state_dict(), "cond_proj": tp.state_dict(),
            "timesteps": 16, "guidance_weight": 3.0,
        }
        pt = str(tmp_path / "ref_meta.pt")
        torch.save(ckpt, pt)

        models = load_models(pt, cfg=CFG)
        assert models.timesteps == 16
        assert models.guidance_weight == 3.0
        steps, g = _resolve_run_params(models, None, None)
        assert steps == 16 and g == 3.0


class TestStdCalibration:
    def test_calibration_scales_z_std_and_preserves_mean(self, clip_npz,
                                                         tmp_path):
        """A checkpoint-carried std_calibration rescales each generated
        clip about its own mean in z-space (round-5 VERDICT #3): generated
        std scales by exactly r, the clip mean is untouched, and r=None
        is a bit-exact no-op."""
        denoiser = build_denoiser(CFG.model)
        cond_proj = build_cond_projection(CFG.model)
        state, _ = init_train_state(denoiser, cond_proj, CFG,
                                    jax.random.key(0), seq_len=48)
        ckpt_dir = str(tmp_path / "ck")
        save_checkpoint(ckpt_dir, state, CFG, epoch=0, dataset_mean=-4.6,
                        dataset_std=1.86,
                        extra={"std_calibration": 1.5})
        ckpt = os.path.join(ckpt_dir, "ckpt_step_0")

        models = load_models(ckpt)
        assert models.std_calibration == pytest.approx(1.5)
        base = load_models(ckpt)
        base.std_calibration = None

        a = sample_from_npz(clip_npz, ckpt, str(tmp_path / "a"), steps=6,
                            seed=3, save_png=False, models=models)
        b = sample_from_npz(clip_npz, ckpt, str(tmp_path / "b"), steps=6,
                            seed=3, save_png=False, models=base)
        mel_c = np.load(a)["mel"].astype(np.float64)
        mel_u = np.load(b)["mel"].astype(np.float64)
        zc = (mel_c + 4.6) / 1.86
        zu = (mel_u + 4.6) / 1.86
        assert zc.mean() == pytest.approx(zu.mean(), abs=1e-5)
        assert zc.std() / zu.std() == pytest.approx(1.5, rel=1e-4)

    def test_batched_generation_calibrates_per_clip(self, orbax_ckpt,
                                                    tmp_path):
        from lm2a_tpu.inference.sample import _apply_std_calibration

        models = load_models(orbax_ckpt)
        models.std_calibration = 2.0
        rng = np.random.default_rng(0)
        z = rng.normal(size=(3, 48, 80)).astype(np.float32)
        out = _apply_std_calibration(z, models)
        for i in range(3):
            np.testing.assert_allclose(out[i].mean(), z[i].mean(),
                                       rtol=0, atol=1e-5)
            np.testing.assert_allclose(out[i].std() / z[i].std(), 2.0,
                                       rtol=1e-5)
