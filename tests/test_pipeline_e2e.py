"""Full-pipeline integration test on synthetic data:

raw song tree -> preprocess (npz shards) -> split -> train (few steps) ->
sample (CFG) -> vocode (random-init BigVGAN, smoke) -> wav-domain evaluate.

This is the hermetic end-to-end slice: every layer of the framework in one
test, tiny configs, virtual CPU devices.
"""

import json
import os

import numpy as np
import pytest

from lm2a_tpu.core.config import (
    DataConfig,
    DiffusionConfig,
    LM2AConfig,
    ModelConfig,
    TrainConfig,
)
from lm2a_tpu.core.mesh import make_mesh
from lm2a_tpu.utils.audio import write_wav

pytestmark = pytest.mark.slow  # full preprocess->train->sample pipeline (~5 min)

SR = 22050


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw")
    rng = np.random.default_rng(0)
    for song in ("songA", "songB"):
        d = root / "2024" / song
        d.mkdir(parents=True)
        wav = (0.1 * rng.standard_normal(14 * SR)).astype(np.float32)
        write_wav(str(d / "audio.wav"), wav, SR)
        (d / "sliced.json").write_text(json.dumps({"0:00": "hello", "0:06": "world"}))
        smpl = {
            str(i).zfill(6): {
                "annots": [{
                    "poses": [list(rng.standard_normal(72).astype(float))],
                    "Th": [[0, 0, 0]], "Rh": [[0, 0, 0]],
                }]
            }
            for i in range(360)
        }
        (d / "smplfull.json").write_text(json.dumps(smpl))
    return str(root)


def test_full_pipeline(raw_tree, tmp_path):
    from lm2a_tpu.data.preprocess import make_dataset

    npz_dir = str(tmp_path / "npz")
    n = make_dataset(raw_tree, npz_dir, lyrics_backend="hashed")
    assert n == 4

    # --- split (move aux files must be excluded automatically) ---
    from lm2a_tpu.data.split import split_dataset

    split_dir = str(tmp_path / "split")
    split_dataset(npz_dir, split_dir, counts=(3, 1, 0), seed=42)
    train_dir = os.path.join(split_dir, "train")
    val_dir = os.path.join(split_dir, "val")

    # --- pack the train split ---
    from lm2a_tpu.data.dataset import pack_dataset

    pack_dir = str(tmp_path / "pack")
    pack_dataset(train_dir, pack_dir)

    # --- train a tiny model for a few steps ---
    from lm2a_tpu.training import train

    cfg = LM2AConfig(
        model=ModelConfig(base_dim=16, dim_mults=(1, 2), cond_dim=8,
                          time_emb_dim=16, num_res_blocks=1, mid_blocks=1,
                          attn_heads=2),
        diffusion=DiffusionConfig(timesteps=8),
        train=TrainConfig(batch_size=1, epochs=2, lr=1e-3, log_interval=1,
                          save_interval=0, seed=0),
        data=DataConfig(),
    )
    mesh = make_mesh(devices=make_mesh().devices.ravel()[:1])
    save_dir = str(tmp_path / "run")
    res = train(cfg, pack_dir, save_dir, val_npz_dir=val_dir, mesh=mesh,
                use_tensorboard=False)
    assert res.final_step == 6  # 2 epochs x 3 steps
    ckpt = os.path.join(save_dir, "ckpt_step_6")
    assert os.path.isdir(ckpt)

    # --- sample with CFG from a val clip ---
    from lm2a_tpu.inference import sample_from_npz

    # sorted for determinism (listdir order is fs-dependent); moderate
    # guidance — an untrained model under strong CFG can legitimately
    # produce non-finite values, which the sampler guards against
    val_npz = sorted(f for f in os.listdir(val_dir) if f.endswith(".npz"))[0]
    gen_dir = str(tmp_path / "gen")
    out_npz = sample_from_npz(os.path.join(val_dir, val_npz), ckpt, gen_dir,
                              steps=8, guidance_weight=1.5, save_png=False)
    gen = np.load(out_npz)
    assert gen["mel"].shape == (80, 516)
    assert np.isfinite(gen["mel"]).all()

    # --- vocode (random init smoke config) ---
    from lm2a_tpu.vocoder import Vocoder, VocoderConfig, npz_to_wav

    tiny_voc = VocoderConfig(
        upsample_rates=(4, 4, 4, 4), upsample_kernel_sizes=(8, 8, 8, 8),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    voc = Vocoder(weights_path=None, cfg=tiny_voc)
    wav_path, sr = npz_to_wav(out_npz, str(tmp_path / "gen.wav"), voc)
    assert os.path.exists(wav_path) and sr == SR

    # --- wav-domain evaluation over gt/gen pairs ---
    from lm2a_tpu.eval import evaluate_all
    from lm2a_tpu.utils.audio import read_wav

    eval_root = tmp_path / "evaluation" / "sample_0"
    eval_root.mkdir(parents=True)
    gt_wav, _ = read_wav(wav_path)
    write_wav(str(eval_root / "gt.wav"), gt_wav, SR)
    write_wav(str(eval_root / "gen.wav"), gt_wav, SR)
    results = evaluate_all(str(tmp_path / "evaluation"),
                           str(tmp_path / "results"), use_clap=False)
    assert results["metadata"]["total_samples"] == 1
    assert results["metadata"]["acoustic_similarity_mean"] == pytest.approx(1.0)
