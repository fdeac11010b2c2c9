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


@pytest.fixture(scope="module")
def raw_tree12(tmp_path_factory):
    """12 clips (4 songs x 3 slices) so an 8-way-sharded batch exists."""
    root = tmp_path_factory.mktemp("raw12")
    rng = np.random.default_rng(7)
    for song in ("sA", "sB", "sC", "sD"):
        d = root / "2024" / song
        d.mkdir(parents=True)
        wav = (0.1 * rng.standard_normal(20 * SR)).astype(np.float32)
        write_wav(str(d / "audio.wav"), wav, SR)
        (d / "sliced.json").write_text(json.dumps(
            {"0:00": "alpha", "0:06": "beta", "0:12": "gamma"}))
        smpl = {
            str(i).zfill(6): {
                "annots": [{
                    "poses": [list(rng.standard_normal(72).astype(float))],
                    "Th": [[0, 0, 0]], "Rh": [[0, 0, 0]],
                }]
            }
            for i in range(600)
        }
        (d / "smplfull.json").write_text(json.dumps(smpl))
    return str(root)


def test_cli_surface_pipeline(raw_tree12, tmp_path, monkeypatch, capsys):
    """The WHOLE 13-command CLI surface chained as one flow, each stage
    consuming the previous stage's artifacts (round-3 VERDICT #8):

    preprocess -> inspect-npz -> split -> pack -> train ->
    inspect-train-log -> distill -> sample -> val -> serve (batched) ->
    towav -> evaluate -> graph
    """
    import io
    import sys

    from lm2a_tpu import cli as climod

    def run(cmd, args):
        mod = __import__(f"lm2a_tpu.cli.{cmd}", fromlist=["main"])
        return mod.main(args)

    tiny_model = ["--base_dim", "16", "--dim_mults", "1,2", "--cond_dim", "8",
                  "--time_emb_dim", "16", "--num_res_blocks", "1",
                  "--mid_blocks", "1", "--attn_heads", "2"]

    # 1. preprocess
    npz_dir = str(tmp_path / "npz")
    run("preprocess", ["--root", raw_tree12, "--out", npz_dir,
                       "--lyrics_backend", "hashed"])
    shards = sorted(f for f in os.listdir(npz_dir)
                    if f.startswith("sample_") and f.endswith(".npz"))
    assert len(shards) == 12

    # 2. inspect-npz (shape-oracle assertions live inside)
    run("inspect_npz", [os.path.join(npz_dir, shards[0])])

    # 3. split
    split_dir = str(tmp_path / "split")
    run("split", ["--npz_dir", npz_dir, "--out_dir", split_dir,
                  "--train_count", "8", "--val_count", "4",
                  "--test_count", "0", "--seed", "42"])
    train_dir = os.path.join(split_dir, "train")
    val_dir = os.path.join(split_dir, "val")

    # 4. pack
    pack_dir = str(tmp_path / "pack")
    run("pack", ["--npz_dir", train_dir, "--out_dir", pack_dir])

    # 5. train (2 steps)
    save_dir = str(tmp_path / "run")
    run("train", ["--npz_dir", pack_dir, "--val_npz_dir", val_dir,
                  "--save_dir", save_dir, "--batch_size", "8", "--epochs",
                  "2", "--max_steps", "2", "--timesteps", "8",
                  "--log_interval", "1", "--no_tensorboard", "--seed", "1"]
        + tiny_model)
    ckpt = os.path.join(save_dir, "ckpt_step_2")
    assert os.path.isdir(ckpt)

    # 6. inspect-train-log
    run("inspect_train_log", [os.path.join(save_dir, "train_log.csv"),
                              "--plot", str(tmp_path / "loss.png")])
    assert (tmp_path / "loss.png").exists()

    # 7. distill one stage 8 -> 4 (tiny budget)
    distill_dir = str(tmp_path / "distilled")
    run("distill", ["--teacher", ckpt, "--npz_dir", pack_dir,
                    "--save_dir", distill_dir, "--student_steps", "4",
                    "--start_steps", "8", "--steps_per_stage", "2",
                    "--batch_size", "8", "--guidance", "1.5", "--seed", "2"])
    student = [d for d in os.listdir(distill_dir) if "4" in d or "student" in d]
    assert student, f"no student checkpoint in {os.listdir(distill_dir)}"

    # 8. sample from the val clip
    val_npz = sorted(f for f in os.listdir(val_dir) if f.endswith(".npz"))[0]
    gen_dir = str(tmp_path / "gen")
    run("sample", ["--npz", os.path.join(val_dir, val_npz), "--ckpt", ckpt,
                   "--out_dir", gen_dir, "--steps", "8", "--guidance", "1.5",
                   "--no_png"])
    gen_npz = os.path.join(gen_dir, val_npz.replace(".npz", "_gen.npz"))
    assert np.isfinite(np.load(gen_npz)["mel"]).all()

    # 9. val (mel-domain assessment, 1 clip)
    assess_dir = str(tmp_path / "assess")
    run("val", ["--ckpt", ckpt, "--npz_dir", val_dir, "--out_dir", assess_dir,
                "--max_samples", "1", "--steps", "8", "--guidance", "1.5"])
    assert any("average" in f for f in os.listdir(assess_dir))

    # 10. serve: one batched request over the train clips (JSON-line stdio)
    train_npzs = [os.path.join(train_dir, f)
                  for f in sorted(os.listdir(train_dir)) if f.endswith(".npz")]
    req = json.dumps({"npz": train_npzs[:2], "id": "e2e", "steps": 8,
                      "out_dir": str(tmp_path / "served")})
    monkeypatch.setattr(sys, "stdin", io.StringIO(req + "\n"))
    capsys.readouterr()  # drop accumulated stage output
    run("serve", ["--ckpt", ckpt, "--out_dir", str(tmp_path / "served")])
    resp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resp["ok"] and len(resp["out"]) == 2

    # 11. towav on the generated mel (CI-scale generator geometry)
    wav_path = str(tmp_path / "gen.wav")
    run("towav", ["--npz", gen_npz, "--out", wav_path,
                  "--preset", "smoke_tiny"])
    assert os.path.exists(wav_path)

    # 12. evaluate over a gt/gen pair built from the vocoded wav
    from lm2a_tpu.utils.audio import read_wav

    eval_root = tmp_path / "evaluation" / "sample_0"
    eval_root.mkdir(parents=True)
    y, _ = read_wav(wav_path)
    write_wav(str(eval_root / "gt.wav"), y, SR)
    write_wav(str(eval_root / "gen.wav"), y, SR)
    run("evaluate", ["--eval-dir", str(tmp_path / "evaluation"),
                     "--output-dir", str(tmp_path / "results"), "--no-clap"])
    results_json = tmp_path / "results" / "evaluation_results.json"
    assert results_json.exists()

    # 13. graph the results
    run("graph", [str(results_json), "--out_dir", str(tmp_path / "pngs")])
    assert any(f.endswith(".png") for f in os.listdir(tmp_path / "pngs"))

    assert climod is not None  # the dispatcher module imports cleanly
