"""End-to-end training-loop smoke test on synthetic shards + real resume."""

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
from lm2a_tpu.data import Sample, save_sample
from lm2a_tpu.training import train

pytestmark = pytest.mark.slow  # full training loops with resume (~13 min)

CFG = LM2AConfig(
    model=ModelConfig(
        base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
        num_res_blocks=1, mid_blocks=1, attn_heads=2,
        motion_dim=10, text_dim=20,
    ),
    diffusion=DiffusionConfig(timesteps=10),
    train=TrainConfig(
        batch_size=4, epochs=2, lr=1e-3, log_interval=2,
        save_interval=0, val_cap_batches=2, seed=0,
    ),
    data=DataConfig(),
)


@pytest.fixture
def npz_dirs(tmp_path):
    rng = np.random.default_rng(0)
    for name, n in (("train", 8), ("val", 4)):
        d = tmp_path / name
        d.mkdir()
        for i in range(n):
            save_sample(
                str(d / f"sample_{i:08d}.npz"),
                Sample(
                    mel=rng.normal(size=(80, 24)).astype(np.float32),
                    motion=rng.normal(size=(8, 10)).astype(np.float32),
                    lyrics=rng.normal(size=(8, 20)).astype(np.float32),
                ),
            )
    return str(tmp_path / "train"), str(tmp_path / "val")


def test_train_loop_and_resume(npz_dirs, tmp_path):
    train_dir, val_dir = npz_dirs
    save_dir = str(tmp_path / "run")
    mesh = make_mesh()  # 8 virtual devices; batch 4 won't shard evenly -> use 4
    mesh = make_mesh(devices=mesh.devices.ravel()[:4])

    res = train(
        CFG, train_dir, save_dir, val_npz_dir=val_dir,
        mesh=mesh, use_tensorboard=False,
    )
    assert res.final_step == 4  # 2 epochs x (8 samples / bs 4)
    assert np.isfinite(res.final_loss)
    assert os.path.exists(os.path.join(save_dir, "train_log.csv"))
    rows = open(os.path.join(save_dir, "train_log.csv")).read().splitlines()
    assert rows[0].startswith("epoch,step,train_loss")
    assert len(rows) > 2

    # resume continues from the saved step instead of restarting at 0
    cfg2 = LM2AConfig(
        model=CFG.model, diffusion=CFG.diffusion, data=CFG.data,
        train=TrainConfig(
            batch_size=4, epochs=3, lr=1e-3, log_interval=2,
            save_interval=0, val_cap_batches=2, seed=0,
        ),
    )
    res2 = train(
        cfg2, train_dir, save_dir, val_npz_dir=val_dir,
        mesh=mesh, resume=True, use_tensorboard=False,
    )
    assert res2.final_step == 6  # resumed at epoch 2, ran 1 more epoch


def test_quality_telemetry(npz_dirs, tmp_path):
    """quality_every_epochs generates fixed val clips from EMA weights and
    writes a quality_log.csv with the mel metric columns."""
    import csv
    import dataclasses

    train_dir, val_dir = npz_dirs
    save_dir = str(tmp_path / "runq")
    cfg = dataclasses.replace(
        CFG,
        train=dataclasses.replace(
            CFG.train, epochs=1, quality_every_epochs=1, quality_clips=2,
            quality_steps=4, quality_guidance=2.1,
        ),
    )
    mesh = make_mesh(devices=make_mesh().devices.ravel()[:4])
    train(cfg, train_dir, save_dir, val_npz_dir=val_dir, mesh=mesh,
          dataset_mean=0.0, dataset_std=1.0, use_tensorboard=False)
    path = os.path.join(save_dir, "quality_log.csv")
    assert os.path.exists(path)
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 1
    for k in ("mse", "ssim", "avg_cos_sim", "snr"):
        assert k in rows[0] and np.isfinite(float(rows[0][k])), rows[0]
