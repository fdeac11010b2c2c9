"""Multi-host execution layer: single-process degenerate helpers, and a
REAL two-process CPU run (jax.distributed + Gloo collectives) of the train
CLI checked against a single-process run of identical global shape.

The reference has no distributed training at all
(``/root/reference/train.py:54``); this validates the DCN data-axis design
in docs/SCALING.md end-to-end.
"""

import csv
import os
import socket
import subprocess
import sys
import textwrap

import jax
import numpy as np
import pytest

from lm2a_tpu.core.distributed import (
    local_batch_slice,
    make_hybrid_mesh,
    put_global_batch,
)
from lm2a_tpu.core.mesh import make_mesh

pytestmark = pytest.mark.slow  # two-process training run (~7 min)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestSingleProcessDegenerate:
    def test_local_batch_slice_is_full_range(self):
        mesh = make_mesh()
        assert local_batch_slice(mesh, 16) == slice(0, 16)

    def test_local_batch_slice_model_axis_repeats_rows(self):
        mesh = make_mesh(data=4, model=2)
        assert local_batch_slice(mesh, 8) == slice(0, 8)

    def test_put_global_batch_matches_device_put(self):
        mesh = make_mesh()
        batch = {"mel": np.random.default_rng(0).normal(size=(8, 4, 3))
                 .astype(np.float32)}
        out = put_global_batch(mesh, batch)
        np.testing.assert_array_equal(np.asarray(out["mel"]), batch["mel"])
        assert out["mel"].sharding.spec == jax.sharding.PartitionSpec("data")

    def test_hybrid_mesh_single_process_is_make_mesh(self):
        m = make_hybrid_mesh(model=2)
        assert m.axis_names == ("data", "model")
        assert m.devices.shape == (len(jax.devices()) // 2, 2)


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


_DRIVER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, {repo!r})
    from lm2a_tpu.cli.train import main
    main(sys.argv[1:])
    """
)


def _run_train(tmp, tag, extra_args, n_devices, env_extra=None):
    """Launch one training process; returns the Popen handle."""
    driver = os.path.join(tmp, "driver.py")
    if not os.path.exists(driver):
        with open(driver, "w") as f:
            f.write(_DRIVER.format(repo=REPO))
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env.pop("JAX_PLATFORMS", None)
    env.update(env_extra or {})
    log = open(os.path.join(tmp, f"{tag}.log"), "w")
    return subprocess.Popen(
        [sys.executable, driver] + extra_args,
        env=env, stdout=log, stderr=subprocess.STDOUT, cwd=tmp,
    )


def _losses(save_dir):
    rows = []
    with open(os.path.join(save_dir, "train_log.csv")) as f:
        for row in csv.DictReader(f):
            if row["train_loss"]:
                rows.append(float(row["train_loss"]))
    return rows


class TestTwoProcessTraining:
    def test_two_process_matches_single_process(self, tmp_path):
        tmp = str(tmp_path)
        npz = os.path.join(tmp, "npz")
        os.makedirs(npz)
        from lm2a_tpu.data import Sample, save_sample

        rng = np.random.default_rng(0)
        for i in range(8):
            save_sample(os.path.join(npz, f"sample_{i:08d}.npz"), Sample(
                mel=rng.normal(size=(80, 64)).astype(np.float32),
                motion=rng.normal(size=(20, 234)).astype(np.float32),
                lyrics=rng.normal(size=(20, 768)).astype(np.float32)))

        common = [
            "--npz_dir", npz, "--batch_size", "4", "--epochs", "2",
            "--base_dim", "16", "--dim_mults", "1,2", "--timesteps", "20",
            "--cond_dim", "16", "--time_emb_dim", "16",
            "--num_res_blocks", "1", "--mid_blocks", "1",
            "--attn_heads", "2", "--log_interval", "1", "--seed", "3",
            "--save_interval", "0", "--no_tensorboard",
            "--dataset_mean", "0.0", "--dataset_std", "1.0",
        ]

        # baseline: one process, 4 virtual devices, pure dp4
        base_dir = os.path.join(tmp, "base")
        p = _run_train(tmp, "base", common + ["--save_dir", base_dir], 4)
        assert p.wait(timeout=900) == 0, open(
            os.path.join(tmp, "base.log")).read()[-2000:]

        # two processes x 2 virtual devices: same global mesh size
        port = _free_port()
        mh_dir = os.path.join(tmp, "mh")
        dist = ["--coordinator", f"127.0.0.1:{port}",
                "--num_processes", "2", "--save_dir", mh_dir]
        p0 = _run_train(tmp, "mh0", common + dist + ["--process_id", "0"], 2)
        p1 = _run_train(tmp, "mh1", common + dist + ["--process_id", "1"], 2)
        rc0, rc1 = p0.wait(timeout=900), p1.wait(timeout=900)
        assert rc0 == 0, open(os.path.join(tmp, "mh0.log")).read()[-2000:]
        assert rc1 == 0, open(os.path.join(tmp, "mh1.log")).read()[-2000:]

        base_losses = _losses(base_dir)
        mh_losses = _losses(mh_dir)
        assert len(base_losses) == len(mh_losses) > 0
        # same global batches, same replicated init, same key stream; only
        # collective reduction order may differ
        np.testing.assert_allclose(mh_losses, base_losses, rtol=2e-4)
        # only the primary writes checkpoints/logs
        assert os.path.exists(os.path.join(mh_dir, "train_log.csv"))
