"""CLI smoke tests: dispatcher, parsers, and light end-to-end commands."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from lm2a_tpu.data import Sample, save_sample

ENV = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="/root/repo")


def run_cli(*args, check=True):
    proc = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys; sys.argv=['lm2a']+sys.argv[1:];"
         "from lm2a_tpu.cli.__main__ import main; main()",
         *args],
        capture_output=True, text=True, env=ENV, cwd="/root/repo",
    )
    if check and proc.returncode != 0:
        raise AssertionError(f"CLI failed: {proc.stderr}\n{proc.stdout}")
    return proc


class TestParsers:
    """Parsers accept the reference's flag vocabulary."""

    def test_train_flags(self):
        from lm2a_tpu.cli.train import build_parser, config_from_args

        args = build_parser().parse_args(
            ["--npz_dir", "x", "--batch_size", "8", "--dim_mults", "1,2",
             "--lr_decay_steps", "100,200", "--lr_decay_factors", "0.5,0.1",
             "--amp"]
        )
        cfg = config_from_args(args)
        assert cfg.model.dim_mults == (1, 2)
        assert cfg.train.lr_decay_steps == (100, 200)
        assert cfg.train.batch_size == 8

    def test_sample_flags(self):
        from lm2a_tpu.cli.sample import build_parser

        a = build_parser().parse_args(
            ["--ckpt", "c", "--out_dir", "o", "--guidance", "2.1", "--steps", "50"]
        )
        assert a.guidance == 2.1 and a.steps == 50

    def test_split_flags(self):
        from lm2a_tpu.cli.split import build_parser

        a = build_parser().parse_args(["--npz_dir", "a", "--out_dir", "b"])
        assert a.train_ratio == 0.7 and a.seed == 42


class TestCommands:
    def test_help_lists_commands(self):
        proc = run_cli("--help", check=False)
        assert "preprocess" in proc.stdout and "towav" in proc.stdout

    def test_inspect_npz(self, tmp_path):
        p = str(tmp_path / "s.npz")
        rng = np.random.default_rng(0)
        save_sample(p, Sample(
            mel=rng.normal(size=(80, 516)).astype(np.float32),
            motion=rng.normal(size=(180, 234)).astype(np.float32),
            lyrics=rng.normal(size=(180, 768)).astype(np.float32),
        ))
        proc = run_cli("inspect-npz", p)
        assert "mel: shape=(80, 516)" in proc.stdout
        assert "mel fps: 86.13" in proc.stdout

    def test_split_command(self, tmp_path):
        src = tmp_path / "npz"
        src.mkdir()
        rng = np.random.default_rng(0)
        for i in range(10):
            save_sample(str(src / f"sample_{i:08d}.npz"), Sample(
                mel=rng.normal(size=(80, 8)).astype(np.float32),
                motion=rng.normal(size=(4, 234)).astype(np.float32),
                lyrics=rng.normal(size=(4, 768)).astype(np.float32),
            ))
        out = tmp_path / "split"
        proc = run_cli("split", "--npz_dir", str(src), "--out_dir", str(out))
        assert "Total files: 10" in proc.stdout
        assert len(os.listdir(out / "train")) == 7

    def test_inspect_train_log(self, tmp_path):
        csv_path = tmp_path / "train_log.csv"
        csv_path.write_text(
            "epoch,step,train_loss,val_loss,time_seconds\n"
            "0,0,1.0,,\n0,10,0.8,,\n0,12,0.7,0.75,3.2\n"
        )
        proc = run_cli("inspect-train-log", str(csv_path))
        assert "3 rows" in proc.stdout
        assert "train loss" in proc.stdout

    def test_graph_command(self, tmp_path):
        results = {
            "metadata": {},
            "batch_metrics": {},
            "per_sample_metrics": {
                f"sample_{i}": {
                    "beat_f1": 0.5 + 0.05 * i,
                    "cosine_similarity": None,
                    "acoustic_similarity": 0.9,
                }
                for i in range(5)
            },
        }
        rp = tmp_path / "evaluation_results.json"
        rp.write_text(json.dumps(results))
        proc = run_cli("graph", str(rp), "--out_dir", str(tmp_path))
        assert (tmp_path / "beat_f1_hist.png").exists()
        assert "skip cosine_similarity" in proc.stdout
