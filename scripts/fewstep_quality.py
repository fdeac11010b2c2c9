#!/usr/bin/env python3
"""Few-step serving quality gates: DDPM-1000 vs DDIM-{50,100} (VERDICT r1 #6).

For N validation clips, sample each method at guidance 2.1 from the same
checkpoint and compute the mel-domain metric table (MSE/SSIM/cos/SNR vs the
ground-truth mel — the reference ``val.py`` protocol) plus measured
wall-clock per clip. The reference hard-codes a 1000-step ancestral chain
(``/root/reference/sample.py:144``); DDIM at 50 steps costs 20x less — this
script documents what that buys and what it gives up ON THIS CHECKPOINT.

Usage::

    python scripts/fewstep_quality.py <ckpt_dir> <npz_dir> [n_clips]

Prints one markdown table + a JSON line (machine-readable).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.data.schema import load_sample  # noqa: E402
from lm2a_tpu.eval.mel_metrics import compute_metrics  # noqa: E402
from lm2a_tpu.inference.sample import generate_mel, load_models  # noqa: E402

GUIDANCE = 2.1
METHODS = [
    ("ddpm-1000", "ddpm", None),
    ("ddim-100", "ddim", 100),
    ("ddim-50", "ddim", 50),
]


def main(ckpt_dir: str, npz_dir: str, n_clips: int = 10) -> None:
    models = load_models(ckpt_dir)
    files = sorted(f for f in os.listdir(npz_dir)
                   if f.endswith(".npz") and f != "motion_stats.npz")
    import random

    random.Random(42).shuffle(files)
    files = files[:n_clips]
    print(f"checkpoint {ckpt_dir}; {len(files)} clips from {npz_dir}",
          file=sys.stderr)

    rows = {}
    for label, method, ddim_steps in METHODS:
        metrics, times = [], []
        for i, name in enumerate(files):
            s = load_sample(os.path.join(npz_dir, name))
            mel_t = s.mel.shape[1]
            t0 = time.perf_counter()
            gen, *_ = generate_mel(
                models, s.motion, s.lyrics, mel_t,
                guidance_weight=GUIDANCE, method=method,
                ddim_steps=ddim_steps, seed=1000 + i,
            )
            dt = time.perf_counter() - t0
            if i > 0:  # first call pays the compile
                times.append(dt)
            metrics.append(compute_metrics(s.mel, gen[0]))
        agg = {k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]}
        agg["sec_per_clip"] = float(np.median(times)) if times else None
        rows[label] = agg
        print(f"  {label}: {agg}", file=sys.stderr)

    keys = ["mse", "ssim", "avg_cos_sim", "snr", "sec_per_clip"]
    print("| method | " + " | ".join(keys) + " |")
    print("|---" * (len(keys) + 1) + "|")
    for label, agg in rows.items():
        cells = [f"{agg[k]:.4f}" if agg[k] is not None else "-" for k in keys]
        print(f"| {label} | " + " | ".join(cells) + " |")
    print(json.dumps({"guidance": GUIDANCE, "n_clips": len(files),
                      "results": rows}))


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 10)
