#!/usr/bin/env python3
"""One baseline row of the few-step quality table: undistilled DDIM-N (CFG
doubled batch) on the same clips/protocol as scripts/eval_distilled.py —
the comparison the distilled student must beat (VERDICT r2 #3 gate).

Usage: ddim_baseline_row.py <ckpt_dir> <npz_dir> [n_clips] [ddim_steps]
       [guidance] [method]
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.data.schema import load_sample, normalize_mel_layout  # noqa: E402
from lm2a_tpu.eval.mel_metrics import compute_metrics  # noqa: E402
from lm2a_tpu.inference.sample import generate_mel, load_models  # noqa: E402


def main():
    ckpt, npz_dir = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    steps = int(sys.argv[4]) if len(sys.argv) > 4 else 100
    guidance = float(sys.argv[5]) if len(sys.argv) > 5 else 2.1
    method = sys.argv[6] if len(sys.argv) > 6 else "ddim"

    models = load_models(ckpt)
    files = sorted(f for f in os.listdir(npz_dir)
                   if f.endswith(".npz") and f != "motion_stats.npz")
    # the eval_distilled clip-pick convention: same shuffle, same clips
    random.Random(42).shuffle(files)
    picks = files[:n]
    rows = []
    for i, f in enumerate(picks):
        s = load_sample(os.path.join(npz_dir, f))
        real = normalize_mel_layout(s.mel)
        gen, *_ = generate_mel(
            models, s.motion, s.lyrics, real.shape[1],
            steps=models.timesteps, guidance_weight=guidance,
            method=method, ddim_steps=steps if method == "ddim" else None,
            seed=1000 + i,  # eval_distilled's noise-seed convention
        )
        m = compute_metrics(real, gen[0])
        m = {k: round(float(v), 4) for k, v in m.items()}
        rows.append(m)
        print(f"  [{i + 1}/{n}] {f}: {m}", flush=True)
    avg = {k: round(float(np.mean([r[k] for r in rows])), 4) for k in rows[0]}
    print(json.dumps({
        "method": f"{method}-{steps}", "guidance": guidance,
        "n_clips": n, "results": avg,
    }))


if __name__ == "__main__":
    main()
