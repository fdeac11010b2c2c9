#!/usr/bin/env python3
"""Diagnose the steering metric: is the centroid readout or the model at
fault? Computes (a) real-vs-real centroid correlations across clips (the
chance floor), (b) MATCHED generation (motion_i + lyrics_i) centroid vs
real_i (the val-protocol setup that scores cos 0.96), (c) mel-domain cos
for the same pairs as a cross-check.

Usage: diag_steering_metric.py --ckpt <dir> --npz_dir <test split> [--n 6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from scripts.condition_swap_eval import corr, mel_centroid


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--npz_dir", required=True)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--guidance", type=float, default=2.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lm2a_tpu.data.schema import load_sample, normalize_mel_layout
    from lm2a_tpu.inference import generate_mel_batch, load_models

    models = load_models(args.ckpt)
    files = sorted(f for f in os.listdir(args.npz_dir)
                   if f.endswith(".npz") and f != "motion_stats.npz")
    rng = np.random.default_rng(args.seed)
    picks = rng.choice(len(files), size=args.n, replace=False)
    clips = [load_sample(os.path.join(args.npz_dir, files[i])) for i in picks]
    reals = [normalize_mel_layout(c.mel) for c in clips]
    cents = [mel_centroid(m) for m in reals]
    mel_t = reals[0].shape[1]
    n = args.n

    print("real-vs-real centroid corr matrix (off-diag = chance floor):")
    for i in range(n):
        print("  " + " ".join(f"{corr(cents[i], cents[j]):+0.2f}"
                              for j in range(n)))

    gen, _, _ = generate_mel_batch(
        models, [c.motion for c in clips], [c.lyrics for c in clips], mel_t,
        guidance_weight=args.guidance, seed=args.seed)

    def framecos(a, b):
        af = a / (np.linalg.norm(a, axis=0, keepdims=True) + 1e-9)
        bf = b / (np.linalg.norm(b, axis=0, keepdims=True) + 1e-9)
        return float((af * bf).sum(axis=0).mean())

    print("\nMATCHED generation (motion_i + lyrics_i):")
    print(f"{'i':>3} {'cent-corr(own)':>15} {'cent-corr(others m.)':>20} "
          f"{'framecos(own)':>14} {'framecos(other)':>16}")
    for i in range(n):
        c = mel_centroid(gen[i])
        own = corr(c, cents[i])
        others = np.mean([corr(c, cents[j]) for j in range(n) if j != i])
        fc_own = framecos(gen[i], reals[i])
        fc_other = np.mean([framecos(gen[i], reals[j])
                            for j in range(n) if j != i])
        print(f"{i:>3} {own:>15.3f} {others:>20.3f} {fc_own:>14.3f} "
              f"{fc_other:>16.3f}")


if __name__ == "__main__":
    main()
