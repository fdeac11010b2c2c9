#!/usr/bin/env python3
"""Fit a distilled student's variance calibration on VAL clips.

Round-5 VERDICT #3: deterministic few-step chains (DDIM eta=0 and the
distilled students built on its grid) are systematically over-smooth —
their z-space output std runs ~0.5-0.8 sigma below the real clips', while
stochastic DDPM-1000 lands within 0.06. The gate metrics (mse/ssim/snr)
don't see it; std_error does.

This fits ONE scalar on validation clips (never the test protocol's):

    r = mean over clips of  std(real_mel_z) / std(gen_mel_z)

and writes it into the checkpoint's metadata as ``std_calibration``.
Serving then rescales each generated clip about its own mean in z-space
(``inference/sample._apply_std_calibration``) — the clip mean (and thus
mean_error) is untouched by construction, and frame-level structure is
preserved up to a global contrast change.

Usage::

    python scripts/calibrate_student_std.py <student_ckpt_dir> <val_npz_dir>
        [n_clips=12] [--dry]   (--dry: print r, do not write metadata)
"""

import json
import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.data.schema import load_sample, normalize_mel_layout  # noqa: E402
from lm2a_tpu.inference.sample import generate_mel, load_models  # noqa: E402
from lm2a_tpu.training.checkpoint import load_metadata  # noqa: E402


def main(ckpt_dir: str, val_dir: str, n_clips: int = 12,
         dry: bool = False) -> None:
    models = load_models(ckpt_dir)
    if models.std_calibration:
        print(f"note: checkpoint already carries std_calibration="
              f"{models.std_calibration}; refitting (applied OFF during "
              "the fit)", file=sys.stderr)
        models.std_calibration = None

    files = sorted(f for f in os.listdir(val_dir)
                   if f.endswith(".npz") and f != "motion_stats.npz")
    # seed 7: a different stream from every eval protocol (val 100/42,
    # fewstep 42) — calibration must not share clips with the test gates
    random.Random(7).shuffle(files)
    files = files[:n_clips]

    ratios = []
    for i, name in enumerate(files):
        s = load_sample(os.path.join(val_dir, name))
        real = normalize_mel_layout(s.mel)
        gen, *_ = generate_mel(
            models, s.motion, s.lyrics, real.shape[1], seed=5000 + i,
        )
        real_z = (real - models.dataset_mean) / models.dataset_std
        gen_z = (gen[0] - models.dataset_mean) / models.dataset_std
        r = float(real_z.std() / (gen_z.std() + 1e-8))
        ratios.append(r)
        print(f"  [{i + 1}/{len(files)}] {name}: std(real_z)="
              f"{real_z.std():.4f} std(gen_z)={gen_z.std():.4f} r={r:.4f}",
              file=sys.stderr, flush=True)

    r_fit = float(np.mean(ratios))
    out = {"ckpt": ckpt_dir, "n_clips": len(files),
           "std_calibration": round(r_fit, 6),
           "ratio_std": round(float(np.std(ratios)), 6)}
    if not dry:
        meta_path = ckpt_dir.rstrip("/") + ".meta.json"
        meta = load_metadata(ckpt_dir)
        meta["std_calibration"] = r_fit
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=2)
        out["written"] = meta_path
    print(json.dumps(out))


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--dry"]
    if len(args) < 2:
        sys.exit(__doc__)
    main(args[0], args[1], int(args[2]) if len(args) > 2 else 12,
         dry="--dry" in sys.argv)
