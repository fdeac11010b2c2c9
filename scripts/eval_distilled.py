#!/usr/bin/env python3
"""Quality of a distilled few-step student vs its teacher's recorded table.

Samples N validation clips with the student's own protocol — DDIM at its
``distilled_steps``, guidance 1.0 (the teacher's CFG weight is folded in, so
a single forward per step) — and prints the same mel-metric row as
``scripts/fewstep_quality.py`` for side-by-side comparison with the
teacher's DDPM-1000 / DDIM-50 rows.

Usage::

    python scripts/eval_distilled.py <student_ckpt_dir> <npz_dir> [n_clips]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.data.schema import load_sample  # noqa: E402
from lm2a_tpu.eval.mel_metrics import compute_metrics  # noqa: E402
from lm2a_tpu.inference.sample import generate_mel, load_models  # noqa: E402
from lm2a_tpu.training.checkpoint import load_metadata  # noqa: E402


def main(ckpt_dir: str, npz_dir: str, n_clips: int = 6) -> None:
    meta = load_metadata(ckpt_dir)
    steps = int(meta.get("distilled_steps", 50))
    folded = meta.get("folded_guidance")
    models = load_models(ckpt_dir)
    files = sorted(f for f in os.listdir(npz_dir)
                   if f.endswith(".npz") and f != "motion_stats.npz")
    import random

    random.Random(42).shuffle(files)
    files = files[:n_clips]
    print(f"student {ckpt_dir}: ddim-{steps}, folded guidance {folded}; "
          f"{len(files)} clips", file=sys.stderr)

    metrics = []
    for i, name in enumerate(files):
        s = load_sample(os.path.join(npz_dir, name))
        gen, *_ = generate_mel(
            models, s.motion, s.lyrics, s.mel.shape[1],
            guidance_weight=1.0, method="ddim", ddim_steps=steps,
            seed=1000 + i,
        )
        metrics.append(compute_metrics(s.mel, gen[0]))
        print(f"  [{i + 1}/{len(files)}] {name}: "
              f"{ {k: round(v, 4) for k, v in metrics[-1].items()} }",
              file=sys.stderr, flush=True)
    agg = {k: float(np.mean([m[k] for m in metrics])) for k in metrics[0]}
    print(json.dumps({"method": f"distilled-ddim-{steps}",
                      "folded_guidance": folded,
                      "n_clips": len(files), "results": agg}))


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    main(sys.argv[1], sys.argv[2],
         int(sys.argv[3]) if len(sys.argv) > 3 else 6)
