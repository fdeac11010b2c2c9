#!/usr/bin/env python3
"""Assemble the wav-domain evaluation tree from mel-assessment outputs.

The reference produces ``eval_root/sample_*/{gt.wav, gen.wav}`` pairs
out-of-band with ``sometest/newwav.py`` before running ``evaluate_all.py``
(SURVEY §3.4). This script closes that gap in one step: for every
``<base>_gen_mel.npz`` that ``lm2a_tpu.cli val`` wrote into the assessment
directory, it vocodes BOTH the generated mel and the ground-truth mel (from
the original ``<base>.npz`` in the test split) into
``<out>/sample_<i>/{gen.wav, gt.wav}`` — ready for
``python -m lm2a_tpu.cli evaluate --eval-dir <out>``.

Usage::

    python scripts/build_eval_tree.py <npz_dir> <assess_dir> <out_root> \
        [--weights bigvgan.pt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("npz_dir", help="test split with the ground-truth npz files")
    p.add_argument("assess_dir", help="output dir of `cli val` (has *_gen_mel.npz)")
    p.add_argument("out_root", help="eval tree root to create")
    p.add_argument("--weights", default=None,
                   help="converted NVIDIA BigVGAN torch checkpoint")
    args = p.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lm2a_tpu.data.schema import normalize_mel_layout
    from lm2a_tpu.utils.audio import write_wav
    from lm2a_tpu.vocoder import Vocoder

    gen_files = sorted(f for f in os.listdir(args.assess_dir)
                       if f.endswith("_gen_mel.npz"))
    if not gen_files:
        raise SystemExit(f"no *_gen_mel.npz under {args.assess_dir}")

    voc = Vocoder(weights_path=args.weights)
    n = 0
    for i, name in enumerate(gen_files):
        base = name[: -len("_gen_mel.npz")]
        gt_npz = os.path.join(args.npz_dir, base + ".npz")
        if not os.path.exists(gt_npz):
            print(f"skip {base}: no ground-truth npz in {args.npz_dir}")
            continue
        d = os.path.join(args.out_root, f"sample_{i:04d}")
        os.makedirs(d, exist_ok=True)
        for src, dst in ((os.path.join(args.assess_dir, name), "gen.wav"),
                         (gt_npz, "gt.wav")):
            z = np.load(src, allow_pickle=True)
            mel = normalize_mel_layout(z["mel"])
            sr = int(z.get("sr", voc.cfg.sample_rate))
            write_wav(os.path.join(d, dst), voc.mel_to_wav(mel)[0], sr)
        with open(os.path.join(d, "source.txt"), "w") as f:
            f.write(base + "\n")
        n += 1
        print(f"sample_{i:04d} <- {base}", flush=True)
    print(f"built {n} gt/gen pairs under {args.out_root}")


if __name__ == "__main__":
    main()
