"""60-second generation demo: windowed-crossfade vs single-pass longform.

Round-3 VERDICT #9 — longform as a MEASURED feature. On the trained
checkpoint, generates a 60 s clip two ways and reports:

  - device time + mel frames/s for each path (value-fetch timing, chained
    program = honest through the axon tunnel);
  - a stitching-seam metric for the windowed path: mean frame-to-frame mel
    L1 discontinuity AT window-boundary columns vs everywhere else (ratio
    ~1.0 = seams indistinguishable from ordinary motion; >> 1 = audible
    seams). The single-pass output has no seams by construction and its
    boundary-column ratio is the control.

Motion conditioning: a slow sinusoidal melody-line sweep in the first pose
dims (the synthetic-corpus convention), so the 60 s output has structure to
stitch. Usage:

  python scripts/demo_longform.py --ckpt runs/r3/train/ckpt_step_16200 \
      [--seconds 60] [--steps 100] [--method ddim] [--guidance 2.1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def synth_motion(seconds: float, fps: int = 30) -> np.ndarray:
    """Slow melody-line sweep encoded the way the synthetic corpus does."""
    t = np.arange(int(seconds * fps), dtype=np.float32) / fps
    line = 0.5 + 0.45 * np.sin(2 * np.pi * t / 12.0)
    m = np.zeros((len(t), 234), np.float32)
    m[:, :8] = line[:, None]
    return m


def seam_metric(mel: np.ndarray, boundaries: list[int]) -> tuple[float, float]:
    """(boundary-column discontinuity, everywhere-else discontinuity)."""
    d = np.abs(np.diff(mel, axis=1)).mean(axis=0)  # (T-1,) per-column L1
    bcols = [b - 1 for b in boundaries if 0 < b < mel.shape[1]]
    mask = np.zeros(d.shape[0], bool)
    for b in bcols:
        mask[max(0, b - 1): b + 2] = True
    return float(d[mask].mean()), float(d[~mask].mean())


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--seconds", type=float, default=60.0)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--method", default="ddim", choices=["ddpm", "ddim"])
    ap.add_argument("--guidance", type=float, default=2.1)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None, help="write the stitched mel npz")
    args = ap.parse_args()

    from lm2a_tpu.inference import generate_long, generate_single_pass, load_models

    models = load_models(args.ckpt)
    motion = synth_motion(args.seconds)
    lyrics = np.zeros((180, 768), np.float32)

    sr, hop, fps = 22050, 256, 30
    win_s, ov_s = 6.0, 1.0
    win_t = int(win_s * sr / hop)
    hop_t = int((win_s - ov_s) * sr / hop)
    total_t = int(args.seconds * sr / hop)
    n_win = max(1, int(np.ceil((args.seconds - win_s) / (win_s - ov_s))) + 1)
    boundaries = [hop_t * (w + 1) for w in range(n_win - 1)]

    kw = dict(steps=args.steps, guidance_weight=args.guidance,
              method=args.method, seed=args.seed)

    print(f"[windowed] {n_win} windows of {win_t} frames, hop {hop_t}",
          flush=True)
    t0 = time.perf_counter()
    mel_w = generate_long(models, motion, [lyrics] * n_win, args.seconds,
                          window_seconds=win_s, overlap_seconds=ov_s, **kw)
    chk = float(np.abs(mel_w).sum())  # host array already; fetch is done
    dt_w = time.perf_counter() - t0
    print(f"[windowed] {mel_w.shape} in {dt_w:.2f} s wall "
          f"({mel_w.shape[1] / dt_w:.0f} frames/s incl host stitch, "
          f"chk {chk:.1f})", flush=True)
    sb, sg = seam_metric(mel_w, boundaries)
    print(f"[windowed] seam discontinuity {sb:.4f} vs elsewhere {sg:.4f} "
          f"(ratio {sb / sg:.2f})", flush=True)

    print(f"[single-pass] T={total_t}", flush=True)
    t0 = time.perf_counter()
    mel_s = generate_single_pass(models, motion, lyrics, args.seconds, **kw)
    chk = float(np.abs(mel_s).sum())
    dt_s = time.perf_counter() - t0
    print(f"[single-pass] {mel_s.shape} in {dt_s:.2f} s wall "
          f"({mel_s.shape[1] / dt_s:.0f} frames/s, chk {chk:.1f})", flush=True)
    cb, cg = seam_metric(mel_s, boundaries)
    print(f"[single-pass] control: same columns {cb:.4f} vs elsewhere "
          f"{cg:.4f} (ratio {cb / cg:.2f})", flush=True)

    # does the output actually track the motion sweep?
    from scripts.condition_swap_eval import corr, mel_centroid

    t_frames = np.arange(mel_s.shape[1]) * hop / sr
    line = 0.5 + 0.45 * np.sin(2 * np.pi * t_frames / 12.0)
    print(f"[steering] centroid-vs-line corr: windowed "
          f"{corr(mel_centroid(mel_w), line):.3f}, single-pass "
          f"{corr(mel_centroid(mel_s), line):.3f}", flush=True)

    if args.out:
        np.savez_compressed(args.out, mel=mel_w.astype(np.float32), sr=sr,
                            hop_length=hop)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
