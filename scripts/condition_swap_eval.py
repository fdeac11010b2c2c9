#!/usr/bin/env python3
"""Conditioning-steering proof: does generation FOLLOW the motion condition?

Round-3 VERDICT #5: quality evidence so far showed reconstruction metrics,
but nothing demonstrated that the conditioning *steers* generation. This
script generates clips under swapped conditions and checks that the output
tracks the swapped-IN motion, discrimination-table style (the beat
tracker's aligned >> shifted protocol, reference anchor val.py:185-204).

Protocol (synthetic corpus, scripts/make_synth_corpus.py): each clip's
audio is a harmonic tone whose f0 follows a melody line that the SMPL
motion track also encodes — so the mel's spectral centroid is a readout of
the line the MOTION dictates. For clips i != j:

    gen_ij = sample(motion_i, lyrics_j)        # A's motion, B's lyrics
    score(i<-j) = corr(centroid(gen_ij), centroid(real_mel_i))   matched
    score(j<-j) = corr(centroid(gen_ij), centroid(real_mel_j))   swapped-out

If conditioning steers, matched correlation >> swapped-out correlation
(the output follows whose MOTION it got, not whose lyrics). An
unconditional or conditioning-ignoring model scores ~equal.

Usage: condition_swap_eval.py --ckpt <dir> --npz_dir <test split> [--n 6]
       [--steps 1000] [--guidance 2.1]
Writes a table to stdout; exit code 1 if the margin is not positive.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def mel_centroid(mel: np.ndarray) -> np.ndarray:
    """(80, T) log-mel -> (T,) spectral-centroid trajectory in bin units.

    Softmax-weighted centroid over mel bins; temperature sharpens the
    moving formant against the noise floor.
    """
    m = np.asarray(mel, np.float32)
    w = np.exp((m - m.max(axis=0, keepdims=True)) * 2.0)
    w = w / w.sum(axis=0, keepdims=True)
    bins = np.arange(m.shape[0], dtype=np.float32)[:, None]
    return (w * bins).sum(axis=0)


def corr(a: np.ndarray, b: np.ndarray) -> float:
    a = a - a.mean()
    b = b - b.mean()
    denom = np.sqrt((a * a).sum() * (b * b).sum()) + 1e-12
    return float((a * b).sum() / denom)


def framecos(gen: np.ndarray, real: np.ndarray) -> float:
    """Frame-wise cosine between two (80, T) log-mels (the val-protocol
    similarity; SURVEY val.py:81-87)."""
    g = gen / (np.linalg.norm(gen, axis=0, keepdims=True) + 1e-9)
    r = real / (np.linalg.norm(real, axis=0, keepdims=True) + 1e-9)
    return float((g * r).sum(axis=0).mean())


def centered_framecos(gen: np.ndarray, real: np.ndarray) -> float:
    """Frame-wise cosine after removing each mel's per-bin temporal mean.

    Raw log-mels share a large static structure (noise floor + harmonic
    stack shape): ANY two clips score ~0.93 raw frame-cosine and the
    centroid trajectory has a ~+0.7 cross-clip chance floor (measured,
    scripts/diag_steering_metric.py). Subtracting each mel's per-bin mean
    over time leaves only the MOVING spectral content — the part the
    motion condition dictates.
    """
    g = gen - gen.mean(axis=1, keepdims=True)
    r = real - real.mean(axis=1, keepdims=True)
    gn = g / (np.linalg.norm(g, axis=0, keepdims=True) + 1e-9)
    rn = r / (np.linalg.norm(r, axis=0, keepdims=True) + 1e-9)
    return float((gn * rn).sum(axis=0).mean())


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--npz_dir", required=True)
    ap.add_argument("--n", type=int, default=6)
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--guidance", type=float, default=2.1)
    ap.add_argument("--method", default="ddpm", choices=["ddpm", "ddim"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from lm2a_tpu.data.schema import load_sample, normalize_mel_layout
    from lm2a_tpu.inference import generate_mel_batch, load_models

    models = load_models(args.ckpt)
    files = sorted(
        f for f in os.listdir(args.npz_dir)
        if f.endswith(".npz") and f != "motion_stats.npz"
    )
    # one clip per SONG: same-song slices have near-identical mels (adjacent
    # slices of the same melody line), which collapses the matched/swapped
    # separation to zero by construction
    rng = np.random.default_rng(args.seed)
    by_song = {}
    for f in files:
        d = np.load(os.path.join(args.npz_dir, f), allow_pickle=True)
        song = str(d.get("song_name", f))
        by_song.setdefault(song, []).append(f)
    songs = sorted(by_song)
    if len(songs) < args.n:
        raise SystemExit(f"need {args.n} distinct songs, have {len(songs)}")
    pick_songs = rng.choice(len(songs), size=args.n, replace=False)
    names = [by_song[songs[i]][rng.integers(len(by_song[songs[i]]))]
             for i in pick_songs]
    clips = [load_sample(os.path.join(args.npz_dir, f)) for f in names]
    real_cent = [mel_centroid(normalize_mel_layout(c.mel)) for c in clips]
    mel_t = normalize_mel_layout(clips[0].mel).shape[1]

    # pairing: motion from clip i, lyrics from clip perm(i) (a derangement
    # so every row is a true swap)
    n = args.n
    perm = np.roll(np.arange(n), 1)
    motions = [clips[i].motion for i in range(n)]
    lyrics = [clips[perm[i]].lyrics for i in range(n)]

    gen, _, _ = generate_mel_batch(
        models, motions, lyrics, mel_t, steps=args.steps,
        guidance_weight=args.guidance, method=args.method, seed=args.seed,
    )

    # no-swap CONTROL: matched conditions (motion_i + lyrics_i). Upper
    # anchor for the centered-frame-cos scale on this checkpoint.
    ctrl, _, _ = generate_mel_batch(
        models, [c.motion for c in clips], [c.lyrics for c in clips], mel_t,
        steps=args.steps, guidance_weight=args.guidance, method=args.method,
        seed=args.seed + 1,
    )

    reals = [normalize_mel_layout(c.mel) for c in clips]
    matched, swapped, cmatched, cswapped = [], [], [], []
    print(f"{'row':>3} {'motion-of':>22} {'lyrics-of':>22} "
          f"{'fc(motion)':>11} {'fc(lyrics)':>11} "
          f"{'cfc(m)':>7} {'cfc(l)':>7}")
    for i in range(n):
        fm = framecos(gen[i], reals[i])                 # MOTION donor
        fl = framecos(gen[i], reals[perm[i]])           # lyrics donor
        cm = centered_framecos(gen[i], reals[i])
        cl = centered_framecos(gen[i], reals[perm[i]])
        matched.append(fm)
        swapped.append(fl)
        cmatched.append(cm)
        cswapped.append(cl)
        print(f"{i:>3} {names[i][:22]:>22} {names[perm[i]][:22]:>22} "
              f"{fm:>11.3f} {fl:>11.3f} {cm:>7.3f} {cl:>7.3f}")

    print("\nno-swap control (motion_i + lyrics_i):")
    ctrl_own, ctrl_other = [], []
    for i in range(n):
        own = framecos(ctrl[i], reals[i])
        other = float(np.mean([framecos(ctrl[i], reals[j])
                               for j in range(n) if j != i]))
        ctrl_own.append(own)
        ctrl_other.append(other)
        print(f"{i:>3} cfc(own) {own:>7.3f}  cfc(others) {other:>7.3f}")

    mm, ms = float(np.mean(matched)), float(np.mean(swapped))
    print(f"\ncontrol: matched {np.mean(ctrl_own):.3f} vs "
          f"other-clips {np.mean(ctrl_other):.3f} "
          f"(wins {sum(a > b for a, b in zip(ctrl_own, ctrl_other))}/{n})")
    margin = mm - ms
    wins = sum(a > b for a, b in zip(matched, swapped))
    cwins = sum(a > b for a, b in zip(cmatched, cswapped))
    print(f"\nframe-cos with motion-donor mel: {mm:.3f}")
    print(f"frame-cos with lyrics-donor mel: {ms:.3f}")
    print(f"margin (motion steering): {margin:+.3f}  "
          f"per-row wins {wins}/{n} (centered-residual wins {cwins}/{n})")
    ok = margin > 0.02 and wins == n
    print("VERDICT:", "conditioning STEERS generation (output follows the "
          "MOTION donor)" if ok else "weak/no steering")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
