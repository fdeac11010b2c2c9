#!/usr/bin/env python3
"""Lyric-conditioning steering proof: does generation obey the LYRICS?

Round-4 protocol (VERDICT r3 #2). The synthetic corpus couples each slice's
lyric phrase to an audible mel property: the phrase's rate bucket sets the
amplitude-envelope beat rate (1/2/4/8 Hz, ``scripts/make_synth_corpus.py``).
The envelope rate is independent of the motion-controlled melody line, so a
generated clip's modulation spectrum is a readout of which LYRICS it
followed. (Reference anchor: the text branch is half of CrossAttentionFusion,
``/root/reference/models/cross_attention.py:46-47``, and both CFG branches
drop with one shared mask, ``/root/reference/train.py:148-157``.)

Protocol, N pairs (default 24):
  1. classifier sanity — classify REAL test mels' envelope rate (ceiling);
  2. swap — generate with motion_i + lyrics_j where bucket_j != bucket_i;
     classify each output; "follows lyrics" = pred == bucket_j;
  3. control — matched generation (motion_i + lyrics_i), accuracy vs own
     bucket;
  4. significance — exact binomial tail of the follows-lyrics count vs the
     1/len(RATES) chance floor AND vs the follows-motion-donor count;
  5. motion axis on the same generations — centered frame-cos vs the motion
     donor vs the lyric donor (the round-3 margin, now at N>=20).

Round-5 extension (VERDICT r4 #8): the corpus's second lyric-controlled
property — harmonic stack density (sparse/dense, independent of the rate
bucket) — is read out on the SAME swapped generations via the
above-3.5f0 harmonic power ratio (``harmonic_density_score``). Pairs are
chosen so BOTH buckets differ; the report adds per-channel and joint
follow rates, and the gate requires both channels significant. Corpora
built before round 5 carry only the rate channel: pass
``--properties rate`` there.

Usage: lyric_swap_eval.py --ckpt <dir> --npz_dir <split> [--n 24]
       [--steps N] [--guidance 2.1] [--method ddpm|ddim] [--ddim_steps N]
       [--properties rate,density]
Exit 1 unless follows-lyrics accuracy is significant (p < 0.01) vs chance
on every read-out property.
"""

import argparse
import json
import os
import sys
from math import comb

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root: lm2a_tpu package
sys.path.insert(0, _HERE)  # sibling scripts

import numpy as np

from make_synth_corpus import RATES, phrase_bucket, phrase_density  # noqa: E402
from condition_swap_eval import centered_framecos  # noqa: E402

MEL_FPS = 22050.0 / 256.0

# Harmonic-density decision threshold for ``harmonic_density_score``:
# measured on raw corpus mels (64 slices across 8 songs, all rates), sparse
# scores <= 0.117 and dense >= 0.376 — 0.2 splits the gap with margin on
# the sparse side (generations drift toward sparse noise, not dense).
DENSITY_THRESHOLD = 0.2


def _mel_center_freqs() -> np.ndarray:
    """Center frequency (Hz) of each of the 80 Slaney mel bands."""
    from lm2a_tpu.ops.mel import _hz_to_mel_slaney, _mel_to_hz_slaney

    m = np.linspace(_hz_to_mel_slaney(0.0), _hz_to_mel_slaney(22050.0 / 2),
                    82)
    return np.asarray([_mel_to_hz_slaney(x) for x in m])[1:-1]


_CENTERS = None


def harmonic_density_score(mel: np.ndarray) -> float:
    """Above-3.5f0 harmonic power ratio — the harmonic-DENSITY readout.

    (80, T) log-mel -> linear power; per frame, estimate f0 as the peak
    mel band, then ratio = P[3.5 f0 .. 5.6 f0] / P[1.5 f0 .. 3.5 f0]:
    the 4th/5th partials exist ONLY in the dense stack
    (``make_synth_corpus.DENSITY_AMPS``) while the 2nd/3rd exist in both,
    so the ratio is ~0 for sparse and ~0.4-0.65 for dense, independent of
    the melody's f0 regime (an absolute above-fundamental fraction is
    f0-dependent and overlaps — measured). Median over frames; envelope
    (rate) modulation cancels in the ratio, making the two lyric
    properties' readouts independent.
    """
    global _CENTERS
    if _CENTERS is None:
        _CENTERS = _mel_center_freqs()
    p = np.exp(np.asarray(mel, np.float32))
    ratios = []
    for t in range(p.shape[1]):
        col = p[:, t]
        f0 = _CENTERS[int(np.argmax(col))]
        lo = col[(_CENTERS >= 1.5 * f0) & (_CENTERS < 3.5 * f0)].sum()
        hi = col[(_CENTERS >= 3.5 * f0) & (_CENTERS <= 5.6 * f0)].sum()
        ratios.append(hi / (lo + 1e-12))
    return float(np.median(ratios))


def classify_density(mel: np.ndarray) -> int:
    return int(harmonic_density_score(mel) >= DENSITY_THRESHOLD)


def envelope_rate_scores(mel: np.ndarray, rates=RATES) -> np.ndarray:
    """Modulation-spectrum score per candidate envelope rate.

    (80, T) log-mel -> LINEAR-power frame energy (sum of exp over bins —
    melody-invariant: the envelope multiplies every harmonic, while melody
    movement only relocates energy across bins) -> log -> windowed rFFT ->
    peak magnitude in a +/-20-25% band around each candidate rate. The
    rates are octave-separated so the bands never overlap. 80/80 on raw
    corpus mels (the per-bin log-mel mean variant read melody leakage
    instead and scored ~chance).
    """
    p = np.exp(np.asarray(mel, np.float32))
    e = np.log(p.sum(axis=0) + 1e-8)
    e = e - e.mean()
    w = np.hanning(e.shape[0]).astype(np.float32)
    spec = np.abs(np.fft.rfft(e * w))
    freqs = np.fft.rfftfreq(e.shape[0], d=1.0 / MEL_FPS)
    scores = []
    for r in rates:
        band = (freqs >= 0.8 * r) & (freqs <= 1.25 * r)
        scores.append(float(spec[band].max()) if band.any() else 0.0)
    return np.asarray(scores, np.float32)


def classify_rate(mel: np.ndarray, rates=RATES) -> int:
    return int(np.argmax(envelope_rate_scores(mel, rates)))


def binom_tail(k: int, n: int, p: float) -> float:
    """P[X >= k] for X ~ Binomial(n, p) (exact, stdlib only)."""
    return float(sum(comb(n, i) * p**i * (1 - p) ** (n - i)
                     for i in range(k, n + 1)))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--npz_dir", required=True)
    ap.add_argument("--n", type=int, default=24, help="swap pairs")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--guidance", type=float, default=2.1)
    ap.add_argument("--method", default="ddpm", choices=["ddpm", "ddim"])
    ap.add_argument("--ddim_steps", type=int, default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8,
                    help="generation batch size per compiled chain")
    ap.add_argument("--properties", default="rate,density",
                    help="comma list of lyric-controlled properties to read "
                         "out and gate on: rate (envelope beat, 4-way) and/"
                         "or density (harmonic stack, 2-way). Corpora built "
                         "before round 5 carry only rate — pass "
                         "--properties rate there")
    args = ap.parse_args()
    props = [s.strip() for s in args.properties.split(",") if s.strip()]
    want_density = "density" in props

    from lm2a_tpu.data.schema import load_sample, normalize_mel_layout
    from lm2a_tpu.inference import generate_mel_batch, load_models

    files = sorted(f for f in os.listdir(args.npz_dir)
                   if f.endswith(".npz") and f != "motion_stats.npz")
    # clip -> (sample, bucket); one clip per song (same-song slices share a
    # melody line, which would soften the motion-axis readout)
    by_song = {}
    for f in files:
        d = np.load(os.path.join(args.npz_dir, f), allow_pickle=True)
        raw = d.get("lyric_text", "")
        if isinstance(raw, np.ndarray):
            raw = raw.item()
        if isinstance(raw, bytes):
            raw = raw.decode("utf-8", "replace")
        b = phrase_bucket(str(raw))
        if b < 0:
            continue
        song = str(d.get("song_name", f))
        by_song.setdefault(song, []).append((f, b, phrase_density(str(raw))))
    rng = np.random.default_rng(args.seed)
    picks = []  # (file, bucket), one per song, shuffled
    for song in sorted(by_song):
        lst = by_song[song]
        picks.append(lst[rng.integers(len(lst))])
    rng.shuffle(picks)

    # ---- 1. classifier sanity on REAL mels ----
    n_sanity = min(48, len(picks))
    ok_real = ok_real_d = 0
    for f, b, dd in picks[:n_sanity]:
        s = load_sample(os.path.join(args.npz_dir, f))
        mel = normalize_mel_layout(s.mel)
        ok_real += classify_rate(mel) == b
        ok_real_d += classify_density(mel) == dd
    print(f"[sanity] real-mel envelope-rate classification: "
          f"{ok_real}/{n_sanity} ({ok_real / n_sanity:.2f})", flush=True)
    if want_density:
        print(f"[sanity] real-mel harmonic-density classification: "
              f"{ok_real_d}/{n_sanity} ({ok_real_d / n_sanity:.2f})",
              flush=True)

    # ---- pair selection: motion donor i, lyric donor j; every read-out
    # property's bucket must differ so following the lyric donor is
    # distinguishable on each channel ----
    pairs = []
    pool = list(picks)
    for idx in range(len(pool)):
        if len(pairs) >= args.n:
            break
        f_i, b_i, d_i = pool[idx]
        # nearest later clip whose buckets all differ
        for jdx in range(idx + 1, len(pool)):
            f_j, b_j, d_j = pool[jdx]
            if b_j != b_i and (not want_density or d_j != d_i):
                pairs.append(((f_i, b_i, d_i), (f_j, b_j, d_j)))
                break
    if len(pairs) < args.n:
        print(f"warning: only {len(pairs)} usable pairs", file=sys.stderr)
    n = len(pairs)

    clips_m = [load_sample(os.path.join(args.npz_dir, p[0][0])) for p in pairs]
    clips_l = [load_sample(os.path.join(args.npz_dir, p[1][0])) for p in pairs]
    mel_t = normalize_mel_layout(clips_m[0].mel).shape[1]

    models = load_models(args.ckpt)

    def gen_batched(motions, lyrics, seed):
        outs = []
        for k in range(0, len(motions), args.batch):
            g, _, _ = generate_mel_batch(
                models, motions[k:k + args.batch], lyrics[k:k + args.batch],
                mel_t, steps=args.steps, guidance_weight=args.guidance,
                method=args.method, ddim_steps=args.ddim_steps, seed=seed + k)
            outs.extend(np.asarray(g))
        return outs

    # ---- 2. swap: motion_i + lyrics_j ----
    gen_swap = gen_batched([c.motion for c in clips_m],
                           [c.lyrics for c in clips_l], args.seed)
    # ---- 3. control: matched motion_i + lyrics_i ----
    gen_ctrl = gen_batched([c.motion for c in clips_m],
                           [c.lyrics for c in clips_m], args.seed + 10_000)

    k_chance = 1.0 / len(RATES)
    fl = fm = fl_d = fm_d = joint = 0
    cfc_m, cfc_l = [], []
    print(f"\n{'row':>3} {'motion-of':>22} {'lyrics-of':>22} "
          f"{'b_m':>3} {'b_l':>3} {'pred':>4} {'d_m':>3} {'d_l':>3} "
          f"{'pd':>3} {'cfc(m)':>7} {'cfc(l)':>7}")
    reals_m = [normalize_mel_layout(c.mel) for c in clips_m]
    reals_l = [normalize_mel_layout(c.mel) for c in clips_l]
    for i, ((f_i, b_i, d_i), (f_j, b_j, d_j)) in enumerate(pairs):
        pred = classify_rate(gen_swap[i])
        pred_d = classify_density(gen_swap[i])
        fl += pred == b_j
        fm += pred == b_i
        fl_d += pred_d == d_j
        fm_d += pred_d == d_i
        joint += (pred == b_j) and (pred_d == d_j)
        cm = centered_framecos(gen_swap[i], reals_m[i])
        cl = centered_framecos(gen_swap[i], reals_l[i])
        cfc_m.append(cm)
        cfc_l.append(cl)
        print(f"{i:>3} {f_i[:22]:>22} {f_j[:22]:>22} "
              f"{b_i:>3} {b_j:>3} {pred:>4} {d_i:>3} {d_j:>3} {pred_d:>3} "
              f"{cm:>7.3f} {cl:>7.3f}")

    ctrl_ok = sum(classify_rate(gen_ctrl[i]) == pairs[i][0][1]
                  for i in range(n))
    ctrl_ok_d = sum(classify_density(gen_ctrl[i]) == pairs[i][0][2]
                    for i in range(n))

    p_chance = binom_tail(fl, n, k_chance)
    # follows-lyrics vs follows-motion-donor: sign test on discordant rows
    disc = fl + fm
    p_vs_motion = binom_tail(fl, disc, 0.5) if disc else 1.0
    mwins = sum(a > b for a, b in zip(cfc_m, cfc_l))
    dm = np.asarray(cfc_m) - np.asarray(cfc_l)
    p_motion_axis = binom_tail(mwins, n, 0.5)

    # density channel: binary, chance 0.5; joint channel chance = product
    p_chance_d = binom_tail(fl_d, n, 0.5)
    p_joint = binom_tail(joint, n, k_chance * 0.5)

    print(f"\n[control] matched-generation rate accuracy: {ctrl_ok}/{n} "
          f"({ctrl_ok / n:.2f})")
    if want_density:
        print(f"[control] matched-generation density accuracy: "
              f"{ctrl_ok_d}/{n} ({ctrl_ok_d / n:.2f})")
    print(f"[lyrics]  swap follows LYRIC donor: {fl}/{n} ({fl / n:.2f}); "
          f"follows motion donor's rate: {fm}/{n}; chance {k_chance:.2f}")
    print(f"[lyrics]  P(>= {fl} | chance {k_chance:.2f}) = {p_chance:.2e}; "
          f"sign test lyrics-vs-motion p = {p_vs_motion:.2e}")
    if want_density:
        print(f"[density] swap follows LYRIC donor's density: {fl_d}/{n} "
              f"({fl_d / n:.2f}); motion donor's: {fm_d}/{n}; chance 0.50")
        print(f"[density] P(>= {fl_d} | chance 0.50) = {p_chance_d:.2e}")
        print(f"[joint]   swap follows BOTH lyric properties: {joint}/{n}; "
              f"chance {k_chance * 0.5:.3f}; "
              f"P(>= {joint}) = {p_joint:.2e}")
    print(f"[motion]  centered frame-cos: motion donor "
          f"{np.mean(cfc_m):.3f} vs lyric donor {np.mean(cfc_l):.3f} "
          f"(margin {np.mean(dm):+.3f}, wins {mwins}/{n}, "
          f"sign-test p = {p_motion_axis:.2e})")

    ok = p_chance < 0.01 and fl > fm
    if want_density:
        ok = ok and p_chance_d < 0.01 and fl_d > fm_d
    print(json.dumps({
        "n_pairs": n, "real_sanity": ok_real / n_sanity,
        "real_sanity_density": ok_real_d / n_sanity,
        "ctrl_acc": ctrl_ok / n, "ctrl_acc_density": ctrl_ok_d / n,
        "follows_lyrics": fl, "follows_motion": fm,
        "follows_lyrics_density": fl_d, "follows_motion_density": fm_d,
        "follows_both": joint,
        "p_vs_chance": p_chance, "p_vs_motion": p_vs_motion,
        "p_density": p_chance_d, "p_joint": p_joint,
        "motion_margin": float(np.mean(dm)), "motion_wins": mwins,
        "p_motion_axis": p_motion_axis, "properties": props, "ok": ok,
    }))
    print("VERDICT:", "LYRICS conditioning STEERS generation on "
          + (f"{len(props)} independent channels" if want_density
             else "the rate channel") if ok
          else "lyrics steering NOT demonstrated")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
