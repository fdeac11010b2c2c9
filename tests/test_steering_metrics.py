"""Unit tests for the conditioning-steering metrics
(scripts/condition_swap_eval.py): the discrimination protocol's scoring
functions must themselves discriminate synthetic formants correctly."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scripts.condition_swap_eval import (  # noqa: E402
    centered_framecos,
    corr,
    framecos,
    mel_centroid,
)


def formant_mel(line: np.ndarray, floor: float = -4.6, peak: float = 2.0,
                width: float = 3.0) -> np.ndarray:
    """(T,) line in [0,1] -> (80, T) log-mel with a moving gaussian formant
    over a shared static floor."""
    bins = np.arange(80, dtype=np.float32)[:, None]
    center = 10 + 60 * line[None, :]
    return floor + peak * np.exp(-((bins - center) / width) ** 2)


def test_centroid_tracks_the_formant():
    t = np.linspace(0, 1, 200, dtype=np.float32)
    line = 0.5 + 0.4 * np.sin(2 * np.pi * 3 * t)
    c = mel_centroid(formant_mel(line))
    assert corr(c, line) > 0.99


def test_framecos_discriminates_lines():
    t = np.linspace(0, 1, 200, dtype=np.float32)
    la = 0.5 + 0.4 * np.sin(2 * np.pi * 3 * t)
    lb = 0.5 + 0.4 * np.cos(2 * np.pi * 5 * t)
    a, b = formant_mel(la), formant_mel(lb)
    noisy_a = a + 0.05 * np.random.default_rng(0).normal(size=a.shape)
    assert framecos(noisy_a, a) > framecos(noisy_a, b)
    # the shared static floor keeps even mismatched cos high — the metric is
    # only meaningful as matched-vs-swapped margins (DEVNOTES)
    assert framecos(a, b) > 0.5


def test_centered_framecos_removes_static_structure():
    t = np.linspace(0, 1, 200, dtype=np.float32)
    la = 0.5 + 0.4 * np.sin(2 * np.pi * 3 * t)
    lb = 0.5 + 0.4 * np.cos(2 * np.pi * 5 * t)
    a, b = formant_mel(la), formant_mel(lb)
    assert centered_framecos(a, a) > 0.99
    # different motion -> near-orthogonal residuals (static floor removed)
    assert abs(centered_framecos(a, b)) < 0.35
    assert centered_framecos(a, a) - centered_framecos(a, b) > 0.6


# ---- lyric-axis envelope-rate classifier (scripts/lyric_swap_eval.py) ----

from scripts.lyric_swap_eval import (  # noqa: E402
    MEL_FPS,
    binom_tail,
    classify_rate,
    envelope_rate_scores,
)
from scripts.make_synth_corpus import RATES, phrase_bucket, PHRASES  # noqa: E402


def rate_mel(rate_hz: float, t_frames: int = 516, floor: float = -4.6,
             formant_line: float = 0.5) -> np.ndarray:
    """(80, T) log-mel of a static formant whose LINEAR power is modulated
    by the corpus envelope (0.55 + 0.45 sin^2(pi r t)) — the mel-domain
    image of make_synth_corpus's amplitude coupling."""
    t = np.arange(t_frames, dtype=np.float32) / MEL_FPS
    env = 0.55 + 0.45 * np.square(np.sin(np.pi * rate_hz * t))
    mel = formant_mel(np.full(t_frames, formant_line, np.float32),
                      floor=floor)
    return mel + 2.0 * np.log(env)[None, :]  # power ~ env^2


def test_classifier_recovers_every_rate():
    for b, r in enumerate(RATES):
        assert classify_rate(rate_mel(r)) == b, (r, envelope_rate_scores(
            rate_mel(r)))


def test_classifier_robust_to_moving_formant():
    # melody movement (the MOTION-controlled axis) must not confuse the
    # lyric-axis readout: linear-power frame energy is formant-invariant
    t = np.linspace(0, 1, 516, dtype=np.float32)
    line = 0.5 + 0.4 * np.sin(2 * np.pi * 0.8 * t)  # slow melody walk
    for b, r in enumerate(RATES):
        mel = formant_mel(line) + 2.0 * np.log(
            0.55 + 0.45 * np.square(
                np.sin(np.pi * r * np.arange(516) / MEL_FPS)))[None, :]
        assert classify_rate(mel) == b


def test_phrase_buckets_cover_all_rates():
    buckets = {phrase_bucket(p) for p in PHRASES}
    assert buckets == set(range(len(RATES)))
    assert phrase_bucket("not a corpus phrase") == -1


def test_binom_tail_exact_values():
    assert binom_tail(0, 10, 0.25) == 1.0
    assert abs(binom_tail(10, 10, 0.5) - 0.5**10) < 1e-12
    # monotone in k
    assert binom_tail(8, 10, 0.25) < binom_tail(2, 10, 0.25)


# ---- harmonic-density classifier (round-5 second lyric channel) ----

from scripts.lyric_swap_eval import (  # noqa: E402
    classify_density,
    harmonic_density_score,
)
from scripts.make_synth_corpus import (  # noqa: E402
    CLIP_S,
    SR,
    make_song,
    phrase_density,
)


def test_phrase_density_independent_of_rate():
    assert {phrase_density(p) for p in PHRASES} == {0, 1}
    # the 32-phrase pool covers the full (rate, density) factorial, so the
    # two lyric channels are statistically independent across phrases
    combos = {(phrase_bucket(p), phrase_density(p)) for p in PHRASES}
    assert combos == {(r, d) for r in range(len(RATES)) for d in (0, 1)}
    assert phrase_density("not a corpus phrase") == -1


def test_density_classifier_on_synthesized_slices():
    """End-to-end through the real mel op: sparse and dense slices of one
    song classify correctly, at both rate extremes — and the RATE readout
    is unaffected by density (channel independence)."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lm2a_tpu.ops.mel import MelConfig, mel_spectrogram

    rng = np.random.default_rng(0)
    rates = [1.0, 8.0, 1.0, 8.0]
    dens = [0, 0, 1, 1]
    audio, _, starts = make_song(rng, 4, slice_rates=rates,
                                 slice_densities=dens)
    cfg = MelConfig()
    for i, st in enumerate(starts):
        seg = audio[int(st * SR):int((st + CLIP_S) * SR)]
        mel = np.asarray(mel_spectrogram(seg, cfg))
        if mel.shape[0] != 80:
            mel = mel.T
        score = harmonic_density_score(mel)
        assert classify_density(mel) == dens[i], (i, score)
        assert classify_rate(mel) == {1.0: 0, 8.0: 3}[rates[i]], i


def test_legacy_density_default_reads_sparse():
    """No slice_densities (pre-round-5 corpora) must still produce the
    legacy sparse stack."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from lm2a_tpu.ops.mel import MelConfig, mel_spectrogram

    rng = np.random.default_rng(1)
    audio, _, starts = make_song(rng, 2, slice_rates=[2.0, 4.0])
    seg = audio[:int(CLIP_S * SR)]
    mel = np.asarray(mel_spectrogram(seg, MelConfig()))
    if mel.shape[0] != 80:
        mel = mel.T
    assert classify_density(mel) == 0
