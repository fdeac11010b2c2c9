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
