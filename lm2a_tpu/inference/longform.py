"""Long-form generation: full-song mel synthesis beyond the 6 s clip.

The reference is structurally fixed at 6 s / 516-frame clips (SURVEY.md
§5.7). This extension generates arbitrarily long mels by windowed sampling
with overlapped stitching:

- the song's motion track and per-slice lyrics are windowed into clip-sized
  conditions (hop < window for overlap),
- every window is generated in ONE batched scan chain (they're independent
  given their conditions, so the batch dimension absorbs them),
- overlapping regions are linearly cross-faded in mel space.

For truly single-pass long clips (minutes of frames in one attention
window), use the sequence-parallel sampler
(``lm2a_tpu.parallel.sequence``) instead — this module trades global
coherence for clip-protocol parity and constant memory.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from lm2a_tpu.inference.sample import LoadedModels, generate_mel_batch
from lm2a_tpu.ops.resample import linear_resample


def window_conditions(
    motion: np.ndarray,  # (T_motion, 234) full-song motion features
    lyrics_per_window: List[np.ndarray],  # one (768,) or (T, 768) per window
    num_windows: int,
    window_motion_frames: int,
    hop_motion_frames: int,
) -> List[Tuple[np.ndarray, np.ndarray]]:
    """Slice a full-song motion track into overlapping windows."""
    out = []
    for w in range(num_windows):
        a = w * hop_motion_frames
        seg = motion[a : a + window_motion_frames]
        if seg.shape[0] < window_motion_frames:  # pad tail by holding last
            pad = np.repeat(seg[-1:], window_motion_frames - seg.shape[0], axis=0)
            seg = np.concatenate([seg, pad], axis=0)
        lyr = lyrics_per_window[min(w, len(lyrics_per_window) - 1)]
        if lyr.ndim == 1:
            lyr = np.tile(lyr[None], (window_motion_frames, 1))
        out.append((seg.astype(np.float32), lyr.astype(np.float32)))
    return out


def crossfade_stitch(
    windows: np.ndarray,  # (W, 80, T_w) generated mels
    hop_frames: int,
) -> np.ndarray:
    """Linearly cross-fade overlapping windows into one (80, total_T) mel."""
    w, c, t_w = windows.shape
    overlap = t_w - hop_frames
    total = hop_frames * (w - 1) + t_w
    out = np.zeros((c, total), dtype=np.float64)
    weight = np.zeros(total, dtype=np.float64)

    env = np.ones(t_w)
    if overlap > 0:
        ramp = np.linspace(0.0, 1.0, overlap + 2)[1:-1]
        env[:overlap] = ramp
        env[-overlap:] = ramp[::-1]

    for i in range(w):
        a = i * hop_frames
        e = env.copy()
        if i == 0 and overlap > 0:
            e[:overlap] = 1.0  # no fade-in on the first window
        if i == w - 1 and overlap > 0:
            e[-overlap:] = 1.0  # no fade-out on the last
        out[:, a : a + t_w] += windows[i] * e
        weight[a : a + t_w] += e
    return (out / np.maximum(weight, 1e-8)).astype(np.float32)


def generate_long(
    models: LoadedModels,
    motion: np.ndarray,  # (T_motion, 234) full-song normalized motion feats
    lyrics_windows: List[np.ndarray],  # lyric embedding per window
    total_seconds: float,
    window_seconds: float = 6.0,
    overlap_seconds: float = 1.0,
    fps: int = 30,
    sr: int = 22050,
    hop_size: int = 256,
    steps: Optional[int] = None,
    guidance_weight: Optional[float] = None,
    method: Optional[str] = None,
    seed: int = 0,
    batch_size: int = 8,
) -> np.ndarray:
    """Generate a (80, ~total_seconds*sr/hop) mel via overlapped windows."""
    if overlap_seconds >= window_seconds:
        raise ValueError("overlap must be smaller than the window")
    mel_fps = sr / hop_size
    t_w = int(round(window_seconds * mel_fps))
    hop_w = int(round((window_seconds - overlap_seconds) * mel_fps))
    total_t = int(round(total_seconds * mel_fps))
    num_windows = max(1, int(np.ceil((total_t - t_w) / hop_w)) + 1)

    win_motion = int(round(window_seconds * fps))
    hop_motion = int(round((window_seconds - overlap_seconds) * fps))
    conds = window_conditions(motion, lyrics_windows, num_windows, win_motion, hop_motion)

    mels = []
    for i in range(0, num_windows, batch_size):
        chunk = conds[i : i + batch_size]
        gen, _, _ = generate_mel_batch(
            models,
            [m for m, _ in chunk],
            [l for _, l in chunk],
            t_w,
            steps=steps, guidance_weight=guidance_weight,
            method=method, seed=seed + i,
        )
        mels.append(gen)
    windows = np.concatenate(mels, axis=0)  # (W, 80, t_w)
    stitched = crossfade_stitch(windows, hop_w)
    if stitched.shape[1] > total_t:
        stitched = stitched[:, :total_t]
    return linear_resample(stitched, total_t, time_axis=1) if stitched.shape[1] != total_t else stitched


def with_streaming_attention(models: LoadedModels, mel_t: int) -> LoadedModels:
    """Return ``models`` with the streaming flash-attention denoiser when the
    sequence is long enough for it to engage.

    Cross-attention here has S == T, so at long T the XLA path materializes
    (B, h, T, T) probabilities per site while the Pallas kernel
    (``ops/pallas_attention``) keeps them in VMEM. The engage point is the
    MEASURED break-even (``FUSED_ATTENTION_MIN_T``, ~12k frames): below it
    XLA's fused form is faster and memory still fits; above it the kernel
    wins and is eventually the only path that runs at all.
    Parameters are unchanged (the flag only reroutes the attention core), so
    the returned copy shares the loaded checkpoint; its sampler cache is
    fresh (different compiled programs).
    """
    from dataclasses import replace as dc_replace

    from lm2a_tpu.models.factory import build_denoiser
    from lm2a_tpu.ops.pallas_attention import FUSED_ATTENTION_MIN_T

    if mel_t <= FUSED_ATTENTION_MIN_T:
        return models
    cfg = dc_replace(models.cfg, model=dc_replace(models.cfg.model,
                                                  fused_attention=True))
    denoiser = build_denoiser(cfg.model, "bfloat16")
    return LoadedModels(
        cfg=cfg, denoiser=denoiser, cond_proj=models.cond_proj,
        unet_params=models.unet_params, proj_params=models.proj_params,
        dataset_mean=models.dataset_mean, dataset_std=models.dataset_std,
        timesteps=models.timesteps, guidance_weight=models.guidance_weight,
        # distilled metadata must survive the copy or method/guidance
        # resolution silently reverts to ddpm/2.1 above the engage point
        distilled_steps=models.distilled_steps,
        folded_guidance=models.folded_guidance,
    )


def generate_single_pass(
    models: LoadedModels,
    motion: np.ndarray,  # (T_motion, 234) full-song normalized motion feats
    lyrics: np.ndarray,  # (T_l, 768) full-song lyric embedding track
    total_seconds: float,
    sr: int = 22050,
    hop_size: int = 256,
    steps: Optional[int] = None,
    guidance_weight: Optional[float] = None,
    method: Optional[str] = None,
    seed: int = 0,
) -> np.ndarray:
    """Whole-song mel in ONE attention window (no stitching seams).

    The alternative to ``generate_long``'s windowed protocol: one scan chain
    over the full sequence, with the streaming flash-attention kernel
    engaged automatically above the VMEM threshold. Memory scales linearly
    in T (the kernel never materializes (T, S) scores); compute scales
    quadratically, so this is for coherence-critical finals, not batch
    serving.
    """
    from lm2a_tpu.inference.sample import generate_mel

    mel_t = int(round(total_seconds * sr / hop_size))
    m = with_streaming_attention(models, mel_t)
    gen, *_ = generate_mel(
        m, motion, lyrics, mel_t,
        steps=steps, guidance_weight=guidance_weight,
        method=method, seed=seed,
    )
    return gen[0]
