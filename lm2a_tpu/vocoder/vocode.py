"""Mel-to-waveform driving: the reference's testwav/newwav equivalents.

``/root/reference/sometest/testwav.py`` (single npz) and ``newwav.py``
(batch folder walk) load BigVGAN once and vocode generated-mel npz files to
wavs. Here the generator is jitted once per mel length and the whole
sample->wav path stays on device; weights come from a converted NVIDIA
checkpoint file, or random init for smoke-testing the pipeline shape.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lm2a_tpu.data.schema import normalize_mel_layout
from lm2a_tpu.utils.audio import write_wav
from lm2a_tpu.vocoder.bigvgan import BIGVGAN_22KHZ_80BAND, BigVGANGenerator, VocoderConfig


class Vocoder:
    def __init__(
        self,
        weights_path: Optional[str] = None,
        cfg: VocoderConfig = BIGVGAN_22KHZ_80BAND,
        compute_dtype=jnp.bfloat16,
        fused_sandwich: Optional[bool] = None,
    ):
        if fused_sandwich is None:
            # fused Pallas snake sandwich on TPU (identical numerics,
            # measured serving win); XLA polyphase elsewhere
            fused_sandwich = jax.default_backend() == "tpu"
        self.cfg = cfg
        self.model = BigVGANGenerator(
            cfg=cfg, fused_sandwich=fused_sandwich, dtype=compute_dtype)
        if weights_path:
            from lm2a_tpu.vocoder.convert import load_bigvgan_torch

            self.params = load_bigvgan_torch(weights_path, cfg)
        else:
            import sys

            # stderr: stdout may be a serving protocol stream (cli/serve)
            print("vocoder: no weights file given; using random init "
                  "(smoke mode)", file=sys.stderr)
            dummy = jnp.zeros((1, 32, cfg.num_mels), jnp.float32)
            self.params = jax.jit(self.model.init)(jax.random.key(0), dummy)
        self._apply = jax.jit(self.model.apply)

    def mel_to_wav(self, mel: np.ndarray) -> np.ndarray:
        """mel (80, T) or (B, 80, T) npz layout -> waveform (B, hop*T)."""
        mel = np.asarray(mel, dtype=np.float32)
        if mel.ndim == 2:
            mel = mel[None]
        x = jnp.asarray(mel.transpose(0, 2, 1))  # channels-last
        return np.asarray(self._apply(self.params, x))


def npz_to_wav(
    npz_path: str, out_path: str, vocoder: Vocoder
) -> Tuple[str, int]:
    d = np.load(npz_path, allow_pickle=True)
    mel = normalize_mel_layout(d["mel"])
    sr = int(d.get("sr", vocoder.cfg.sample_rate))
    wav = vocoder.mel_to_wav(mel)[0]
    write_wav(out_path, wav, sr)
    return out_path, sr


def batch_npz_to_wav(npz_dir: str, vocoder: Vocoder, suffix: str = ".wav"):
    """Vocode every npz in a folder, wav written next to each npz."""
    ok, failed = 0, 0
    for name in sorted(os.listdir(npz_dir)):
        if not name.endswith(".npz") or name == "motion_stats.npz":
            continue
        src = os.path.join(npz_dir, name)
        dst = os.path.join(npz_dir, os.path.splitext(name)[0] + suffix)
        try:
            npz_to_wav(src, dst, vocoder)
            ok += 1
        except Exception as e:
            print(f"vocode failed for {src}: {e}")
            failed += 1
    print(f"vocoded {ok} files, {failed} failures")
    return ok, failed
