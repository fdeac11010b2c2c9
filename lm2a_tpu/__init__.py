"""LM2A-TPU: a TPU-native JAX framework for lyrics-and-motion-to-audio diffusion.

A ground-up rebuild of the capabilities of
``Bokway/LM2A-lyrics-and-motion-to-audio-with-diffusion-model`` (PyTorch/CUDA,
single GPU) as an idiomatic JAX / XLA / Pallas / pjit framework:

- ``core``      configs, mesh/sharding setup, precision policy, PRNG discipline
- ``ops``       pure signal ops: STFT/mel, resampling, motion features, moments
- ``models``    flax.linen denoisers: UNet1D (v1) and UNet1DUltimate + fusion
- ``diffusion`` beta schedules, q_sample/loss, lax.scan DDPM/DDIM samplers + CFG
- ``training``  optax Adan, EMA, data-parallel pjit train step, ckpt/resume
- ``parallel``  device mesh and sharding helpers
- ``data``      npz schema, dataset reader/batcher, preprocess, split tools
- ``vocoder``   BigVGAN generator in JAX (anti-aliased Snake activation)
- ``eval``      mel-domain and wav-domain metrics (MSE/SSIM/FAD/NDB/beat/...)
- ``cli``       preprocess / split / train / sample / val / evaluate / towav

Layout convention: everything is channels-last ``(B, T, C)`` — mel frames as
rows, 80 mel bins as the innermost (lane) dimension — so convolutions lower to
MXU-friendly NHC convs and attention needs no transposes, unlike the
reference's channels-first ``(B, 80, T)`` torch layout.
"""

__version__ = "0.1.0"
