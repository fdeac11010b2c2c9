#!/usr/bin/env python3
"""On-hardware learning demo: overfit the flagship model on synthetic clips.

Builds 16 structured synthetic clips (mel patterns deterministically derived
from their motion conditions), trains the production 134M-param UNet for
N steps on one chip, then samples with clip 0's conditions and reports:

- the train-loss trajectory (eps-MSE starts ~1.0 for an untrained model),
- the correlation between the generated mel and the conditioning clip's
  ground-truth mel (vs. the correlation against a mismatched clip).

Uses the same shapes/constants as bench.py so the persistent compile cache
is reused. Run: ``python scripts/demo_overfit.py [steps]``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.core.config import LM2AConfig  # noqa: E402
from lm2a_tpu.core.mesh import make_mesh, shard_batch  # noqa: E402
from lm2a_tpu.diffusion import ddpm_sample, make_schedule  # noqa: E402
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser  # noqa: E402
from lm2a_tpu.training import init_train_state, make_train_step  # noqa: E402

MEAN, STD = -4.6, 1.86  # bench-matching constants (compile-cache reuse)


def synth_clips(n=16, t=516, seed=0):
    """Mels with structure a conditional model can learn from motion."""
    rng = np.random.default_rng(seed)
    motions = rng.normal(size=(n, t, 234)).astype(np.float32)
    lyrics = rng.normal(size=(n, t, 768)).astype(np.float32)
    mels = np.zeros((n, t, 80), dtype=np.float32)
    freqs = np.arange(80)[None, :]
    for i in range(n):
        # slow per-clip melody line driven by the motion track
        line = 40 + 30 * np.tanh(motions[i, :, :3].mean(axis=1))  # (t,)
        envelope = np.exp(-0.5 * ((freqs - line[:, None]) / 6.0) ** 2)
        mels[i] = MEAN + STD * (2.0 * envelope - 1.0)
    return mels, motions, lyrics


def main(steps=1000):
    cfg = LM2AConfig()
    mesh = make_mesh()
    denoiser = build_denoiser(cfg.model, "bfloat16")
    cond_proj = build_cond_projection(cfg.model, "bfloat16")
    schedule = make_schedule(cfg.diffusion)

    state, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.key(0))
    from lm2a_tpu.training.train_step import make_multistep_train_step

    # fused dispatch (DEVNOTES): K steps per call, 65 ms/step wall vs
    # 0.4-6 s/step for per-step dispatch through the relay
    K = 50
    multistep = make_multistep_train_step(
        denoiser, cond_proj, schedule, cfg, tx, mesh=mesh,
        dataset_mean=MEAN, dataset_std=STD,
    )
    _ = make_train_step  # single-step variant available for comparison

    mels, motions, lyrics = synth_clips()
    batch = {"mel": mels, "motion": motions, "lyrics": lyrics}
    stacked = shard_batch(mesh, {k: np.stack([v] * K) for k, v in batch.items()})

    losses = []
    t0 = time.time()
    root = jax.random.key(1)
    for i in range(0, steps, K):
        offsets = jnp.arange(i, i + K, dtype=jnp.int32)
        state, loss_vec = multistep(state, stacked, root, offsets)
        losses.append((i + K - 1, float(jax.device_get(loss_vec[-1]))))
        print(f"step {losses[-1][0]}: loss {losses[-1][1]:.4f}", flush=True)
    print(f"{steps} steps in {time.time() - t0:.1f}s")

    # sample with clip 0's conditions (CFG 2.1, full 1000-step chain)
    params = {"params": state.params["unet"]}
    proj_params = {"params": state.params["cond_proj"]}
    mf, tf = cond_proj.apply(proj_params, jnp.asarray(motions[:1]),
                             jnp.asarray(lyrics[:1]))

    def model_fn(x, t, m, l):
        return denoiser.apply(params, x, t, m, l)

    out = ddpm_sample(model_fn, schedule, jax.random.key(2), (1, 516, 80),
                      mf, tf, guidance_weight=2.1)
    gen = np.asarray(out)[0] * STD + MEAN  # (516, 80)

    def corr(a, b):
        a, b = a.ravel() - a.mean(), b.ravel() - b.mean()
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))

    c_match = corr(gen, mels[0])
    c_mismatch = np.mean([corr(gen, mels[j]) for j in range(1, 8)])
    print(f"corr(generated, conditioning clip) = {c_match:.3f}")
    print(f"corr(generated, other clips, mean) = {c_mismatch:.3f}")
    print(f"loss: start {losses[0][1]:.3f} -> end {losses[-1][1]:.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1000)
