"""On-the-fly sample-quality telemetry during training.

The reference only tracks the diffusion loss while training and measures
mel metrics in a separate post-hoc ``val.py`` pass; this monitor closes the
loop: every N epochs it generates a FIXED set of validation clips from the
EMA weights (DDIM few-step — cheap, deterministic) and logs the same
mel-domain metrics ``val`` reports (``/root/reference/val.py:40-90``
semantics via ``eval/mel_metrics.py``), so quality regressions are visible
during the run, not after it.

The whole generation is ONE jitted scan program (same discipline as
serving); conditions are prepared once at construction. Multi-host: every
process executes the sampler (it may contain collectives on a sharded
mesh); only the primary logs.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lm2a_tpu.diffusion.gaussian import ddim_sample
from lm2a_tpu.eval.mel_metrics import compute_metrics


class QualityMonitor:
    """Periodic EMA-sample quality probe over fixed validation clips."""

    def __init__(
        self,
        denoiser,
        cond_proj,
        schedule,
        val_ds,
        n_clips: int,
        num_steps: int,
        guidance: float,
        dataset_mean: float,
        dataset_std: float,
        mesh=None,
        seed: int = 0,
    ):
        from lm2a_tpu.data.dataset import BatchIterator

        n_clips = min(n_clips, len(val_ds))
        batch = next(iter(BatchIterator(val_ds, n_clips, shuffle=False)))
        self._gt_mel = np.asarray(batch["mel"])  # (K, T, 80) log-mel units
        self._mean, self._std = float(dataset_mean), float(dataset_std)
        self._key = jax.random.key(seed + 777)

        motion = batch["motion"]
        lyrics = batch["lyrics"]
        if mesh is not None and jax.process_count() > 1:
            from lm2a_tpu.core.distributed import put_replicated

            cond = put_replicated(mesh, {"m": motion, "l": lyrics})
            motion, lyrics = cond["m"], cond["l"]

        shape = self._gt_mel.shape  # (K, T, 80)
        mean, std = self._mean, self._std

        @partial(jax.jit, static_argnames=())
        def _generate(ema_params, motion, lyrics, key):
            motion_f, text_f = cond_proj.apply(
                {"params": ema_params["cond_proj"]}, motion, lyrics
            )

            def model_fn(x, t, m, l, **kw):
                return denoiser.apply(
                    {"params": ema_params["unet"]}, x, t, m, l,
                    deterministic=True, **kw,
                )

            x = ddim_sample(
                model_fn, schedule, key, shape, motion_f, text_f,
                num_steps=num_steps, guidance_weight=guidance,
                uncond_fast=True,
            )
            return x * std + mean

        self._generate = _generate
        self._motion, self._lyrics = motion, lyrics

    def run(self, ema_params) -> Dict[str, float]:
        """Generate the fixed clips and return mean mel metrics."""
        gen = np.asarray(jax.device_get(
            self._generate(ema_params, self._motion, self._lyrics, self._key)
        ))
        rows = [
            compute_metrics(self._gt_mel[i].T, gen[i].T)
            for i in range(gen.shape[0])
        ]
        return {
            k: float(np.mean([r[k] for r in rows])) for k in rows[0]
        }
