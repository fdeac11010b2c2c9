"""Sequence-parallel sampler: sharded-T execution matches unsharded math."""

import jax
import jax.numpy as jnp
import numpy as np

from lm2a_tpu.core.config import DiffusionConfig, ModelConfig
from lm2a_tpu.core.mesh import make_mesh
from lm2a_tpu.diffusion import ddpm_sample, make_schedule
from lm2a_tpu.models import build_denoiser
from lm2a_tpu.parallel.sequence import make_sequence_sharded_sampler

CFG = ModelConfig(
    base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
    num_res_blocks=1, mid_blocks=1, attn_heads=2,
)


def test_sequence_sharded_matches_unsharded():
    mesh = make_mesh(model=4)  # (data=2, model=4) over the 8 virtual CPUs
    model = build_denoiser(CFG)
    schedule = make_schedule(DiffusionConfig(timesteps=4))

    B, T = 1, 64  # T divisible by model axis (4)
    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x0 = jax.random.normal(k1, (B, T, 80))
    motion = jax.random.normal(k2, (B, T, CFG.cond_dim))
    text = jax.random.normal(k3, (B, T, CFG.cond_dim))
    params = model.init(k4, x0, jnp.zeros((B,), jnp.int32), motion, text)

    def model_fn(x, t, m, l):
        return model.apply(params, x, t, m, l)

    ref = ddpm_sample(
        model_fn, schedule, jax.random.key(7), (B, T, 80),
        motion, text, guidance_weight=2.0, x_init=x0,
    )

    sampler = make_sequence_sharded_sampler(
        model.apply, schedule, mesh, guidance_weight=2.0, x_init=x0
    )
    out = sampler(params, jax.random.key(7), (B, T, 80), motion, text)

    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )
    assert np.isfinite(np.asarray(out)).all()
