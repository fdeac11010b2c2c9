"""Sequence-parallel sampler: sharded-T execution matches unsharded math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


@pytest.mark.slow
def test_sp_train_step_matches_unsharded():
    """(data=2, model=4) sequence-sharded train step == single-device step."""
    from lm2a_tpu.core.config import LM2AConfig, TrainConfig
    from lm2a_tpu.models.factory import build_cond_projection
    from lm2a_tpu.parallel.sequence import make_sp_train_step
    from lm2a_tpu.training import init_train_state, make_train_step

    cfg = LM2AConfig(
        model=ModelConfig(
            base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
            num_res_blocks=1, mid_blocks=1, attn_heads=2,
            motion_dim=12, text_dim=24,
        ),
        diffusion=DiffusionConfig(timesteps=20),
        train=TrainConfig(batch_size=4, lr=1e-3, ema_decay=0.9),
    )
    B, T = 4, 32  # B % data(2) == 0, T % model(4) == 0
    denoiser = build_denoiser(cfg.model)
    cond_proj = build_cond_projection(cfg.model)
    schedule = make_schedule(DiffusionConfig(timesteps=20))
    state, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.key(0),
                                 seq_len=T)

    rng = np.random.default_rng(0)
    batch = {
        "mel": rng.normal(size=(B, T, 80)).astype(np.float32),
        "motion": rng.normal(size=(B, T, 12)).astype(np.float32),
        "lyrics": rng.normal(size=(B, T, 24)).astype(np.float32),
    }
    key = jax.random.key(5)

    step_1 = make_train_step(denoiser, cond_proj, schedule, cfg, tx)
    st_a, loss_a = step_1(jax.tree.map(jnp.copy, state), batch, key)

    mesh = make_mesh(model=4)
    step_sp = make_sp_train_step(denoiser, cond_proj, schedule, cfg, tx, mesh)
    with mesh:
        st_b, loss_b = step_sp(jax.tree.map(jnp.copy, state), batch, key)

    assert abs(float(loss_a) - float(loss_b)) < 2e-5 * max(1.0, abs(float(loss_a)))
    wa = np.asarray(st_a.params["unet"]["in_proj"]["kernel"])
    wb = np.asarray(st_b.params["unet"]["in_proj"]["kernel"])
    np.testing.assert_allclose(wa, wb, rtol=1e-4, atol=1e-6)
    ea = np.asarray(st_a.ema_params["unet"]["in_proj"]["kernel"])
    eb = np.asarray(st_b.ema_params["unet"]["in_proj"]["kernel"])
    np.testing.assert_allclose(ea, eb, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_collective_audit_counts_dp_allreduce():
    """The audit sees the gradient all-reduce in the DP step's HLO."""
    from lm2a_tpu.core.config import LM2AConfig, TrainConfig
    from lm2a_tpu.core.mesh import shard_batch
    from lm2a_tpu.models.factory import build_cond_projection
    from lm2a_tpu.parallel.audit import audit
    from lm2a_tpu.training import init_train_state, make_train_step

    cfg = LM2AConfig(
        model=ModelConfig(
            base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
            num_res_blocks=1, mid_blocks=1, attn_heads=2,
            motion_dim=12, text_dim=24,
        ),
        diffusion=DiffusionConfig(timesteps=20),
        train=TrainConfig(batch_size=8, lr=1e-3, ema_decay=0.9),
    )
    B, T = 8, 32
    denoiser = build_denoiser(cfg.model)
    cond_proj = build_cond_projection(cfg.model)
    schedule = make_schedule(DiffusionConfig(timesteps=20))
    state, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.key(0),
                                 seq_len=T)
    mesh = make_mesh()  # pure 8-way data parallel
    step = make_train_step(denoiser, cond_proj, schedule, cfg, tx, mesh=mesh)
    rng = np.random.default_rng(0)
    batch = shard_batch(mesh, {
        "mel": rng.normal(size=(B, T, 80)).astype(np.float32),
        "motion": rng.normal(size=(B, T, 12)).astype(np.float32),
        "lyrics": rng.normal(size=(B, T, 24)).astype(np.float32),
    })
    report = audit(step, state, batch, jax.random.key(1))
    assert report["collectives"].get("all-reduce", 0) >= 1
    assert report["collectives"].get("all-gather", 0) == 0  # DP needs none
