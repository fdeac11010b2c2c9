#!/usr/bin/env python3
"""Count the collectives GSPMD inserts for each parallelism mode.

Runs on the 8-device virtual CPU mesh (no TPU needed): compiles the train
step / sampler under each sharding layout and reports the collective-op
census from the optimized HLO (``lm2a_tpu.parallel.audit``). This is the
measurement VERDICT r1 #9 asked for — layout decisions (e.g. column-
parallel-everywhere TP) justified by what XLA actually inserts, recorded in
``docs/SCALING.md``.

The model topology matches the flagship (same depth/mults/attention sites);
width is scaled down (base 64) so the virtual-mesh compile stays in minutes
— collective COUNTS depend on graph structure, not layer width.

Usage: ``python scripts/audit_collectives.py [--full]``
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from lm2a_tpu.core.config import (  # noqa: E402
    DiffusionConfig,
    LM2AConfig,
    ModelConfig,
    TrainConfig,
)
from lm2a_tpu.core.mesh import make_mesh, shard_batch  # noqa: E402
from lm2a_tpu.diffusion.schedule import make_schedule  # noqa: E402
from lm2a_tpu.models.factory import (  # noqa: E402
    build_cond_projection,
    build_denoiser,
)
from lm2a_tpu.parallel.audit import audit  # noqa: E402
from lm2a_tpu.training import init_train_state, make_train_step  # noqa: E402


def flagship_topology(base_dim=64):
    return LM2AConfig(
        model=ModelConfig(base_dim=base_dim, cond_dim=64, time_emb_dim=64),
        diffusion=DiffusionConfig(timesteps=50),
        train=TrainConfig(batch_size=8, steps_per_call=1),
    )


def make_batch(b, t, cfg, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "mel": rng.normal(size=(b, t, 80)).astype(np.float32),
        "motion": rng.normal(size=(b, t, cfg.model.motion_dim)).astype(np.float32),
        "lyrics": rng.normal(size=(b, t, cfg.model.text_dim)).astype(np.float32),
    }


def main():
    cfg = flagship_topology()
    B, T = 8, 64
    denoiser = build_denoiser(cfg.model)
    cond_proj = build_cond_projection(cfg.model)
    schedule = make_schedule(cfg.diffusion)
    state, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.key(0),
                                 seq_len=T)
    key = jax.random.key(1)
    results = {}

    def report(name, rep):
        results[name] = rep
        print(f"{name}: total={rep['total']} {rep['collectives']}", flush=True)

    # 1. pure data parallelism (the workload's required mode)
    mesh = make_mesh()  # (data=8, model=1)
    step = make_train_step(denoiser, cond_proj, schedule, cfg, tx, mesh=mesh)
    report("dp8_train", audit(step, state, shard_batch(mesh, make_batch(B, T, cfg)), key))

    # 2. tensor parallelism (column-parallel everywhere), dp2 x tp4
    from lm2a_tpu.parallel.tensor import make_tp_train_step, shard_state_tp

    mesh_tp = make_mesh(model=4)  # (data=2, model=4)
    tp_step, _ = make_tp_train_step(denoiser, cond_proj, schedule, cfg, tx,
                                    mesh_tp, state)
    placed, _ = shard_state_tp(state, mesh_tp)
    report("dp2_tp4_train",
           audit(tp_step, placed, shard_batch(mesh_tp, make_batch(B, T, cfg)), key))

    # 3. sequence-parallel training, dp2 x sp4
    from lm2a_tpu.parallel.sequence import make_sp_train_step

    sp_step = make_sp_train_step(denoiser, cond_proj, schedule, cfg, tx, mesh_tp)
    with mesh_tp:
        report("dp2_sp4_train",
               audit(sp_step, state, make_batch(B, T, cfg), key))

    # 4. sequence-parallel sampler (serving), sp4
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lm2a_tpu.diffusion.gaussian import ddpm_sample

    seq_sh = NamedSharding(mesh_tp, P(None, "model", None))

    def model_fn(x, t, m, l):
        x = jax.lax.with_sharding_constraint(x, seq_sh)
        return denoiser.apply({"params": state.params["unet"]}, x, t, m, l)

    import functools

    @functools.partial(jax.jit, static_argnums=(1,))
    def sp_sampler(key, shape, motion_f, text_f):
        motion_f = jax.lax.with_sharding_constraint(motion_f, seq_sh)
        text_f = jax.lax.with_sharding_constraint(text_f, seq_sh)
        return ddpm_sample(model_fn, schedule, key, shape, motion_f, text_f,
                           guidance_weight=2.1)

    rng = np.random.default_rng(2)
    mf = rng.normal(size=(1, T, cfg.model.cond_dim)).astype(np.float32)
    lf = rng.normal(size=(1, T, cfg.model.cond_dim)).astype(np.float32)
    with mesh_tp:
        report("sp4_sampler",
               audit(sp_sampler, jax.random.key(3), (1, T, 80), mf, lf))

    print(json.dumps(results))


if __name__ == "__main__":
    main()
