"""Flat-carry train step: is raveling ONCE per dispatch the granularity fix?

The per-leaf optimizer tail costs 22.3 ms/step vs 11.2 flat
(`profile_opt_granularity.py`), but the flat-ADAPTER step (ravel/unravel
around tx.update EVERY step) measured 51.1 ms vs the per-leaf 39.2 — the
382-piece concat/slice per step is worse than the disease. This measures
the remaining design: the K-step scan CARRIES flat params/ema/moments
(ravel once per dispatch, amortized over K), the forward consumes
``unravel(pflat)`` views, and the backward differentiates w.r.t. the flat
vector itself (grad transpose of the unravel). Optimizer+EMA then run as
pure flat elementwise at roofline.

Prints ms/step for the production per-leaf step and the flat-carry step,
interleaved reps (DEVNOTES discipline).

Usage: python scripts/profile_flatstate_step.py [K] [reps] [fp32|bf16]
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from jax.flatten_util import ravel_pytree  # noqa: E402

from lm2a_tpu.core.config import LM2AConfig  # noqa: E402
from lm2a_tpu.diffusion.schedule import make_schedule  # noqa: E402
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser  # noqa: E402
from lm2a_tpu.training.adan import adan, make_lr_schedule  # noqa: E402
from lm2a_tpu.training.train_step import (  # noqa: E402
    _loss,
    init_train_state,
    make_device_data_multistep,
    make_optimizer,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
B, T, N = 16, 516, 64


def main():
    import dataclasses

    cfg = LM2AConfig()
    opt_dtype = sys.argv[3] if len(sys.argv) > 3 else "fp32"
    if opt_dtype == "bf16":
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, opt_dtype="bfloat16"))
        print("bf16 Adan moments", flush=True)
    # per-leaf baseline = production step with fused_opt off
    cfg_leaf = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, fused_opt=False))

    denoiser = build_denoiser(cfg.model, cfg.train.compute_dtype)
    cond_proj = build_cond_projection(cfg.model, cfg.train.compute_dtype)
    schedule = make_schedule(cfg.diffusion)
    state, tx_leaf = init_train_state(
        denoiser, cond_proj, cfg_leaf, jax.random.PRNGKey(0))

    km, ko, kl = jax.random.split(jax.random.PRNGKey(1), 3)
    data = {
        "mel": jax.random.normal(km, (N, T, 80), jnp.float32),
        "motion": jax.random.normal(ko, (N, T, 234), jnp.float32),
        "lyrics": jax.random.normal(kl, (N, T, 768), jnp.float32),
    }
    idx = jax.random.randint(jax.random.PRNGKey(2), (K, B), 0, N)
    offsets = jnp.arange(K, dtype=jnp.int32)

    leaf_step = make_device_data_multistep(
        denoiser, cond_proj, schedule, cfg_leaf, tx_leaf)

    # ---- flat-carry variant ----
    pflat0, unravel = ravel_pytree(state.params)
    n = pflat0.size
    tc = cfg.train
    lr = make_lr_schedule(tc.lr, tc.lr_decay_steps, tc.lr_decay_factors)
    sd = None if tc.opt_dtype in ("", "float32") else tc.opt_dtype
    tx_flat = adan(lr, weight_decay=tc.weight_decay, state_dtype=sd)
    ema_decay = tc.ema_decay
    clip = tc.grad_clip

    loss_kw = dict(
        denoiser=denoiser, cond_proj=cond_proj, schedule=schedule,
        cond_drop_prob=tc.cond_drop_prob,
        dataset_mean=0.0, dataset_std=1.0, train=True,
    )

    @partial(jax.jit, donate_argnums=0)
    def flat_chain(carry0, data, idx, base_key, offsets):
        def body(carry, inp):
            pflat, eflat, opt_state, step = carry
            idx_k, off = inp
            batch = {k: jnp.take(v, idx_k, axis=0) for k, v in data.items()}
            key = jax.random.fold_in(base_key, off)

            def loss_flat(pf):
                return _loss(unravel(pf), batch=batch, key=key, **loss_kw)

            loss, gflat = jax.value_and_grad(loss_flat)(pflat)
            if clip and clip > 0:
                norm = jnp.sqrt(jnp.sum(gflat * gflat))
                gflat = jnp.where(norm < clip, gflat, gflat / norm * clip)
            updates, opt_state = tx_flat.update(
                {"w": gflat}, opt_state, {"w": pflat})
            pflat = pflat + updates["w"]
            eflat = eflat * ema_decay + pflat * (1 - ema_decay)
            return (pflat, eflat, opt_state, step + 1), loss

        return jax.lax.scan(body, carry0, (idx, offsets))

    def fresh_flat_carry():
        return (jnp.array(pflat0), jnp.array(pflat0),
                tx_flat.init({"w": pflat0}), jnp.zeros((), jnp.int32))

    # compile + warm both, discard first-run readings
    leaf_state = jax.tree.map(jnp.copy, state)
    leaf_state, losses = leaf_step(
        leaf_state, data, idx, jax.random.PRNGKey(50), offsets)
    float(jnp.abs(losses).sum())
    flat_carry = fresh_flat_carry()
    flat_carry, losses = flat_chain(
        flat_carry, data, idx, jax.random.PRNGKey(50), offsets)
    float(jnp.abs(losses).sum())

    times = {"leaf": [], "flat": []}
    for r in range(REPS):
        t0 = time.perf_counter()
        leaf_state, losses = leaf_step(
            leaf_state, data, idx, jax.random.PRNGKey(100 + r), offsets + r)
        float(jnp.abs(losses).sum())
        times["leaf"].append(time.perf_counter() - t0)

        t0 = time.perf_counter()
        flat_carry, losses = flat_chain(
            flat_carry, data, idx, jax.random.PRNGKey(100 + r), offsets + r)
        float(jnp.abs(losses).sum())
        times["flat"].append(time.perf_counter() - t0)
        print(f"rep {r}: leaf {times['leaf'][-1]/K*1e3:6.2f} ms  "
              f"flat {times['flat'][-1]/K*1e3:6.2f} ms", flush=True)

    for name, ts in times.items():
        print(f"{name}: median {sorted(ts)[len(ts)//2]/K*1e3:.2f} ms/step")


if __name__ == "__main__":
    main()
