"""A/B the suspected training-step costs (ROADMAP #1): dropout RNG, CFG-drop
RNG, grad-clip's extra pass, and the threefry-vs-rbg generator.

Each variant is the FULL production step (``make_device_data_multistep``,
bs16, T=516, bf16, device-resident data) with exactly one knob changed:

  base    — production defaults (dropout 0.1, cond_drop 0.2, clip 1.0, threefry)
  nodrop  — model dropout = 0.0 (no mask RNG, no mask apply, fwd+bwd)
  nocfg   — cond_drop_prob = 0.0
  noclip  — grad_clip off (skips the global-norm pass over the grad tree)
  rbg     — same program, but the base key is a typed ``rbg`` key, so every
            split/fold_in/bernoulli inside uses the cheap generator

Measurement discipline per DEVNOTES.md: chained scans, a value fetch to
sync, distinct inputs per rep, variants interleaved round-robin and the
first post-compile run discarded.

Round-5 additions (VERDICT r4 #5 — attribute the 1.9-2.1 ms/row
batch-scaling margin): ``B`` is now an argument (run at 16 AND 32 and
difference the per-row costs), plus two variants aimed at the bwd
activation-traffic suspect:

  remat   — rematerialize residual blocks in bwd (ModelConfig.remat): stored
            activations shrink to block boundaries, bwd recomputes the
            block forward — if the margin is activation HBM traffic, remat
            trades it for FLOPs and the delta bounds the traffic share
  fp32act — compute_dtype float32: doubles every activation's HBM footprint
            (params stay fp32 either way); the bs-scaling of the delta
            reads the per-row activation-traffic slope directly

Usage: python scripts/profile_train_levers.py [K] [reps] [B] [variants]
``variants``: comma list to run (default all); ``base`` is always included.
Cold compiles through the relay cost minutes per program — trim the set
when only some knobs are in question (e.g. ``base,nodrop,remat,fp32act``).
"""

import dataclasses
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.core.config import LM2AConfig  # noqa: E402
from lm2a_tpu.diffusion.schedule import make_schedule  # noqa: E402
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser  # noqa: E402
from lm2a_tpu.training.train_step import (  # noqa: E402
    init_train_state,
    make_device_data_multistep,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
B = int(sys.argv[3]) if len(sys.argv) > 3 else 16
ONLY = set(sys.argv[4].split(",")) if len(sys.argv) > 4 else None
T, N = 516, 64


def build_variant(cfg: LM2AConfig):
    denoiser = build_denoiser(cfg.model, cfg.train.compute_dtype)
    cond_proj = build_cond_projection(cfg.model, cfg.train.compute_dtype)
    schedule = make_schedule(cfg.diffusion)
    state, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.PRNGKey(0))
    fn = make_device_data_multistep(denoiser, cond_proj, schedule, cfg, tx)
    return fn, state


def main():
    import dataclasses as _dc

    base = LM2AConfig()
    base = _dc.replace(base, train=_dc.replace(base.train, batch_size=B))
    print(f"batch_size={B} K={K} reps={REPS}", flush=True)
    variants = {
        "base": base,
        "nodrop": dataclasses.replace(
            base, model=dataclasses.replace(base.model, dropout=0.0)),
        "nocfg": dataclasses.replace(
            base, train=dataclasses.replace(base.train, cond_drop_prob=0.0)),
        "noclip": dataclasses.replace(
            base, train=dataclasses.replace(base.train, grad_clip=0.0)),
        # Serving's exact-math attention fold, applied to the TRAINING step:
        # merged Q matmul + branch-stacked score/AV einsums. The hoisting win
        # doesn't exist here (weights change every step) but the larger
        # matmuls might still pay at bs16.
        "foldattn": dataclasses.replace(
            base, model=dataclasses.replace(base.model, folded_attention=True)),
        "remat": dataclasses.replace(
            base, model=dataclasses.replace(base.model, remat=True)),
        "fp32act": dataclasses.replace(
            base, train=dataclasses.replace(
                base.train, compute_dtype="float32")),
    }
    if ONLY is not None:
        variants = {k: v for k, v in variants.items()
                    if k == "base" or k in ONLY}

    km, ko, kl = jax.random.split(jax.random.PRNGKey(1), 3)
    data = {
        "mel": jax.random.normal(km, (N, T, 80), jnp.float32),
        "motion": jax.random.normal(ko, (N, T, 234), jnp.float32),
        "lyrics": jax.random.normal(kl, (N, T, 768), jnp.float32),
    }
    idx = jax.random.randint(jax.random.PRNGKey(2), (K, B), 0, N)
    offsets = jnp.arange(K, dtype=jnp.int32)

    def measure(name, cfg, key_impl, cycle):
        """Build, warm (discarded), time REPS chains, tear down.

        One variant lives on device at a time: each TrainState tree is
        ~3.2 GB at 134M params, so holding all variants at once would OOM
        the 16 GB chip. The step fn donates the state, so the returned
        state is threaded into the next rep (reusing the original reads
        donated buffers — the crash that killed the first breakdown run).
        """
        fn, state = build_variant(cfg)
        ts = []
        for rep in range(-1, REPS):
            seed = 1000 + rep + 100 * cycle
            key = (jax.random.PRNGKey(seed) if key_impl is None
                   else jax.random.key(seed, impl=key_impl))
            t0 = time.perf_counter()
            st, losses = fn(state, data, idx, key, offsets + rep)
            float(jnp.abs(losses).sum())  # value-fetch sync (DEVNOTES)
            state = st
            dt = time.perf_counter() - t0
            if rep == -1:
                print(f"  warm {name:>8}: {dt/K*1e3:8.2f} ms/step (discarded)",
                      flush=True)
            else:
                ts.append(dt)
        del state, fn
        jax.clear_caches()
        return ts

    # Two full cycles over the variants; only cycle 2 counts (compiles are
    # then persistent-cache-warm and tunnel drift shows up as a base shift).
    times = {}
    for cycle in (1, 2):
        print(f"--- cycle {cycle} ---", flush=True)
        for name, cfg in variants.items():
            times[name] = measure(name, cfg, None, cycle)
            ms = sorted(times[name])[len(times[name]) // 2] / K * 1e3
            print(f"  {name:>8}: {ms:8.2f} ms/step  "
                  f"[{', '.join(f'{t/K*1e3:.2f}' for t in times[name])}]",
                  flush=True)
        if ONLY is None or "rbg" in ONLY:
            times["rbg"] = measure("rbg", base, "rbg", cycle)
            ms = sorted(times["rbg"])[len(times["rbg"]) // 2] / K * 1e3
            print(f"  {'rbg':>8}: {ms:8.2f} ms/step  "
                  f"[{', '.join(f'{t/K*1e3:.2f}' for t in times['rbg'])}]",
                  flush=True)

    base_ms = sorted(times["base"])[len(times["base"]) // 2] / K * 1e3
    print(f"\ncycle-2 deltas vs base ({base_ms:.2f} ms):")
    for name, ts in times.items():
        if name == "base":
            continue
        ms = sorted(ts)[len(ts) // 2] / K * 1e3
        print(f"  {name:>8}: {ms - base_ms:+6.2f} ms "
              f"({(base_ms - ms) / base_ms * 100:+.1f}% saved)")


if __name__ == "__main__":
    main()
