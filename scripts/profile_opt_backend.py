"""A/B the optimizer backends on the real chip: XLA per-leaf fusions vs the
bucketed multi-ref Pallas clip+Adan+EMA kernel (ops/pallas_opt.py).

Times the FULL production step (bs16, T=516, bf16 activations, device-data
K-step chains) for both backends INTERLEAVED (A,B,A,B with distinct inputs
per rep — DEVNOTES: first-run numbers and isolated opt legs are artifacts;
only converged interleaved full-step deltas count), plus the isolated
opt-only chains for diagnosis.

Usage: python scripts/profile_opt_backend.py [K] [reps] [fp32|bf16]
       [pallas_big|xla_big]
"""

import dataclasses
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.core.config import LM2AConfig  # noqa: E402
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser  # noqa: E402
from lm2a_tpu.diffusion.schedule import make_schedule  # noqa: E402
from lm2a_tpu.training.train_step import (  # noqa: E402
    TrainState,
    init_train_state,
    make_device_data_multistep,
    make_pallas_opt_fn,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
OPT_DTYPE = sys.argv[3] if len(sys.argv) > 3 else "fp32"
BIG = sys.argv[4] if len(sys.argv) > 4 else "pallas_big"
B, T, N = 16, 516, 64


def synth_data(key):
    km, ko, kl = jax.random.split(key, 3)
    return {
        "mel": jax.random.normal(km, (N, T, 80), jnp.float32),
        "motion": jax.random.normal(ko, (N, T, 234), jnp.float32),
        "lyrics": jax.random.normal(kl, (N, T, 768), jnp.float32),
    }


def time_call(fn, args, label):
    t0 = time.perf_counter()
    out = fn(*args)
    state, losses = out
    # value fetch ends the timed region (block_until_ready lies, DEVNOTES)
    s = float(jnp.abs(losses).sum())
    dt = (time.perf_counter() - t0) * 1e3 / K
    print(f"  {label}: {dt:8.2f} ms/step (chk {s:.4f})", flush=True)
    return dt, state


def main():
    base = LM2AConfig()
    if OPT_DTYPE == "bf16":
        base = dataclasses.replace(
            base, train=dataclasses.replace(base.train, opt_dtype="bfloat16"))
    cfgs = {
        "xla": base,
        "pallas": dataclasses.replace(
            base, train=dataclasses.replace(
                base.train, opt_backend="pallas",
                opt_big_backend="pallas" if BIG == "pallas_big" else "xla")),
    }
    print(f"K={K} reps={REPS} opt_dtype={OPT_DTYPE} big={BIG}", flush=True)

    denoiser = build_denoiser(base.model, base.train.compute_dtype)
    cond_proj = build_cond_projection(base.model, base.train.compute_dtype)
    schedule = make_schedule(base.diffusion)
    state, tx = init_train_state(denoiser, cond_proj, base,
                                 jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.1f}M", flush=True)

    data = synth_data(jax.random.PRNGKey(1))
    idx = jax.random.randint(jax.random.PRNGKey(2), (K, B), 0, N)
    offsets = jnp.arange(K, dtype=jnp.int32)

    steps = {
        name: make_device_data_multistep(denoiser, cond_proj, schedule, cfg,
                                         tx)
        for name, cfg in cfgs.items()
    }

    # isolated opt-only chains (diagnostic; unstable through the tunnel)
    pal_fn = make_pallas_opt_fn(cfgs["pallas"])

    @partial(jax.jit, donate_argnums=0)
    def opt_chain_pallas(st, grads):
        def body(s, _):
            p, e, o = pal_fn(s.params, s.ema_params, s.opt_state, grads)
            return TrainState(step=s.step + 1, params=p, ema_params=e,
                              opt_state=o), s.step + 0.0
        return jax.lax.scan(body, st, None, length=K)

    @partial(jax.jit, donate_argnums=0)
    def opt_chain_xla(st, grads):
        import optax

        def body(s, _):
            updates, o = tx.update(grads, s.opt_state, s.params)
            p = optax.apply_updates(s.params, updates)
            e = jax.tree.map(
                lambda a, b: a * base.train.ema_decay
                + b * (1 - base.train.ema_decay), s.ema_params, p)
            return TrainState(step=s.step + 1, params=p, ema_params=e,
                              opt_state=o), s.step + 0.0
        return jax.lax.scan(body, st, None, length=K)

    # warm both compiled steps once (compile + first-run inflation burn-off)
    warm_states = {n: jax.tree.map(jnp.copy, state) for n in steps}
    for name, fn in steps.items():
        print(f"compile+warm {name} ...", flush=True)
        _, warm_states[name] = time_call(
            fn, (warm_states[name], data, idx, jax.random.PRNGKey(7),
                 offsets), f"warm {name}")

    results = {n: [] for n in steps}
    for rep in range(REPS):
        for name in ("xla", "pallas"):
            dt, warm_states[name] = time_call(
                steps[name],
                (warm_states[name], data, idx,
                 jax.random.PRNGKey(100 + 10 * rep), offsets + rep),
                f"rep{rep} full {name}")
            results[name].append(dt)

    if __import__("os").environ.get("LM2A_OPT_ISOLATED", "0") != "1":
        import numpy as np

        for name, vals in results.items():
            print(f"{name}: median {np.median(vals):.2f} ms/step "
                  f"(all {['%.2f' % v for v in vals]})")
        return
    del warm_states  # each state tree is ~3.2 GB; free before more copies
    print("\nisolated opt chains (diagnostic):", flush=True)
    for name, chain in (("xla", opt_chain_xla), ("pallas", opt_chain_pallas)):
        st = jax.tree.map(jnp.copy, state)
        grads = jax.tree.map(lambda p: jnp.full_like(p, 1e-6), state.params)
        t0 = time.perf_counter()
        st2, out = chain(st, grads)
        _ = float(jnp.abs(out).sum())
        print(f"  warm opt {name}: {(time.perf_counter()-t0)*1e3/K:.2f}",
              flush=True)
        for r in range(2):
            st2g = jax.tree.map(lambda p: jnp.full_like(p, 1e-6 * (r + 2)),
                                state.params)
            t0 = time.perf_counter()
            st2, out = chain(st2, st2g)
            _ = float(jnp.abs(out).sum())
            print(f"  opt {name} rep{r}: {(time.perf_counter()-t0)*1e3/K:.2f} "
                  f"ms/step", flush=True)

    import numpy as np

    for name, vals in results.items():
        print(f"{name}: median {np.median(vals):.2f} ms/step "
              f"(all {['%.2f' % v for v in vals]})")


if __name__ == "__main__":
    main()
