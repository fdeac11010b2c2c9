"""Apportion the flagship train step (bs16, T=516, bf16): where do 41.7 ms go?

Measures, as K-step chained scans on device-resident data (the honest
timing shape through the axon tunnel, DEVNOTES.md):

  fwd      — loss forward only
  fwdbwd   — value_and_grad, optimizer skipped
  opt      — clip+Adan+EMA applied to a fixed grad tree
  full     — the production step (fwd+bwd+clip+Adan+EMA)

plus XLA cost-analysis FLOPs of the forward and full step, parameter count,
and the implied MFU / HBM-traffic numbers. Serving reaches 73% MFU; this
locates the training gap (bwd efficiency vs optimizer bandwidth).

Usage: python scripts/profile_train_breakdown.py [K] [reps] [fp32|bf16]

The optional third arg sets ``TrainConfig.opt_dtype`` (storage dtype of the
Adan moment trees) for the before/after of the bf16-optimizer-state lever.
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.core.config import LM2AConfig  # noqa: E402
from lm2a_tpu.diffusion.schedule import make_schedule  # noqa: E402
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser  # noqa: E402
from lm2a_tpu.training.train_step import (  # noqa: E402
    TrainState,
    _loss,
    init_train_state,
    make_device_data_multistep,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
B, T, N = 16, 516, 64
PEAK_TFLOPS = 197.0  # v5e bf16
HBM_GBPS = 819.0


def synth_data(key):
    km, ko, kl = jax.random.split(key, 3)
    return {
        "mel": jax.random.normal(km, (N, T, 80), jnp.float32),
        "motion": jax.random.normal(ko, (N, T, 234), jnp.float32),
        "lyrics": jax.random.normal(kl, (N, T, 768), jnp.float32),
    }


def median_chain(fn, args_fn, label, thread_state=False):
    """fn is jitted; args_fn(rep) -> args. Times REPS chains, median.

    ``thread_state=True`` marks fns that DONATE their first argument and
    return the new state first: the returned state is threaded into the next
    rep's args (reusing the original reads donated buffers — the crash that
    killed the first run of this script).
    """
    out = fn(*args_fn(-1))  # compile + warm (discarded: first-run trap)
    state = out[0] if thread_state else None
    jax.tree.map(lambda x: x.block_until_ready(), out)
    times = []
    for r in range(REPS):
        a = args_fn(r)
        if thread_state:
            a = (state,) + a[1:]
        t0 = time.perf_counter()
        out = fn(*a)
        # value fetch, not block_until_ready (DEVNOTES trap)
        leaves = jax.tree.leaves(out)
        float(jnp.abs(leaves[-1]).sum())
        times.append(time.perf_counter() - t0)
        if thread_state:
            state = out[0]
    ms = sorted(times)[len(times) // 2] / K * 1e3
    print(f"{label:>7}: {ms:8.2f} ms/step   (reps {['%.1f' % (t/K*1e3) for t in times]})",
          flush=True)
    return ms


def main():
    cfg = LM2AConfig()
    opt_dtype = sys.argv[3] if len(sys.argv) > 3 else "fp32"
    if opt_dtype == "bf16":
        import dataclasses
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, opt_dtype="bfloat16"))
        print("opt_dtype: bfloat16 Adan moments", flush=True)
    denoiser = build_denoiser(cfg.model, cfg.train.compute_dtype)
    cond_proj = build_cond_projection(cfg.model, cfg.train.compute_dtype)
    schedule = make_schedule(cfg.diffusion)
    state, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.PRNGKey(0))
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    print(f"params: {n_params/1e6:.1f}M", flush=True)

    data = synth_data(jax.random.PRNGKey(1))
    idx = jax.random.randint(jax.random.PRNGKey(2), (K, B), 0, N)
    offsets = jnp.arange(K, dtype=jnp.int32)

    loss_kw = dict(
        denoiser=denoiser, cond_proj=cond_proj, schedule=schedule,
        cond_drop_prob=cfg.train.cond_drop_prob,
        dataset_mean=0.0, dataset_std=1.0, train=True,
    )

    def gather(idx_k):
        return {k: jnp.take(v, idx_k, axis=0) for k, v in data.items()}

    # ---- fwd only ----
    @jax.jit
    def fwd_chain(params, idx, base_key, offsets):
        def body(carry, inp):
            idx_k, off = inp
            batch = gather(idx_k)
            batch = dict(batch, mel=batch["mel"] + carry * 1e-30)
            loss = _loss(params, batch=batch,
                         key=jax.random.fold_in(base_key, off), **loss_kw)
            return loss, loss
        return jax.lax.scan(body, 0.0, (idx, offsets))[1]

    # ---- fwd+bwd only ----
    @jax.jit
    def fwdbwd_chain(params, idx, base_key, offsets):
        def body(carry, inp):
            idx_k, off = inp
            batch = gather(idx_k)
            batch = dict(batch, mel=batch["mel"] + carry * 1e-30)
            loss_fn = partial(_loss, batch=batch,
                              key=jax.random.fold_in(base_key, off), **loss_kw)
            loss, grads = jax.value_and_grad(loss_fn)(params)
            g0 = jax.tree.leaves(grads)[0]
            return loss + jnp.sum(g0).astype(loss.dtype) * 1e-30, loss
        return jax.lax.scan(body, 0.0, (idx, offsets))[1]

    # ---- optimizer only (fixed grads; donated state like production) ----
    @partial(jax.jit, donate_argnums=0)
    def opt_chain(state, grads):
        def body(st, _):
            updates, opt_state = tx.update(grads, st.opt_state, st.params)
            params = jax.tree.map(lambda p, u: p + u, st.params, updates)
            ema = jax.tree.map(
                lambda e, p: e * cfg.train.ema_decay + p * (1 - cfg.train.ema_decay),
                st.ema_params, params)
            return TrainState(step=st.step + 1, params=params,
                              ema_params=ema, opt_state=opt_state), st.step + 0.0
        return jax.lax.scan(body, state, None, length=K)

    # ---- full production step ----
    full = make_device_data_multistep(denoiser, cond_proj, schedule, cfg, tx)

    # FLOPs via cost analysis (single step, unscanned)
    def one_fwd(params, batch, key):
        return _loss(params, batch=batch, key=key, **loss_kw)

    batch1 = gather(idx[0])
    fl_fwd = jax.jit(one_fwd).lower(
        state.params, batch1, jax.random.PRNGKey(9)).compile().cost_analysis()["flops"]

    def one_step(params, batch, key):
        return jax.value_and_grad(one_fwd)(params, batch, key)

    fl_fb = jax.jit(one_step).lower(
        state.params, batch1, jax.random.PRNGKey(9)).compile().cost_analysis()["flops"]
    print(f"cost-analysis flops: fwd {fl_fwd:.3e}, fwd+bwd {fl_fb:.3e}", flush=True)

    ms_fwd = median_chain(
        fwd_chain,
        lambda r: (state.params, idx, jax.random.PRNGKey(100 + r), offsets + r),
        "fwd")
    ms_fb = median_chain(
        fwdbwd_chain,
        lambda r: (state.params, idx, jax.random.PRNGKey(200 + r), offsets + r),
        "fwdbwd")
    # opt and full both DONATE the state: give each its own device copy, and
    # vary grads per rep (identical inputs hit the relay's dedupe cache —
    # the 0.80 ms "opt" reading of the first run was that artifact).
    opt_state0 = jax.tree.map(jnp.copy, state)
    ms_opt = median_chain(
        opt_chain,
        lambda r: (opt_state0,
                   jax.tree.map(lambda p: jnp.full_like(p, 1e-6 * (r + 2)),
                                state.params)),
        "opt", thread_state=True)
    # created after opt's copy is consumed, to bound peak HBM (each state
    # tree is ~3.2 GB at 134M params)
    full_state0 = jax.tree.map(jnp.copy, state)
    ms_full = median_chain(
        full,
        lambda r: (full_state0, data, idx, jax.random.PRNGKey(300 + r),
                   offsets + r),
        "full", thread_state=True)

    print(f"\nfwd    : {fl_fwd / ms_fwd / 1e9:7.1f} TFLOP/s "
          f"({fl_fwd / ms_fwd / 1e9 / PEAK_TFLOPS * 100:4.1f}% MFU)")
    print(f"fwd+bwd: {fl_fb / ms_fb / 1e9:7.1f} TFLOP/s "
          f"({fl_fb / ms_fb / 1e9 / PEAK_TFLOPS * 100:4.1f}% MFU)")
    bwd_ms = ms_fb - ms_fwd
    print(f"bwd alone ~{bwd_ms:.2f} ms -> {(fl_fb - fl_fwd) / bwd_ms / 1e9:.1f} TFLOP/s")
    # Adan: read m,v,n,prev_g,params,grads + write m,v,n,prev_g,params; EMA r/w
    sbytes = 2 if opt_dtype == "bf16" else 4  # moment-tree storage dtype
    traffic_gb = n_params * (4 * 5 + sbytes * 8) / 1e9
    print(f"opt    : {ms_opt:.2f} ms vs ~{traffic_gb / HBM_GBPS * 1e3:.2f} ms "
          f"HBM roofline ({traffic_gb:.1f} GB @ {HBM_GBPS:.0f} GB/s)")
    print(f"full   : {ms_full:.2f} ms (fwd+bwd {ms_fb:.2f} + opt {ms_opt:.2f} "
          f"= {ms_fb + ms_opt:.2f})")


if __name__ == "__main__":
    main()
