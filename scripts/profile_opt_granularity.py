"""Is the optimizer tail kernel-granularity-bound, not bandwidth-bound?

The full train step carries a ~21.7 ms (fp32) / ~18.6 ms (bf16 moments)
optimizer+EMA tail vs an 8.5 / 5.9 ms HBM roofline, and the audit
(`audit_trainstep_memory.py`) shows 658 fusions in the while body — mostly
per-leaf Adan/EMA elementwise kernels over the ~250-leaf 134M-param tree.
This A/Bs the SAME optimizer math at two tree granularities:

  tree — clip+Adan+EMA over the real flagship param tree (production)
  flat — identical math over ONE concatenated 134M-element vector

as K-step donated chains, interleaved reps (DEVNOTES discipline), distinct
grads per rep. If flat ~= roofline and tree is 2x+ slower, the fix is a
flat-buffer optimizer adapter, not more bandwidth work.

Usage: python scripts/profile_opt_granularity.py [K] [reps] [fp32|bf16]
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
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser  # noqa: E402
from lm2a_tpu.training.train_step import (  # noqa: E402
    TrainState,
    init_train_state,
    make_optimizer,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
HBM_GBPS = 819.0


def main():
    cfg = LM2AConfig()
    if len(sys.argv) > 3 and sys.argv[3] == "bf16":
        import dataclasses
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, opt_dtype="bfloat16"))
        print("bf16 Adan moments", flush=True)
    denoiser = build_denoiser(cfg.model, cfg.train.compute_dtype)
    cond_proj = build_cond_projection(cfg.model, cfg.train.compute_dtype)
    state, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree.leaves(state.params))
    n_leaves = len(jax.tree.leaves(state.params))
    print(f"params: {n/1e6:.1f}M in {n_leaves} leaves", flush=True)

    def make_chain(tx):
        @partial(jax.jit, donate_argnums=0)
        def chain(st, grads):
            def body(st, _):
                updates, opt_state = tx.update(grads, st.opt_state, st.params)
                params = jax.tree.map(lambda p, u: p + u, st.params, updates)
                ema = jax.tree.map(
                    lambda e, p: e * cfg.train.ema_decay
                    + p * (1 - cfg.train.ema_decay),
                    st.ema_params, params)
                return TrainState(step=st.step + 1, params=params,
                                  ema_params=ema, opt_state=opt_state), st.step + 0.0
            return jax.lax.scan(body, st, None, length=K)
        return chain

    # --- tree variant: production state ---
    tree_chain = make_chain(tx)
    tree_state = state

    # --- flat variant: one 134M vector, same math ---
    flat_params = {"w": jnp.concatenate(
        [x.reshape(-1) for x in jax.tree.leaves(state.params)])}
    flat_state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=flat_params,
        ema_params=jax.tree.map(jnp.copy, flat_params),
        opt_state=tx.init(flat_params),
    )
    flat_chain = make_chain(tx)

    def tree_grads(r):
        return jax.tree.map(lambda p: jnp.full_like(p, 1e-6 * (r + 2)),
                            state.params)

    def flat_grads(r):
        return {"w": jnp.full((n,), 1e-6 * (r + 2), jnp.float32)}

    # compile + warm both (first-run trap: discard)
    out_t = tree_chain(tree_state, tree_grads(-1))
    tree_state = out_t[0]
    float(jnp.abs(out_t[1]).sum())
    out_f = flat_chain(flat_state, flat_grads(-1))
    flat_state = out_f[0]
    float(jnp.abs(out_f[1]).sum())

    times = {"tree": [], "flat": []}
    for r in range(REPS):
        for name in ("tree", "flat"):
            if name == "tree":
                args, st = tree_grads(r), tree_state
                fn = tree_chain
            else:
                args, st = flat_grads(r), flat_state
                fn = flat_chain
            t0 = time.perf_counter()
            st, ticks = fn(st, args)
            float(jnp.abs(ticks).sum())  # value-fetch sync
            dt = time.perf_counter() - t0
            times[name].append(dt)
            if name == "tree":
                tree_state = st
            else:
                flat_state = st
        print(f"rep {r}: tree {times['tree'][-1]/K*1e3:6.2f} ms  "
              f"flat {times['flat'][-1]/K*1e3:6.2f} ms", flush=True)

    sbytes = 2 if (len(sys.argv) > 3 and sys.argv[3] == "bf16") else 4
    roofline_ms = n * (4 * 5 + sbytes * 8) / 1e9 / HBM_GBPS * 1e3
    for name, ts in times.items():
        ms = sorted(ts)[len(ts) // 2] / K * 1e3
        print(f"{name}: median {ms:.2f} ms/step "
              f"(roofline ~{roofline_ms:.2f} ms)")


if __name__ == "__main__":
    main()
