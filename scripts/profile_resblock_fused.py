"""A/B: fused Pallas resblock kernel vs the XLA module, chained scans.

Per-geometry ms/application at flagship shapes (B=2 CFG serving, bf16).
Usage: python scripts/profile_resblock_fused.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from lm2a_tpu.models.unet1d import ResBlockUltimate, default_num_groups  # noqa: E402
from lm2a_tpu.ops.pallas_resblock import fused_resblock_chain  # noqa: E402

GEOMETRIES = [
    (516, 256, 256, 3),
    (258, 512, 512, 3),
    (129, 1024, 1024, 5),
    (129, 2048, 1024, 1),
    (258, 1024, 512, 1),
    (516, 512, 256, 1),
]


def extract(variables, has_skip):
    p = variables["params"]
    kw = [
        p["gn1"]["scale"], p["gn1"]["bias"],
        p["conv1"]["kernel"], p["conv1"]["bias"],
    ]
    tail = [
        p["gn2"]["scale"], p["gn2"]["bias"],
        p["conv2"]["kernel"], p["conv2"]["bias"],
    ]
    skip = [p["skip"]["kernel"][0], p["skip"]["bias"]] if has_skip else [None, None]
    film = (p["film"]["to_scale_shift"]["kernel"], p["film"]["to_scale_shift"]["bias"])
    return kw, tail, skip, film


def timed(chain, params, x0, iters):
    chain(params, x0).block_until_ready()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        chain(params, x0).block_until_ready()
        times.append(time.perf_counter() - t0)
    return sorted(times)[1] / iters * 1e3


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    B = 2
    key = jax.random.PRNGKey(0)
    print(f"platform={jax.devices()[0].platform} iters={iters}", file=sys.stderr)
    print("T    Cin   Cout  n | xla_ms pallas_ms | speedup")
    tot_x = tot_p = 0.0
    for T, cin, cout, n in GEOMETRIES:
        x = jax.random.normal(key, (B, T, cin), jnp.bfloat16)
        t_emb = jax.random.normal(key, (B, 256), jnp.bfloat16)
        block = ResBlockUltimate(out_channels=cout, dtype=jnp.bfloat16,
                                 use_attn=False, dropout=0.0)
        variables = block.init(key, x, t_emb, None, None)
        g1, g2 = default_num_groups(cin), default_num_groups(cout)
        kw, tail, skip, (fk, fb) = extract(variables, cin != cout)

        def stabilize(y, carry):
            if y.shape != carry.shape:
                reps = -(-carry.shape[-1] // y.shape[-1])
                y = jnp.concatenate([y] * reps, axis=-1)[..., : carry.shape[-1]]
            return y.astype(carry.dtype)

        @jax.jit
        def chain_xla(v, x0):
            def step(c, _):
                y = block.apply(v, c, t_emb, None, None, deterministic=True)
                return stabilize(y, c), ()
            y, _ = jax.lax.scan(step, x0, None, length=iters)
            return y

        @jax.jit
        def chain_pallas(v, x0):
            kw2, tail2, skip2, (fk2, fb2) = extract(v, cin != cout)
            stats = jax.nn.silu(t_emb.astype(jnp.float32)) @ fk2 + fb2
            sc, sh = jnp.split(stats, 2, axis=-1)

            def step(c, _):
                y = fused_resblock_chain(
                    c, *kw2, sc, sh, *tail2, *skip2, groups1=g1, groups2=g2)
                return stabilize(y, c), ()
            y, _ = jax.lax.scan(step, x0, None, length=iters)
            return y

        tx = timed(chain_xla, variables, x, iters)
        kw_probe = fused_resblock_chain(
            x, *kw, jnp.zeros((B, cout)), jnp.zeros((B, cout)), *tail, *skip,
            groups1=g1, groups2=g2)
        if kw_probe is None:  # over VMEM weight budget -> XLA fallback
            tot_x += n * tx
            tot_p += n * tx
            print(f"{T:4d} {cin:5d} {cout:5d} {n:2d} | {tx:7.3f} "
                  f"fallback | (xla)", flush=True)
            continue
        tp = timed(chain_pallas, variables, x, iters)
        tot_x += n * tx
        tot_p += n * tp
        print(f"{T:4d} {cin:5d} {cout:5d} {n:2d} | {tx:7.3f} {tp:8.3f} | "
              f"{tx / tp:6.2f}x", flush=True)
    print(f"\nweighted per-fwd resblock time: xla {tot_x:.3f} ms, "
          f"pallas {tot_p:.3f} ms ({tot_x / tot_p:.2f}x)")


if __name__ == "__main__":
    main()
