"""Int8-vs-bf16 MXU ceiling probe at the flagship serving shapes (ROADMAP
#4 / VERDICT r2 #10 gate: measure the ceiling BEFORE building a quantized
path).

v5e lists 394 int8 TOPS vs 197 bf16 TFLOP/s, but the serving step's
matmuls are small-K ((T, C) x (C, C) with C=256..1024, T=129..516 and
hd=32 attention contractions) — if int8 doesn't approach 2x at THESE
shapes, W8A8 serving cannot pay for its quantize/dequantize VPU work and
the exploration closes here with numbers.

Times chained scans (data dependency via output feedback, distinct inputs
per rep, value-fetch sync — DEVNOTES discipline) of:
  bf16:  y = dot(x_bf16, w_bf16) -> f32
  int8:  y = dot(x_int8, w_int8, preferred_element_type=int32)
plus the int8 path INCLUDING per-step activation quantization (abs-max
scale + round + cast) — the honest serving cost.

Usage: python scripts/probe_int8_matmul.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 3000

# (rows, K, N): the six resblock conv-tap shapes (2-row CFG pair merged in
# the kernel = T rows per matmul) + the B=8 serving variants (16T rows) +
# the attention score/AV contraction (hd=32).
SHAPES = [
    ("conv 516x256x256 (B=1)", 516, 256, 256),
    ("conv 258x512x512", 258, 512, 512),
    ("conv 129x1024x1024", 129, 1024, 1024),
    ("conv 8256x256x256 (B=8)", 8256, 256, 256),
    ("conv 2064x1024x1024 (B=8)", 2064, 1024, 1024),
    ("attn qk 516x32x516", 516, 32, 516),
    ("proj 516x256x2048", 516, 256, 2048),
]


def chain(fn, x0, w):
    @jax.jit
    def run(x, w):
        def body(c, _):
            y = fn(c, w)
            # feed a cheap projection of y back so iterations serialize
            c2 = (c + y[:1, :1].astype(c.dtype) * 1e-30) if c.ndim == 2 else c
            return c2, ()
        c, _ = jax.lax.scan(body, x, None, length=ITERS)
        return c
    return run


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}; iters={ITERS}")
    key = jax.random.key(0)
    for name, m, k, n in SHAPES:
        kx, kw = jax.random.split(jax.random.fold_in(key, m * n))
        x = jax.random.normal(kx, (m, k), jnp.float32)
        w = jax.random.normal(kw, (k, n), jnp.float32)
        flops = 2 * m * k * n * ITERS

        variants = {}

        def bf16_dot(c, wq):
            return jnp.dot(c.astype(jnp.bfloat16), wq,
                           preferred_element_type=jnp.float32)

        variants["bf16"] = (bf16_dot, x, w.astype(jnp.bfloat16))

        def int8_dot(c, wq):
            return jnp.dot(c.astype(jnp.int8), wq,
                           preferred_element_type=jnp.int32).astype(jnp.float32)

        xq = jnp.clip(x * 16.0, -127, 127).astype(jnp.int8).astype(jnp.float32)
        wq8 = jnp.clip(w * 16.0, -127, 127).astype(jnp.int8)
        variants["int8 (pre-quant acts)"] = (int8_dot, xq, wq8)

        def int8_dyn(c, wq):
            s = 127.0 / (jnp.max(jnp.abs(c)) + 1e-6)
            cq = jnp.round(c * s).astype(jnp.int8)
            y = jnp.dot(cq, wq, preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) / s

        variants["int8 +dyn act quant"] = (int8_dyn, x, wq8)

        out = [name]
        for vname, (fn, x0, wv) in variants.items():
            run = chain(fn, x0, wv)
            float(jnp.abs(run(x0, wv)).sum())  # warm
            best = float("inf")
            for rep in range(3):
                xr = x0 * (1.0 + 1e-3 * (rep + 1))
                t0 = time.perf_counter()
                o = run(xr, wv)
                float(jnp.abs(o).sum())
                best = min(best, time.perf_counter() - t0)
            tput = flops / best / 1e12
            out.append(f"{vname}: {best / ITERS * 1e6:6.2f} us "
                       f"({tput:6.1f} T/s)")
        print("  " + " | ".join(out), flush=True)


if __name__ == "__main__":
    main()
