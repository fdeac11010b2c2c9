"""Per-component chained-scan breakdown of the BigVGAN vocode path (real TPU).

Times each upsample ConvTranspose and each stage's MRF resblock group in
isolation (5000-iteration chains per DEVNOTES microbench discipline, scaled
down for the big-T stages), to locate where the ~92-114 ms/clip goes after
the polyphase-resampler and fused-sandwich rounds.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import flax.linen as nn  # noqa: E402

from lm2a_tpu.vocoder.bigvgan import AMPBlock1, BIGVGAN_22KHZ_80BAND  # noqa: E402

C = BIGVGAN_22KHZ_80BAND
T0 = 516
FUSED = os.environ.get("FUSED_SANDWICH", "1") == "1"


def chain_time(mod, x, iters):
    params = jax.jit(mod.init)(jax.random.key(0), x)

    @jax.jit
    def chained(p, x0):
        def step(h, _):
            y = mod.apply(p, h)
            # keep shapes fixed: fold y back into an input-shaped carry
            return h + jnp.sum(y).astype(h.dtype) * 1e-30, ()
        return jax.lax.scan(step, x0, None, length=iters)[0]

    float(jnp.abs(chained(params, x)).sum())  # warm
    best = float("inf")
    for i in range(2):
        t0 = time.perf_counter()
        float(jnp.abs(chained(params, x * (1 + 1e-4 * i))).sum())
        best = min(best, time.perf_counter() - t0)
    return best / iters * 1e3


class UpStage(nn.Module):
    ch: int
    k: int
    r: int

    @nn.compact
    def __call__(self, x):
        p = self.k - 1 - (self.k - self.r) // 2
        return nn.ConvTranspose(self.ch, (self.k,), strides=(self.r,),
                                padding=[(p, p)], dtype=jnp.bfloat16)(x)


class MRFStage(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        acc = None
        for j, (rk, dil) in enumerate(
            zip(C.resblock_kernel_sizes, C.resblock_dilation_sizes)
        ):
            y = AMPBlock1(self.ch, rk, tuple(dil), beta=False,
                          logscale=C.snake_logscale, fused=FUSED,
                          dtype=jnp.bfloat16, name=f"rb{j}")(x)
            acc = y if acc is None else acc + y
        return acc / len(C.resblock_kernel_sizes)


def main():
    print(f"fused_sandwich={FUSED}", flush=True)
    t = T0
    ch = C.upsample_initial_channel
    total = 0.0
    for i, (r, k) in enumerate(zip(C.upsample_rates, C.upsample_kernel_sizes)):
        x = jax.random.normal(jax.random.key(i), (1, t, ch), jnp.float32)
        ch //= 2
        iters = max(200, int(2000 * T0 / t))
        ms_up = chain_time(UpStage(ch=ch, k=k, r=r), x, iters)
        t *= r
        x2 = jax.random.normal(jax.random.key(100 + i), (1, t, ch), jnp.float32)
        ms_rb = chain_time(MRFStage(ch=ch), x2, iters)
        total += ms_up + ms_rb
        print(f"stage {i}: T {t//r:>6}->{t:>6} C {ch:>4}  "
              f"up(k{k},s{r}) {ms_up:7.3f} ms   MRF {ms_rb:7.3f} ms", flush=True)
    print(f"sum of stages: {total:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
