"""Resblock fusion headroom: time XLA's full GN+SiLU+conv+FiLM+GN+SiLU+conv
chain against a convs-only chain at every flagship geometry.

The difference bounds what a fused Pallas resblock kernel could reclaim
(the convs are MXU work either way; the rest is reduction barriers,
elementwise kernels, and the HBM round-trips between them). Chained-scan
discipline per DEVNOTES: iteration k+1 consumes iteration k's output, so
the tunnel cannot overlap dispatches.

Usage: python scripts/profile_resblock.py [iters]
"""

import sys
import time

import jax
import jax.numpy as jnp
import flax.linen as nn

sys.path.insert(0, ".")

from lm2a_tpu.models.unet1d import ResBlockUltimate, _group_norm  # noqa: E402

# flagship CFG forward geometries (B=2): (T, Cin, Cout, n_blocks_like_this)
GEOMETRIES = [
    (516, 256, 256, 3),    # down0 x2 + up2 block1
    (258, 512, 512, 3),    # down1 block1 + up1 block1 (+ down1 block0 ~)
    (129, 1024, 1024, 5),  # down2 block1 + mid x3 + up0 block1
    (129, 2048, 1024, 1),  # up0 block0 (post-concat)
    (258, 1024, 512, 1),   # up1 block0 (post-concat)
    (516, 512, 256, 1),    # up2 block0 (post-concat)
]


class ConvsOnly(nn.Module):
    """The two conv3 matmuls alone — the MXU floor of a resblock."""

    out_channels: int
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels, (3,), padding="SAME",
                    dtype=jnp.bfloat16, name="conv1")(x)
        h = nn.Conv(self.out_channels, (3,), padding="SAME",
                    dtype=jnp.bfloat16, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1,), dtype=jnp.bfloat16,
                        name="skip")(x)
        return x + h


class GlueOnly(nn.Module):
    """Everything BUT the convs: gn1+silu, film, gn2+silu (1x1 convs stand in
    for channel changes so the chain stays shape-stable)."""

    out_channels: int

    @nn.compact
    def __call__(self, x, t_emb):
        h = _group_norm(x.shape[-1], jnp.bfloat16, "gn1")(x)
        h = nn.silu(h)
        if x.shape[-1] != self.out_channels:
            h = nn.Conv(self.out_channels, (1,), dtype=jnp.bfloat16,
                        name="chan")(h)
        scale = nn.Dense(self.out_channels, dtype=jnp.bfloat16,
                         name="fs")(t_emb)[:, None, :]
        h = h * (1.0 + scale)
        h = _group_norm(self.out_channels, jnp.bfloat16, "gn2")(h)
        h = nn.silu(h)
        return h


def timed_chain(fn, params, x0, extra, iters):
    """Median-of-3 chained-scan seconds for `iters` applications."""

    def step(carry, _):
        y = fn(params, carry, *extra)
        # keep the chain shape-stable for channel-changing blocks
        if y.shape != carry.shape:
            reps = carry.shape[-1] // y.shape[-1]
            y = jnp.concatenate([y] * reps, axis=-1)[..., : carry.shape[-1]]
        return y, ()

    @jax.jit
    def chain(p, x):
        y, _ = jax.lax.scan(lambda c, _: step(c, _), x, None, length=iters)
        return y

    chain(params, x0).block_until_ready()  # compile
    best = []
    for _ in range(3):
        t0 = time.perf_counter()
        chain(params, x0).block_until_ready()
        best.append(time.perf_counter() - t0)
    return sorted(best)[1]


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    B = 2
    key = jax.random.PRNGKey(0)
    print(f"platform={jax.devices()[0].platform} iters={iters}", file=sys.stderr)
    print("T    Cin   Cout  n | full_ms conv_ms glue_ms | glue_frac upside_ms(xN)")
    total_full = total_upside = 0.0
    for T, cin, cout, n in GEOMETRIES:
        x = jax.random.normal(key, (B, T, cin), jnp.bfloat16)
        t_emb = jax.random.normal(key, (B, 256), jnp.bfloat16)
        mo = jax.random.normal(key, (B, T, 128), jnp.bfloat16)

        full = ResBlockUltimate(out_channels=cout, dtype=jnp.bfloat16,
                                use_attn=False, dropout=0.0)
        pf = full.init(key, x, t_emb, mo, mo)
        tf = timed_chain(
            lambda p, c, te: full.apply(p, c, te, None, None), pf, x,
            (t_emb,), iters) / iters * 1e3

        conv = ConvsOnly(out_channels=cout)
        pc = conv.init(key, x)
        tc = timed_chain(lambda p, c: conv.apply(p, c), pc, x, (), iters) \
            / iters * 1e3

        glue = GlueOnly(out_channels=cout)
        pg = glue.init(key, x, t_emb)
        tg = timed_chain(lambda p, c, te: glue.apply(p, c, te), pg, x,
                         (t_emb,), iters) / iters * 1e3

        upside = tf - tc
        total_full += n * tf
        total_upside += n * max(0.0, upside)
        print(f"{T:4d} {cin:5d} {cout:5d} {n:2d} | {tf:7.3f} {tc:7.3f} "
              f"{tg:7.3f} | {upside / tf:9.1%} {upside:6.3f} (x{n})")
    print(f"\nweighted full resblock time per fwd: {total_full:.3f} ms")
    print(f"max fusion upside per fwd:            {total_upside:.3f} ms "
          f"({total_upside / total_full:.1%} of resblock time)")


if __name__ == "__main__":
    main()
