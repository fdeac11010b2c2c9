"""Fused resblock kernel vs the flax ResBlockUltimate module.

Runs the Pallas kernel in interpret mode (CPU) and checks it against the
exact module it replaces, at every flagship geometry class: equal-channel,
channel-change (1x1 skip), and the no-residual (pre-attention) variant.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lm2a_tpu.models.unet1d import ResBlockUltimate, default_num_groups
from lm2a_tpu.ops.pallas_resblock import (
    fused_resblock_chain,
    resblock_chain_reference,
)


def _params_from_module(variables, has_skip):
    p = variables["params"]
    film_kernel = p["film"]["to_scale_shift"]["kernel"]
    film_bias = p["film"]["to_scale_shift"]["bias"]
    out = dict(
        gn1_scale=p["gn1"]["scale"], gn1_bias=p["gn1"]["bias"],
        conv1_w=p["conv1"]["kernel"], conv1_b=p["conv1"]["bias"],
        gn2_scale=p["gn2"]["scale"], gn2_bias=p["gn2"]["bias"],
        conv2_w=p["conv2"]["kernel"], conv2_b=p["conv2"]["bias"],
    )
    if has_skip:
        out["skip_w"] = p["skip"]["kernel"][0]  # (1, Cin, Cout) -> (Cin, Cout)
        out["skip_b"] = p["skip"]["bias"]
    return out, (film_kernel, film_bias)


def _film_vectors(t_emb, film_kernel, film_bias):
    stats = jax.nn.silu(t_emb) @ film_kernel + film_bias
    scale, shift = jnp.split(stats, 2, axis=-1)
    return scale, shift


@pytest.mark.parametrize(
    "t,cin,cout",
    [(36, 32, 32), (24, 16, 32), (20, 64, 32)],
)
def test_fused_matches_module(t, cin, cout):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, t, cin), jnp.float32)
    t_emb = jax.random.normal(jax.random.PRNGKey(1), (2, 48), jnp.float32)

    block = ResBlockUltimate(out_channels=cout, use_attn=False, dropout=0.0)
    variables = block.init(key, x, t_emb, None, None)
    want = block.apply(variables, x, t_emb, None, None, deterministic=True)

    kw, (fk, fb) = _params_from_module(variables, has_skip=cin != cout)
    scale, shift = _film_vectors(t_emb, fk, fb)
    got = fused_resblock_chain(
        x, kw["gn1_scale"], kw["gn1_bias"], kw["conv1_w"], kw["conv1_b"],
        scale, shift, kw["gn2_scale"], kw["gn2_bias"], kw["conv2_w"],
        kw["conv2_b"], kw.get("skip_w"), kw.get("skip_b"),
        groups1=default_num_groups(cin), groups2=default_num_groups(cout),
        interpret=True,
    )
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=2e-4)


def test_fused_matches_xla_reference_bf16():
    key = jax.random.PRNGKey(2)
    t, cin, cout = 40, 32, 32
    x = jax.random.normal(key, (3, t, cin), jnp.bfloat16)
    args = dict(
        gn1_scale=jax.random.normal(jax.random.PRNGKey(3), (cin,)) * 0.1 + 1,
        gn1_bias=jax.random.normal(jax.random.PRNGKey(4), (cin,)) * 0.1,
        conv1_w=jax.random.normal(jax.random.PRNGKey(5), (3, cin, cout)) * 0.1,
        conv1_b=jax.random.normal(jax.random.PRNGKey(6), (cout,)) * 0.1,
        film_scale=jax.random.normal(jax.random.PRNGKey(7), (3, cout)) * 0.1,
        film_shift=jax.random.normal(jax.random.PRNGKey(8), (3, cout)) * 0.1,
        gn2_scale=jax.random.normal(jax.random.PRNGKey(9), (cout,)) * 0.1 + 1,
        gn2_bias=jax.random.normal(jax.random.PRNGKey(10), (cout,)) * 0.1,
        conv2_w=jax.random.normal(jax.random.PRNGKey(11), (3, cout, cout)) * 0.1,
        conv2_b=jax.random.normal(jax.random.PRNGKey(12), (cout,)) * 0.1,
    )
    got = fused_resblock_chain(x, *args.values(), groups1=8, groups2=8,
                               interpret=True)
    want = resblock_chain_reference(x, *args.values(), groups1=8, groups2=8)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_no_residual_variant_returns_h_and_skip():
    """Pre-attention blocks need h (to attend) and xs (to add after)."""
    key = jax.random.PRNGKey(0)
    t, cin, cout = 24, 16, 32
    x = jax.random.normal(key, (2, t, cin), jnp.float32)
    t_emb = jax.random.normal(jax.random.PRNGKey(1), (2, 48), jnp.float32)

    block = ResBlockUltimate(out_channels=cout, use_attn=False, dropout=0.0)
    variables = block.init(key, x, t_emb, None, None)
    want_full = block.apply(variables, x, t_emb, None, None,
                            deterministic=True)

    kw, (fk, fb) = _params_from_module(variables, has_skip=True)
    scale, shift = _film_vectors(t_emb, fk, fb)
    h, xs = fused_resblock_chain(
        x, kw["gn1_scale"], kw["gn1_bias"], kw["conv1_w"], kw["conv1_b"],
        scale, shift, kw["gn2_scale"], kw["gn2_bias"], kw["conv2_w"],
        kw["conv2_b"], kw["skip_w"], kw["skip_b"],
        groups1=default_num_groups(cin), groups2=default_num_groups(cout),
        add_residual=False, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(h + xs), np.asarray(want_full),
                               atol=2e-4, rtol=2e-4)


def test_vmem_budget_fallback():
    """Oversized geometries return None (caller keeps the XLA path)."""
    x = jnp.zeros((1, 8, 2048), jnp.bfloat16)
    out = fused_resblock_chain(
        x, jnp.ones((2048,)), jnp.zeros((2048,)),
        jnp.zeros((3, 2048, 2048)), jnp.zeros((2048,)),
        jnp.zeros((1, 2048)), jnp.zeros((1, 2048)),
        jnp.ones((2048,)), jnp.zeros((2048,)),
        jnp.zeros((3, 2048, 2048)), jnp.zeros((2048,)),
        groups1=8, groups2=8, interpret=True,
    )
    assert out is None


class TestSplitForward:
    """Two-call split path for over-VMEM geometries (2048->1024 up block)."""

    @pytest.mark.parametrize("has_skip,add_residual",
                             [(True, True), (True, False), (False, True)])
    def test_split_matches_reference(self, has_skip, add_residual, monkeypatch):
        import lm2a_tpu.ops.pallas_resblock as prb

        t, cin = 24, 32
        cout = 16 if has_skip else cin
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 16)
        args = [
            jax.random.normal(ks[0], (2, t, cin), jnp.float32),
            jnp.ones((cin,)) + 0.1 * jax.random.normal(ks[1], (cin,)),
            0.1 * jax.random.normal(ks[2], (cin,)),
            jax.random.normal(ks[3], (3, cin, cout)) * 0.1,
            0.1 * jax.random.normal(ks[4], (cout,)),
            0.2 * jax.random.normal(ks[5], (2, cout)),
            0.2 * jax.random.normal(ks[6], (2, cout)),
            jnp.ones((cout,)) + 0.1 * jax.random.normal(ks[7], (cout,)),
            0.1 * jax.random.normal(ks[8], (cout,)),
            jax.random.normal(ks[9], (3, cout, cout)) * 0.1,
            0.1 * jax.random.normal(ks[10], (cout,)),
        ]
        if has_skip:
            args += [jax.random.normal(ks[11], (cin, cout)) * 0.1,
                     0.1 * jax.random.normal(ks[12], (cout,))]
        else:
            args += [None, None]
        gkw = dict(groups1=4, groups2=4, add_residual=add_residual)

        want = resblock_chain_reference(*args, **gkw)
        # shrink the budget to exactly the larger half so this tiny geometry
        # fails the whole-chain check but passes both half checks
        # (fp32 inputs -> weights are budgeted at 4 bytes/element)
        half1 = args[3].size * 4
        half2 = args[9].size * 4 + (args[11].size * 4 if has_skip else 0)
        monkeypatch.setattr(prb, "VMEM_WEIGHT_BUDGET", max(half1, half2))
        got = fused_resblock_chain(*args, **gkw, interpret=True)
        assert got is not None
        if isinstance(want, tuple):
            for g, w in zip(got, want):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           atol=2e-4, rtol=2e-4)
        else:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-4, rtol=2e-4)

    def test_truly_oversized_still_declines(self, monkeypatch):
        import lm2a_tpu.ops.pallas_resblock as prb

        monkeypatch.setattr(prb, "VMEM_WEIGHT_BUDGET", 1)
        # patching the budget to 1 byte also sinks both halves -> None
        x = jnp.zeros((1, 8, 16), jnp.float32)
        out = fused_resblock_chain(
            x, jnp.ones((16,)), jnp.zeros((16,)),
            jnp.zeros((3, 16, 16)), jnp.zeros((16,)),
            jnp.zeros((1, 16)), jnp.zeros((1, 16)),
            jnp.ones((16,)), jnp.zeros((16,)),
            jnp.zeros((3, 16, 16)), jnp.zeros((16,)),
            groups1=4, groups2=4, interpret=True,
        )
        assert out is None


class TestFusedBackward:
    """fused_resblock_train's custom VJP vs jax.grad of the XLA reference."""

    @staticmethod
    def _args(key, b, t, cin, cout, has_skip, dtype=jnp.float32):
        ks = jax.random.split(key, 16)
        a = [
            jax.random.normal(ks[0], (b, t, cin), dtype),  # x
            jnp.ones((cin,)) + 0.1 * jax.random.normal(ks[1], (cin,)),
            0.1 * jax.random.normal(ks[2], (cin,)),
            jax.random.normal(ks[3], (3, cin, cout)) * 0.05,
            0.1 * jax.random.normal(ks[4], (cout,)),
            0.2 * jax.random.normal(ks[5], (b, cout), dtype),  # film scale
            0.2 * jax.random.normal(ks[6], (b, cout), dtype),  # film shift
            jnp.ones((cout,)) + 0.1 * jax.random.normal(ks[7], (cout,)),
            0.1 * jax.random.normal(ks[8], (cout,)),
            jax.random.normal(ks[9], (3, cout, cout)) * 0.05,
            0.1 * jax.random.normal(ks[10], (cout,)),
        ]
        if has_skip:
            a += [jax.random.normal(ks[11], (cin, cout)) * 0.1,
                  0.1 * jax.random.normal(ks[12], (cout,))]
        return a

    @pytest.mark.parametrize(
        "b,t,cin,cout,g1,g2",
        [(3, 37, 16, 24, 4, 4), (2, 64, 32, 32, 8, 8), (2, 20, 8, 16, 2, 4)],
    )
    def test_grads_match_xla_autodiff(self, b, t, cin, cout, g1, g2):
        from lm2a_tpu.ops.pallas_resblock import fused_resblock_train

        has_skip = cin != cout
        args = self._args(jax.random.PRNGKey(0), b, t, cin, cout, has_skip)

        def loss(chain):
            def f(*a):
                out = chain(*a, groups1=g1, groups2=g2)
                assert out is not None
                if has_skip:
                    h, xs = out
                    out = xs + 2.0 * h  # distinct cotangents for h and xs
                return jnp.sum(jnp.sin(out.astype(jnp.float32)))
            return f

        def ref_chain(*a, groups1, groups2):
            return resblock_chain_reference(
                *a, groups1=groups1, groups2=groups2, add_residual=False)

        argnums = tuple(range(len(args)))
        vf, gf = jax.value_and_grad(
            loss(fused_resblock_train), argnums=argnums)(*args)
        vr, gr = jax.value_and_grad(loss(ref_chain), argnums=argnums)(*args)
        np.testing.assert_allclose(float(vf), float(vr), rtol=1e-5)
        for x, y in zip(gf, gr):
            x = np.asarray(x, np.float64)
            y = np.asarray(y, np.float64)
            denom = max(1e-6, np.abs(y).max())
            assert np.abs(x - y).max() / denom < 2e-4

    def test_oversized_geometry_declines(self):
        from lm2a_tpu.ops.pallas_resblock import (
            fused_resblock_train, resblock_train_fits,
        )

        assert not resblock_train_fits(129, 1024, 1024, False)
        assert not resblock_train_fits(258, 1024, 512, True)
        assert resblock_train_fits(516, 256, 256, False)
        assert resblock_train_fits(258, 512, 512, False)
        assert resblock_train_fits(516, 512, 256, True)
        # fp32 compute doubles the in-VMEM weight bytes: a geometry that
        # fits at bf16 must be re-judged at itemsize 4
        assert not resblock_train_fits(258, 512, 512, False, weight_itemsize=4)

        args = self._args(jax.random.PRNGKey(0), 1, 129, 1024, 1024, False)
        assert fused_resblock_train(*args, groups1=8, groups2=8) is None

    @pytest.mark.slow
    def test_unet_train_grads_match_xla(self):
        """Full UNet training-mode loss + grads with fused_resblock_grad
        match the plain XLA path (dropout disabled for determinism)."""
        from lm2a_tpu.models.unet1d import UNet1DUltimate

        kw = dict(in_dim=8, base_dim=16, dim_mults=(1, 2), cond_dim=16,
                  time_emb_dim=32, num_res_blocks=2, mid_blocks=1,
                  attn_heads=2, dropout=0.0)
        key = jax.random.PRNGKey(0)
        x = jax.random.normal(key, (2, 24, 8), jnp.float32)
        t = jnp.array([3, 7])
        mo = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 16), jnp.float32)
        tx = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 16), jnp.float32)

        base = UNet1DUltimate(**kw)
        variables = base.init(key, x, t, mo, tx)
        fused = UNet1DUltimate(**kw, fused_resblock_grad=True)

        def loss(model):
            def f(params):
                out = model.apply({"params": params}, x, t, mo, tx,
                                  deterministic=False,
                                  rngs={"dropout": jax.random.PRNGKey(9)})
                return jnp.mean(out.astype(jnp.float32) ** 2)
            return f

        vb, gb = jax.value_and_grad(loss(base))(variables["params"])
        vf, gf = jax.value_and_grad(loss(fused))(variables["params"])
        np.testing.assert_allclose(float(vf), float(vb), rtol=1e-5)
        flat_b = jax.tree.leaves(gb)
        flat_f = jax.tree.leaves(gf)
        assert len(flat_b) == len(flat_f)
        for a, c in zip(flat_b, flat_f):
            a = np.asarray(a, np.float64)
            c = np.asarray(c, np.float64)
            # relative to the leaf's own scale, with an absolute floor for
            # near-zero leaves (time-embedding grads can be ~1e-10 here)
            assert np.abs(a - c).max() < 5e-4 * np.abs(a).max() + 1e-8


def test_unet_fused_resblock_matches_xla():
    """Full UNet1DUltimate apply with fused_resblock=True equals the XLA
    path (CPU interpret mode), including attention blocks and CFG rows."""
    from lm2a_tpu.models.unet1d import UNet1DUltimate

    kw = dict(in_dim=8, base_dim=16, dim_mults=(1, 2), cond_dim=16,
              time_emb_dim=32, num_res_blocks=2, mid_blocks=1, attn_heads=2)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 24, 8), jnp.float32)
    t = jnp.array([3, 7])
    mo = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 16), jnp.float32)
    tx = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 16), jnp.float32)

    base = UNet1DUltimate(**kw)
    variables = base.init(key, x, t, mo, tx)
    want = base.apply(variables, x, t, mo, tx, deterministic=True)

    fused = UNet1DUltimate(**kw, fused_resblock=True)
    got = fused.apply(variables, x, t, mo, tx, deterministic=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=5e-4, rtol=5e-4)

    # CFG uncond fold composes with the fused chain
    want_u = base.apply(variables, x, t, mo, tx, deterministic=True,
                        uncond_rows=1)
    got_u = fused.apply(variables, x, t, mo, tx, deterministic=True,
                        uncond_rows=1)
    np.testing.assert_allclose(np.asarray(got_u), np.asarray(want_u),
                               atol=5e-4, rtol=5e-4)


class TestRowTiling:
    """R-row tiling (round 3): rows batched into the MXU contraction must be
    bit-equal to the one-row grid — GroupNorm statistics and conv3 shifts
    are strictly per-row, so any cross-row leakage shows up here."""

    @pytest.mark.parametrize("rows", [1, 2, 4, 8])
    def test_rows_per_step_equivalent(self, rows):
        from lm2a_tpu.models.factory import build_denoiser  # noqa: F401

        rng = np.random.default_rng(5)
        b, t, cin, cout = 8, 20, 32, 48
        x = jnp.asarray(rng.normal(size=(b, t, cin)), jnp.float32)
        args = dict(
            gn1_scale=jnp.asarray(rng.normal(size=(cin,)), jnp.float32),
            gn1_bias=jnp.asarray(rng.normal(size=(cin,)), jnp.float32),
            conv1_w=jnp.asarray(rng.normal(size=(3, cin, cout)) * 0.1, jnp.float32),
            conv1_b=jnp.asarray(rng.normal(size=(cout,)), jnp.float32),
            film_scale=jnp.asarray(rng.normal(size=(b, cout)), jnp.float32),
            film_shift=jnp.asarray(rng.normal(size=(b, cout)), jnp.float32),
            gn2_scale=jnp.asarray(rng.normal(size=(cout,)), jnp.float32),
            gn2_bias=jnp.asarray(rng.normal(size=(cout,)), jnp.float32),
            conv2_w=jnp.asarray(rng.normal(size=(3, cout, cout)) * 0.1, jnp.float32),
            conv2_b=jnp.asarray(rng.normal(size=(cout,)), jnp.float32),
            skip_w=jnp.asarray(rng.normal(size=(cin, cout)) * 0.1, jnp.float32),
            skip_b=jnp.asarray(rng.normal(size=(cout,)), jnp.float32),
        )
        base = fused_resblock_chain(x, *args.values(), groups1=8, groups2=8,
                                    rows_per_step=1)
        tiled = fused_resblock_chain(x, *args.values(), groups1=8, groups2=8,
                                     rows_per_step=rows)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)
        # rows must also differ from each other (no row got duplicated)
        out = np.asarray(tiled)
        assert not np.allclose(out[0], out[1])

    def test_split_path_rows_equivalent(self, monkeypatch):
        import lm2a_tpu.ops.pallas_resblock as prb

        # force the split path by shrinking the budget
        monkeypatch.setattr(prb, "VMEM_WEIGHT_BUDGET", 40 * 1024)
        rng = np.random.default_rng(9)
        b, t, cin, cout = 4, 16, 32, 32
        x = jnp.asarray(rng.normal(size=(b, t, cin)), jnp.float32)
        args = dict(
            gn1_scale=jnp.asarray(rng.normal(size=(cin,)), jnp.float32),
            gn1_bias=jnp.asarray(rng.normal(size=(cin,)), jnp.float32),
            conv1_w=jnp.asarray(rng.normal(size=(3, cin, cout)) * 0.1, jnp.float32),
            conv1_b=jnp.asarray(rng.normal(size=(cout,)), jnp.float32),
            film_scale=jnp.asarray(rng.normal(size=(b, cout)), jnp.float32),
            film_shift=jnp.asarray(rng.normal(size=(b, cout)), jnp.float32),
            gn2_scale=jnp.asarray(rng.normal(size=(cout,)), jnp.float32),
            gn2_bias=jnp.asarray(rng.normal(size=(cout,)), jnp.float32),
            conv2_w=jnp.asarray(rng.normal(size=(3, cout, cout)) * 0.1, jnp.float32),
            conv2_b=jnp.asarray(rng.normal(size=(cout,)), jnp.float32),
        )
        base = prb.fused_resblock_chain(x, *args.values(), None, None,
                                        groups1=8, groups2=8, rows_per_step=1)
        tiled = prb.fused_resblock_chain(x, *args.values(), None, None,
                                         groups1=8, groups2=8, rows_per_step=4)
        want = resblock_chain_reference(x, *args.values(), None, None,
                                        groups1=8, groups2=8)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
