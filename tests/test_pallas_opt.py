"""Golden tests for the bucketed multi-ref Pallas optimizer update.

``ops/pallas_opt.fused_adan_ema_update`` must reproduce the exact
tx.update → apply_updates → EMA tail of ``train_step.make_update_step``
(the reference optimizer /root/reference/models/adan.py:147-216 + EMA
train.py:176-180) — kernel partitioning is the only thing allowed to
change. Runs in interpret mode on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lm2a_tpu.ops.pallas_opt import fused_adan_ema_update, plan_buckets
from lm2a_tpu.training.adan import adan


def make_tree(key, sizes_shapes):
    ks = jax.random.split(key, len(sizes_shapes))
    return {
        f"leaf{i}": jax.random.normal(k, shp, jnp.float32)
        for i, (k, shp) in enumerate(zip(ks, sizes_shapes))
    }


SHAPES = [
    (7,), (128,), (3, 33), (16, 128), (2, 40, 64), (700, 96), (1, 2050),
]


def reference_step(params, ema, opt_state, grads, tx, ema_decay):
    updates, opt_state = tx.update(grads, opt_state, params)
    new_p = optax.apply_updates(params, updates)
    new_e = jax.tree.map(
        lambda e, p: e * ema_decay + p * (1.0 - ema_decay), ema, new_p)
    return new_p, new_e, opt_state


def assert_params_close(p_ref, p_pal, n_ref, step, lr, eps=1e-8,
                        b3=0.01, label="params", p_prev=None, rel=1e-4):
    """Amplification-aware parameter comparison.

    Adan's update divides by ``sqrt(n * c_n) + eps``; where the second
    moment is near zero (g + (1-b2)(g-pg) cancels), a 1-2 ULP difference in
    ``n`` between backends (kernel-internal FMA contraction vs op-by-op
    execution) is amplified by up to lr/eps. The elementwise tolerance
    therefore scales with the reference's own amplification factor — the
    same few-in-a-million elements differ between ANY two compilations of
    the reference optimizer."""
    c_n = 1.0 / (1.0 - (1.0 - b3) ** float(step))
    prev_leaves = (jax.tree.leaves(p_prev) if p_prev is not None
                   else [None] * len(jax.tree.leaves(p_ref)))
    for la, lb, ln, lp in zip(jax.tree.leaves(p_ref),
                              jax.tree.leaves(p_pal),
                              jax.tree.leaves(n_ref), prev_leaves):
        a = np.asarray(la, np.float32)
        b = np.asarray(lb, np.float32)
        nref = np.asarray(ln, np.float32)
        amp = lr / (np.sqrt(np.maximum(nref, 0.0) * c_n) + eps)
        tol = 1e-5 * np.abs(a) + 1e-6 + amp * 3e-5
        if lp is not None:
            # a relative bound on the update magnitude itself: bf16 moment
            # storage rounds the numerator, so the applied delta carries
            # that relative error
            tol = tol + rel * np.abs(a - np.asarray(lp, np.float32))
        # where n comes from squaring a catastrophically-cancelled quantity
        # (sqrt(n*c_n) within ~2 decades of eps), the n value itself carries
        # O(10%) fp noise in ANY backend and the update there is numerically
        # meaningless; exclude those elements but bound how rare they are
        singular = np.sqrt(np.maximum(nref, 0.0) * c_n) < 1e-5
        over = np.abs(a - b) > tol
        excused = over & singular
        bad = over & ~singular
        assert excused.mean() < 1e-3, (
            f"{label} step {step}: too many excused near-singular "
            f"divergences ({excused.mean():.2e})")
        assert not bad.any(), (
            f"{label} step {step}: {bad.sum()} elements beyond "
            f"amplification-aware tol; max diff "
            f"{(np.abs(a - b) * ~singular).max():.3e}")


@pytest.mark.parametrize("state_dtype", [None, "bfloat16"])
@pytest.mark.parametrize("grad_clip", [0.0, 1.0])
def test_matches_xla_chain_over_steps(state_dtype, grad_clip):
    key = jax.random.key(0)
    params = make_tree(key, SHAPES)
    ema = jax.tree.map(jnp.copy, params)
    tx = adan(2e-4, weight_decay=1e-4, state_dtype=state_dtype,
              grad_clip=grad_clip)
    opt_ref = tx.init(params)
    opt_pal = tx.init(params)
    p_ref, e_ref = params, ema
    p_pal, e_pal = params, ema

    # bf16 moment storage: both backends round the SAME fp32 value to bf16,
    # but a 1-ULP fp32 difference (kernel FMA contraction) can flip the
    # bf16 rounding — tolerate 2 bf16 ULPs relative
    mom_rtol = 1.6e-2 if state_dtype == "bfloat16" else 2e-5
    upd_rel = 2e-2 if state_dtype == "bfloat16" else 1e-4

    for step in range(4):
        gkey = jax.random.fold_in(key, step)
        # step 2: huge grads so the global-norm clip actually engages
        scale = 50.0 if step == 2 else 1.0
        grads = jax.tree.map(
            lambda p, k=gkey: scale * jax.random.normal(k, p.shape), p_ref)
        p_prev = p_ref
        p_ref, e_ref, opt_ref = reference_step(
            p_ref, e_ref, opt_ref, grads, tx, 0.999)
        p_pal, e_pal, opt_pal = fused_adan_ema_update(
            p_pal, e_pal, opt_pal, grads,
            lr=2e-4, ema_decay=0.999, weight_decay=1e-4,
            grad_clip=grad_clip, state_dtype=state_dtype,
            small_max=1024,  # force several leaves down the big path
        )
        for name, a, b in (
            ("m", opt_ref.m, opt_pal.m),
            ("v", opt_ref.v, opt_pal.v),
            ("n", opt_ref.n, opt_pal.n),
            ("prev_grad", opt_ref.prev_grad, opt_pal.prev_grad),
        ):
            ra, rb = jax.tree.leaves(a), jax.tree.leaves(b)
            for la, lb in zip(ra, rb):
                np.testing.assert_allclose(
                    np.asarray(la, np.float32), np.asarray(lb, np.float32),
                    rtol=mom_rtol, atol=2e-6,
                    err_msg=f"{name} step {step}")
        assert_params_close(p_ref, p_pal, opt_ref.n, step + 1, 2e-4,
                            label="params", p_prev=p_prev, rel=upd_rel)
        assert_params_close(e_ref, e_pal, opt_ref.n, step + 1, 2e-4,
                            label="ema", p_prev=p_prev, rel=upd_rel)
        assert int(opt_pal.step) == int(opt_ref.step) == step + 1
        # re-sync so each step compares the UPDATE from identical inputs
        # (a ULP divergence at a near-singular element would otherwise
        # persist and trip later steps' tighter tolerances)
        p_pal, e_pal, opt_pal = p_ref, e_ref, opt_ref


def test_big_backend_xla_matches_pallas():
    key = jax.random.key(3)
    params = make_tree(key, SHAPES)
    ema = jax.tree.map(jnp.copy, params)
    tx = adan(1e-3, weight_decay=1e-4, grad_clip=1.0)
    grads = jax.tree.map(lambda p: 3.0 * jnp.ones_like(p), params)
    outs = {}
    for bb in ("pallas", "xla"):
        opt = tx.init(params)
        # two steps so the moments warm up
        p, e = params, ema
        for _ in range(2):
            p, e, opt = fused_adan_ema_update(
                p, e, opt, grads, lr=1e-3, ema_decay=0.999,
                weight_decay=1e-4, grad_clip=1.0, big_backend=bb,
                small_max=1024)
        outs[bb] = (p, e, opt)
    for a, b in zip(jax.tree.leaves(outs["pallas"]), jax.tree.leaves(outs["xla"])):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-6, atol=1e-6)


def test_plan_buckets_limits():
    sizes = [10, 20, 100, 5000, 70000, 200000, 64, 64, 64, 64, 64, 64, 64]
    plan = plan_buckets(sizes, small_max=65536, max_leaves=4,
                        vmem_budget=1 << 20)
    covered = sorted(i for b in plan.buckets for i in b) + sorted(plan.big)
    assert sorted(covered) == list(range(len(sizes)))
    assert all(len(b) <= 4 for b in plan.buckets)
    assert all(sum(13 * 4 * sizes[i] for i in b) <= (1 << 20) or len(b) == 1
               for b in plan.buckets)
    assert set(plan.big) == {4, 5}  # 70000 and 200000 exceed small_max


def test_moment_freeze_at_step_zero():
    """The reference's step-0 guard: moments stay zero, only the decoupled
    weight-decay shrink applies on the very first step."""
    params = {"w": jnp.ones((4, 130))}
    ema = jax.tree.map(jnp.copy, params)
    tx = adan(1e-2, weight_decay=0.1)
    opt = tx.init(params)
    grads = {"w": jnp.full((4, 130), 7.0)}
    p, e, opt = fused_adan_ema_update(
        params, ema, opt, grads, lr=1e-2, ema_decay=0.999, weight_decay=0.1)
    np.testing.assert_allclose(np.asarray(opt.m["w"]), 0.0)
    np.testing.assert_allclose(np.asarray(opt.v["w"]), 0.0)
    np.testing.assert_allclose(np.asarray(opt.n["w"]), 0.0)
    np.testing.assert_allclose(np.asarray(opt.prev_grad["w"]), 7.0)
    np.testing.assert_allclose(np.asarray(p["w"]), 1.0 / (1.0 + 0.1 * 1e-2),
                               rtol=1e-6)


def test_train_step_backend_parity():
    """make_train_step with opt_backend='pallas' matches the XLA step on a
    tiny end-to-end model (loss + params + ema), including under jit."""
    import dataclasses

    from lm2a_tpu.core.config import (
        DiffusionConfig, LM2AConfig, ModelConfig, TrainConfig,
    )
    from lm2a_tpu.diffusion.schedule import make_schedule
    from lm2a_tpu.models.factory import (
        build_cond_projection, build_denoiser,
    )
    from lm2a_tpu.training.train_step import (
        init_train_state, make_train_step,
    )

    cfg = LM2AConfig(
        model=ModelConfig(base_dim=16, dim_mults=(1, 2), cond_dim=8,
                          time_emb_dim=16, num_res_blocks=1, mid_blocks=1,
                          attn_heads=2),
        diffusion=DiffusionConfig(timesteps=8),
        train=TrainConfig(batch_size=2, compute_dtype="float32"),
    )
    rng = np.random.default_rng(0)
    batch = {
        "mel": jnp.asarray(rng.normal(size=(2, 48, 80)), jnp.float32),
        "motion": jnp.asarray(rng.normal(size=(2, 48, 234)), jnp.float32),
        "lyrics": jnp.asarray(rng.normal(size=(2, 48, 768)), jnp.float32),
    }
    outs = {}
    for backend in ("xla", "pallas"):
        c = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, opt_backend=backend))
        denoiser = build_denoiser(c.model, c.train.compute_dtype)
        cond_proj = build_cond_projection(c.model, c.train.compute_dtype)
        state, tx = init_train_state(denoiser, cond_proj, c,
                                     jax.random.key(0), seq_len=48)
        schedule = make_schedule(c.diffusion)
        step_fn = make_train_step(denoiser, cond_proj, schedule, c, tx)
        losses = []
        for k in range(3):
            state, loss = step_fn(state, batch, jax.random.key(k))
            losses.append(float(loss))
        outs[backend] = (losses, state)
    assert np.allclose(outs["xla"][0], outs["pallas"][0], rtol=1e-5)
    for a, b in zip(jax.tree.leaves(outs["xla"][1].params),
                    jax.tree.leaves(outs["pallas"][1].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
    for a, b in zip(jax.tree.leaves(outs["xla"][1].ema_params),
                    jax.tree.leaves(outs["pallas"][1].ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
