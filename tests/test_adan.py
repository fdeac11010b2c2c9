"""Adan optimizer parity: numpy oracle of the documented recurrences AND a
golden run against the reference torch implementation."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lm2a_tpu.training.adan import adan, flat_adan, make_lr_schedule

REF = "/root/reference"


def np_adan_steps(p0, grads, lr, betas=(0.02, 0.08, 0.01), eps=1e-8, wd=0.0):
    """Numpy oracle of the reference update (models/adan.py:147-216)."""
    b1, b2, b3 = betas
    p = p0.astype(np.float64).copy()
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    n = np.zeros_like(p)
    prev = np.zeros_like(p)
    step = 0
    out = []
    for g in grads:
        g = g.astype(np.float64)
        if step > 0:
            m = (1 - b1) * m + b1 * g
            gd = g - prev
            v = (1 - b2) * v + b2 * gd
            n = (1 - b3) * n + b3 * (g + (1 - b2) * gd) ** 2
        step += 1
        cm = 1 / (1 - (1 - b1) ** step)
        cv = 1 / (1 - (1 - b2) ** step)
        cn = 1 / (1 - (1 - b3) ** step)
        wss = lr / (np.sqrt(n * cn) + eps)
        p = (p - wss * (m * cm + (1 - b2) * v * cv)) / (1 + wd * lr)
        prev = g.copy()
        out.append(p.copy())
    return out


class TestAdanOracle:
    @pytest.mark.parametrize("wd", [0.0, 1e-2])
    def test_matches_numpy_oracle(self, wd):
        rng = np.random.default_rng(0)
        p0 = rng.normal(size=(4, 3)).astype(np.float32)
        grads = [rng.normal(size=(4, 3)).astype(np.float32) for _ in range(6)]

        opt = adan(1e-2, weight_decay=wd)
        params = {"w": jnp.asarray(p0)}
        state = opt.init(params)
        traj = []
        for g in grads:
            updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
            params = {"w": params["w"] + updates["w"]}
            traj.append(np.asarray(params["w"]))

        ref = np_adan_steps(p0, grads, 1e-2, wd=wd)
        for ours, want in zip(traj, ref):
            np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-6)

    def test_bf16_state_tracks_fp32_trajectory(self):
        """state_dtype='bfloat16' stores moments in bf16 (half the optimizer
        HBM traffic) but must stay CLOSE to the fp32 trajectory: math is
        fp32, only storage rounds."""
        rng = np.random.default_rng(1)
        p0 = rng.normal(size=(8, 5)).astype(np.float32)
        grads = [rng.normal(size=(8, 5)).astype(np.float32) for _ in range(8)]

        def run(state_dtype):
            opt = adan(1e-2, weight_decay=1e-4, state_dtype=state_dtype)
            params = {"w": jnp.asarray(p0)}
            state = opt.init(params)
            for g in grads:
                updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
                params = {"w": params["w"] + updates["w"]}
            return np.asarray(params["w"]), state

        got, state = run("bfloat16")
        want, _ = run(None)
        assert state.m["w"].dtype == jnp.bfloat16
        assert state.prev_grad["w"].dtype == jnp.bfloat16
        # bf16 has ~2^-8 relative storage error; trajectories drift but the
        # per-step updates are lr-scaled so absolute drift stays ~1e-3 here
        np.testing.assert_allclose(got, want, atol=5e-3)
        # and params themselves remain fp32
        assert got.dtype == np.float32

    def test_opt_dtype_travels_through_config(self):
        from lm2a_tpu.core.config import (
            LM2AConfig,
            config_from_dict,
            config_to_dict,
        )
        import dataclasses

        cfg = LM2AConfig()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, opt_dtype="bfloat16", rng_impl="rbg"))
        rt = config_from_dict(config_to_dict(cfg))
        assert rt.train.opt_dtype == "bfloat16"
        assert rt.train.rng_impl == "rbg"

        from lm2a_tpu.training.train_step import make_optimizer

        tx = make_optimizer(cfg)
        params = {"w": jnp.ones((3,), jnp.float32)}
        state = tx.init(params)
        # optax.chain wraps (clip, adan); the moment trees must store bf16
        dtypes = {str(x.dtype) for x in jax.tree.leaves(state)}
        assert "bfloat16" in dtypes

    def test_flat_matches_per_leaf_chain(self):
        """flat_adan (one raveled clip+Adan pass) follows the per-leaf
        optax.chain(clip_by_global_norm, adan) trajectory on a multi-leaf
        tree; only the global-norm reduction order may differ in rounding."""
        import optax

        rng = np.random.default_rng(3)
        shapes = {"a": (7, 3), "b": (16,), "c": (2, 5, 4)}
        p0 = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
        # large grads so the clip actually triggers on some steps
        grads = [{k: (rng.normal(size=s) * (3.0 if i % 2 else 0.1)).astype(np.float32)
                  for k, s in shapes.items()} for i in range(6)]

        def run(tx):
            params = jax.tree.map(jnp.asarray, p0)
            state = tx.init(params)
            traj = []
            for g in grads:
                updates, state = tx.update(jax.tree.map(jnp.asarray, g),
                                           state, params)
                params = optax.apply_updates(params, updates)
                traj.append(jax.device_get(params))
            return traj

        ref = run(optax.chain(optax.clip_by_global_norm(1.0),
                              adan(1e-2, weight_decay=1e-4)))
        got = run(flat_adan(1e-2, weight_decay=1e-4, grad_clip=1.0))
        for a, b in zip(got, ref):
            jax.tree.map(lambda x, y: np.testing.assert_allclose(
                x, y, rtol=2e-5, atol=1e-7), a, b)

    def test_flat_adan_state_is_one_vector(self):
        """flat_adan stores each moment as a single raveled vector and the
        update survives jit (the documented-and-rejected experiment)."""
        tx = flat_adan(1e-2, weight_decay=1e-4, grad_clip=1.0)
        params = {"a": jnp.ones((3, 2)), "b": jnp.zeros((5,))}
        state = tx.init(params)
        vec_leaves = jax.tree.leaves(state.m)
        assert len(vec_leaves) == 1 and vec_leaves[0].shape == (11,)

        @jax.jit
        def step(g, st, p):
            return tx.update(g, st, p)

        updates, _ = step(jax.tree.map(jnp.ones_like, params), state, params)
        assert updates["a"].shape == (3, 2) and updates["b"].shape == (5,)

    def test_folded_clip_bit_identical_to_chain(self):
        """adan(grad_clip=c) == optax.chain(clip_by_global_norm(c), adan)
        BIT-exactly: same norm reduction, same per-element scaling order,
        prev_grad stores the clipped gradient."""
        import optax

        rng = np.random.default_rng(7)
        shapes = {"a": (9, 4), "b": (21,), "c": (3, 2, 5)}
        p0 = {k: rng.normal(size=s).astype(np.float32) for k, s in shapes.items()}
        grads = [{k: (rng.normal(size=s) * (4.0 if i % 2 else 0.05)).astype(np.float32)
                  for k, s in shapes.items()} for i in range(6)]

        def run(tx):
            params = jax.tree.map(jnp.asarray, p0)
            state = tx.init(params)
            traj = []
            for g in grads:
                updates, state = tx.update(jax.tree.map(jnp.asarray, g),
                                           state, params)
                params = optax.apply_updates(params, updates)
                traj.append(jax.device_get(params))
            return traj, state

        ref, ref_state = run(optax.chain(optax.clip_by_global_norm(1.0),
                                         adan(1e-2, weight_decay=1e-4)))
        got, got_state = run(adan(1e-2, weight_decay=1e-4, grad_clip=1.0))
        for a, b in zip(got, ref):
            jax.tree.map(
                lambda x, y: np.testing.assert_array_equal(x, y), a, b)
        # chain state is (ClipState, AdanState); folded is bare AdanState
        ref_adan = next(s for s in ref_state if hasattr(s, "prev_grad"))
        jax.tree.map(
            lambda x, y: np.testing.assert_array_equal(
                np.asarray(x), np.asarray(y)),
            got_state.prev_grad, ref_adan.prev_grad)

    def test_first_step_only_weight_decay(self):
        """Step 1: moments are zero -> pure 1/(1+wd*lr) shrink."""
        opt = adan(0.1, weight_decay=0.5)
        params = {"w": jnp.full((3,), 2.0)}
        state = opt.init(params)
        g = {"w": jnp.full((3,), 7.0)}
        updates, state = opt.update(g, state, params)
        new = params["w"] + updates["w"]
        np.testing.assert_allclose(np.asarray(new), 2.0 / (1 + 0.5 * 0.1), rtol=1e-6)


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
class TestAdanGoldenVsTorch:
    def test_matches_reference_torch_adan(self):
        torch = pytest.importorskip("torch")
        if REF not in sys.path:
            sys.path.insert(0, REF)
        from models.adan import Adan as TorchAdan

        rng = np.random.default_rng(1)
        p0 = rng.normal(size=(5, 2)).astype(np.float32)
        grads = [rng.normal(size=(5, 2)).astype(np.float32) for _ in range(8)]

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        topt = TorchAdan([tp], lr=3e-3, weight_decay=1e-4)
        ref_traj = []
        for g in grads:
            tp.grad = torch.from_numpy(g.copy())
            topt.step()
            ref_traj.append(tp.detach().numpy().copy())

        opt = adan(3e-3, weight_decay=1e-4)
        params = {"w": jnp.asarray(p0)}
        state = opt.init(params)
        for g, want in zip(grads, ref_traj):
            updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
            params = {"w": params["w"] + updates["w"]}
            np.testing.assert_allclose(np.asarray(params["w"]), want, rtol=2e-4, atol=1e-6)


class TestLRSchedule:
    def test_constant_when_empty(self):
        f = make_lr_schedule(2e-4)
        assert float(f(jnp.int32(0))) == pytest.approx(2e-4)
        assert float(f(jnp.int32(10**6))) == pytest.approx(2e-4)

    def test_step_decay(self):
        # Reference boundary semantics (train.py:209-216): the decayed lr is
        # first applied at 0-indexed loop step D+1, i.e. 1-indexed step D+2.
        f = make_lr_schedule(1.0, (100, 200), (0.5, 0.1))
        assert float(f(jnp.int32(101))) == pytest.approx(1.0)
        assert float(f(jnp.int32(102))) == pytest.approx(0.5)
        assert float(f(jnp.int32(201))) == pytest.approx(0.5)
        assert float(f(jnp.int32(202))) == pytest.approx(0.05)
        assert float(f(jnp.int32(250))) == pytest.approx(0.05)

    @pytest.mark.skipif(not os.path.isdir(REF), reason="reference tree absent")
    def test_decay_boundary_matches_reference_loop(self):
        """Simulate the reference's post-step decay check with its torch Adan
        and assert our scheduled optimizer lands on the same trajectory."""
        torch = pytest.importorskip("torch")
        if REF not in sys.path:
            sys.path.insert(0, REF)
        from models.adan import Adan as TorchAdan

        rng = np.random.default_rng(2)
        p0 = rng.normal(size=(4,)).astype(np.float32)
        grads = [rng.normal(size=(4,)).astype(np.float32) for _ in range(10)]
        decay_at, factor = 3, 0.1

        tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
        topt = TorchAdan([tp], lr=1e-2, weight_decay=0.0)
        ref_traj = []
        current_lr, decay_done = 1e-2, False
        for step, g in enumerate(grads):  # reference train loop, 0-indexed
            tp.grad = torch.from_numpy(g.copy())
            topt.step()
            ref_traj.append(tp.detach().numpy().copy())
            if not decay_done and step >= decay_at:
                current_lr *= factor
                for pg in topt.param_groups:
                    pg["lr"] = current_lr
                decay_done = True

        sched = make_lr_schedule(1e-2, (decay_at,), (factor,))
        opt = adan(sched, weight_decay=0.0)
        params = {"w": jnp.asarray(p0)}
        state = opt.init(params)
        for g, want in zip(grads, ref_traj):
            updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
            params = {"w": params["w"] + updates["w"]}
            np.testing.assert_allclose(
                np.asarray(params["w"]), want, rtol=2e-4, atol=1e-6
            )
