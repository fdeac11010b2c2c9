"""Training-step and checkpoint tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lm2a_tpu.core.config import (
    DiffusionConfig,
    LM2AConfig,
    ModelConfig,
    TrainConfig,
)
from lm2a_tpu.core.mesh import make_mesh, shard_batch
from lm2a_tpu.diffusion.schedule import make_schedule
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser
from lm2a_tpu.training import (
    init_train_state,
    make_eval_step,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
    latest_checkpoint,
)

CFG = LM2AConfig(
    model=ModelConfig(
        base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
        num_res_blocks=1, mid_blocks=1, attn_heads=2,
        motion_dim=12, text_dim=24,
    ),
    diffusion=DiffusionConfig(timesteps=20),
    train=TrainConfig(batch_size=8, lr=1e-3, ema_decay=0.9),
)

T_MEL = 32


def make_batch(b=8, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "mel": rng.normal(size=(b, T_MEL, 80)).astype(np.float32),
        "motion": rng.normal(size=(b, T_MEL, 12)).astype(np.float32),
        "lyrics": rng.normal(size=(b, T_MEL, 24)).astype(np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    denoiser = build_denoiser(CFG.model)
    cond_proj = build_cond_projection(CFG.model)
    schedule = make_schedule(CFG.diffusion)
    state, tx = init_train_state(denoiser, cond_proj, CFG, jax.random.key(0), seq_len=T_MEL)
    return denoiser, cond_proj, schedule, state, tx


@pytest.mark.slow
class TestTrainStep:
    def test_single_device_step(self, setup):
        denoiser, cond_proj, schedule, state, tx = setup
        step = make_train_step(denoiser, cond_proj, schedule, CFG, tx)
        st = jax.tree.map(jnp.copy, state)
        st2, loss = step(st, make_batch(), jax.random.key(1))
        assert np.isfinite(float(loss))
        assert int(st2.step) == int(state.step) + 1
        # Adan's first step is weight-decay-only (moments start frozen), so
        # take a second step before asserting real movement.
        st3, _ = step(st2, make_batch(seed=1), jax.random.key(2))
        w0 = state.params["unet"]["in_proj"]["kernel"]
        w1 = st3.params["unet"]["in_proj"]["kernel"]
        e1 = st3.ema_params["unet"]["in_proj"]["kernel"]
        assert not np.allclose(np.asarray(w0), np.asarray(w1), atol=1e-6)
        assert not np.allclose(np.asarray(w1), np.asarray(e1), atol=1e-6)

    def test_loss_decreases(self, setup):
        denoiser, cond_proj, schedule, state, tx = setup
        step = make_train_step(denoiser, cond_proj, schedule, CFG, tx)
        st = jax.tree.map(jnp.copy, state)
        batch = make_batch()
        losses = []
        for i in range(30):
            st, loss = step(st, batch, jax.random.fold_in(jax.random.key(2), i))
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])

    def test_multichip_dp_matches_single_device(self, setup):
        """Batch-sharded 8-way step == unsharded step (same math, psum'd)."""
        denoiser, cond_proj, schedule, state, tx = setup
        mesh = make_mesh()  # 8 virtual CPU devices
        assert mesh.devices.size == 8

        step_1 = make_train_step(denoiser, cond_proj, schedule, CFG, tx)
        step_8 = make_train_step(denoiser, cond_proj, schedule, CFG, tx, mesh=mesh)

        batch = make_batch()
        key = jax.random.key(3)
        st_a, loss_a = step_1(jax.tree.map(jnp.copy, state), batch, key)
        st_b, loss_b = step_8(
            jax.tree.map(jnp.copy, state), shard_batch(mesh, batch), key
        )
        assert float(loss_a) == pytest.approx(float(loss_b), rel=2e-5)
        wa = np.asarray(st_a.params["unet"]["in_proj"]["kernel"])
        wb = np.asarray(st_b.params["unet"]["in_proj"]["kernel"])
        np.testing.assert_allclose(wa, wb, rtol=1e-4, atol=1e-6)

    def test_eval_step_deterministic(self, setup):
        denoiser, cond_proj, schedule, state, _ = setup
        ev = make_eval_step(denoiser, cond_proj, schedule, CFG)
        batch = make_batch(seed=5)
        a = ev(state.params, batch, jax.random.key(7))
        b = ev(state.params, batch, jax.random.key(7))
        assert float(a) == float(b)


@pytest.mark.slow
class TestCheckpoint:
    def test_roundtrip_and_resume_state(self, setup, tmp_path):
        denoiser, cond_proj, schedule, state, tx = setup
        step = make_train_step(denoiser, cond_proj, schedule, CFG, tx)
        st = jax.tree.map(jnp.copy, state)
        for i in range(3):
            st, _ = step(st, make_batch(seed=i), jax.random.key(i))

        ckpt_dir = str(tmp_path / "ckpts")
        save_checkpoint(ckpt_dir, st, CFG, epoch=2, dataset_mean=-4.6, dataset_std=1.86)
        path = latest_checkpoint(ckpt_dir)
        assert path and path.endswith("ckpt_step_3")

        restored, meta = restore_checkpoint(path, state)
        assert int(restored.step) == 3
        assert meta["epoch"] == 2
        assert meta["dataset_mean"] == pytest.approx(-4.6)
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            restored.params,
            st.params,
        )
        # optimizer state (incl. Adan moments) restored exactly -> true resume
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            restored.opt_state,
            st.opt_state,
        )

        # training continues identically from the restored state
        step2 = make_train_step(denoiser, cond_proj, schedule, CFG, tx)
        a, la = step2(jax.tree.map(jnp.copy, st), make_batch(seed=9), jax.random.key(9))
        b, lb = step2(jax.tree.map(jnp.copy, restored), make_batch(seed=9), jax.random.key(9))
        assert float(la) == pytest.approx(float(lb), rel=1e-6)

    def test_roundtrip_bf16_opt_state(self, tmp_path):
        """--opt_dtype bfloat16 moments survive the npz checkpoint format
        (np.savez writes ml_dtypes as raw void; the backend stores the bit
        pattern as uint16 and restores through the template dtype)."""
        import dataclasses

        cfg = dataclasses.replace(
            CFG, train=dataclasses.replace(CFG.train, opt_dtype="bfloat16"))
        denoiser = build_denoiser(cfg.model, cfg.train.compute_dtype)
        cond_proj = build_cond_projection(cfg.model, cfg.train.compute_dtype)
        schedule = make_schedule(cfg.diffusion)
        state, tx = init_train_state(
            denoiser, cond_proj, cfg, jax.random.key(0), seq_len=T_MEL)
        step = make_train_step(denoiser, cond_proj, schedule, cfg, tx)
        st = state
        for i in range(2):
            st, _ = step(st, make_batch(seed=i), jax.random.key(i))

        ckpt_dir = str(tmp_path / "ckpts_bf16")
        save_checkpoint(ckpt_dir, st, cfg)
        template, _ = init_train_state(
            denoiser, cond_proj, cfg, jax.random.key(0), seq_len=T_MEL)
        restored, _ = restore_checkpoint(latest_checkpoint(ckpt_dir), template)

        moments = (restored.opt_state if hasattr(restored.opt_state, "m")
                   else next(s for s in restored.opt_state
                             if hasattr(s, "m")))
        dtypes = {str(x.dtype) for x in jax.tree.leaves(moments.m)}
        assert dtypes == {"bfloat16"}
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)),
            restored.opt_state, jax.device_get(st.opt_state),
        )


@pytest.mark.slow
class TestMultistep:
    def test_fused_steps_match_sequential(self, setup):
        """K scanned steps == K sequential single steps, bitwise same RNG."""
        from lm2a_tpu.training.train_step import make_multistep_train_step

        denoiser, cond_proj, schedule, state, tx = setup
        single = make_train_step(denoiser, cond_proj, schedule, CFG, tx)
        multi = make_multistep_train_step(denoiser, cond_proj, schedule, CFG, tx)

        root = jax.random.key(42)
        batches = [make_batch(seed=i) for i in range(3)]

        st_a = jax.tree.map(jnp.copy, state)
        losses_a = []
        for i, b in enumerate(batches):
            st_a, loss = single(st_a, b, jax.random.fold_in(root, i))
            losses_a.append(float(loss))

        stacked = {k: np.stack([b[k] for b in batches]) for k in batches[0]}
        offsets = jnp.arange(3, dtype=jnp.int32)
        st_b, losses_b = multi(
            jax.tree.map(jnp.copy, state), stacked, root, offsets
        )
        np.testing.assert_allclose(losses_a, np.asarray(losses_b), rtol=1e-5)
        # scanned vs sequential compilations reassociate fp ops slightly
        np.testing.assert_allclose(
            np.asarray(st_a.params["unet"]["in_proj"]["kernel"]),
            np.asarray(st_b.params["unet"]["in_proj"]["kernel"]),
            rtol=1e-4, atol=1e-5,
        )
        assert int(st_b.step) == 3

    def test_loop_with_steps_per_call(self, tmp_path):
        """Training loop with fused dispatch incl. a tail flush."""
        from lm2a_tpu.core.config import (
            DataConfig, DiffusionConfig, LM2AConfig, ModelConfig, TrainConfig,
        )
        from lm2a_tpu.data import Sample, save_sample
        from lm2a_tpu.training import train
        from lm2a_tpu.core.mesh import make_mesh

        rng = np.random.default_rng(0)
        d = tmp_path / "train"
        d.mkdir()
        for i in range(5):  # 5 batches of 1 -> 2 fused calls + 1 tail
            save_sample(str(d / f"sample_{i:08d}.npz"), Sample(
                mel=rng.normal(size=(80, 24)).astype(np.float32),
                motion=rng.normal(size=(8, 10)).astype(np.float32),
                lyrics=rng.normal(size=(8, 20)).astype(np.float32),
            ))
        cfg = LM2AConfig(
            model=ModelConfig(base_dim=16, dim_mults=(1, 2), cond_dim=8,
                              time_emb_dim=16, num_res_blocks=1, mid_blocks=1,
                              attn_heads=2, motion_dim=10, text_dim=20),
            diffusion=DiffusionConfig(timesteps=10),
            train=TrainConfig(batch_size=1, epochs=1, lr=1e-3, log_interval=2,
                              save_interval=0, seed=0, steps_per_call=2),
            data=DataConfig(),
        )
        mesh = make_mesh(devices=make_mesh().devices.ravel()[:1])
        res = train(cfg, str(d), str(tmp_path / "run"), mesh=mesh,
                    use_tensorboard=False)
        assert res.final_step == 5
        assert np.isfinite(res.final_loss)


@pytest.mark.slow
class TestFusedAttentionTraining:
    def test_train_step_with_pallas_attention(self):
        """Gradients flow through the Pallas kernel's custom VJP in a full
        train step (interpret mode on CPU)."""
        cfg = LM2AConfig(
            model=ModelConfig(
                base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
                num_res_blocks=1, mid_blocks=1, attn_heads=2,
                motion_dim=12, text_dim=24, fused_attention=True,
            ),
            diffusion=DiffusionConfig(timesteps=10),
            train=TrainConfig(batch_size=4, lr=1e-3),
        )
        denoiser = build_denoiser(cfg.model)
        cond_proj = build_cond_projection(cfg.model)
        schedule = make_schedule(cfg.diffusion)
        state, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.key(0),
                                     seq_len=T_MEL)
        step = make_train_step(denoiser, cond_proj, schedule, cfg, tx)
        st, loss = step(state, make_batch(b=4), jax.random.key(1))
        assert np.isfinite(float(loss))
        st, loss2 = step(st, make_batch(b=4, seed=1), jax.random.key(2))
        assert np.isfinite(float(loss2))


class TestCheckpointRetention:
    def test_keep_last_prunes_old(self, setup, tmp_path):
        denoiser, cond_proj, schedule, state, tx = setup
        from lm2a_tpu.training import list_checkpoints

        step = make_train_step(denoiser, cond_proj, schedule, CFG, tx)
        ckpt_dir = str(tmp_path / "ck")
        st = jax.tree.map(jnp.copy, state)
        for i in range(4):
            st, _ = step(st, make_batch(seed=i), jax.random.key(i))
            save_checkpoint(ckpt_dir, st, CFG, keep_last=2)
        assert list_checkpoints(ckpt_dir) == [3, 4]
        import os
        names = os.listdir(ckpt_dir)
        assert "ckpt_step_1.meta.json" not in names
        assert "ckpt_step_4.meta.json" in names


@pytest.mark.slow
class TestDeviceDataMultistep:
    def test_matches_host_multistep(self, setup):
        """Device-resident gather path == host-stacked multistep, same order."""
        from lm2a_tpu.training.train_step import (
            make_device_data_multistep,
            make_multistep_train_step,
        )

        denoiser, cond_proj, schedule, state, tx = setup
        multi = make_multistep_train_step(denoiser, cond_proj, schedule, CFG, tx)
        devm = make_device_data_multistep(denoiser, cond_proj, schedule, CFG, tx)

        # a 24-row "dataset" on device, indexed as K=3 batches of 8
        rng = np.random.default_rng(7)
        data = {
            "mel": rng.normal(size=(24, T_MEL, 80)).astype(np.float32),
            "motion": rng.normal(size=(24, T_MEL, 12)).astype(np.float32),
            "lyrics": rng.normal(size=(24, T_MEL, 24)).astype(np.float32),
        }
        order = rng.permutation(24).astype(np.int32)
        idx = order.reshape(3, 8)
        stacked = {k: v[order].reshape(3, 8, *v.shape[1:]) for k, v in data.items()}

        root = jax.random.key(9)
        offsets = jnp.arange(3, dtype=jnp.int32)
        st_a, losses_a = multi(jax.tree.map(jnp.copy, state), stacked, root, offsets)
        st_b, losses_b = devm(
            jax.tree.map(jnp.copy, state),
            {k: jnp.asarray(v) for k, v in data.items()},
            jnp.asarray(idx), root, offsets,
        )
        np.testing.assert_allclose(np.asarray(losses_a), np.asarray(losses_b),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(
            np.asarray(st_a.params["unet"]["in_proj"]["kernel"]),
            np.asarray(st_b.params["unet"]["in_proj"]["kernel"]),
            rtol=1e-5, atol=1e-6,
        )
        assert int(st_b.step) == 3

    def test_async_write_roundtrip(self, setup, tmp_path):
        """async_write saves are identical to sync ones after the join."""
        from lm2a_tpu.training.checkpoint import wait_for_pending_save

        denoiser, cond_proj, schedule, state, tx = setup
        d = str(tmp_path / "ck")
        save_checkpoint(d, state, CFG, epoch=3, async_write=True)
        wait_for_pending_save()
        path = latest_checkpoint(d)
        restored, meta = restore_checkpoint(path, state)
        assert meta["epoch"] == 3
        np.testing.assert_array_equal(
            np.asarray(restored.params["unet"]["in_proj"]["kernel"]),
            np.asarray(state.params["unet"]["in_proj"]["kernel"]))

    def test_fetch_workers_roundtrip(self, setup, tmp_path):
        """Threaded per-leaf fetch saves bit-identical checkpoints."""
        from lm2a_tpu.training.checkpoint import (
            fetch_tree,
            wait_for_pending_save,
        )

        denoiser, cond_proj, schedule, state, tx = setup
        batched = fetch_tree(state, workers=0)
        threaded = fetch_tree(state, workers=8)
        for a, b in zip(jax.tree.leaves(batched), jax.tree.leaves(threaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        d = str(tmp_path / "ck")
        save_checkpoint(d, state, CFG, epoch=1, fetch_workers=8,
                        async_write=True)
        wait_for_pending_save()
        restored, meta = restore_checkpoint(latest_checkpoint(d), state)
        assert meta["epoch"] == 1
        np.testing.assert_array_equal(
            np.asarray(restored.params["unet"]["in_proj"]["kernel"]),
            np.asarray(state.params["unet"]["in_proj"]["kernel"]))

    def test_device_data_eval_matches_eval_step(self, setup):
        """Fused device-resident validation == per-batch eval_step stream."""
        from lm2a_tpu.training.train_step import make_device_data_eval

        denoiser, cond_proj, schedule, state, tx = setup
        eval_step = make_eval_step(denoiser, cond_proj, schedule, CFG)
        deve = make_device_data_eval(denoiser, cond_proj, schedule, CFG)

        rng = np.random.default_rng(11)
        data = {
            "mel": rng.normal(size=(24, T_MEL, 80)).astype(np.float32),
            "motion": rng.normal(size=(24, T_MEL, 12)).astype(np.float32),
            "lyrics": rng.normal(size=(24, T_MEL, 24)).astype(np.float32),
        }
        root = jax.random.key(5)
        # the streaming loop folds 10_000_000 + step + i per val batch
        offsets = 10_000_000 + 7 + np.arange(3, dtype=np.int32)
        want = []
        for i in range(3):
            batch = {k: v[i * 8 : (i + 1) * 8] for k, v in data.items()}
            want.append(eval_step(
                state.params, batch, jax.random.fold_in(root, offsets[i])))
        idx = np.arange(24, dtype=np.int32).reshape(3, 8)
        got = deve(state.params,
                   {k: jnp.asarray(v) for k, v in data.items()},
                   jnp.asarray(idx), root, jnp.asarray(offsets))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-7)

    def test_loop_device_data_matches_streaming(self, tmp_path):
        """End-to-end: --device_data loop == streaming fused loop (same seed)."""
        import csv

        from lm2a_tpu.core.config import DataConfig, DiffusionConfig, LM2AConfig
        from lm2a_tpu.core.config import ModelConfig as MC, TrainConfig as TC
        from lm2a_tpu.data.dataset import pack_dataset
        from lm2a_tpu.data.schema import Sample, save_sample
        from lm2a_tpu.training.loop import train

        rng = np.random.default_rng(0)
        npz = tmp_path / "npz"
        npz.mkdir()
        for i in range(10):
            save_sample(str(npz / f"sample_{i:08d}.npz"), Sample(
                mel=rng.normal(size=(80, T_MEL)).astype(np.float32),
                motion=rng.normal(size=(12, 12)).astype(np.float32),
                lyrics=rng.normal(size=(12, 24)).astype(np.float32)))
        pack = str(tmp_path / "pack")
        pack_dataset(str(npz), pack)

        from lm2a_tpu.core.mesh import make_mesh as _mm

        one_dev = _mm(jax.devices()[:1])

        def run(save, device_data):
            cfg = LM2AConfig(
                model=MC(base_dim=16, dim_mults=(1, 2), cond_dim=8,
                         time_emb_dim=16, num_res_blocks=1, mid_blocks=1,
                         attn_heads=2, motion_dim=12, text_dim=24),
                diffusion=DiffusionConfig(timesteps=20),
                train=TC(batch_size=2, epochs=2, steps_per_call=2,
                         device_data=device_data, seed=3, log_interval=1),
                data=DataConfig(),
            )
            return train(cfg, pack, str(tmp_path / save), mesh=one_dev,
                         val_npz_dir=pack, use_tensorboard=False)

        ra = run("run_stream", False)
        rb = run("run_dev", True)
        assert ra.final_step == rb.final_step

        def losses(p, col="train_loss"):
            with open(p) as f:
                return [row[col] for row in csv.DictReader(f) if row[col]]

        la = losses(str(tmp_path / "run_stream" / "train_log.csv"))
        lb = losses(str(tmp_path / "run_dev" / "train_log.csv"))
        assert len(la) == len(lb) > 0
        for a, b in zip(la, lb):
            assert abs(float(a) - float(b)) < 2e-5
        # the device-resident fused validation pass logs the same val losses
        va = losses(str(tmp_path / "run_stream" / "train_log.csv"), "val_loss")
        vb = losses(str(tmp_path / "run_dev" / "train_log.csv"), "val_loss")
        assert len(va) == len(vb) > 0
        for a, b in zip(va, vb):
            assert abs(float(a) - float(b)) < 2e-5
