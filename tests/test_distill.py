"""Progressive distillation: grid/step consistency with the DDIM sampler,
and end-to-end loss descent on a tiny model (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from lm2a_tpu.core.config import DiffusionConfig, LM2AConfig, ModelConfig, TrainConfig
from lm2a_tpu.diffusion.gaussian import ddim_sample
from lm2a_tpu.diffusion.schedule import make_schedule
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser
from lm2a_tpu.training.distill import (
    ddim_det_step,
    make_distill_step,
    student_time_grid,
)
from lm2a_tpu.training.train_step import init_train_state, make_optimizer
import pytest

CFG = LM2AConfig(
    model=ModelConfig(base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
                      num_res_blocks=1, mid_blocks=1, attn_heads=2,
                      motion_dim=12, text_dim=24),
    diffusion=DiffusionConfig(timesteps=40),
    train=TrainConfig(batch_size=4, lr=1e-3, ema_decay=0.9),
)
T_MEL = 32


class TestGridAndStep:
    def test_grid_matches_ddim_sampler(self):
        sched = make_schedule(CFG.diffusion)
        ts, ts_prev, ts_mid = student_time_grid(sched.timesteps, 8)
        ref = jnp.linspace(sched.timesteps - 1, 0, 8).round().astype(jnp.int32)
        np.testing.assert_array_equal(np.asarray(ts), np.asarray(ref))
        assert int(ts_prev[-1]) == -1
        # midpoints strictly between the endpoints
        mid, lo, hi = np.asarray(ts_mid), np.asarray(ts_prev), np.asarray(ts)
        assert ((mid >= lo) & (mid < hi)).all()

    def test_det_step_chain_equals_ddim_sample(self):
        """Iterating ddim_det_step over the student grid with the same model
        reproduces ddim_sample(eta=0) exactly (same clamps, same grid)."""
        sched = make_schedule(CFG.diffusion)
        den = build_denoiser(CFG.model)
        x0 = jnp.zeros((2, T_MEL, 80), jnp.float32)
        cond = jnp.zeros((2, T_MEL, CFG.model.cond_dim), jnp.float32)
        params = den.init(jax.random.key(0), x0, jnp.zeros((2,), jnp.int32),
                          cond, cond)

        def model_fn(x, t, m, l, **kw):
            return den.apply(params, x, t, m, l, deterministic=True)

        n = 6
        out_ref = ddim_sample(model_fn, sched, jax.random.key(7),
                              (2, T_MEL, 80), cond, cond, num_steps=n, eta=0.0)

        ts, ts_prev, _ = student_time_grid(sched.timesteps, n)
        x = jax.random.normal(jax.random.fold_in(jax.random.key(7), 0),
                              (2, T_MEL, 80), jnp.float32)
        # ddim_sample draws x_init from split(key)[1] — reproduce it
        _, k0 = jax.random.split(jax.random.key(7))
        x = jax.random.normal(k0, (2, T_MEL, 80), jnp.float32)
        for i in range(n):
            tb = jnp.full((2,), int(ts[i]), jnp.int32)
            tp = jnp.full((2,), int(ts_prev[i]), jnp.int32)
            eps = model_fn(x, tb, cond, cond).astype(jnp.float32)
            x = ddim_det_step(x.astype(jnp.float32), eps, tb, tp, sched)
        np.testing.assert_allclose(np.asarray(x), np.asarray(out_ref),
                                   rtol=2e-4, atol=2e-4)


class TestDistillStep:
    def test_loss_decreases_and_state_updates(self):
        den = build_denoiser(CFG.model)
        proj = build_cond_projection(CFG.model)
        sched = make_schedule(CFG.diffusion)
        teacher_state, _ = init_train_state(den, proj, CFG, jax.random.key(0),
                                            seq_len=T_MEL)
        teacher_params = teacher_state.params
        # student initialized FROM the teacher
        student = jax.tree.map(jnp.copy, teacher_state)
        tx = make_optimizer(CFG)

        step = make_distill_step(
            den, proj, sched, CFG, tx, num_student_steps=5,
            dataset_mean=0.0, dataset_std=1.0, guidance_weight=2.1,
        )
        rng = np.random.default_rng(3)
        batch = {
            "mel": rng.normal(size=(4, T_MEL, 80)).astype(np.float32),
            "motion": rng.normal(size=(4, T_MEL, 12)).astype(np.float32),
            "lyrics": rng.normal(size=(4, T_MEL, 24)).astype(np.float32),
        }
        losses = []
        for i in range(8):
            student, loss = step(student, teacher_params, batch,
                                 jax.random.key(100 + (i % 2)))
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[0] > 0.0  # one-step vs two-step teacher mismatch
        # repeating two alternating keys: the student should fit them
        assert min(losses[-2:]) < losses[0], losses
        assert int(student.step) == 8


@pytest.mark.slow
class TestDeviceDataMultistep:
    def test_matches_sequential_single_step(self):
        """The fused device-data path (scan + on-device gather) runs the
        IDENTICAL math to make_distill_step with the same fold_in stream."""
        from lm2a_tpu.training.distill import make_device_data_multistep_distill

        den = build_denoiser(CFG.model)
        proj = build_cond_projection(CFG.model)
        sched = make_schedule(CFG.diffusion)
        teacher_state, _ = init_train_state(den, proj, CFG, jax.random.key(0),
                                            seq_len=T_MEL)
        teacher_params = teacher_state.params
        tx = make_optimizer(CFG)

        rng = np.random.default_rng(11)
        n_rows = 10
        data = {
            "mel": jnp.asarray(rng.normal(size=(n_rows, T_MEL, 80)),
                               jnp.float32),
            "motion": jnp.asarray(rng.normal(size=(n_rows, T_MEL, 12)),
                                  jnp.float32),
            "lyrics": jnp.asarray(rng.normal(size=(n_rows, T_MEL, 24)),
                                  jnp.float32),
        }
        k, b = 3, 4
        idx = rng.integers(0, n_rows, size=(k, b)).astype(np.int32)
        offsets = np.arange(5, 5 + k, dtype=np.int32)
        root = jax.random.key(42)

        multi = make_device_data_multistep_distill(
            den, proj, sched, CFG, tx, num_student_steps=5,
            guidance_weight=2.1,
        )
        st_multi = jax.tree.map(jnp.copy, teacher_state)
        st_multi, losses = multi(st_multi, teacher_params, data, idx, root,
                                 offsets)

        step = make_distill_step(
            den, proj, sched, CFG, tx, num_student_steps=5,
            guidance_weight=2.1,
        )
        st_seq = jax.tree.map(jnp.copy, teacher_state)
        seq_losses = []
        for i in range(k):
            batch = {kk: v[idx[i]] for kk, v in data.items()}
            st_seq, loss = step(st_seq, teacher_params, batch,
                                jax.random.fold_in(root, offsets[i]))
            seq_losses.append(float(loss))

        np.testing.assert_allclose(np.asarray(losses), seq_losses, rtol=2e-5)
        # scanned vs sequential compilations reassociate fp ops; Adan's
        # rsqrt on tiny early second moments amplifies that, so compare
        # with a loose absolute bound but require the updates themselves
        # to be an order of magnitude larger (non-vacuous tolerance).
        leaves_m = jax.tree.leaves(st_multi.params)
        leaves_s = jax.tree.leaves(st_seq.params)
        leaves_t = jax.tree.leaves(teacher_state.params)
        moved = max(
            float(np.abs(np.asarray(a) - np.asarray(t)).max())
            for a, t in zip(leaves_s, leaves_t)
        )
        assert moved > 2e-3, moved
        # tolerance scales with how far the optimizer moved: the truncated
        # -SNR loss makes early gradients (hence reassociation drift)
        # larger, but the two dispatch modes must stay within a few % of
        # the update magnitude
        for a, b_ in zip(leaves_m, leaves_s):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=max(1e-3, 0.03 * moved))
        assert int(st_multi.step) == int(st_seq.step)


class TestLossSpace:
    def test_eps_and_x0_snr_are_different_objectives(self):
        """Regression: the two loss spaces must actually change the computed
        loss AND the update (a silent fallthrough to the default trained
        bit-identical students for every --loss_schedule value)."""
        den = build_denoiser(CFG.model)
        proj = build_cond_projection(CFG.model)
        # NB: for SNR >= 1 the truncated-SNR x0 loss EQUALS eps-MSE
        # identically (eps-diff^2 = SNR * x0-diff^2, w = max(SNR, 1)); a
        # schedule must reach SNR < 1 for the objectives to separate, as
        # the production 1000-step schedule does at large t.
        sched = make_schedule(DiffusionConfig(timesteps=40, beta_end=0.3))
        assert float(sched.alpha_bars[-1] / (1 - sched.alpha_bars[-1])) < 1.0
        teacher_state, _ = init_train_state(den, proj, CFG, jax.random.key(0),
                                            seq_len=T_MEL)
        tx = make_optimizer(CFG)
        rng = np.random.default_rng(5)
        batch = {
            "mel": rng.normal(size=(4, T_MEL, 80)).astype(np.float32),
            "motion": rng.normal(size=(4, T_MEL, 12)).astype(np.float32),
            "lyrics": rng.normal(size=(4, T_MEL, 24)).astype(np.float32),
        }
        out = {}
        for space in ("eps", "x0_snr"):
            step = make_distill_step(
                den, proj, sched, CFG, tx, num_student_steps=5,
                guidance_weight=2.1, loss_space=space,
            )
            st = jax.tree.map(jnp.copy, teacher_state)
            st, loss = step(st, teacher_state.params, batch, jax.random.key(9))
            out[space] = (float(loss), st)
        l_eps, st_eps = out["eps"]
        l_snr, st_snr = out["x0_snr"]
        assert np.isfinite([l_eps, l_snr]).all()
        # the objectives coincide where SNR >= 1, and Adan's FIRST step is
        # ~lr*sign(g) elementwise (m-hat/sqrt(n-hat) of one gradient), so
        # params after one step can tie — the loss values are the
        # discriminating signal here
        assert abs(l_eps - l_snr) > 1e-6 * max(abs(l_eps), abs(l_snr))

    def test_mean_match_term_penalizes_mean_bias(self):
        """x0_snr_mm = x0_snr + a per-sample global-mean discrepancy term
        scaled to full element mass: its loss must exceed plain x0_snr
        whenever the student-teacher diff has a nonzero mean (the +0.7
        sigma distilled-student bias, round 3)."""
        den = build_denoiser(CFG.model)
        proj = build_cond_projection(CFG.model)
        sched = make_schedule(DiffusionConfig(timesteps=40, beta_end=0.3))
        teacher_state, _ = init_train_state(den, proj, CFG, jax.random.key(0),
                                            seq_len=T_MEL)
        tx = make_optimizer(CFG)
        rng = np.random.default_rng(6)
        batch = {
            "mel": rng.normal(size=(4, T_MEL, 80)).astype(np.float32),
            "motion": rng.normal(size=(4, T_MEL, 12)).astype(np.float32),
            "lyrics": rng.normal(size=(4, T_MEL, 24)).astype(np.float32),
        }
        losses = {}
        for space in ("x0_snr", "x0_snr_mm"):
            step = make_distill_step(
                den, proj, sched, CFG, tx, num_student_steps=5,
                guidance_weight=2.1, loss_space=space,
            )
            st = jax.tree.map(jnp.copy, teacher_state)
            _, loss = step(st, teacher_state.params, batch, jax.random.key(9))
            losses[space] = float(loss)
        assert np.isfinite(list(losses.values())).all()
        # a random-init student's diff has nonzero per-sample means, so the
        # mm term is strictly positive
        assert losses["x0_snr_mm"] > losses["x0_snr"]


class TestCLIPlumbing:
    def test_loss_schedule_reaches_step_builder(self, tmp_path, monkeypatch):
        """Regression for the round-2 bug where cli/distill.py PRINTED the
        per-stage loss but never passed it: V1 (x0_snr) and V3 (eps) runs
        produced bit-identical students. Assert each stage's builder call
        receives its --loss_schedule entry."""
        import lm2a_tpu.training.distill as dmod
        from lm2a_tpu.cli import distill as cli_distill
        from lm2a_tpu.data import Sample, save_sample
        from lm2a_tpu.training.checkpoint import save_checkpoint

        den = build_denoiser(CFG.model)
        proj = build_cond_projection(CFG.model)
        state, _ = init_train_state(den, proj, CFG, jax.random.key(0),
                                    seq_len=T_MEL)
        teacher_dir = str(tmp_path / "teacher")
        save_checkpoint(teacher_dir, state, CFG, epoch=0,
                        dataset_mean=0.0, dataset_std=1.0)
        ckpts = sorted(p for p in (tmp_path / "teacher").iterdir()
                       if p.is_dir())
        teacher = str(ckpts[0])

        npz_dir = tmp_path / "npz"
        npz_dir.mkdir()
        rng = np.random.default_rng(1)
        for i in range(4):
            save_sample(
                str(npz_dir / f"sample_{i:08d}.npz"),
                Sample(
                    mel=rng.normal(size=(80, T_MEL)).astype(np.float32),
                    motion=rng.normal(size=(8, 12)).astype(np.float32),
                    lyrics=rng.normal(size=(8, 24)).astype(np.float32),
                ),
            )

        seen = []
        real_single = dmod.make_distill_step
        real_multi = dmod.make_device_data_multistep_distill

        seen_ema = []

        def spy_single(*a, **kw):
            seen.append(kw.get("loss_space", "<MISSING>"))
            seen_ema.append(a[3].train.ema_decay)
            return real_single(*a, **kw)

        def spy_multi(*a, **kw):
            seen.append(kw.get("loss_space", "<MISSING>"))
            seen_ema.append(a[3].train.ema_decay)
            return real_multi(*a, **kw)

        monkeypatch.setattr(dmod, "make_distill_step", spy_single)
        monkeypatch.setattr(dmod, "make_device_data_multistep_distill",
                            spy_multi)

        cli_distill.main([
            "--teacher", teacher,
            "--npz_dir", str(npz_dir),
            "--save_dir", str(tmp_path / "out"),
            "--student_steps", "2",
            "--start_steps", "4",
            "--steps_per_stage", "2",
            "--batch_size", "2",
            "--steps_per_call", "1",
            "--loss_schedule", "eps,x0_snr",
            "--ema_decay", "0.5",
        ])
        assert seen == ["eps", "x0_snr"], seen
        # --ema_decay override must reach the step builders' config (the
        # teacher's 0.999 EMA absorbs only ~45% of a 600-step stage)
        assert seen_ema == [0.5, 0.5], seen_ema

    def test_lr_decay_cosine_runs_and_decays(self, tmp_path):
        """--lr_decay cosine: the CLI trains with a cosine-decayed LR over
        all stages and still writes a working student checkpoint."""
        from lm2a_tpu.cli import distill as cli_distill
        from lm2a_tpu.data import Sample, save_sample
        from lm2a_tpu.training.checkpoint import load_metadata, save_checkpoint

        den = build_denoiser(CFG.model)
        proj = build_cond_projection(CFG.model)
        state, _ = init_train_state(den, proj, CFG, jax.random.key(0),
                                    seq_len=T_MEL)
        teacher_dir = str(tmp_path / "teacher")
        save_checkpoint(teacher_dir, state, CFG, epoch=0,
                        dataset_mean=0.0, dataset_std=1.0)
        teacher = str(sorted(p for p in (tmp_path / "teacher").iterdir()
                             if p.is_dir())[0])
        npz_dir = tmp_path / "npz"
        npz_dir.mkdir()
        rng = np.random.default_rng(2)
        for i in range(4):
            save_sample(
                str(npz_dir / f"sample_{i:08d}.npz"),
                Sample(
                    mel=rng.normal(size=(80, T_MEL)).astype(np.float32),
                    motion=rng.normal(size=(8, 12)).astype(np.float32),
                    lyrics=rng.normal(size=(8, 24)).astype(np.float32),
                ),
            )
        cli_distill.main([
            "--teacher", teacher,
            "--npz_dir", str(npz_dir),
            "--save_dir", str(tmp_path / "out"),
            "--student_steps", "2",
            "--start_steps", "4",
            "--steps_per_stage", "2",
            "--batch_size", "2",
            "--steps_per_call", "1",
            "--lr_decay", "cosine",
        ])
        outs = sorted(p for p in (tmp_path / "out").iterdir() if p.is_dir())
        assert outs, "no student checkpoint written"
        meta = load_metadata(str(outs[-1]))
        assert meta["distilled_steps"] == 2


class TestStageGuidance:
    def test_cfg_folded_exactly_once(self):
        """Stage 0 folds the CFG weight; every later stage's teacher is the
        already-guided previous student, so re-applying w > 1 would
        double-guide (regression: biased stage-2 students)."""
        from lm2a_tpu.training.distill import stage_guidance_schedule

        assert stage_guidance_schedule(1, 2.1) == [2.1]
        assert stage_guidance_schedule(3, 2.1) == [2.1, 1.0, 1.0]
        # no guidance requested -> plain conditional teacher throughout
        assert stage_guidance_schedule(2, 1.0) == [1.0, 1.0]


class TestDistillResume:
    def _make_env(self, tmp_path):
        from lm2a_tpu.data import Sample, save_sample
        from lm2a_tpu.data.dataset import pack_dataset
        from lm2a_tpu.training.checkpoint import save_checkpoint

        den = build_denoiser(CFG.model)
        proj = build_cond_projection(CFG.model)
        state, _ = init_train_state(den, proj, CFG, jax.random.key(0),
                                    seq_len=T_MEL)
        teacher_dir = str(tmp_path / "teacher")
        save_checkpoint(teacher_dir, state, CFG, epoch=0,
                        dataset_mean=0.0, dataset_std=1.0)
        teacher = str(sorted(p for p in (tmp_path / "teacher").iterdir()
                             if p.is_dir())[0])
        npz_dir = tmp_path / "npz"
        npz_dir.mkdir()
        rng = np.random.default_rng(3)
        for i in range(4):
            save_sample(
                str(npz_dir / f"sample_{i:08d}.npz"),
                Sample(
                    mel=rng.normal(size=(80, T_MEL)).astype(np.float32),
                    motion=rng.normal(size=(8, 12)).astype(np.float32),
                    lyrics=rng.normal(size=(8, 24)).astype(np.float32),
                ),
            )
        pack_dir = str(tmp_path / "pack")
        pack_dataset(str(npz_dir), pack_dir)
        return teacher, pack_dir

    def _flags(self, teacher, pack_dir, save_dir):
        return [
            "--teacher", teacher, "--npz_dir", pack_dir,
            "--save_dir", save_dir,
            "--student_steps", "2", "--start_steps", "4",
            "--steps_per_stage", "4", "--batch_size", "2",
            "--steps_per_call", "2", "--save_interval", "2",
        ]

    def test_kill_mid_stage_then_resume_matches_uninterrupted(
            self, tmp_path, monkeypatch):
        """A run killed mid-stage-2 and resumed with --resume must produce a
        bit-identical final checkpoint to an uninterrupted run (round-4
        VERDICT #6: the device-data index stream is replayed to the saved
        step; the resumed stage's teacher is recovered from the previous
        stage-end checkpoint)."""
        import lm2a_tpu.training.distill as dmod
        from lm2a_tpu.cli import distill as cli_distill

        teacher, pack_dir = self._make_env(tmp_path)

        # ---- run A: uninterrupted ----
        dir_a = str(tmp_path / "out_a")
        cli_distill.main(self._flags(teacher, pack_dir, dir_a))

        # ---- run B: die on the 4th fused dispatch (stage 2, after its
        # mid-stage save at done=2), then --resume ----
        real_multi = dmod.make_device_data_multistep_distill
        calls = {"n": 0}

        def wrapping_multi(*a, **kw):
            fn = real_multi(*a, **kw)

            def counted(*fa, **fkw):
                calls["n"] += 1
                if calls["n"] == 4:
                    raise RuntimeError("simulated tunnel hang / kill")
                return fn(*fa, **fkw)

            return counted

        monkeypatch.setattr(dmod, "make_device_data_multistep_distill",
                            wrapping_multi)
        dir_b = str(tmp_path / "out_b")
        with pytest.raises(RuntimeError, match="simulated"):
            cli_distill.main(self._flags(teacher, pack_dir, dir_b))
        monkeypatch.setattr(dmod, "make_device_data_multistep_distill",
                            real_multi)

        cli_distill.main(self._flags(teacher, pack_dir, dir_b) + ["--resume"])

        # ---- final checkpoints bit-identical ----
        from lm2a_tpu.training.checkpoint import (
            latest_checkpoint,
            load_metadata,
        )

        fa, fb = latest_checkpoint(dir_a), latest_checkpoint(dir_b)
        assert fa.split("/")[-1] == fb.split("/")[-1]  # same final step
        ma, mb = load_metadata(fa), load_metadata(fb)
        assert ma["distilled_steps"] == mb["distilled_steps"] == 2
        assert ma["distill_progress"]["done_in_stage"] == 4
        import os

        za = np.load(os.path.join(fa, "state.npz"))
        zb = np.load(os.path.join(fb, "state.npz"))
        assert sorted(za.files) == sorted(zb.files)
        for k in za.files:
            np.testing.assert_array_equal(za[k], zb[k], err_msg=k)

    def test_resume_on_complete_run_is_a_noop(self, tmp_path, capsys):
        from lm2a_tpu.cli import distill as cli_distill

        teacher, pack_dir = self._make_env(tmp_path)
        out = str(tmp_path / "out")
        cli_distill.main(self._flags(teacher, pack_dir, out))
        n_ckpts = len([p for p in (tmp_path / "out").iterdir() if p.is_dir()])
        cli_distill.main(self._flags(teacher, pack_dir, out) + ["--resume"])
        assert "already complete" in capsys.readouterr().out
        assert len([p for p in (tmp_path / "out").iterdir()
                    if p.is_dir()]) == n_ckpts

    def test_start_below_student_steps_rejected(self):
        from lm2a_tpu.cli import distill as cli_distill

        with pytest.raises(SystemExit, match="start_steps"):
            cli_distill.main(["--teacher", "x", "--npz_dir", "y",
                              "--student_steps", "50", "--start_steps", "25"])
