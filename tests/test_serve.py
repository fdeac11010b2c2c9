"""Serving-loop tests: one model load, many requests, cached compiled chains."""

import io
import json
import os

import jax
import numpy as np
import pytest

from lm2a_tpu.cli.serve import build_parser, serve_loop
from lm2a_tpu.core.config import (
    DiffusionConfig,
    LM2AConfig,
    ModelConfig,
    TrainConfig,
)
from lm2a_tpu.data import Sample, save_sample
from lm2a_tpu.inference import load_models
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser
from lm2a_tpu.training import init_train_state, save_checkpoint

CFG = LM2AConfig(
    model=ModelConfig(
        base_dim=16, dim_mults=(1, 2), cond_dim=8, time_emb_dim=16,
        num_res_blocks=1, mid_blocks=1, attn_heads=2,
        motion_dim=234, text_dim=768,
    ),
    diffusion=DiffusionConfig(timesteps=8),
    train=TrainConfig(batch_size=2),
)


@pytest.fixture(scope="module")
def ckpt_dir(tmp_path_factory):
    denoiser = build_denoiser(CFG.model)
    cond_proj = build_cond_projection(CFG.model)
    state, _ = init_train_state(
        denoiser, cond_proj, CFG, jax.random.key(0), seq_len=48)
    d = str(tmp_path_factory.mktemp("serve") / "ckpts")
    save_checkpoint(d, state, CFG, epoch=0, dataset_mean=-4.6, dataset_std=1.86)
    return os.path.join(d, "ckpt_step_0")


@pytest.fixture
def clip_npz(tmp_path):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "clip.npz")
    save_sample(p, Sample(
        mel=rng.normal(size=(80, 48)).astype(np.float32),
        motion=rng.normal(size=(16, 234)).astype(np.float32),
        lyrics=rng.normal(size=(16, 768)).astype(np.float32),
    ))
    return p


def _run(models, requests, **kw):
    out = io.StringIO()
    served = serve_loop(models, [json.dumps(r) for r in requests], out, **kw)
    responses = [json.loads(line) for line in out.getvalue().splitlines()]
    return served, responses


class TestServeLoop:
    def test_many_requests_share_one_compiled_chain(self, ckpt_dir, clip_npz,
                                                    tmp_path):
        models = load_models(ckpt_dir)
        served, resp = _run(
            models,
            [
                {"npz": clip_npz, "id": "a", "seed": 1,
                 "out_dir": str(tmp_path / "a")},
                {"npz": clip_npz, "id": "b", "seed": 2,
                 "out_dir": str(tmp_path / "b")},
            ],
            out_dir=str(tmp_path / "out"),
        )
        assert served == 2
        assert [r["id"] for r in resp] == ["a", "b"]
        assert all(r["ok"] for r in resp)
        for r in resp:
            d = np.load(r["out"])
            assert d["mel"].shape == (80, 48)
            assert np.isfinite(d["mel"]).all()
        # both requests hit the SAME geometry -> exactly one jitted sampler
        assert len(models._samplers) == 1
        # distinct seeds -> distinct outputs (same compiled chain, new noise)
        a, b = (np.load(r["out"])["mel"] for r in resp)
        assert not np.array_equal(a, b)

    def test_per_request_overrides_and_methods(self, ckpt_dir, clip_npz,
                                               tmp_path):
        models = load_models(ckpt_dir)
        served, resp = _run(
            models,
            [
                {"npz": clip_npz, "id": "ddpm"},
                {"npz": clip_npz, "id": "ddim", "method": "ddim",
                 "ddim_steps": 4},
            ],
            out_dir=str(tmp_path / "out"),
        )
        assert served == 2 and all(r["ok"] for r in resp)
        assert len(models._samplers) == 2  # two geometries, two chains

    def test_same_seed_is_deterministic(self, ckpt_dir, clip_npz, tmp_path):
        models = load_models(ckpt_dir)
        _, resp = _run(
            models,
            [
                {"npz": clip_npz, "id": "x", "seed": 7,
                 "out_dir": str(tmp_path / "x")},
                {"npz": clip_npz, "id": "y", "seed": 7,
                 "out_dir": str(tmp_path / "y")},
            ],
        )
        a, b = (np.load(r["out"])["mel"] for r in resp)
        np.testing.assert_array_equal(a, b)

    def test_guidance_values_share_one_compiled_chain(self, ckpt_dir,
                                                      clip_npz, tmp_path):
        """The CFG weight is a traced argument: sweeping guidance must not
        recompile (each baked weight would cost minutes through the relay)."""
        models = load_models(ckpt_dir)
        served, resp = _run(
            models,
            [
                {"npz": clip_npz, "id": "g15", "guidance": 1.5, "seed": 3,
                 "out_dir": str(tmp_path / "g15")},
                {"npz": clip_npz, "id": "g21", "guidance": 2.1, "seed": 3,
                 "out_dir": str(tmp_path / "g21")},
                {"npz": clip_npz, "id": "g30", "guidance": 3.0, "seed": 3,
                 "out_dir": str(tmp_path / "g30")},
            ],
        )
        assert served == 3 and all(r["ok"] for r in resp)
        assert len(models._samplers) == 1  # one guided chain for all weights
        mels = [np.load(r["out"])["mel"] for r in resp]
        # same noise, different weights -> different outputs
        assert not np.array_equal(mels[0], mels[1])
        assert not np.array_equal(mels[1], mels[2])

    def test_sampler_cache_is_lru_capped(self, ckpt_dir, clip_npz, tmp_path):
        models = load_models(ckpt_dir)
        models.sampler_cache_max = 2
        reqs = [
            {"npz": clip_npz, "id": f"s{k}", "steps": k,
             "out_dir": str(tmp_path / f"s{k}")}
            for k in (2, 3, 4)
        ]
        served, resp = _run(models, reqs)
        assert served == 3 and all(r["ok"] for r in resp)
        assert len(models._samplers) == 2  # oldest geometry evicted
        keys = list(models._samplers)
        assert {k[1] for k in keys} == {3, 4}  # steps field of the cache key

    def test_batched_request_serves_all_clips_in_one_chain(self, ckpt_dir,
                                                           tmp_path):
        rng = np.random.default_rng(3)
        paths = []
        for i in range(3):
            p = str(tmp_path / f"clip{i}.npz")
            save_sample(p, Sample(
                mel=rng.normal(size=(80, 48)).astype(np.float32),
                motion=rng.normal(size=(16, 234)).astype(np.float32),
                lyrics=rng.normal(size=(16, 768)).astype(np.float32),
            ))
            paths.append(p)
        models = load_models(ckpt_dir)
        served, resp = _run(
            models,
            [{"npz": paths, "id": "batch"}],
            out_dir=str(tmp_path / "out"),
        )
        assert served == 1
        (r,) = resp
        assert r["ok"] and isinstance(r["out"], list) and len(r["out"]) == 3
        # equal-length clips share one compiled batched chain
        assert len(models._samplers) == 1
        mels = [np.load(o)["mel"] for o in r["out"]]
        assert all(m.shape == (80, 48) and np.isfinite(m).all() for m in mels)
        # per-row conditions differ -> per-row outputs differ
        assert not np.array_equal(mels[0], mels[1])

    def test_bad_requests_do_not_kill_the_server(self, ckpt_dir, clip_npz,
                                                 tmp_path):
        models = load_models(ckpt_dir)
        out = io.StringIO()
        served = serve_loop(
            models,
            [
                "this is not json",
                json.dumps({"id": "no-npz"}),
                json.dumps({"npz": str(tmp_path / "missing.npz"),
                            "id": "gone"}),
                json.dumps({"npz": clip_npz, "id": "good"}),
            ],
            out,
            out_dir=str(tmp_path / "out"),
        )
        resp = [json.loads(line) for line in out.getvalue().splitlines()]
        assert served == 1
        assert [r["ok"] for r in resp] == [False, False, False, True]
        assert all("error" in r for r in resp[:3])

    def test_ping_quit_and_blank_lines(self, ckpt_dir, clip_npz, tmp_path):
        models = load_models(ckpt_dir)
        out = io.StringIO()
        served = serve_loop(
            models,
            [
                "",
                json.dumps({"cmd": "ping", "id": "p"}),
                json.dumps({"cmd": "quit"}),
                json.dumps({"npz": clip_npz, "id": "after-quit"}),
            ],
            out,
            out_dir=str(tmp_path / "out"),
        )
        resp = [json.loads(line) for line in out.getvalue().splitlines()]
        assert served == 0  # quit stops before the sampling request
        assert resp[0] == {"id": "p", "ok": True, "pong": True}
        assert resp[1]["bye"] is True
        assert len(resp) == 2

    def test_cli_parser_contract(self):
        args = build_parser().parse_args(
            ["--ckpt", "c", "--method", "ddim", "--warmup_t", "516"])
        assert args.ckpt == "c"
        assert args.method == "ddim"
        assert args.warmup_t == 516
        assert args.out_dir == "serve_out"
        assert args.warmup_batch is None and not args.serial

    def test_default_seed_is_position_independent(self, ckpt_dir, clip_npz,
                                                  tmp_path):
        """No explicit seed: the seed derives from the request id, so the
        same request replayed at a different stream position reproduces the
        same audio (round-2 VERDICT: the old line-counter default did not)."""
        models = load_models(ckpt_dir)
        _, resp1 = _run(
            models,
            [{"npz": clip_npz, "id": "rep", "out_dir": str(tmp_path / "p0")}],
        )
        _, resp2 = _run(
            models,
            [
                {"npz": clip_npz, "id": "other", "seed": 5,
                 "out_dir": str(tmp_path / "other")},
                {"npz": clip_npz, "id": "rep", "out_dir": str(tmp_path / "p1")},
            ],
        )
        assert resp1[0]["seed"] == resp2[1]["seed"]
        a = np.load(resp1[0]["out"])["mel"]
        b = np.load(resp2[1]["out"])["mel"]
        np.testing.assert_array_equal(a, b)

    def test_wav_request_writes_waveform(self, ckpt_dir, clip_npz, tmp_path):
        from lm2a_tpu.vocoder import Vocoder, VocoderConfig
        from lm2a_tpu.utils.audio import read_wav

        tiny = VocoderConfig(
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            upsample_initial_channel=32, resblock_kernel_sizes=(3, 5),
            resblock_dilation_sizes=((1, 2), (1, 2)),
        )
        voc = Vocoder(weights_path=None, cfg=tiny, fused_sandwich=False)
        models = load_models(ckpt_dir)
        served, resp = _run(
            models,
            [{"npz": clip_npz, "id": "w", "wav": True,
              "out_dir": str(tmp_path / "w")}],
            vocoder=voc,
        )
        assert served == 1 and resp[0]["ok"]
        assert resp[0]["wav"].endswith("_gen.wav")
        y, sr = read_wav(resp[0]["wav"])
        assert sr == tiny.sample_rate
        assert y.shape == (48 * tiny.hop,)  # mel T=48 x hop
        assert np.isfinite(y).all()

    def test_pipelined_stream_keeps_response_order(self, ckpt_dir, tmp_path):
        """Mixed single/batched/error stream through the two-stage pipeline:
        responses come back in request order, writes land on disk."""
        rng = np.random.default_rng(7)
        paths = []
        for i in range(2):
            p = str(tmp_path / f"pipe{i}.npz")
            save_sample(p, Sample(
                mel=rng.normal(size=(80, 48)).astype(np.float32),
                motion=rng.normal(size=(16, 234)).astype(np.float32),
                lyrics=rng.normal(size=(16, 768)).astype(np.float32),
            ))
            paths.append(p)
        models = load_models(ckpt_dir)
        served, resp = _run(
            models,
            [
                {"npz": paths[0], "id": "r0", "seed": 0},
                {"npz": paths, "id": "r1", "seed": 1},
                {"npz": str(tmp_path / "nope.npz"), "id": "r2"},
                {"npz": paths[1], "id": "r3", "seed": 3},
            ],
            out_dir=str(tmp_path / "out"),
        )
        assert served == 3
        assert [r["id"] for r in resp] == ["r0", "r1", "r2", "r3"]
        assert [r["ok"] for r in resp] == [True, True, False, True]
        for r in resp:
            if r["ok"]:
                outs = r["out"] if isinstance(r["out"], list) else [r["out"]]
                assert all(os.path.exists(o) for o in outs)

    def test_lockstep_client_gets_reply_without_next_request(
            self, ckpt_dir, clip_npz, tmp_path):
        """A send-one-await-one client must receive reply N while the server
        is already blocked reading request N+1 (round-3 ADVICE high: emission
        deferred to the next main-thread flush deadlocked lockstep clients).
        The request iterator only yields request N+1 after reply N has hit
        the stream; a bounded wait converts the old deadlock into a failure."""
        import threading

        models = load_models(ckpt_dir)

        class EventStream(io.StringIO):
            def __init__(self):
                super().__init__()
                self.got_line = threading.Event()

            def write(self, s):
                r = super().write(s)
                if "\n" in s:
                    self.got_line.set()
                return r

        out = EventStream()
        timed_out = []

        def requests():
            for i in range(3):
                out.got_line.clear()
                yield json.dumps({"npz": clip_npz, "id": f"q{i}", "seed": i,
                                  "out_dir": str(tmp_path / "out")})
                if not out.got_line.wait(timeout=60):
                    timed_out.append(i)
                    return

        served = serve_loop(models, requests(), out,
                            out_dir=str(tmp_path / "out"))
        assert timed_out == [], f"reply never emitted for request {timed_out}"
        resp = [json.loads(line) for line in out.getvalue().splitlines()]
        assert served == 3
        assert [r["id"] for r in resp] == ["q0", "q1", "q2"]

    def test_failed_host_io_not_counted_as_served(self, ckpt_dir, clip_npz,
                                                  tmp_path):
        """Device compute succeeds but the npz write fails (out_dir collides
        with a regular file): the client gets ok:false and the request is NOT
        counted in the return value (round-3 ADVICE low)."""
        blocker = tmp_path / "blocked"
        blocker.write_text("not a directory")
        models = load_models(ckpt_dir)
        served, resp = _run(
            models,
            [
                {"npz": clip_npz, "id": "bad-io", "seed": 1,
                 "out_dir": str(blocker)},
                {"npz": clip_npz, "id": "good", "seed": 2,
                 "out_dir": str(tmp_path / "ok")},
            ],
        )
        assert served == 1
        assert [r["id"] for r in resp] == ["bad-io", "good"]
        assert [r["ok"] for r in resp] == [False, True]
        assert "error" in resp[0]

    def test_serial_mode_matches_pipelined(self, ckpt_dir, clip_npz, tmp_path):
        models = load_models(ckpt_dir)
        _, resp_p = _run(
            models, [{"npz": clip_npz, "id": "s", "seed": 11,
                      "out_dir": str(tmp_path / "p")}])
        _, resp_s = _run(
            models, [{"npz": clip_npz, "id": "s", "seed": 11,
                      "out_dir": str(tmp_path / "s")}], serial=True)
        a = np.load(resp_p[0]["out"])["mel"]
        b = np.load(resp_s[0]["out"])["mel"]
        np.testing.assert_array_equal(a, b)


class TestNpzCompression:
    def test_serve_writes_uncompressed_by_default(self, ckpt_dir, clip_npz,
                                                  tmp_path):
        """Serving writes plain np.savez npz (compression measured ~185 ms/
        clip on a 1-core host — >50% of steady-state wall; round-5 serve
        host-path profile). Per-request "compress": true restores the
        reference's compressed artifact; both load identically."""
        import zipfile

        models = load_models(ckpt_dir)
        out_u = str(tmp_path / "u")
        out_c = str(tmp_path / "c")
        served, resp = _run(models, [
            {"npz": clip_npz, "steps": 4, "out_dir": out_u, "id": "u"},
            {"npz": clip_npz, "steps": 4, "out_dir": out_c, "id": "c",
             "compress": True, "seed": 0},
        ])
        assert served == 2 and all(r["ok"] for r in resp)
        pu = [r for r in resp if r["id"] == "u"][0]["out"]
        pc = [r for r in resp if r["id"] == "c"][0]["out"]
        with zipfile.ZipFile(pu) as z:
            assert all(i.compress_type == zipfile.ZIP_STORED
                       for i in z.infolist())
        with zipfile.ZipFile(pc) as z:
            assert any(i.compress_type == zipfile.ZIP_DEFLATED
                       for i in z.infolist())
        du, dc = np.load(pu), np.load(pc)
        assert du["mel"].shape == dc["mel"].shape == (80, 48)
        assert np.isfinite(du["mel"]).all()
        assert os.path.getsize(pu) > os.path.getsize(pc) * 0.5  # both real
