"""Contract tests for the externally-gated wrappers (CLAP, RoBERTa).

Neither laion_clap nor roberta-base weights exist in this image, so the
wrappers' glue (filelist API, tensor/ndarray duck-typing, tokenizer/pooling
conventions) is exercised here against stub modules that honor the real
packages' interfaces. This pins the call contracts the real packages will be
driven through (``/root/reference/metrics/clap.py:7-47``,
``/root/reference/preprocess.py:15-18,64-71``).
"""

import sys
import types
import zlib

import numpy as np
import pytest

SR = 22050


def _fake_laion_clap(return_torch: bool, recorded: dict):
    """A laion_clap stand-in implementing the surface CLAPEvaluator uses."""
    import torch

    mod = types.ModuleType("laion_clap")

    class CLAP_Module:
        def __init__(self, enable_fusion=True):
            recorded["enable_fusion"] = enable_fusion

        def load_ckpt(self, ckpt=None):
            recorded["ckpt"] = ckpt

        def eval(self):
            recorded["eval"] = True
            return self

        def get_audio_embedding_from_filelist(self, x):
            assert isinstance(x, list)  # the real API requires a list
            # zlib.crc32: stable across processes (str hash() is
            # randomized per run, which made failures irreproducible)
            embs = np.stack([
                np.random.default_rng(zlib.crc32(p.encode())).standard_normal(8)
                for p in x
            ]).astype(np.float32)
            return torch.from_numpy(embs) if return_torch else embs

    mod.CLAP_Module = CLAP_Module
    return mod


class TestCLAPContract:
    @pytest.mark.parametrize("return_torch", [False, True])
    def test_compute_metrics_end_to_end(self, monkeypatch, return_torch):
        recorded = {}
        monkeypatch.setitem(
            sys.modules, "laion_clap", _fake_laion_clap(return_torch, recorded)
        )
        from lm2a_tpu.eval.wav_metrics import CLAPEvaluator, _cosine_sim

        ev = CLAPEvaluator()
        assert recorded == {"enable_fusion": False, "ckpt": None, "eval": True}

        gt, gen = ["a.wav", "b.wav"], ["c.wav", "d.wav"]
        out = ev.compute_metrics(gt, gen)
        assert out["per_sample"].shape == (2,)
        assert np.isfinite(out["per_sample"]).all()
        # the mean/std must be consistent with the per-sample sims
        assert out["mean"] == pytest.approx(float(out["per_sample"].mean()))
        # and the sims must be actual cosines of the stub embeddings
        # (fp32, matching the evaluator's pipeline; a relative-only
        # tolerance broke when the embeddings landed on a near-zero cosine)
        def emb(p):
            return np.random.default_rng(
                zlib.crc32(p.encode())).standard_normal(8).astype(np.float32)

        want = _cosine_sim(emb("a.wav"), emb("c.wav"))
        assert out["per_sample"][0] == pytest.approx(want, rel=1e-5, abs=1e-7)

    def test_local_ckpt_passthrough(self, monkeypatch):
        recorded = {}
        monkeypatch.setitem(
            sys.modules, "laion_clap", _fake_laion_clap(False, recorded)
        )
        from lm2a_tpu.eval.wav_metrics import CLAPEvaluator

        CLAPEvaluator(ckpt="/weights/clap_630k.pt")
        assert recorded["ckpt"] == "/weights/clap_630k.pt"

    def test_evaluate_all_reports_clap(self, monkeypatch, tmp_path):
        """Full orchestrator run with the stub: clap keys land in the report."""
        recorded = {}
        monkeypatch.setitem(
            sys.modules, "laion_clap", _fake_laion_clap(True, recorded)
        )
        from lm2a_tpu.eval.evaluate_all import evaluate_all
        from lm2a_tpu.utils.audio import write_wav

        rng = np.random.default_rng(0)
        t = np.arange(SR) / SR
        for i in range(2):
            d = tmp_path / f"sample_{i}"
            d.mkdir()
            tone = np.sin(2 * np.pi * (220 + 20 * i) * t).astype(np.float32)
            write_wav(str(d / "gt.wav"), tone * 0.5, SR)
            write_wav(
                str(d / "gen.wav"),
                (tone * 0.5 + rng.normal(0, 0.01, SR)).astype(np.float32), SR,
            )
        out = evaluate_all(
            str(tmp_path), str(tmp_path / "results"),
            use_clap=True, clap_ckpt="/weights/clap.pt",
        )
        assert recorded["ckpt"] == "/weights/clap.pt"
        md = out["metadata"]
        assert md.get("clap_mean") is not None
        assert md["clap_type"] == "LAION-CLAP (semantic embedding)"
        for sid, r in out["per_sample_metrics"].items():
            assert "cosine_similarity" in r


class _StubTokenizer:
    """Mimics RobertaTokenizer(text, return_tensors='pt', truncation=...)."""

    from_pretrained_path = None

    def __call__(self, text, return_tensors=None, truncation=None, max_length=None):
        import torch

        assert return_tensors == "pt" and truncation and max_length == 128
        ids = [0] + [ord(c) % 50000 for c in (text or "")][: max_length - 2] + [2]
        return {
            "input_ids": torch.tensor([ids], dtype=torch.long),
            "attention_mask": torch.ones((1, len(ids)), dtype=torch.long),
        }


class _StubModel:
    def eval(self):
        return self

    def __call__(self, input_ids=None, attention_mask=None):
        import torch

        # deterministic per-token "hidden states": token id seeds a row
        ids = input_ids[0].tolist()
        rows = np.stack([
            np.random.default_rng(i).standard_normal(768) for i in ids
        ]).astype(np.float32)
        out = types.SimpleNamespace()
        out.last_hidden_state = torch.from_numpy(rows[None])
        return out


class TestRobertaContract:
    def _patch(self, monkeypatch, recorded):
        import transformers

        def tok_fp(path):
            recorded["tok_path"] = path
            return _StubTokenizer()

        def mdl_fp(path):
            recorded["mdl_path"] = path
            return _StubModel()

        monkeypatch.setattr(
            transformers.RobertaTokenizer, "from_pretrained", staticmethod(tok_fp)
        )
        monkeypatch.setattr(
            transformers.RobertaModel, "from_pretrained", staticmethod(mdl_fp)
        )

    def test_embed_mean_pools_last_hidden_state(self, monkeypatch):
        recorded = {}
        self._patch(monkeypatch, recorded)
        from lm2a_tpu.data.lyrics import RobertaLyricsEmbedder

        emb = RobertaLyricsEmbedder("/models/roberta-base")
        assert recorded == {
            "tok_path": "/models/roberta-base",
            "mdl_path": "/models/roberta-base",
        }
        v = emb.embed("la la")
        assert v.shape == (768,) and v.dtype == np.float32
        # oracle: mean over the stub's per-token rows
        ids = [0] + [ord(c) % 50000 for c in "la la"] + [2]
        rows = np.stack([
            np.random.default_rng(i).standard_normal(768) for i in ids
        ])
        np.testing.assert_allclose(v, rows.mean(axis=0), rtol=1e-5, atol=1e-6)

    def test_truncation_at_128_tokens(self, monkeypatch):
        recorded = {}
        self._patch(monkeypatch, recorded)
        from lm2a_tpu.data.lyrics import RobertaLyricsEmbedder

        emb = RobertaLyricsEmbedder()
        v = emb.embed("x" * 10_000)  # must not blow past max_length=128
        assert v.shape == (768,) and np.isfinite(v).all()

    def test_get_lyrics_embedder_backend_and_path(self, monkeypatch):
        recorded = {}
        self._patch(monkeypatch, recorded)
        from lm2a_tpu.data.lyrics import get_lyrics_embedder

        e = get_lyrics_embedder("roberta", model_path="/models/rb")
        assert recorded["tok_path"] == "/models/rb"
        assert e.embed("hey").shape == (768,)

    def test_preprocess_plumbs_model_path(self, monkeypatch):
        """make_dataset(lyrics_model_path=...) reaches from_pretrained."""
        recorded = {}
        self._patch(monkeypatch, recorded)
        from lm2a_tpu.data.lyrics import get_lyrics_embedder

        get_lyrics_embedder("roberta", "/models/rb2")
        assert recorded["mdl_path"] == "/models/rb2"
