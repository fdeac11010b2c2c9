"""Preprocess pipeline tests: wav IO, lyric embedding, slice parsing, and the
full dataset builder on a synthetic JustDance-style tree."""

import json
import os

import numpy as np
import pytest

from lm2a_tpu.core.config import MelConfig
from lm2a_tpu.data.lyrics import HashedLyricsEmbedder, tile_lyrics_embedding
from lm2a_tpu.data.preprocess import (
    extract_motion_track,
    find_lyric_for_time,
    make_dataset,
    parse_time_key,
)
from lm2a_tpu.data.schema import load_sample
from lm2a_tpu.utils.audio import read_wav, write_wav


class TestAudioIO:
    def test_pcm16_roundtrip(self, tmp_path):
        sr = 22050
        t = np.arange(sr) / sr
        y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
        p = str(tmp_path / "a.wav")
        write_wav(p, y, sr)
        y2, sr2 = read_wav(p)
        assert sr2 == sr
        np.testing.assert_allclose(y2, y, atol=1.5 / 32768)

    def test_resample(self, tmp_path):
        sr = 44100
        y = np.sin(2 * np.pi * 440 * np.arange(sr) / sr).astype(np.float32)
        p = str(tmp_path / "b.wav")
        write_wav(p, y, sr)
        y2, sr2 = read_wav(p, target_sr=22050)
        assert sr2 == 22050
        assert abs(len(y2) - 22050) <= 1

    def test_float32_wav(self, tmp_path):
        import struct

        sr, n = 8000, 100
        y = np.linspace(-1, 1, n).astype(np.float32)
        data = y.tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32)
        p = str(tmp_path / "f.wav")
        with open(p, "wb") as f:
            f.write(hdr + fmt + b"data" + struct.pack("<I", len(data)) + data)
        y2, sr2 = read_wav(p)
        assert sr2 == sr
        np.testing.assert_allclose(y2, y, atol=1e-6)


class TestLyrics:
    def test_hashed_deterministic(self):
        e = HashedLyricsEmbedder()
        a = e.embed("hello world")
        b = HashedLyricsEmbedder().embed("hello world")
        np.testing.assert_array_equal(a, b)
        assert a.shape == (768,)
        assert not np.allclose(a, e.embed("different text"))

    def test_empty_text_zeros(self):
        e = HashedLyricsEmbedder()
        assert (e.embed("") == 0).all()

    def test_tile(self):
        v = np.arange(768, dtype=np.float32)
        tiled = tile_lyrics_embedding(v, 516)
        assert tiled.shape == (516, 768)
        np.testing.assert_array_equal(tiled[0], tiled[-1])


class TestSliceParsing:
    def test_parse_time_key(self):
        assert parse_time_key("1:30") == pytest.approx(90.0)
        assert parse_time_key("0:05.5") == pytest.approx(5.5)
        assert parse_time_key("12.25") == pytest.approx(12.25)
        assert parse_time_key("bogus") is None

    def test_find_lyric_exact_then_nearest(self):
        sliced = {"0:10": "ten", "0:20": "twenty"}
        assert find_lyric_for_time(sliced, 10.0) == "ten"
        assert find_lyric_for_time(sliced, 10.0005) == "ten"  # within 1e-3
        assert find_lyric_for_time(sliced, 17.0) == "twenty"  # nearest
        assert find_lyric_for_time({}, 5.0) is None


class TestMotionTrack:
    def _smpl(self, frames):
        return {
            str(i).zfill(6): {
                "annots": [
                    {
                        "poses": [list(np.full(72, float(i)))],
                        "Th": [[i, 0, 0]],
                        "Rh": [[0, i, 0]],
                    }
                ]
            }
            for i in frames
        }

    def test_hold_last_and_zero_fill(self):
        smpl = self._smpl([2, 3])
        track = extract_motion_track(smpl, start_frame=0, total_frames=6)
        assert track.shape == (6, 78)
        assert (track[0] == 0).all() and (track[1] == 0).all()  # zero fill
        assert track[2, 0] == 2.0 and track[3, 0] == 3.0
        np.testing.assert_array_equal(track[4], track[3])  # hold last
        np.testing.assert_array_equal(track[5], track[3])


@pytest.fixture
def song_tree(tmp_path):
    """root/2024/songA with two slices; 14 s of audio at 22.05 kHz."""
    sr = 22050
    root = tmp_path / "raw"
    song = root / "2024" / "songA"
    song.mkdir(parents=True)
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(14 * sr)).astype(np.float32)
    write_wav(str(song / "audio.wav"), wav, sr)
    sliced = {"0:00": "first words", "0:06": "second words"}
    (song / "sliced.json").write_text(json.dumps(sliced))
    smpl = {
        str(i).zfill(6): {
            "annots": [
                {
                    "poses": [list(rng.standard_normal(72).astype(float))],
                    "Th": [[0.1 * i, 0, 0]],
                    "Rh": [[0, 0.1 * i, 0]],
                }
            ]
        }
        for i in range(12 * 30)
    }
    (song / "smplfull.json").write_text(json.dumps(smpl))
    return str(root)


class TestMakeDataset:
    def test_end_to_end(self, song_tree, tmp_path):
        out = str(tmp_path / "npz")
        n = make_dataset(song_tree, out, lyrics_backend="hashed")
        assert n == 2
        files = sorted(
            f for f in os.listdir(out) if f.startswith("sample_") and f.endswith(".npz")
        )
        assert files == ["sample_00000000.npz", "sample_00000001.npz"]

        s = load_sample(os.path.join(out, files[0]))
        assert s.mel.shape == (80, 516)  # canonical 6 s geometry
        assert s.motion.shape == (180, 234)
        assert s.lyrics.shape == (516, 768)
        assert s.lyric_text == "first words"
        assert s.time_start == pytest.approx(0.0)
        assert s.frame_start == 0 and s.frame_end == 180

        # motion z-scored across the dataset: per-dim stats ~ (0, 1)
        s2 = load_sample(os.path.join(out, files[1]))
        allm = np.concatenate([s.motion, s2.motion], axis=0)
        assert abs(allm.mean()) < 0.2
        varying = allm.std(axis=0) > 1e-6
        np.testing.assert_allclose(
            allm.std(axis=0, ddof=1)[varying], 1.0, atol=0.05
        )

        stats = np.load(os.path.join(out, "motion_stats.npz"))
        assert stats["mean"].shape == (234,) and stats["std"].shape == (234,)

        info = json.load(open(os.path.join(out, "sample_info_list.json")))
        assert len(info) == 2
        assert info[0]["mel_shape"] == [80, 516]

    def test_mel_matches_direct_op(self, song_tree, tmp_path):
        """Shard mel == mel_spectrogram of the same slice (no drift through
        the batching path)."""
        out = str(tmp_path / "npz2")
        make_dataset(song_tree, out, lyrics_backend="hashed")
        s = load_sample(os.path.join(out, "sample_00000001.npz"))
        wav, _ = read_wav(
            os.path.join(song_tree, "2024", "songA", "audio.wav"), target_sr=22050
        )
        from lm2a_tpu.ops.mel import mel_spectrogram

        seg = wav[6 * 22050 : 12 * 22050]
        direct = np.asarray(mel_spectrogram(seg, MelConfig())).T
        np.testing.assert_allclose(s.mel, direct, rtol=1e-4, atol=1e-4)
