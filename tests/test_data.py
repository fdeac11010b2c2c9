"""Data layer tests: schema roundtrip, alignment contract, packing, batching,
splitting, and dataset statistics."""

import os

import numpy as np
import pytest

from lm2a_tpu.data import (
    BatchIterator,
    MelNpzDataset,
    PackedDataset,
    Sample,
    compute_dataset_stats,
    load_sample,
    pack_dataset,
    save_sample,
    split_dataset,
)


def make_shard(path, seed, mel_t=36, motion_t=12):
    rng = np.random.default_rng(seed)
    s = Sample(
        mel=rng.normal(size=(80, mel_t)).astype(np.float32),
        motion=rng.normal(size=(motion_t, 234)).astype(np.float32),
        lyrics=rng.normal(size=(motion_t, 768)).astype(np.float32),
        song_name=f"song_{seed}",
        time_start=1.5,
        time_end=7.5,
        lyric_text="la la la",
        frame_start=45,
        frame_end=225,
    )
    save_sample(path, s)
    return s


@pytest.fixture
def shard_dir(tmp_path):
    d = tmp_path / "npz"
    d.mkdir()
    for i in range(6):
        make_shard(str(d / f"sample_{i:08d}.npz"), seed=i)
    # aux files that must be ignored by readers/splitters
    np.savez_compressed(str(d / "motion_stats.npz"), mean=np.zeros(234), std=np.ones(234))
    return str(d)


class TestSchema:
    def test_roundtrip(self, tmp_path):
        p = str(tmp_path / "s.npz")
        s = make_shard(p, seed=0)
        r = load_sample(p)
        np.testing.assert_array_equal(r.mel, s.mel)
        np.testing.assert_array_equal(r.motion, s.motion)
        assert r.song_name == "song_0"
        assert r.lyric_text == "la la la"
        assert r.frame_start == 45 and r.frame_end == 225
        assert r.sr == 22050 and r.hop_length == 256

    def test_transposed_mel_normalized(self, tmp_path):
        p = str(tmp_path / "t.npz")
        s = make_shard(p, seed=1)
        # store mel as (T, 80): loader must normalize back to (80, T)
        s2 = Sample(mel=s.mel.T, motion=s.motion, lyrics=s.lyrics)
        save_sample(p, s2)
        r = load_sample(p)
        assert r.mel.shape == (80, 36)


class TestDataset:
    def test_alignment_contract(self, shard_dir):
        ds = MelNpzDataset(shard_dir)
        assert len(ds) == 6
        item = ds[0]
        # everything aligned to mel T, channels-last
        assert item["mel"].shape == (36, 80)
        assert item["motion"].shape == (36, 234)
        assert item["lyrics"].shape == (36, 768)

    def test_pack_matches_per_file_reads(self, shard_dir, tmp_path):
        pack_dir = str(tmp_path / "pack")
        pack_dataset(shard_dir, pack_dir)
        packed = PackedDataset(pack_dir)
        ds = MelNpzDataset(shard_dir)
        assert len(packed) == len(ds)
        got = packed.gather(np.array([2, 4]))
        np.testing.assert_allclose(got["mel"][0], ds[2]["mel"], rtol=1e-6)
        np.testing.assert_allclose(got["lyrics"][1], ds[4]["lyrics"], rtol=1e-6)

    def test_batch_iterator_static_shapes_and_determinism(self, shard_dir):
        ds = MelNpzDataset(shard_dir)
        it = BatchIterator(ds, batch_size=4, shuffle=True, seed=7)
        batches = list(it)
        assert len(batches) == 1  # 6 // 4, remainder dropped for static shapes
        assert batches[0]["mel"].shape == (4, 36, 80)
        it2 = BatchIterator(ds, batch_size=4, shuffle=True, seed=7)
        np.testing.assert_array_equal(list(it2)[0]["mel"], batches[0]["mel"])

    def test_stats_match_direct_computation(self, shard_dir):
        mean, std = compute_dataset_stats(shard_dir)
        ds = MelNpzDataset(shard_dir)
        allmel = np.concatenate([ds[i]["mel"].ravel() for i in range(len(ds))])
        assert mean == pytest.approx(float(allmel.mean()), rel=1e-6)
        assert std == pytest.approx(float(allmel.std()), rel=1e-5)


class TestSplit:
    def test_ratios_manifests_and_exclusion(self, shard_dir, tmp_path):
        out = str(tmp_path / "split")
        res = split_dataset(shard_dir, out, 0.5, 0.3, 0.2, seed=42)
        assert len(res.train) == 3 and len(res.val) == 2 and len(res.test) == 1
        assert sorted(os.listdir(os.path.join(out, "train")))
        names = open(os.path.join(out, "train.txt")).read().splitlines()
        assert len(names) == 3
        all_names = set()
        for part in ("train", "val", "test"):
            all_names |= set(os.listdir(os.path.join(out, part)))
        assert "motion_stats.npz" not in all_names
        assert len(all_names) == 6  # disjoint and complete

    def test_seeded_shuffle_reproducible(self, shard_dir, tmp_path):
        a = split_dataset(shard_dir, str(tmp_path / "a"), seed=42)
        b = split_dataset(shard_dir, str(tmp_path / "b"), seed=42)
        assert [os.path.basename(p) for p in a.train] == [
            os.path.basename(p) for p in b.train
        ]


class TestSuperbatchIterator:
    """Fused-dispatch input pipeline: K-groups + tail, native and numpy."""

    @pytest.fixture
    def pack_dir(self, tmp_path):
        d = tmp_path / "npz14"
        d.mkdir()
        for i in range(14):  # bs=2, k=3 -> 2 full groups (12 rows) + 1 tail
            make_shard(str(d / f"sample_{i:08d}.npz"), seed=100 + i)
        out = str(tmp_path / "pack14")
        pack_dataset(str(d), out)
        return out

    def _collect(self, ds, bs, k, seed=5):
        from lm2a_tpu.data.dataset import superbatch_iterator

        return list(superbatch_iterator(ds, bs, k, shuffle=True, seed=seed))

    def test_group_and_tail_structure(self, pack_dir):
        ds = PackedDataset(pack_dir, use_native=False)
        items = self._collect(ds, bs=2, k=3)
        tags = [t for t, _ in items]
        assert tags == ["multi", "multi", "single"]
        multi = items[0][1]
        assert multi["mel"].shape == (3, 2) + ds.mel.shape[1:]
        assert multi["motion"].shape == (3, 2) + ds.motion.shape[1:]
        single = items[2][1]
        assert single["mel"].shape == (2,) + ds.mel.shape[1:]

    def test_contents_match_order_permutation(self, pack_dir):
        ds = PackedDataset(pack_dir, use_native=False)
        items = self._collect(ds, bs=2, k=3, seed=5)
        order = np.arange(len(ds))
        np.random.default_rng(5).shuffle(order)
        flat_mels = np.concatenate(
            [b["mel"].reshape(-1, *ds.mel.shape[1:]) if t == "multi" else b["mel"]
             for t, b in items]
        )
        np.testing.assert_array_equal(flat_mels, np.asarray(ds.mel[order]))

    def test_native_matches_numpy_path(self, pack_dir):
        from lm2a_tpu.data.native_loader import native_available

        if not native_available():
            pytest.skip("native loader not built")
        ds_np = PackedDataset(pack_dir, use_native=False)
        ds_nat = PackedDataset(pack_dir, use_native=True)
        if ds_nat.native is None:
            pytest.skip("native loader unavailable")
        a = self._collect(ds_np, bs=2, k=3, seed=7)
        b = self._collect(ds_nat, bs=2, k=3, seed=7)
        assert [t for t, _ in a] == [t for t, _ in b]
        for (_, x), (_, y) in zip(a, b):
            for key in ("mel", "motion", "lyrics"):
                np.testing.assert_array_equal(x[key], y[key])

    def test_melnpz_dataset_path(self, tmp_path):
        d = tmp_path / "raw"
        d.mkdir()
        for i in range(7):
            make_shard(str(d / f"sample_{i:08d}.npz"), seed=i)
        ds = MelNpzDataset(str(d))
        items = self._collect(ds, bs=2, k=2)
        tags = [t for t, _ in items]
        assert tags == ["multi", "single"]  # 4 rows grouped, 2 tail, 1 dropped
        assert items[0][1]["mel"].shape[:2] == (2, 2)
