"""Native C++ batch gatherer: build, correctness vs numpy, async pipeline."""

import numpy as np
import pytest

from lm2a_tpu.data import BatchIterator, PackedDataset, Sample, pack_dataset, save_sample
from lm2a_tpu.data.native_loader import NativeGather, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="g++ unavailable or native build failed"
)


@pytest.fixture
def pack_dir(tmp_path):
    src = tmp_path / "npz"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(10):
        save_sample(str(src / f"sample_{i:08d}.npz"), Sample(
            mel=rng.normal(size=(80, 20)).astype(np.float32),
            motion=rng.normal(size=(8, 234)).astype(np.float32),
            lyrics=rng.normal(size=(8, 768)).astype(np.float32),
        ))
    out = str(tmp_path / "pack")
    pack_dataset(str(src), out)
    return out


class TestNativeGather:
    def test_matches_numpy(self, pack_dir):
        ng = NativeGather(pack_dir)
        ds = PackedDataset(pack_dir, use_native=False)
        idx = np.array([7, 0, 3, 3])
        got = ng.gather(idx)
        want = ds.gather(idx)
        for k in ("mel", "motion", "lyrics"):
            np.testing.assert_array_equal(got[k], want[k])
        ng.close()

    def test_rows_and_shapes(self, pack_dir):
        ng = NativeGather(pack_dir)
        assert ng.rows == 10
        assert ng.shapes["mel"] == (20, 80)
        assert ng.shapes["lyrics"] == (20, 768)
        ng.close()

    def test_async_pipeline(self, pack_dir):
        ng = NativeGather(pack_dir)
        ds = PackedDataset(pack_dir, use_native=False)
        idx1 = np.array([1, 2])
        idx2 = np.array([8, 9])
        ng.submit(idx1)
        out1 = ng.wait()
        ng.submit(idx2)
        out2 = ng.wait()
        np.testing.assert_array_equal(out1["mel"], ds.gather(idx1)["mel"])
        np.testing.assert_array_equal(out2["lyrics"], ds.gather(idx2)["lyrics"])
        ng.close()

    def test_wait_during_gather_not_torn(self, tmp_path, monkeypatch):
        """Regression: wait() issued while the gather is in flight must block.

        Production-sized rows (516 frames -> ~2.2 MB/row) plus an injected
        worker delay (LM2A_LOADER_TEST_DELAY_US) widen the copy window; on the
        pre-fix code wait() returned as soon as the worker dequeued the
        request (has_request cleared before the memcpy), handing back torn
        batches. Mirrors the submit->wait-immediately pattern BatchIterator
        uses for the first batch of every epoch.
        """
        src = tmp_path / "npz"
        src.mkdir()
        rng = np.random.default_rng(7)
        n_rows, T = 8, 516
        for i in range(n_rows):
            save_sample(str(src / f"sample_{i:08d}.npz"), Sample(
                mel=rng.normal(size=(80, T)).astype(np.float32),
                motion=rng.normal(size=(180, 234)).astype(np.float32),
                lyrics=rng.normal(size=(180, 768)).astype(np.float32),
            ))
        out = str(tmp_path / "pack")
        pack_dataset(str(src), out)

        monkeypatch.setenv("LM2A_LOADER_TEST_DELAY_US", "20000")
        ng = NativeGather(out)
        ds = PackedDataset(out, use_native=False)
        try:
            for trial in range(5):
                idx = np.arange(n_rows, dtype=np.int64)
                np.random.default_rng(trial).shuffle(idx)
                ng.submit(idx)
                got = ng.wait()  # issued while the delayed gather is in flight
                want = ds.gather(idx)
                for k in ("mel", "motion", "lyrics"):
                    np.testing.assert_array_equal(
                        got[k], want[k],
                        err_msg=f"torn batch: key={k} trial={trial}")
        finally:
            ng.close()

    def test_queue_fifo_and_capacity(self, pack_dir, monkeypatch):
        """Up to 4 requests queue; the 5th is rejected (-2); wait() returns
        batches in submission order with correct contents."""
        monkeypatch.setenv("LM2A_LOADER_TEST_DELAY_US", "50000")
        ng = NativeGather(pack_dir)
        ds = PackedDataset(pack_dir, use_native=False)
        try:
            batches = [np.array([i, (i + 1) % 10]) for i in range(4)]
            for b in batches:
                ng.submit(b)
            with pytest.raises(RuntimeError, match="-2"):
                ng.submit(np.array([8, 9]))
            assert ng.pending == 4
            for b in batches:
                got = ng.wait()
                want = ds.gather(b)
                for k in ("mel", "motion", "lyrics"):
                    np.testing.assert_array_equal(got[k], want[k])
            assert ng.pending == 0
            # queue drained: capacity available again
            ng.submit(np.array([5]))
            ng.wait()
        finally:
            ng.close()

    def test_close_drains_queue(self, pack_dir, monkeypatch):
        monkeypatch.setenv("LM2A_LOADER_TEST_DELAY_US", "20000")
        ng = NativeGather(pack_dir)
        ng.submit(np.array([0, 1]))
        ng.submit(np.array([2, 3]))
        ng.close()  # must not crash or leak the in-flight copies

    def test_out_of_range_rejected(self, pack_dir):
        ng = NativeGather(pack_dir)
        with pytest.raises(IndexError):
            ng.gather(np.array([99]))
        ng.close()

    def test_batch_iterator_uses_native_pipeline(self, pack_dir):
        ds_native = PackedDataset(pack_dir, use_native=True)
        ds_numpy = PackedDataset(pack_dir, use_native=False)
        assert ds_native.native is not None
        a = list(BatchIterator(ds_native, 4, shuffle=True, seed=3))
        b = list(BatchIterator(ds_numpy, 4, shuffle=True, seed=3))
        assert len(a) == len(b) == 2
        for ba, bb in zip(a, b):
            for k in ("mel", "motion", "lyrics"):
                np.testing.assert_array_equal(ba[k], bb[k])


class TestAbandonedConsumers:
    def test_batch_iterator_abandoned_mid_epoch_keeps_fifo_aligned(
            self, pack_dir):
        """Breaking out of a native-pipelined epoch must drain the in-flight
        gather: the NEXT iteration over the same dataset must get ITS first
        batch, not last epoch's stale readahead."""
        ds = PackedDataset(pack_dir, use_native=True)
        ds_np = PackedDataset(pack_dir, use_native=False)
        it = iter(BatchIterator(ds, 4, shuffle=False))
        next(it)  # batch [0..3] consumed; batch [4..7] submitted
        it.close()  # abandon mid-epoch (what a capped val loop does)
        assert ds.native.pending == 0
        first = next(iter(BatchIterator(ds, 4, shuffle=False)))
        np.testing.assert_array_equal(
            first["mel"], ds_np.gather(np.arange(4))["mel"])

    def test_device_prefetch_abandonment_stops_producer(self, pack_dir):
        """Breaking out of device_prefetch must retire the producer thread
        and close the source iterator (draining its native readahead)."""
        import threading

        from lm2a_tpu.data.dataset import device_prefetch

        ds = PackedDataset(pack_dir, use_native=True)
        before = threading.active_count()
        gen = device_prefetch(iter(BatchIterator(ds, 2, shuffle=False)),
                              put_fn=lambda b: b)
        next(gen)
        gen.close()  # what an abandoning for-loop does at GC
        assert ds.native.pending == 0
        # the producer must have exited (join happens in the finally)
        assert threading.active_count() <= before

    def test_superbatch_stream_drain(self, pack_dir):
        from lm2a_tpu.data.dataset import SuperbatchStream

        ds = PackedDataset(pack_dir, use_native=True)
        stream = SuperbatchStream(ds, batch_size=2, k=2, base_seed=1,
                                  total_epochs=5)
        g = stream.epoch(0)
        next(g)  # readahead now queued
        g.close()
        assert ds.native.pending > 0  # cross-epoch readahead persists
        stream.drain()  # early-stop path in the training loop
        assert ds.native.pending == 0
        # FIFO clean: a fresh consumer of the same dataset is unaffected
        first = next(iter(BatchIterator(ds, 4, shuffle=False)))
        ds_np = PackedDataset(pack_dir, use_native=False)
        np.testing.assert_array_equal(
            first["mel"], ds_np.gather(np.arange(4))["mel"])


class TestSuperbatchStream:
    def test_matches_superbatch_iterator_across_epochs(self, pack_dir):
        """Cross-epoch readahead must yield the exact per-epoch stream the
        plain iterator produces (same seeded permutations)."""
        from lm2a_tpu.data.dataset import SuperbatchStream, superbatch_iterator

        ds_native = PackedDataset(pack_dir, use_native=True)
        ds_numpy = PackedDataset(pack_dir, use_native=False)
        stream = SuperbatchStream(ds_native, batch_size=2, k=2, base_seed=5,
                                  total_epochs=3)
        for epoch in range(3):
            got = list(stream.epoch(epoch))
            want = list(superbatch_iterator(ds_numpy, 2, 2, shuffle=True,
                                            seed=5 + epoch))
            assert [t for t, _ in got] == [t for t, _ in want]
            for (_, a), (_, b) in zip(got, want):
                for k in ("mel", "motion", "lyrics"):
                    np.testing.assert_array_equal(a[k], b[k])

    def test_readahead_crosses_epoch_boundary(self, pack_dir):
        """After finishing epoch 0, the next epoch's first groups are
        already queued in the native worker."""
        from lm2a_tpu.data.dataset import SuperbatchStream

        ds = PackedDataset(pack_dir, use_native=True)
        stream = SuperbatchStream(ds, batch_size=2, k=2, base_seed=1,
                                  total_epochs=2)
        list(stream.epoch(0))
        assert ds.native.pending > 0  # epoch 1 groups gathering already
        list(stream.epoch(1))
        assert ds.native.pending == 0  # total_epochs bound respected

    def test_epochs_must_be_sequential(self, pack_dir):
        from lm2a_tpu.data.dataset import SuperbatchStream

        ds = PackedDataset(pack_dir, use_native=True)
        stream = SuperbatchStream(ds, batch_size=2, k=2, total_epochs=4)
        list(stream.epoch(0))
        with pytest.raises(ValueError, match="in order"):
            list(stream.epoch(2))
