"""Data-layer golden test: alignment matches the reference MelDataset.

Loads the same synthetic npz shard through the reference's torch
``MelDataset`` (imported as an oracle) and our ``MelNpzDataset`` and checks
identical aligned tensors — mel transposed to (T, 80), motion/lyrics
linearly interpolated to the mel length ('interp' default).
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REF, "datasetcode")), reason="no reference"
)
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)

torch = pytest.importorskip("torch")

from lm2a_tpu.data import MelNpzDataset, Sample, save_sample  # noqa: E402


@pytest.fixture
def shard_dir(tmp_path):
    rng = np.random.default_rng(0)
    d = tmp_path / "npz"
    d.mkdir()
    # canonical geometry: mel (80, 516), motion (180, 234), lyrics (180, 768)
    save_sample(str(d / "sample_00000000.npz"), Sample(
        mel=rng.normal(size=(80, 516)).astype(np.float32),
        motion=rng.normal(size=(180, 234)).astype(np.float32),
        lyrics=rng.normal(size=(180, 768)).astype(np.float32),
    ))
    # ragged clip exercising the interp path at a different length
    save_sample(str(d / "sample_00000001.npz"), Sample(
        mel=rng.normal(size=(80, 97)).astype(np.float32),
        motion=rng.normal(size=(33, 234)).astype(np.float32),
        lyrics=rng.normal(size=(33, 768)).astype(np.float32),
    ))
    return str(d)


def test_alignment_matches_reference_dataset(shard_dir):
    from datasetcode.dataset import MelDataset as RefMelDataset

    ref_ds = RefMelDataset(shard_dir)  # align_mode 'interp' default
    ours = MelNpzDataset(shard_dir)
    assert len(ref_ds) == len(ours) == 2

    for i in range(2):
        ref = ref_ds[i]
        got = ours[i]
        np.testing.assert_allclose(
            got["mel"], ref["mel"].numpy(), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            got["motion"], ref["motion"].numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            got["lyrics"], ref["lyrics"].numpy(), rtol=1e-4, atol=1e-5
        )
        assert got["sr"] == ref["sr"]
        assert got["hop_length"] == ref["hop_length"]
