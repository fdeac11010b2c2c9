"""Unit tests for signal ops: mel convention, resampling, motion features."""

import numpy as np
import pytest

from lm2a_tpu.core.config import MelConfig
from lm2a_tpu.ops import (
    RunningMoments,
    frame_count,
    gaussian_kernel,
    gaussian_smooth,
    linear_resample,
    match_len,
    mel_spectrogram,
    motion_features,
    slaney_mel_filterbank,
    stft_magnitude,
)


class TestMel:
    def test_canonical_clip_geometry(self):
        # 6 s at 22.05 kHz -> 516 mel frames (reference testnpz.py oracle)
        cfg = MelConfig()
        assert frame_count(6 * 22050, cfg) == 516

    def test_mel_shape_and_finiteness(self):
        cfg = MelConfig()
        rng = np.random.default_rng(0)
        wav = rng.uniform(-0.5, 0.5, size=6 * 22050).astype(np.float32)
        mel = np.asarray(mel_spectrogram(wav, cfg))
        assert mel.shape == (516, 80)
        assert np.isfinite(mel).all()
        # log(clip(., 1e-5)) floor
        assert mel.min() >= np.log(1e-5) - 1e-6

    def test_silence_hits_log_floor(self):
        cfg = MelConfig()
        wav = np.zeros(22050, dtype=np.float32)
        mel = np.asarray(mel_spectrogram(wav, cfg))
        # sqrt(1e-9) magnitudes times the filterbank are < 1e-5 nearly
        # everywhere, so silence should sit at the log floor.
        assert np.allclose(mel, np.log(1e-5), atol=1e-3)

    def test_stft_matches_torch_convention(self):
        """Golden test vs torch.stft with the BigVGAN call signature."""
        torch = pytest.importorskip("torch")
        cfg = MelConfig()
        rng = np.random.default_rng(1)
        wav = rng.uniform(-1, 1, size=3 * 22050).astype(np.float32)

        mag = np.asarray(stft_magnitude(wav, cfg))  # (frames, freq)

        pad = (cfg.n_fft - cfg.hop_size) // 2
        wt = torch.nn.functional.pad(
            torch.from_numpy(wav)[None], (pad, pad), mode="reflect"
        ).squeeze(0)
        spec = torch.stft(
            wt,
            cfg.n_fft,
            hop_length=cfg.hop_size,
            win_length=cfg.win_size,
            window=torch.hann_window(cfg.win_size),
            center=False,
            normalized=False,
            onesided=True,
            return_complex=True,
        )
        ref = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9).numpy().T
        assert mag.shape == ref.shape
        np.testing.assert_allclose(mag, ref, rtol=1e-4, atol=1e-4)

    def test_filterbank_rows_cover_band(self):
        fb = slaney_mel_filterbank(22050, 1024, 80)
        assert fb.shape == (80, 513)
        assert (fb >= 0).all()
        assert (fb.sum(axis=1) > 0).all()

    def test_filterbank_hand_derived_scalar(self):
        """Independent scalar derivation of filter 0 at FFT bin 1.

        Slaney scale: linear below 1 kHz with f_sp = 200/3 Hz/mel, log above
        with step ln(6.4)/27. For sr=22050 / n_fft=1024 / 80 mels / fmax=sr/2:
        mel_max = 15 + ln(11.025)/ (ln 6.4 / 27); 82 breakpoints; the first
        two breakpoints sit in the linear region.
        """
        f_sp = 200.0 / 3
        mel_max = 15.0 + np.log(11025.0 / 1000.0) / (np.log(6.4) / 27.0)
        dmel = mel_max / 81.0
        hz1 = dmel * f_sp  # first interior breakpoint (~40.6 Hz)
        hz2 = 2 * dmel * f_sp
        bin1 = 11025.0 / 512.0  # FFT bin 1 center (~21.5 Hz)
        expected = (bin1 / hz1) * (2.0 / hz2)  # rising edge x slaney norm
        fb = slaney_mel_filterbank(22050, 1024, 80)
        assert fb[0, 1] == pytest.approx(expected, rel=1e-5)
        # triangle peaks sit at the interior breakpoints
        mel_pts = np.linspace(0.0, mel_max, 82)
        hz_pts = np.where(
            mel_pts >= 15.0,
            1000.0 * np.exp((np.log(6.4) / 27.0) * (mel_pts - 15.0)),
            mel_pts * f_sp,
        )
        fftfreqs = np.linspace(0, 11025.0, 513)
        for m in (0, 20, 79):
            peak_bin = np.argmax(fb[m])
            nearest = np.argmin(np.abs(fftfreqs - hz_pts[m + 1]))
            assert abs(int(peak_bin) - int(nearest)) <= 1


class TestResample:
    def test_identity(self):
        x = np.arange(12, dtype=np.float32).reshape(6, 2)
        np.testing.assert_array_equal(linear_resample(x, 6), x)

    def test_matches_np_interp(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(180, 5)).astype(np.float32)
        out = linear_resample(x, 516)
        xs_new = np.linspace(0, 179, 516)
        for d in range(5):
            ref = np.interp(xs_new, np.arange(180), x[:, d])
            np.testing.assert_allclose(out[:, d], ref, rtol=1e-5, atol=1e-5)

    def test_match_len_repeat(self):
        x = np.ones((3, 4), dtype=np.float32) * np.arange(3)[:, None]
        out = match_len(x, 6, mode="repeat")
        assert out.shape == (6, 4)
        np.testing.assert_array_equal(out[3:], np.full((3, 4), 2.0))

    def test_match_len_truncate_and_empty(self):
        x = np.ones((10, 4), dtype=np.float32)
        assert match_len(x, 3, mode="repeat").shape == (3, 4)
        empty = np.zeros((0, 4), dtype=np.float32)
        out = match_len(empty, 5, mode="repeat")
        assert out.shape == (5, 4) and (out == 0).all()


class TestMotion:
    def test_gaussian_kernel_matches_reference_formula(self):
        k = gaussian_kernel(1.0)
        radius = 3
        xs = np.arange(-radius, radius + 1)
        ref = np.exp(-0.5 * xs**2)
        ref = ref / ref.sum()
        np.testing.assert_allclose(k, ref, rtol=1e-6)

    def test_smooth_matches_np_convolve_same(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=(50, 7)).astype(np.float32)
        out = gaussian_smooth(x, sigma=1.0)
        k = gaussian_kernel(1.0)
        for d in range(7):
            ref = np.convolve(x[:, d], k, mode="same")
            np.testing.assert_allclose(out[:, d], ref, rtol=1e-4, atol=1e-5)

    def test_velocity_acceleration_boundaries(self):
        """Quadratic track -> exact derivatives (interior) + reference's
        one-sided boundary formulas."""
        fps = 30.0
        dt = 1.0 / fps
        t = np.arange(10, dtype=np.float64) * dt
        x = (3.0 * t**2 + 2.0 * t + 1.0)[:, None].astype(np.float32)
        feats = motion_features(x, fps=fps, sigma=0.0)  # sigma=0: no smoothing
        assert feats.shape == (10, 3)
        pos, vel, acc = feats[:, 0], feats[:, 1], feats[:, 2]
        np.testing.assert_allclose(pos, x[:, 0], rtol=1e-5)
        # interior central difference of a quadratic is exact: v = 6t + 2
        np.testing.assert_allclose(vel[1:-1], 6.0 * t[1:-1] + 2.0, rtol=1e-3)
        # boundaries are one-sided first differences
        np.testing.assert_allclose(vel[0], (x[1, 0] - x[0, 0]) / dt, rtol=1e-4)
        np.testing.assert_allclose(acc[1:-1], 6.0, rtol=1e-2)
        # boundary acc uses shifted one-sided second difference
        ref_acc0 = (x[2, 0] - 2 * x[1, 0] + x[0, 0]) / dt**2
        np.testing.assert_allclose(acc[0], ref_acc0, rtol=1e-2)

    def test_feature_dim_is_234_for_smpl(self):
        x = np.zeros((180, 78), dtype=np.float32)
        assert motion_features(x).shape == (180, 234)


class TestMoments:
    def test_matches_reference_welford(self):
        """Chunked merge == row-by-row Welford == np.mean/std(ddof=1)."""
        rng = np.random.default_rng(4)
        chunks = [rng.normal(size=(n, 6)) * 3 + 1 for n in (17, 1, 40, 9)]
        rm = RunningMoments()
        for c in chunks:
            rm.update(c)
        allrows = np.concatenate(chunks, axis=0)
        np.testing.assert_allclose(rm.mean, allrows.mean(axis=0), rtol=1e-10)
        np.testing.assert_allclose(rm.std(), allrows.std(axis=0, ddof=1), rtol=1e-10)

    def test_single_row_std_is_one(self):
        rm = RunningMoments()
        rm.update(np.ones((1, 3)))
        np.testing.assert_array_equal(rm.std(), np.ones(3))


class TestMelWindowPadding:
    def test_short_window_matches_torch(self):
        """win_size < n_fft exercises the centered window zero-pad path."""
        torch = pytest.importorskip("torch")
        cfg = MelConfig(n_fft=1024, win_size=512, hop_size=256)
        rng = np.random.default_rng(7)
        wav = rng.uniform(-1, 1, size=22050).astype(np.float32)
        mag = np.asarray(stft_magnitude(wav, cfg))

        pad = (cfg.n_fft - cfg.hop_size) // 2
        wt = torch.nn.functional.pad(
            torch.from_numpy(wav)[None], (pad, pad), mode="reflect"
        ).squeeze(0)
        spec = torch.stft(
            wt, cfg.n_fft, hop_length=cfg.hop_size, win_length=cfg.win_size,
            window=torch.hann_window(cfg.win_size), center=False,
            normalized=False, onesided=True, return_complex=True,
        )
        ref = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9).numpy().T
        assert mag.shape == ref.shape
        np.testing.assert_allclose(mag, ref, rtol=1e-4, atol=1e-4)

    def test_alternate_geometry(self):
        """24 kHz / 100-band BigVGAN-v2-style convention also works."""
        cfg = MelConfig(n_fft=1024, num_mels=100, sample_rate=24000,
                        hop_size=256, win_size=1024)
        wav = np.zeros(24000, dtype=np.float32)
        mel = np.asarray(mel_spectrogram(wav, cfg))
        assert mel.shape[1] == 100
