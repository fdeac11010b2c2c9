"""Vocoder tests: filter correctness, anti-aliasing behavior, generator
shapes, and torch-checkpoint conversion structure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lm2a_tpu.vocoder import (
    BIGVGAN_BASE_22KHZ_80BAND,
    BigVGANGenerator,
    VocoderConfig,
    convert_bigvgan,
    downsample2x,
    kaiser_sinc_filter1d,
    upsample2x,
)

TINY = VocoderConfig(
    upsample_rates=(4, 2),
    upsample_kernel_sizes=(8, 4),
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3, 5),
    resblock_dilation_sizes=((1, 2), (1, 2)),
)


class TestFilters:
    def test_kaiser_window_matches_scipy(self):
        from scipy.signal.windows import kaiser as scipy_kaiser

        from lm2a_tpu.vocoder.filters import kaiser_beta, kaiser_window

        beta = kaiser_beta(6, 4 * 0.3)
        ours = kaiser_window(12, beta)
        ref = scipy_kaiser(12, beta, sym=True)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_filter_unit_dc_gain(self):
        f = kaiser_sinc_filter1d(0.25, 0.3, 12)
        assert f.sum() == pytest.approx(1.0, abs=1e-6)
        np.testing.assert_allclose(f, f[::-1], rtol=1e-6)  # symmetric (even K)

    def test_upsample_preserves_lowband_tone(self):
        """A low-frequency tone survives 2x up / 2x down nearly unchanged."""
        t = np.arange(512) / 512
        x = np.sin(2 * np.pi * 8 * t).astype(np.float32)[None, :, None]
        up = upsample2x(jnp.asarray(x))
        assert up.shape == (1, 1024, 1)
        down = np.asarray(downsample2x(up))
        assert down.shape == (1, 512, 1)
        # ignore boundary taps
        np.testing.assert_allclose(down[0, 16:-16, 0], x[0, 16:-16, 0], atol=2e-2)

    def test_upsample_is_bandlimited(self):
        """After 2x upsampling, the image band (above old Nyquist) is tiny."""
        rng = np.random.default_rng(0)
        x = rng.standard_normal((1, 1024, 1)).astype(np.float32)
        up = np.asarray(upsample2x(jnp.asarray(x)))[0, :, 0]
        spec = np.abs(np.fft.rfft(up * np.hanning(len(up))))
        n = len(spec)
        low = spec[: n // 2].mean()
        high = spec[int(n * 0.6) :].mean()
        assert high < 0.05 * low


class TestGenerator:
    def test_output_shape_and_range(self):
        model = BigVGANGenerator(cfg=TINY)
        mel = jax.random.normal(jax.random.key(0), (2, 24, 80))
        params = model.init(jax.random.key(1), mel)
        wav = model.apply(params, mel)
        assert wav.shape == (2, 24 * TINY.hop)  # hop = 4*2 = 8
        assert float(jnp.max(jnp.abs(wav))) <= 1.0

    def test_hop_matches_mel_config(self):
        assert VocoderConfig().hop == 256
        assert BIGVGAN_BASE_22KHZ_80BAND.hop == 256


class TestConvert:
    def _fake_torch_sd(self, cfg):
        """Weight-normed generator state dict with the NVIDIA key layout."""
        rng = np.random.default_rng(0)
        sd = {}

        def conv(prefix, cout, cin, k):
            v = rng.standard_normal((cout, cin, k)).astype(np.float32)
            sd[prefix + ".weight_g"] = np.linalg.norm(
                v.reshape(cout, -1), axis=1
            ).reshape(cout, 1, 1) * 0.5
            sd[prefix + ".weight_v"] = v
            sd[prefix + ".bias"] = rng.standard_normal(cout).astype(np.float32)

        def convt(prefix, cin, cout, k):
            v = rng.standard_normal((cin, cout, k)).astype(np.float32)
            sd[prefix + ".weight_g"] = np.linalg.norm(
                v.reshape(cin, -1), axis=1
            ).reshape(cin, 1, 1) * 0.5
            sd[prefix + ".weight_v"] = v
            sd[prefix + ".bias"] = rng.standard_normal(cout).astype(np.float32)

        def snake(prefix, ch):
            sd[prefix + ".alpha"] = rng.standard_normal(ch).astype(np.float32)
            sd[prefix + ".beta"] = rng.standard_normal(ch).astype(np.float32)

        ch0 = cfg.upsample_initial_channel
        conv("conv_pre", ch0, cfg.num_mels, 7)
        ch = ch0
        nk = len(cfg.resblock_kernel_sizes)
        for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            convt(f"ups.{i}.0", ch, ch // 2, k)
            ch //= 2
            for j, (rk, dil) in enumerate(
                zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
            ):
                rb = f"resblocks.{i * nk + j}"
                for m in range(len(dil)):
                    conv(f"{rb}.convs1.{m}", ch, ch, rk)
                    conv(f"{rb}.convs2.{m}", ch, ch, rk)
                    snake(f"{rb}.activations.{2 * m}.act", ch)
                    snake(f"{rb}.activations.{2 * m + 1}.act", ch)
        snake("activation_post.act", ch)
        conv("conv_post", 1, ch, 7)
        return sd

    def test_converted_params_load_and_run(self):
        model = BigVGANGenerator(cfg=TINY)
        sd = self._fake_torch_sd(TINY)
        params = convert_bigvgan(sd, TINY)
        # structure must match the module's own init exactly
        mel = jnp.zeros((1, 16, 80))
        ref_params = model.init(jax.random.key(0), mel)
        ref_shapes = jax.tree.map(lambda a: a.shape, ref_params)
        got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
        assert ref_shapes == got_shapes
        wav = model.apply(params, mel)
        assert wav.shape == (1, 16 * TINY.hop)
        assert np.isfinite(np.asarray(wav)).all()

    def test_weight_norm_folding(self):
        from lm2a_tpu.vocoder.convert import _fold_weight_norm

        rng = np.random.default_rng(1)
        v = rng.standard_normal((4, 3, 5)).astype(np.float32)
        g = np.full((4, 1, 1), 2.0, dtype=np.float32)
        w = _fold_weight_norm({"x.weight_g": g, "x.weight_v": v}, "x")
        norms = np.linalg.norm(w.reshape(4, -1), axis=1)
        np.testing.assert_allclose(norms, 2.0, rtol=1e-5)


class TestAMPBlock2:
    def test_resblock_type_2_shapes(self):
        cfg2 = VocoderConfig(
            upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
            upsample_initial_channel=32,
            resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 2),),
            resblock_type="2",
        )
        model = BigVGANGenerator(cfg=cfg2)
        mel = jax.random.normal(jax.random.key(0), (1, 16, 80))
        params = model.init(jax.random.key(1), mel)
        wav = model.apply(params, mel)
        assert wav.shape == (1, 16 * cfg2.hop)
        # AMPBlock2 params: conv_/act_ (no conv1_/conv2_)
        blk = params["params"]["resblock_0_0"]
        assert "conv_0" in blk and "conv1_0" not in blk

    def test_v2_presets(self):
        from lm2a_tpu.vocoder import BIGVGAN_V2_24KHZ_100BAND, BIGVGAN_V2_44KHZ_128BAND

        assert BIGVGAN_V2_24KHZ_100BAND.hop == 256
        assert BIGVGAN_V2_24KHZ_100BAND.num_mels == 100
        assert BIGVGAN_V2_44KHZ_128BAND.hop == 512
        # NVIDIA v2 models ship use_bias_at_final=false, use_tanh_at_final=false
        for c in (BIGVGAN_V2_24KHZ_100BAND, BIGVGAN_V2_44KHZ_128BAND):
            assert not c.use_bias_at_final and not c.use_tanh_at_final


class TestV2FinalLayer:
    """v2 semantics: bias-less conv_post + clamp (not tanh) at the output."""

    TINY_V2 = VocoderConfig(
        upsample_rates=(4, 2),
        upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 5),
        resblock_dilation_sizes=((1, 2), (1, 2)),
        use_bias_at_final=False,
        use_tanh_at_final=False,
    )

    def test_conv_post_has_no_bias(self):
        model = BigVGANGenerator(cfg=self.TINY_V2)
        mel = jnp.zeros((1, 8, 80))
        params = model.init(jax.random.key(0), mel)
        assert "bias" not in params["params"]["conv_post"]

    def test_convert_accepts_biasless_conv_post(self):
        sd = TestConvert()._fake_torch_sd(self.TINY_V2)
        del sd["conv_post.bias"]  # v2 checkpoints carry no final bias
        params = convert_bigvgan(sd, self.TINY_V2)
        model = BigVGANGenerator(cfg=self.TINY_V2)
        mel = jnp.zeros((1, 8, 80))
        ref_shapes = jax.tree.map(
            lambda a: a.shape, model.init(jax.random.key(0), mel)
        )
        got_shapes = jax.tree.map(lambda a: np.asarray(a).shape, params)
        assert ref_shapes == got_shapes
        wav = model.apply(params, mel)
        assert np.isfinite(np.asarray(wav)).all()

    def test_output_is_clamped_not_tanh(self):
        """Scale conv_post weights so pre-activation exceeds 1: a tanh would
        squash smoothly (max < 1), a clamp saturates at exactly 1."""
        model = BigVGANGenerator(cfg=self.TINY_V2)
        mel = jax.random.normal(jax.random.key(0), (1, 16, 80))
        params = model.init(jax.random.key(1), mel)
        big = jax.tree.map(lambda a: a, params)
        import flax

        big = flax.core.unfreeze(big) if hasattr(flax.core, "unfreeze") else big
        big["params"]["conv_post"]["kernel"] = (
            big["params"]["conv_post"]["kernel"] * 1e4
        )
        wav = np.asarray(model.apply(big, mel))
        assert wav.max() == pytest.approx(1.0)
        assert wav.min() == pytest.approx(-1.0)


class TestScipyPolyphaseOracle:
    """Independently-derived oracle (VERDICT r1 #7): the resamplers must
    agree with scipy.signal.upfirdn polyphase filtering away from edges.

    The round-1 torch oracle shared its author with the implementation;
    upfirdn implements the same published polyphase math from an independent
    codebase, so a padding/ordering misunderstanding in both our module and
    our oracle would be caught here. Alignment is located by exact match
    search AND pinned to one offset (an off-by-one would shift it)."""

    @staticmethod
    def _best_alignment(ours, ref, max_shift=48):
        """(offset, max_abs_err) minimizing error of ours vs ref[off:off+n]."""
        n = len(ours)
        best = (None, np.inf)
        for off in range(0, max(1, len(ref) - n), 1):
            if off > max_shift and best[0] is not None:
                break
            err = float(np.max(np.abs(ours - ref[off:off + n])))
            if err < best[1]:
                best = (off, err)
        return best

    def test_upsample2x_matches_upfirdn(self):
        from scipy.signal import upfirdn

        from lm2a_tpu.vocoder.filters import kaiser_sinc_filter1d

        rng = np.random.default_rng(3)
        T, K = 256, 12
        x = rng.standard_normal(T).astype(np.float32)
        ours = np.asarray(upsample2x(jnp.asarray(x[None, :, None])))[0, :, 0]
        filt = kaiser_sinc_filter1d(0.25, 0.3, K).astype(np.float64)
        ref = upfirdn(2.0 * filt, x.astype(np.float64), up=2)
        trim = 2 * K  # edge-padding differs (ours replicates, upfirdn zeros)
        off, err = self._best_alignment(ours[trim:-trim], ref, max_shift=48)
        # zero-stuffed x starts at ref index 0 with filter delay (K-1);
        # our slice starts pad_left - (K-1) samples into the full conv of
        # the unpadded signal -> expected offset trim + ratio*pad - delay
        # collapses to trim + 10 - 5 = trim + 5 for K=12.
        assert off == trim + 5, f"alignment off={off}, expected {trim + 5}"
        assert err < 1e-5, f"max interior error {err}"

    def test_downsample2x_matches_upfirdn(self):
        from scipy.signal import upfirdn

        from lm2a_tpu.vocoder.filters import kaiser_sinc_filter1d

        rng = np.random.default_rng(4)
        T, K = 512, 12
        x = rng.standard_normal(T).astype(np.float32)
        ours = np.asarray(downsample2x(jnp.asarray(x[None, :, None])))[0, :, 0]
        filt = kaiser_sinc_filter1d(0.25, 0.3, K).astype(np.float64)
        ref = upfirdn(filt, x.astype(np.float64), down=2)
        trim = K
        off, err = self._best_alignment(ours[trim:-trim], ref, max_shift=24)
        # our m-th output taps x[2m-5 : 2m+7]; upfirdn's taps
        # x[2m-11 : 2m+1] -> ref index m+3, so offset = trim + 3 for K=12.
        assert off == trim + 3, f"alignment off={off}, expected {trim + 3}"
        assert err < 1e-5, f"max interior error {err}"

    def test_snake_sandwich_matches_scipy_pipeline(self):
        """Full SnakeAlias (up2x -> snake -> down2x) vs an all-scipy/numpy
        reimplementation of the published alias-free activation."""
        from scipy.signal import upfirdn

        from lm2a_tpu.vocoder.bigvgan import SnakeAlias
        from lm2a_tpu.vocoder.filters import kaiser_sinc_filter1d

        rng = np.random.default_rng(5)
        T, K, C = 384, 12, 2
        x = rng.standard_normal((1, T, C)).astype(np.float32) * 0.5
        mod = SnakeAlias(channels=C, beta=True, logscale=True)
        params = mod.init(jax.random.key(0), jnp.asarray(x))
        # set distinct alphas/betas so the test sees per-channel modulation
        params = jax.tree.map(np.asarray, params)
        params["params"]["alpha"] = np.array([0.1, -0.2], np.float32)
        params["params"]["beta"] = np.array([-0.3, 0.4], np.float32)
        ours = np.asarray(mod.apply(params, jnp.asarray(x)))

        filt = kaiser_sinc_filter1d(0.25, 0.3, K).astype(np.float64)
        trim = 2 * K
        for c in range(C):
            up = upfirdn(2.0 * filt, x[0, :, c].astype(np.float64), up=2)
            a = np.exp(params["params"]["alpha"][c])
            b = np.exp(params["params"]["beta"][c])
            act = up + np.sin(a * up) ** 2 / (b + 1e-9)
            # Our up stage leads upfirdn by 5 samples (see upsample test), so
            # our decimator taps act_ref[2m : 2m+12]: the ODD phase of the
            # full convolution, full[2m + (K-1)] -> full[11::2][m] exactly.
            full = np.convolve(act, filt)
            expect = full[K - 1 :: 2]
            seg = ours[0, trim:-trim, c]
            err = float(np.max(np.abs(seg - expect[trim:trim + len(seg)])))
            assert err < 1e-4, f"channel {c}: max interior error {err}"


class TestFusedSandwich:
    """The Pallas fused up2x->snake->down2x kernel (interpret mode on CPU)
    must match the XLA polyphase path exactly."""

    def _ref(self, x, alpha, beta):
        y = upsample2x(x)
        y = y + jnp.sin(alpha * y) ** 2 / (beta + 1e-9)
        return downsample2x(y)

    @pytest.mark.parametrize(
        "shape", [(1, 37, 8), (2, 64, 8), (1, 516, 24), (2, 130, 16),
                  (1, 1, 8), (1, 129, 8)])
    def test_matches_xla_path(self, shape):
        from lm2a_tpu.vocoder.pallas_sandwich import fused_snake_sandwich

        rng = np.random.default_rng(sum(shape))
        b, t, c = shape
        x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
        alpha = jnp.asarray(rng.uniform(0.3, 2.0, (c,)), jnp.float32)
        beta = jnp.asarray(rng.uniform(0.3, 2.0, (c,)), jnp.float32)
        got = fused_snake_sandwich(x, alpha, beta)
        ref = self._ref(x, alpha, beta)
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)

    def test_multi_block_grid(self):
        """T spanning several ragged grid blocks exercises the neighbor
        halos and both boundary fixes at true block seams."""
        from lm2a_tpu.vocoder import pallas_sandwich as ps

        rng = np.random.default_rng(0)
        c = 64
        bt = max(128, min(16384, (ps._TARGET_ELEMS // c) // 128 * 128))
        t = 3 * bt + 77  # 4 blocks, last one ragged
        x = jnp.asarray(rng.standard_normal((1, t, c)), jnp.float32)
        alpha = jnp.asarray(rng.uniform(0.3, 2.0, (c,)), jnp.float32)
        beta = jnp.asarray(rng.uniform(0.3, 2.0, (c,)), jnp.float32)
        got = ps.fused_snake_sandwich(x, alpha, beta)
        ref = self._ref(x, alpha, beta)
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5)

    def test_generator_fused_matches_unfused(self):
        rng = np.random.default_rng(3)
        mel = jnp.asarray(
            rng.standard_normal((1, 24, TINY.num_mels)), jnp.float32)
        base = BigVGANGenerator(cfg=TINY, dtype=jnp.float32)
        params = base.init(jax.random.key(0), mel)
        ref = base.apply(params, mel)
        fused = BigVGANGenerator(cfg=TINY, fused_sandwich=True,
                                 dtype=jnp.float32)
        got = fused.apply(params, mel)
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5)
