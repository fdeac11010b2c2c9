"""BigVGAN conversion parity against a torch oracle built in-test.

NVIDIA's BigVGAN code/weights aren't in this image (the reference's
``BigVGAN/`` folder is a download placeholder), so this test constructs the
generator's building blocks in torch from the documented math — snake-beta
activation, Kaiser-sinc anti-aliased 2x resampling via grouped
conv_transpose/conv, dilated convs, weight-normed transposed convs — runs
them with torch's conv semantics, and checks our flax generator with
converted weights matches. This exercises exactly the places conversion
bugs live: weight-norm folding, (Cout,Cin,K)/(Cin,Cout,K) layout
transposes, kernel flips, and padding arithmetic.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from lm2a_tpu.vocoder import (  # noqa: E402
    BigVGANGenerator,
    VocoderConfig,
    convert_bigvgan,
    downsample2x,
    kaiser_sinc_filter1d,
    upsample2x,
)

TINY = VocoderConfig(
    upsample_rates=(2, 2),
    upsample_kernel_sizes=(4, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
    activation="snakebeta",
    snake_logscale=True,
)


def torch_up2x(x, k=12):
    """Torch oracle of anti-aliased 2x upsampling (grouped conv_transpose)."""
    ratio = 2
    filt = torch.from_numpy(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))
    C = x.shape[1]
    pad = k // ratio - 1
    pad_left = pad * ratio + (k - ratio) // 2
    pad_right = pad * ratio + (k - ratio + 1) // 2
    x = torch.nn.functional.pad(x, (pad, pad), mode="replicate")
    y = ratio * torch.nn.functional.conv_transpose1d(
        x, filt.expand(C, 1, k), stride=ratio, groups=C
    )
    return y[..., pad_left : y.shape[-1] - pad_right]


def torch_down2x(x, k=12):
    ratio = 2
    filt = torch.from_numpy(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))
    C = x.shape[1]
    even = k % 2 == 0
    pad_left = k // 2 - int(even)
    pad_right = k // 2
    x = torch.nn.functional.pad(x, (pad_left, pad_right), mode="replicate")
    return torch.nn.functional.conv1d(x, filt.expand(C, 1, k), stride=ratio, groups=C)


def torch_snake_alias(x, alpha, beta, logscale=True):
    a = torch.exp(alpha) if logscale else alpha
    b = torch.exp(beta) if logscale else beta
    x = torch_up2x(x)
    x = x + torch.sin(a[None, :, None] * x) ** 2 / (b[None, :, None] + 1e-9)
    return torch_down2x(x)


class TorchOracleGenerator(torch.nn.Module):
    """Minimal BigVGAN generator with the NVIDIA module/key layout."""

    def __init__(self, cfg):
        super().__init__()
        wn = torch.nn.utils.weight_norm
        self.cfg = cfg
        ch = cfg.upsample_initial_channel
        self.conv_pre = wn(torch.nn.Conv1d(cfg.num_mels, ch, 7, padding=3))
        self.ups = torch.nn.ModuleList()
        self.resblocks = torch.nn.ModuleList()
        self.snakes = {}  # (name) -> params registered below
        params = {}
        for i, (r, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            self.ups.append(torch.nn.ModuleList([
                wn(torch.nn.ConvTranspose1d(ch, ch // 2, k, stride=r,
                                            padding=(k - r) // 2))
            ]))
            ch //= 2
            for j, (rk, dil) in enumerate(zip(cfg.resblock_kernel_sizes,
                                              cfg.resblock_dilation_sizes)):
                rb = torch.nn.Module()
                rb.convs1 = torch.nn.ModuleList([
                    wn(torch.nn.Conv1d(ch, ch, rk, dilation=d,
                                       padding=(rk * d - d) // 2)) for d in dil
                ])
                rb.convs2 = torch.nn.ModuleList([
                    wn(torch.nn.Conv1d(ch, ch, rk, padding=(rk - 1) // 2))
                    for _ in dil
                ])
                acts = torch.nn.ModuleList()
                for _ in range(2 * len(dil)):
                    a = torch.nn.Module()
                    inner = torch.nn.Module()
                    inner.alpha = torch.nn.Parameter(torch.randn(ch) * 0.1)
                    inner.beta = torch.nn.Parameter(torch.randn(ch) * 0.1)
                    a.act = inner
                    acts.append(a)
                rb.activations = acts
                self.resblocks.append(rb)
        post = torch.nn.Module()
        inner = torch.nn.Module()
        inner.alpha = torch.nn.Parameter(torch.randn(ch) * 0.1)
        inner.beta = torch.nn.Parameter(torch.randn(ch) * 0.1)
        post.act = inner
        self.activation_post = post
        self.conv_post = wn(torch.nn.Conv1d(ch, 1, 7, padding=3))

    def _amp_block(self, rb, x):
        for m, (c1, c2) in enumerate(zip(rb.convs1, rb.convs2)):
            a1 = rb.activations[2 * m].act
            a2 = rb.activations[2 * m + 1].act
            xt = torch_snake_alias(x, a1.alpha, a1.beta)
            xt = c1(xt)
            xt = torch_snake_alias(xt, a2.alpha, a2.beta)
            xt = c2(xt)
            x = x + xt
        return x

    def forward(self, mel):  # (B, 80, T)
        cfg = self.cfg
        x = self.conv_pre(mel)
        nk = len(cfg.resblock_kernel_sizes)
        for i in range(len(cfg.upsample_rates)):
            x = self.ups[i][0](x)
            acc = None
            for j in range(nk):
                y = self._amp_block(self.resblocks[i * nk + j], x)
                acc = y if acc is None else acc + y
            x = acc / nk
        p = self.activation_post.act
        x = torch_snake_alias(x, p.alpha, p.beta)
        x = self.conv_post(x)
        return torch.tanh(x)


class TestResamplerParity:
    def test_up2x_matches_torch(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 40)).astype(np.float32)  # (B, C, T)
        ref = torch_up2x(torch.from_numpy(x)).numpy()
        ours = np.asarray(upsample2x(jnp.asarray(x.transpose(0, 2, 1))))
        np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5)

    def test_down2x_matches_torch(self):
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 40)).astype(np.float32)
        ref = torch_down2x(torch.from_numpy(x)).numpy()
        ours = np.asarray(downsample2x(jnp.asarray(x.transpose(0, 2, 1))))
        np.testing.assert_allclose(ours.transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-5)


class TestGeneratorParity:
    def test_converted_generator_matches_torch_oracle(self):
        torch.manual_seed(0)
        tm = TorchOracleGenerator(TINY)
        tm.eval()
        rng = np.random.default_rng(2)
        mel = rng.normal(size=(1, 80, 24)).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(mel)).numpy()[:, 0, :]

        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = convert_bigvgan(sd, TINY)
        model = BigVGANGenerator(cfg=TINY)
        ours = np.asarray(model.apply(params, jnp.asarray(mel.transpose(0, 2, 1))))
        assert ours.shape == ref.shape
        mae = np.abs(ours - ref).mean()
        assert mae < 1e-4, f"vocoder conversion MAE {mae}"
