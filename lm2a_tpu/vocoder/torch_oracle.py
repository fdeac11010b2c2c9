"""Torch oracle of the BigVGAN generator (verification only).

NVIDIA's BigVGAN package/weights can't enter this image, so parity is
checked against this minimal torch implementation of the generator built
from the documented math — snake-beta activation, Kaiser-sinc anti-aliased
2x resampling (grouped conv_transpose/conv), dilated MRF convs, weight-
normed transposed convs — with EXACTLY the NVIDIA module/key layout
(``conv_pre``, ``ups.N.0``, ``resblocks.N.convs1/convs2/activations``,
``activation_post``, ``conv_post``; weight-norm ``weight_g``/``weight_v``
pairs). Its ``state_dict()`` is therefore shaped like the published
checkpoint, which makes it both (a) the numerical oracle for
``convert_bigvgan`` round-trips (tests/test_vocoder_torch_parity.py) and
(b) the synthetic full-size stand-in for the real
``nvidia/bigvgan_22khz_80band`` file in ``scripts/verify_external_assets.py``
until that file is obtainable (reference load sites:
``/root/reference/sometest/testwav.py:43-48``).

Requires torch; import only from verification paths.
"""

import numpy as np
import torch

from lm2a_tpu.vocoder.filters import kaiser_sinc_filter1d


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
