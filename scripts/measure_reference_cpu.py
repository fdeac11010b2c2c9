#!/usr/bin/env python3
"""Measure the reference PyTorch pipeline's CPU sampling throughput.

The reference publishes no benchmark numbers (BASELINE.md), so the measurable
baseline is its own sampling loop on CPU: UNet1D_ultimate at the production
configuration, CFG doubled-batch forwards, 1000-step DDPM protocol
(``/root/reference/sample.py:144-223``). We time a handful of steps and
extrapolate — each step costs the same one 2B-batch forward.

Writes ``baselines/reference_cpu.json`` with mel-frames/sec and metadata.
Requires the reference tree at /root/reference (read-only import, used only
as a measurement oracle).
"""

import json
import os
import platform
import sys
import time

REF = "/root/reference"
sys.path.insert(0, REF)

import numpy as np  # noqa: E402
import torch  # noqa: E402

from models.unet1d_ultimate import UNet1D_ultimate  # noqa: E402


def main(steps_to_time: int = 5, total_steps: int = 1000, T: int = 516):
    torch.manual_seed(0)
    model = UNet1D_ultimate(
        in_dim=80, base_dim=256, dim_mults=(1, 2, 4), cond_dim=128,
        time_emb_dim=256, num_res_blocks=2, mid_blocks=3, attn_heads=8,
    )
    model.eval()
    n_params = sum(p.numel() for p in model.parameters())

    B = 1
    x = torch.randn(2 * B, 80, T)  # CFG doubled batch
    t = torch.full((2 * B,), 500, dtype=torch.long)
    motion_f = torch.randn(2 * B, T, 128)
    text_f = torch.randn(2 * B, T, 128)

    with torch.no_grad():
        model(x, t, motion_f, text_f)  # warmup
        t0 = time.perf_counter()
        for _ in range(steps_to_time):
            model(x, t, motion_f, text_f)
        dt = time.perf_counter() - t0

    sec_per_step = dt / steps_to_time
    chain_seconds = sec_per_step * total_steps
    frames_per_sec = B * T / chain_seconds

    out = {
        "metric": "mel_frames_per_sec_cpu_reference",
        "frames_per_sec": frames_per_sec,
        "sec_per_cfg_step": sec_per_step,
        "chain_seconds_1000_steps": chain_seconds,
        "protocol": f"B=1, T={T}, CFG doubled batch, {total_steps}-step DDPM",
        "model_params": n_params,
        "torch_version": torch.__version__,
        "cpu": platform.processor() or platform.machine(),
        "num_threads": torch.get_num_threads(),
        "steps_timed": steps_to_time,
    }
    os.makedirs("baselines", exist_ok=True)
    with open("baselines/reference_cpu.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main(steps_to_time=int(sys.argv[1]) if len(sys.argv) > 1 else 5)
