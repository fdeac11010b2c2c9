#!/usr/bin/env python3
"""Headline benchmark: mel frames/sec/chip in DDPM sampling.

Protocol (reference parity, BASELINE.md): flagship UNet1DUltimate at the
production configuration (base 256, mults (1,2,4), 134M params), one
canonical 6 s clip (B=1, T=516, 80 mel bins), classifier-free guidance 2.1
(doubled-batch forwards), full 1000-step ancestral DDPM chain — compiled as
a single lax.scan, bf16 activations.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
``vs_baseline`` is the speedup over the measured torch-CPU reference
(baselines/reference_cpu.json; ~0.51 frames/sec on this image).
All diagnostics go to stderr.
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    # Persistent compile cache: the axon remote-compile path costs minutes
    # for the big scan program; cache it across bench invocations.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from lm2a_tpu.core.config import DiffusionConfig, ModelConfig
    from lm2a_tpu.diffusion import make_sampler, make_schedule
    from lm2a_tpu.models.factory import build_denoiser

    dev = jax.devices()[0]
    log(f"device: {dev.platform} / {dev.device_kind}")

    # production defaults; LM2A_FUSED_RESBLOCK=0 / LM2A_FOLDED_ATTENTION=0
    # opt out of the Pallas fused-resblock kernel / the folded cross-attention
    # algebra for A/B runs
    cfg = ModelConfig(
        fused_resblock=os.environ.get("LM2A_FUSED_RESBLOCK", "1") == "1",
        folded_attention=os.environ.get("LM2A_FOLDED_ATTENTION", "1") == "1",
    )
    B, T, steps, guidance = 1, 516, 1000, 2.1

    denoiser = build_denoiser(cfg, "bfloat16")
    schedule = make_schedule(DiffusionConfig(timesteps=steps))

    key = jax.random.key(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    x = jax.random.normal(k1, (B, T, cfg.in_dim), jnp.float32)
    motion_f = jax.random.normal(k2, (B, T, cfg.cond_dim), jnp.float32)
    text_f = jax.random.normal(k3, (B, T, cfg.cond_dim), jnp.float32)
    t0 = time.perf_counter()
    params = jax.jit(denoiser.init)(k4, x, jnp.zeros((B,), jnp.int32), motion_f, text_f)
    jax.block_until_ready(params)
    log(f"init: {time.perf_counter() - t0:.1f}s, "
        f"params: {sum(p.size for p in jax.tree.leaves(params)):,}")

    # uncond_fast constant-folds the CFG uncond rows' cross-attention —
    # exact math (tested to 1e-5 vs the plain forward); measured 1.20x on
    # the 1000-step chain (1.029 s -> 0.858 s, v5e).
    sampler = make_sampler(denoiser.apply, schedule, guidance_weight=guidance,
                           uncond_fast=True)

    shape = (B, T, cfg.in_dim)
    t0 = time.perf_counter()
    out = sampler(params, jax.random.key(1), shape, motion_f, text_f)
    out.block_until_ready()
    log(f"compile+first run: {time.perf_counter() - t0:.1f}s")
    assert bool(jnp.isfinite(out).all()), "non-finite sample"

    # Chip-relative accounting: XLA cost analysis of one CFG forward (the
    # doubled-batch denoiser call that dominates each of the `steps` scan
    # iterations; the pointwise update ops are negligible) -> MFU. Cost
    # analysis counts a lax.scan body once, so the chain total is step*steps.
    from lm2a_tpu.utils.profiling import compiled_flops, device_peak_flops

    # FLOPs from the forward the sampler ACTUALLY runs (uncond_rows folds the
    # uncond half's cross-attention), so MFU reflects executed work. Count on
    # the plain-XLA forward: cost analysis cannot see inside Pallas kernels,
    # and the fused path does the same math.
    import dataclasses as _dc

    denoiser_count = build_denoiser(
        _dc.replace(cfg, fused_resblock=False), "bfloat16")
    cfg_rows = 2 * B if guidance > 1.0 else B
    fwd = jax.jit(lambda p, x, t, m, l: denoiser_count.apply(
        p, x, t, m, l, uncond_rows=B if guidance > 1.0 else 0))
    step_flops = compiled_flops(
        fwd, params,
        jnp.zeros((cfg_rows, T, cfg.in_dim), jnp.float32),
        jnp.zeros((cfg_rows,), jnp.int32),
        jnp.zeros((cfg_rows, T, cfg.cond_dim), jnp.float32),
        jnp.zeros((cfg_rows, T, cfg.cond_dim), jnp.float32),
    )
    chain_flops = step_flops * steps if step_flops else None
    peak = device_peak_flops(dev)
    if chain_flops:
        log(f"FLOPs: {step_flops:.4g}/step (CFG fwd, {cfg_rows} rows) "
            f"-> {chain_flops:.4g}/chain")
    if peak:
        log(f"peak bf16 FLOP/s for {dev.device_kind}: {peak:.4g}")

    # Timed runs end with a scalar VALUE fetch, not block_until_ready():
    # through the axon relay block_until_ready() can return before the
    # computation finishes (measured: a 4.5 s chain "timed" at 0.00 s), while
    # a fetch is a true sync. The fetch's ~20-30 ms round-trip is included —
    # a conservative bias well under the chain's run-to-run noise.
    runs = 3
    times = []
    for i in range(runs):
        t0 = time.perf_counter()
        out = sampler(params, jax.random.key(2 + i), shape, motion_f, text_f)
        float(jnp.abs(out).sum())
        times.append(time.perf_counter() - t0)
    best = min(times)
    frames_per_sec = B * T / best
    log(f"chain seconds (best of {runs}): {best:.3f}  times={['%.3f' % t for t in times]}")

    mfu = None
    if chain_flops and peak:
        mfu = chain_flops / best / peak
        log(f"sustained {chain_flops / best / 1e12:.1f} TFLOP/s -> MFU {mfu:.1%}")

    vs_baseline = None
    base_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "baselines", "reference_cpu.json")
    if os.path.exists(base_path):
        with open(base_path) as f:
            base = json.load(f)
        vs_baseline = frames_per_sec / base["frames_per_sec"]

    # Secondary metrics (stderr): batched serving throughput and the
    # mel->wav vocode leg (BASELINE.md config 4). Opt out: BENCH_EXTRAS=0.
    if os.environ.get("BENCH_EXTRAS", "1") == "1":
        try:
            bs = 8
            mfb = jnp.broadcast_to(motion_f, (bs, T, cfg.cond_dim))
            tfb = jnp.broadcast_to(text_f, (bs, T, cfg.cond_dim))
            out = sampler(params, jax.random.key(9), (bs, T, cfg.in_dim), mfb, tfb)
            float(jnp.abs(out).sum())  # warm (compile) + true sync
            bt = None
            for i in (10, 11):  # distinct keys: the relay dedupes repeats
                t0 = time.perf_counter()
                out = sampler(params, jax.random.key(i), (bs, T, cfg.in_dim),
                              mfb, tfb)
                float(jnp.abs(out).sum())
                dt = time.perf_counter() - t0
                bt = dt if bt is None else min(bt, dt)
            # count on the unfused forward (cost analysis can't see inside
            # Pallas kernels; same math either way)
            bfwd = jax.jit(lambda p, x, t, m, l: denoiser_count.apply(
                p, x, t, m, l, uncond_rows=bs))
            bflops = compiled_flops(
                bfwd, params,
                jnp.zeros((2 * bs, T, cfg.in_dim), jnp.float32),
                jnp.zeros((2 * bs,), jnp.int32),
                jnp.zeros((2 * bs, T, cfg.cond_dim), jnp.float32),
                jnp.zeros((2 * bs, T, cfg.cond_dim), jnp.float32),
            )
            bflops = bflops * steps if bflops else None
            bmfu = f", MFU {bflops / bt / peak:.1%}" if bflops and peak else ""
            log(f"extra: batched sampling B={bs}: {bt:.2f}s/chain -> "
                f"{bs * T / bt:.0f} frames/sec/chip{bmfu}")
        except Exception as e:
            log(f"extra: batched sampling failed: {e}")
        try:
            from lm2a_tpu.vocoder import BIGVGAN_22KHZ_80BAND, BigVGANGenerator

            voc = BigVGANGenerator(
                cfg=BIGVGAN_22KHZ_80BAND,
                fused_sandwich=jax.default_backend() == "tpu",
                dtype=jnp.bfloat16)
            mel = jax.random.normal(jax.random.key(11), (1, T, 80), jnp.float32)
            vparams = jax.jit(voc.init)(jax.random.key(12), mel)
            wav_shape = jax.eval_shape(voc.apply, vparams, mel).shape

            # chained scan (data dependency) so repeats can't overlap or
            # dedupe through the relay; per-call = chain / iters
            viters = 20

            @jax.jit
            def vocode_chain(p, m0):
                def step(m, _):
                    w = voc.apply(p, m)
                    return m + jnp.sum(w).astype(m.dtype) * 1e-30, ()
                m, _ = jax.lax.scan(step, m0, None, length=viters)
                return m

            float(jnp.abs(vocode_chain(vparams, mel)).sum())  # warm
            # 3 reps with distinct inputs, best-of: the first timed run of a
            # freshly-compiled executable can read several x high even
            # through a value fetch (DEVNOTES measurement discipline)
            vt = float("inf")
            for rep in range(3):
                t0 = time.perf_counter()
                out = vocode_chain(vparams, mel * (1.0 + 1e-3 * (rep + 1)))
                float(jnp.abs(out).sum())
                vt = min(vt, (time.perf_counter() - t0) / viters)
            log(f"extra: BigVGAN vocode (1, 516, 80) -> {wav_shape}: "
                f"{vt * 1e3:.1f} ms (chained x{viters})")
            log(f"extra: sample+vocode wall-clock per 6s clip: {best + vt:.3f}s")
        except Exception as e:
            log(f"extra: vocode bench failed: {e}")
        try:
            # steady-state serve throughput, mel -> wav (round-3 VERDICT #4):
            # drive the REAL serve_loop with batched wav requests against a
            # random-init flagship-geometry vocoder; the writer thread
            # overlaps npz/wav writes with the next request's device chain.
            import io
            import tempfile

            from lm2a_tpu.cli.serve import serve_loop
            from lm2a_tpu.data import Sample, save_sample
            from lm2a_tpu.inference.sample import LoadedModels
            from lm2a_tpu.models.factory import build_cond_projection
            from lm2a_tpu.vocoder import Vocoder

            import numpy as _np

            scfg = __import__("lm2a_tpu.core.config",
                              fromlist=["LM2AConfig"]).LM2AConfig()
            import dataclasses as _dc2

            scfg = _dc2.replace(scfg, model=cfg)
            cond_proj = build_cond_projection(cfg, "bfloat16")
            cp_params = jax.jit(cond_proj.init)(
                jax.random.key(21),
                jnp.zeros((1, T, cfg.motion_dim), jnp.float32),
                jnp.zeros((1, T, cfg.text_dim), jnp.float32))
            # serve at DDIM-50 (the few-step serving configuration)
            models = LoadedModels(
                cfg=scfg, denoiser=denoiser, cond_proj=cond_proj,
                unet_params=params, proj_params=cp_params,
                dataset_mean=-4.637, dataset_std=1.865, timesteps=1000)
            voc = Vocoder(weights_path=None, compute_dtype=jnp.bfloat16)
            rng = _np.random.default_rng(0)
            with tempfile.TemporaryDirectory() as td:
                clips = []
                for i in range(8):
                    p = os.path.join(td, f"clip{i}.npz")
                    save_sample(p, Sample(
                        mel=rng.normal(size=(80, T)).astype(_np.float32),
                        motion=rng.normal(size=(180, 234)).astype(_np.float32),
                        lyrics=rng.normal(size=(180, 768)).astype(_np.float32)))
                    clips.append(p)
                reqs = [json.dumps({"npz": clips, "id": f"warm",
                                    "method": "ddim", "steps": 1000,
                                    "guidance": 2.1, "wav": True,
                                    "out_dir": os.path.join(td, "out")})]
                outbuf = io.StringIO()
                serve_loop(models, reqs, outbuf, vocoder=voc,
                           out_dir=os.path.join(td, "out"))  # warm compile
                n_req = 3
                req_objs = [{"npz": clips, "id": f"r{i}", "seed": i,
                             "method": "ddim", "steps": 1000,
                             "guidance": 2.1, "wav": True,
                             "out_dir": os.path.join(td, "out")}
                            for i in range(n_req)]

                # per-request latency under continuous load (round-4 VERDICT
                # #7): send time = when serve_loop pulls the request from the
                # stream, reply time = when its response line hits the output
                # stream (the IO thread emits as soon as host IO finishes)
                pull_t, reply_t = {}, {}

                def timed_requests():
                    for r in req_objs:
                        pull_t[r["id"]] = time.perf_counter()
                        yield json.dumps(r)

                class TimedOut(io.StringIO):
                    def write(self, s):
                        r = super().write(s)
                        if "\n" in s:
                            for line in s.strip().splitlines():
                                try:
                                    rid = json.loads(line).get("id")
                                except Exception:
                                    continue
                                reply_t.setdefault(rid, time.perf_counter())
                        return r

                outbuf = TimedOut()
                t0 = time.perf_counter()
                served = serve_loop(models, timed_requests(), outbuf,
                                    vocoder=voc,
                                    out_dir=os.path.join(td, "out"))
                dt = time.perf_counter() - t0
                clips_per_s = served * len(clips) / dt
                log(f"extra: serve steady-state (B=8 DDIM-50 mel->wav npz, "
                    f"{served}x{len(clips)} clips): {dt:.2f}s -> "
                    f"{clips_per_s:.1f} clips/s ({clips_per_s * 6:.0f}x "
                    f"realtime)")
                lats = sorted(reply_t[i] - pull_t[i]
                              for i in pull_t if i in reply_t)
                if lats:
                    mid = len(lats) // 2
                    p50 = (lats[mid] if len(lats) % 2
                           else 0.5 * (lats[mid - 1] + lats[mid]))
                    p95 = lats[min(len(lats) - 1,
                                   int(round(0.95 * (len(lats) - 1))))]
                    log(f"extra: serve request latency (B=8 batch request, "
                        f"pull->reply): p50 {p50:.2f}s p95 {p95:.2f}s "
                        f"over {len(lats)} requests")
        except Exception as e:
            log(f"extra: serve bench failed: {e}")
        try:
            # training throughput at the measured frontier config (round-4
            # VERDICT #3): bs32 device-data fused multistep — the knee of the
            # bs sweep (DEVNOTES: bs16 223k / bs32 245k / bs64 246k
            # frames/s; eff MFU 37.9 -> 41.7 -> 41.8%)
            import numpy as _np2

            from lm2a_tpu.core.config import (
                LM2AConfig as _L,
                TrainConfig as _TC,
            )
            from lm2a_tpu.diffusion.schedule import (
                make_schedule as _mk_sched,
            )
            from lm2a_tpu.models.factory import (
                build_cond_projection as _bcp,
            )
            from lm2a_tpu.training.train_step import (
                init_train_state as _its,
                make_device_data_multistep as _mdm,
            )

            tb, tk, tn = 32, 50, 64
            tcfg = _L(model=cfg, train=_TC(batch_size=tb,
                                           opt_dtype="bfloat16",
                                           steps_per_call=tk))
            tden = build_denoiser(tcfg.model, "bfloat16")
            tproj = _bcp(tcfg.model, "bfloat16")
            tsched = _mk_sched(tcfg.diffusion)
            tstate, ttx = _its(tden, tproj, tcfg, jax.random.key(30),
                               seq_len=T)
            tmulti = _mdm(tden, tproj, tsched, tcfg, ttx)
            trng = _np2.random.default_rng(0)
            tdata = {
                "mel": jax.device_put(trng.normal(
                    size=(tn, T, 80)).astype(_np2.float32)),
                "motion": jax.device_put(trng.normal(
                    size=(tn, T, 234)).astype(_np2.float32)),
                "lyrics": jax.device_put(trng.normal(
                    size=(tn, T, 768)).astype(_np2.float32)),
            }
            jax.block_until_ready(tdata)
            toff = _np2.arange(tk, dtype=_np2.int32)
            tidx = trng.integers(0, tn, size=(tk, tb)).astype(_np2.int32)
            # warm/compile, then best-of-2 with distinct indices/keys
            tstate, tlosses = tmulti(tstate, tdata, jax.device_put(tidx),
                                     jax.random.key(31),
                                     jax.device_put(toff))
            float(jnp.abs(tlosses).sum())
            tt = float("inf")
            for rep in range(2):
                tidx = trng.integers(0, tn,
                                     size=(tk, tb)).astype(_np2.int32)
                t0 = time.perf_counter()
                tstate, tlosses = tmulti(tstate, tdata,
                                         jax.device_put(tidx),
                                         jax.random.key(32 + rep),
                                         jax.device_put(toff))
                float(jnp.abs(tlosses).sum())
                tt = min(tt, (time.perf_counter() - t0) / tk)
            log(f"extra: train throughput (bs{tb}, fused K={tk}, "
                f"device-data, bf16 moments): {tt * 1e3:.1f} ms/step -> "
                f"{tb * T / tt:,.0f} mel frames/s/chip trained")
        except Exception as e:
            log(f"extra: train throughput bench failed: {e}")
        try:
            from lm2a_tpu.core.config import MelConfig
            from lm2a_tpu.ops.mel import mel_spectrogram

            mc = MelConfig()
            nb = 16
            wavs = jax.random.uniform(jax.random.key(13), (nb, 6 * 22050),
                                      jnp.float32, -0.5, 0.5)
            miters = 100

            @jax.jit
            def mel_chain(w0):
                def step(w, _):
                    m = mel_spectrogram(w, mc)
                    return w + jnp.sum(m).astype(w.dtype) * 1e-30, ()
                w, _ = jax.lax.scan(step, w0, None, length=miters)
                return w

            float(jnp.abs(mel_chain(wavs)).sum())  # warm
            mt = float("inf")
            for rep in range(2):  # distinct inputs; best-of (first-run trap)
                t0 = time.perf_counter()
                out = mel_chain(wavs * (1.0 - 1e-3 * (rep + 1)))
                float(jnp.abs(out).sum())
                mt = min(mt, (time.perf_counter() - t0) / miters)
            log(f"extra: mel extraction {nb}x6s clips: {mt * 1e3:.1f} ms "
                f"({nb * 6 / mt:.0f}x realtime, chained x{miters})")
        except Exception as e:
            log(f"extra: mel bench failed: {e}")

    print(json.dumps({
        "metric": "mel_frames_per_sec_ddpm_cfg_1000step",
        "value": round(frames_per_sec, 3),
        "unit": "mel frames/sec/chip (B=1, T=516, CFG 2.1, 1000-step DDPM)",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
        "flops_per_step": round(chain_flops / steps) if chain_flops else None,
        "mfu": round(mfu, 4) if mfu else None,
    }))


if __name__ == "__main__":
    main()
