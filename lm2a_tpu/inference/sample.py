"""Generation: conditioned mel sampling from an npz clip.

Pipeline parity with ``/root/reference/sample.py:42-278``:
load npz conds -> rebuild models from the checkpointed config (the reference
hardcodes arch literals that must match training; here the config travels in
the checkpoint) -> prefer EMA weights -> dataset stats from ckpt else the
documented fallback constants -> interp-resample conds to mel length ->
DDPM chain with optional CFG -> de-normalize -> write ``<base>_gen.npz``
(mel + conds + projected conds) and gen/real PNGs.

Accepts BOTH checkpoint formats: this framework's checkpoint directories and the
reference's ``torch.save`` files (converted on the fly), so reference users
can sample from their existing checkpoints on TPU.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from lm2a_tpu.core.config import DiffusionConfig, LM2AConfig
from lm2a_tpu.data.schema import load_sample, normalize_mel_layout
from lm2a_tpu.diffusion import ddim_sample, ddpm_sample, make_schedule
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser
from lm2a_tpu.ops.resample import match_len

# Documented fallback stats (/root/reference/sample.py:47-48), used only when
# the checkpoint carries none.
FALLBACK_MEL_MEAN = -4.63706636428833
FALLBACK_MEL_STD = 1.8648223876953125


@dataclass
class LoadedModels:
    cfg: LM2AConfig
    denoiser: object
    cond_proj: object
    unet_params: dict
    proj_params: dict
    dataset_mean: float
    dataset_std: float
    timesteps: int
    # checkpoint-carried CFG weight; the reference lets a checkpointed
    # 'guidance_weight' override the CLI default (sample.py:140)
    guidance_weight: Optional[float] = None
    # distilled-student metadata (training/distill.py): the student's DDIM
    # grid length and the CFG weight folded into its eps. A distilled
    # checkpoint serves correctly ONLY at method='ddim', ddim_steps=
    # distilled_steps, guidance 1.0 — load_models sets guidance_weight to
    # 1.0 and the CLIs default method/steps from these fields (round-4
    # VERDICT #7: serve warmup defaults to the measured best config).
    distilled_steps: Optional[int] = None
    folded_guidance: Optional[float] = None
    # post-hoc variance calibration (round-5 VERDICT #3): deterministic
    # DDIM/distilled chains are systematically over-smooth (z-space std
    # deficit ~0.5-0.8 sigma vs DDPM's 0.06). A single scalar fitted on
    # VAL clips (scripts/calibrate_student_std.py — never the eval clips)
    # rescales each generated clip about its own mean in z-space before
    # de-normalization. None = off.
    std_calibration: Optional[float] = None
    # jitted sampler cache keyed by (mel_t, steps, guided?, method, batch) —
    # the CFG weight itself is a traced argument, so every weight > 1 shares
    # one compiled chain; batch assessment and the serving loop reuse entries
    # across requests. LRU-capped: a long-lived server with varied request
    # geometries must not grow compiled programs without bound. The default
    # cap is generous because per-clip eval loops interleave many distinct
    # mel lengths and every eviction costs a multi-minute recompile through
    # the relay (ADVICE r2); cli/serve sets a tighter cap for long-lived
    # processes.
    _samplers: dict = field(default_factory=dict)
    sampler_cache_max: int = 64

    def _sampler_get(self, key):
        run = self._samplers.get(key)
        if run is not None:  # refresh LRU position
            self._samplers[key] = self._samplers.pop(key)
        return run

    def _sampler_put(self, key, run) -> None:
        while len(self._samplers) >= max(1, self.sampler_cache_max):
            self._samplers.pop(next(iter(self._samplers)))
        self._samplers[key] = run


def load_models(
    ckpt_path: str,
    cfg: Optional[LM2AConfig] = None,
    prefer_ema: bool = True,
    compute_dtype: str = "bfloat16",
    fused_resblock: Optional[bool] = None,
    folded_attention: Optional[bool] = None,
) -> LoadedModels:
    """Load a framework checkpoint dir or a reference torch checkpoint file.

    ``fused_resblock`` None = auto: serving forwards route residual blocks
    through the Pallas fused kernel on TPU (measured ~2% off the 1000-step
    chain, exact within bf16 tolerance); init/training are unaffected by
    construction. Pass False to force the plain XLA path.

    ``folded_attention`` None = auto: serving folds the cross-attention
    linear algebra (merged Q matmul, branch-stacked cores, out/fuse
    projections collapsed to one hoisted-weight matmul) — measured 10.9%
    off the 2-row CFG serving step and neutral-positive at batched
    geometries, same parameters and math up to float reassociation. Enabled
    on every backend (it is a pure XLA rewrite, not a TPU kernel).
    """
    mean, std = FALLBACK_MEL_MEAN, FALLBACK_MEL_STD
    timesteps = None
    guidance_weight = None
    distilled_steps = None
    folded_guidance = None
    std_calibration = None

    if fused_resblock is None:
        fused_resblock = jax.default_backend() == "tpu"
    if folded_attention is None:
        folded_attention = True

    def _with_fused(c: LM2AConfig) -> LM2AConfig:
        import dataclasses as _dc

        if (
            c.model.fused_resblock == fused_resblock
            and c.model.folded_attention == folded_attention
        ):
            return c
        return _dc.replace(c, model=_dc.replace(
            c.model,
            fused_resblock=fused_resblock,
            folded_attention=folded_attention,
        ))

    if os.path.isdir(ckpt_path):  # our checkpoint layout
        from lm2a_tpu.core.config import config_from_dict
        from lm2a_tpu.models.factory import (
            build_cond_projection as bcp,
            build_denoiser as bd,
        )
        from lm2a_tpu.training.checkpoint import load_metadata, restore_checkpoint
        from lm2a_tpu.training.train_step import init_train_state

        meta = load_metadata(ckpt_path)
        cfg = config_from_dict(meta["config"]) if cfg is None else cfg
        cfg = _with_fused(cfg)
        denoiser = bd(cfg.model, compute_dtype)
        cond_proj = bcp(cfg.model, compute_dtype)
        template, _ = init_train_state(denoiser, cond_proj, cfg, jax.random.key(0))
        state, _ = restore_checkpoint(ckpt_path, template)
        params = state.ema_params if prefer_ema else state.params
        unet_params = {"params": params["unet"]}
        proj_params = {"params": params["cond_proj"]}
        mean = float(meta.get("dataset_mean", mean))
        std = float(meta.get("dataset_std", std))
        timesteps = cfg.diffusion.timesteps
        if meta.get("distilled_steps"):
            distilled_steps = int(meta["distilled_steps"])
            folded_guidance = float(meta.get("folded_guidance") or 0.0) or None
            # the fold is baked into the student's eps: serve single-forward
            guidance_weight = 1.0
        std_calibration = (float(meta["std_calibration"])
                           if meta.get("std_calibration") else None)
    else:  # reference torch .pt file
        from lm2a_tpu.utils.torch_convert import load_torch_checkpoint

        cfg = _with_fused(cfg if cfg is not None else LM2AConfig())
        unet_params, proj_params, meta = load_torch_checkpoint(
            ckpt_path, cfg.model, prefer_ema=prefer_ema
        )
        denoiser = build_denoiser(cfg.model, compute_dtype)
        cond_proj = build_cond_projection(cfg.model, compute_dtype)
        if meta.get("dataset_mean") is not None:
            mean = float(meta["dataset_mean"])
            std = float(meta["dataset_std"])
        if meta.get("timesteps") is not None:
            timesteps = int(meta["timesteps"])
        if meta.get("guidance_weight") is not None:
            guidance_weight = float(meta["guidance_weight"])

    return LoadedModels(
        cfg=cfg, denoiser=denoiser, cond_proj=cond_proj,
        unet_params=unet_params, proj_params=proj_params,
        dataset_mean=mean, dataset_std=std,
        timesteps=timesteps or cfg.diffusion.timesteps,
        guidance_weight=guidance_weight,
        distilled_steps=distilled_steps, folded_guidance=folded_guidance,
        std_calibration=std_calibration,
    )


def _resolve_run_params(models: LoadedModels, steps, guidance_weight):
    """Reference precedence (sample.py:118-120,140): an explicit CLI value
    wins; otherwise the checkpoint's timesteps / guidance_weight; otherwise
    the defaults (ckpt timesteps always exist; guidance falls back to 1.0)."""
    steps = int(steps) if steps else models.timesteps
    if guidance_weight is None:
        guidance_weight = (
            models.guidance_weight if models.guidance_weight is not None else 1.0
        )
    return steps, float(guidance_weight)


def _apply_std_calibration(out_z: np.ndarray, models: LoadedModels) -> np.ndarray:
    """Rescale each clip about its own mean in z-space by the checkpoint's
    fitted ``std_calibration`` (no-op when unset). Corrects the measured
    over-smoothing of deterministic few-step chains without touching the
    clip's mean (mean_error is unaffected by construction)."""
    r = models.std_calibration
    if not r or r == 1.0:
        return out_z
    mu = out_z.mean(axis=tuple(range(1, out_z.ndim)), keepdims=True)
    return mu + (out_z - mu) * np.float32(r)


def resolve_eval_guidance(models: LoadedModels,
                          guidance: Optional[float] = None) -> float:
    """Distilled-aware CFG weight for the reference's val protocol
    (``/root/reference/val.py:192`` hardcodes 2.1): an explicit value wins;
    a distilled student must run single-forward at its checkpoint weight
    (1.0 — its teacher's CFG is folded into its eps, and re-applying 2.1
    double-guides it, the +1.1 sigma bias measured in DEVNOTES); an
    undistilled checkpoint defaults to the protocol's 2.1."""
    if guidance is not None:
        return float(guidance)
    if models.guidance_weight is not None:
        return float(models.guidance_weight)
    return 2.1


def resolve_method(models: LoadedModels, method: Optional[str] = None,
                   ddim_steps: Optional[int] = None):
    """Distilled-aware (method, ddim_steps) resolution: an explicit value
    wins; a distilled checkpoint defaults to its own DDIM grid (the only
    configuration it was trained to serve — see training/distill.py)."""
    if method is None:
        method = "ddim" if models.distilled_steps else "ddpm"
    if ddim_steps is None and method == "ddim":
        ddim_steps = models.distilled_steps  # None for undistilled ckpts
    return method, ddim_steps


def _ddim_num_steps(steps: int, ddim_steps: Optional[int]) -> int:
    """DDIM sub-schedule length; logs when the requested steps are adjusted."""
    import sys

    if ddim_steps is not None:
        return int(ddim_steps)
    if steps > 50:
        print(
            f"[sample] ddim: running 50 sampler steps over the {steps}-step "
            "schedule (pass --ddim_steps to change)",
            file=sys.stderr,
        )
        return 50
    return steps


def generate_mel(
    models: LoadedModels,
    motion: np.ndarray,  # (T_m, 234) raw normalized motion feats
    lyrics: np.ndarray,  # (T_l, 768)
    mel_t: int,
    steps: Optional[int] = None,
    guidance_weight: Optional[float] = None,
    method: Optional[str] = None,
    seed: int = 0,
    batch: int = 1,
    debug: bool = False,
    ddim_steps: Optional[int] = None,
):
    """Run the sampler; returns (mel (B, 80, mel_T) de-normalized, motion_f,
    text_f). The whole chain is one jitted scan program.

    ``method`` None resolves via ``resolve_method``: ddpm normally, the
    student's own DDIM grid for a distilled checkpoint.

    ``debug=True`` (DDPM only) collects per-step x/eps statistics inside the
    scan and prints per-decile rows with the schedule coefficients — the
    reference's sampling telemetry without a device sync per step.
    """
    cfg = models.cfg
    steps, guidance_weight = _resolve_run_params(models, steps, guidance_weight)
    method, ddim_steps = resolve_method(models, method, ddim_steps)
    debug = debug and method == "ddpm"

    motion_rs = match_len(np.asarray(motion, np.float32), mel_t, mode="interp")
    lyrics_rs = match_len(np.asarray(lyrics, np.float32), mel_t, mode="interp")
    motion_b = jnp.broadcast_to(jnp.asarray(motion_rs), (batch,) + motion_rs.shape)
    lyrics_b = jnp.broadcast_to(jnp.asarray(lyrics_rs), (batch,) + lyrics_rs.shape)

    motion_f, text_f = models.cond_proj.apply(models.proj_params, motion_b, lyrics_b)

    num_ddim = None if method == "ddpm" else _ddim_num_steps(steps, ddim_steps)
    guided = guidance_weight > 1.0
    cache_key = (mel_t, steps, guided, method, batch, debug, num_ddim)
    run = models._sampler_get(cache_key)
    if run is None:
        schedule = make_schedule(
            DiffusionConfig(
                timesteps=steps,
                beta_start=cfg.diffusion.beta_start,
                beta_end=cfg.diffusion.beta_end,
            )
        )
        sampler = {"ddpm": ddpm_sample, "ddim": ddim_sample}[method]
        kwargs = {} if method == "ddpm" else {"num_steps": num_ddim}
        if debug:
            kwargs["collect_stats"] = True
        # constant-fold the CFG uncond rows' cross-attention (exact math)
        kwargs["uncond_fast"] = guided

        def model_fn_with(params):
            def model_fn(x, t, m, l, **kw):
                return models.denoiser.apply(params, x, t, m, l, **kw)

            return model_fn

        @jax.jit
        def run(params, key, motion_f, text_f, gw):
            # gw is traced: one compiled chain serves every CFG weight > 1
            return sampler(
                model_fn_with(params), schedule, key,
                (batch, mel_t, cfg.model.in_dim),
                motion_f, text_f,
                guidance_weight=gw if guided else 1.0, **kwargs,
            )

        models._sampler_put(cache_key, run)

    out = run(models.unet_params, jax.random.key(seed), motion_f, text_f,
              jnp.float32(guidance_weight))
    if debug:
        out, stats = out
        _print_sampling_telemetry(np.asarray(stats), steps, cfg)
    out = _apply_std_calibration(np.asarray(out), models)
    out = out * models.dataset_std + models.dataset_mean
    mel = out.transpose(0, 2, 1)  # (B, 80, T) npz layout
    return mel, np.asarray(motion_f), np.asarray(text_f), motion_rs, lyrics_rs


def _print_sampling_telemetry(stats: np.ndarray, steps: int, cfg) -> None:
    """Per-decile coefficient + tensor-stat rows (reference sample.py debug)."""
    betas = np.linspace(cfg.diffusion.beta_start, cfg.diffusion.beta_end, steps)
    alphas = 1.0 - betas
    abars = np.cumprod(alphas)
    interval = max(1, steps // 10)
    for i in range(0, steps, interval):
        t = steps - 1 - i
        c1 = 1.0 / np.sqrt(alphas[t])
        c2 = betas[t] / np.sqrt(1.0 - abars[t])
        print(
            f"[coeff] t={t:4d} beta={betas[t]:.6e} alpha={alphas[t]:.6e} "
            f"alpha_bar={abars[t]:.6e} coef1={c1:.6e} coef2={c2:.6e}"
        )
        xm, xM, xu, xs, em, eM, eu, es = stats[i]
        print(
            f"[sampling] step t={t:4d}  x min={xm:.6f} max={xM:.6f} "
            f"mean={xu:.6f} std={xs:.6f} | eps min={em:.6f} max={eM:.6f} "
            f"mean={eu:.6f} std={es:.6f}"
        )


def generate_mel_batch(
    models: LoadedModels,
    motions,  # list of (T_m, 234)
    lyrics_list,  # list of (T_l, 768)
    mel_t: int,
    steps: Optional[int] = None,
    guidance_weight: Optional[float] = None,
    method: Optional[str] = None,
    seed: int = 0,
    ddim_steps: Optional[int] = None,
):
    """True multi-clip batched generation: different conditions per row.

    All clips share one compiled sampler chain (one scan over the batch), so
    per-clip cost amortizes to chain_time / B — the serving path.
    ``method`` None resolves distilled-aware (``resolve_method``).
    Returns (mel (B, 80, mel_t), motion_rs list, lyrics_rs list).
    """
    cfg = models.cfg
    steps, guidance_weight = _resolve_run_params(models, steps, guidance_weight)
    method, ddim_steps = resolve_method(models, method, ddim_steps)
    b = len(motions)
    motion_rs = [match_len(np.asarray(m, np.float32), mel_t, "interp") for m in motions]
    lyrics_rs = [match_len(np.asarray(l, np.float32), mel_t, "interp") for l in lyrics_list]
    motion_b = jnp.asarray(np.stack(motion_rs))
    lyrics_b = jnp.asarray(np.stack(lyrics_rs))
    motion_f, text_f = models.cond_proj.apply(models.proj_params, motion_b, lyrics_b)

    num_ddim = None if method == "ddpm" else _ddim_num_steps(steps, ddim_steps)
    guided = guidance_weight > 1.0
    cache_key = (mel_t, steps, guided, method, b, num_ddim)
    run = models._sampler_get(cache_key)
    if run is None:
        schedule = make_schedule(
            DiffusionConfig(
                timesteps=steps,
                beta_start=cfg.diffusion.beta_start,
                beta_end=cfg.diffusion.beta_end,
            )
        )
        sampler = {"ddpm": ddpm_sample, "ddim": ddim_sample}[method]
        kwargs = {} if method == "ddpm" else {"num_steps": num_ddim}
        kwargs["uncond_fast"] = guided

        @jax.jit
        def run(params, key, motion_f, text_f, gw):
            def model_fn(x, t, m, l, **kw):
                return models.denoiser.apply(params, x, t, m, l, **kw)

            # gw is traced: one compiled chain serves every CFG weight > 1
            return sampler(
                model_fn, schedule, key, (b, mel_t, cfg.model.in_dim),
                motion_f, text_f,
                guidance_weight=gw if guided else 1.0, **kwargs,
            )

        models._sampler_put(cache_key, run)

    out = run(models.unet_params, jax.random.key(seed), motion_f, text_f,
              jnp.float32(guidance_weight))
    out = _apply_std_calibration(np.asarray(out), models)
    out = out * models.dataset_std + models.dataset_mean
    return out.transpose(0, 2, 1), motion_rs, lyrics_rs


def compute_batch_from_npz(
    models: LoadedModels,
    npz_paths,
    steps: Optional[int] = None,
    guidance_weight: Optional[float] = None,
    method: Optional[str] = None,
    seed: int = 0,
    batch_size: int = 8,
    ddim_steps: Optional[int] = None,
):
    """Device stage of batched multi-clip generation: one per-clip result
    dict per input path, all arrays already fetched to host. The serving
    loop uses this + ``write_clip_outputs`` to overlap host IO with the next
    request's device chain."""
    by_len: dict = {}
    for p in npz_paths:
        s = load_sample(p)
        mel_t = normalize_mel_layout(s.mel).shape[1]
        by_len.setdefault(mel_t, []).append((p, s))

    results = []
    chunk_no = 0  # distinct noise stream per chunk ACROSS length groups —
    # seed+i alone would repeat keys at equal chunk offsets of different
    # groups, noise-correlating their outputs
    for mel_t, group in by_len.items():
        for i in range(0, len(group), batch_size):
            chunk = group[i : i + batch_size]
            gen, motion_rs, lyrics_rs = generate_mel_batch(
                models,
                [s.motion for _, s in chunk],
                [s.lyrics for _, s in chunk],
                mel_t,
                steps=steps, guidance_weight=guidance_weight,
                method=method, seed=seed + chunk_no, ddim_steps=ddim_steps,
            )
            chunk_no += 1
            for j, (p, s) in enumerate(chunk):
                results.append({
                    "base": os.path.splitext(os.path.basename(p))[0],
                    "gen_mel": gen[j].astype(np.float32),
                    "motion": motion_rs[j],
                    "lyrics": lyrics_rs[j],
                    "sr": s.sr,
                    "hop_length": s.hop_length,
                })
    return results


def compute_single_from_npz(
    models: LoadedModels,
    npz_path: str,
    steps: Optional[int] = None,
    guidance_weight: Optional[float] = None,
    method: Optional[str] = None,
    seed: int = 0,
    debug: bool = False,
    ddim_steps: Optional[int] = None,
) -> dict:
    """Device stage of single-clip generation (see compute_batch_from_npz)."""
    s = load_sample(npz_path)
    real_mel = normalize_mel_layout(s.mel)
    mel_t = real_mel.shape[1]
    gen, motion_f, text_f, motion_rs, lyrics_rs = generate_mel(
        models, s.motion, s.lyrics, mel_t,
        steps=steps, guidance_weight=guidance_weight, method=method, seed=seed,
        debug=debug, ddim_steps=ddim_steps,
    )
    gen_mel = gen[0]  # (80, T)
    if not np.isfinite(gen_mel).all():
        raise FloatingPointError("sampling produced non-finite values")
    return {
        "base": os.path.splitext(os.path.basename(npz_path))[0],
        "gen_mel": gen_mel.astype(np.float32),
        "real_mel": real_mel,
        "motion": motion_rs,
        "lyrics": lyrics_rs,
        "motion_proj": motion_f,
        "lyrics_proj": text_f,
        "sr": s.sr,
        "hop_length": s.hop_length,
    }


def write_clip_outputs(result: dict, out_dir: str, save_png: bool = False,
                       compress: bool = True) -> str:
    """Host-IO stage: write one clip's ``<base>_gen.npz`` (+optional PNGs,
    +optional ``wav`` waveform if the result carries one).

    ``compress=False`` writes a plain ``np.savez`` archive — measured
    3-5 ms/clip vs ~185 ms/clip for ``savez_compressed`` on this class of
    1-core serving host (the 2.8 MB of float32 conds compress poorly and
    slowly). The serving loop defaults to uncompressed; the ``sample`` CLI
    keeps the reference's compressed artifact
    (``/root/reference/sample.py:249``)."""
    os.makedirs(out_dir, exist_ok=True)
    base = result["base"]
    out_npz = os.path.join(out_dir, base + "_gen.npz")
    extra = {}
    if "motion_proj" in result:
        extra = {"motion_proj": result["motion_proj"],
                 "lyrics_proj": result["lyrics_proj"]}
    (np.savez_compressed if compress else np.savez)(
        out_npz,
        mel=result["gen_mel"],
        motion=result["motion"],
        lyrics=result["lyrics"],
        sr=result["sr"],
        hop_length=result["hop_length"],
        **extra,
    )
    if "wav" in result:
        from lm2a_tpu.utils.audio import write_wav

        write_wav(os.path.join(out_dir, base + "_gen.wav"),
                  result["wav"], result.get("wav_sr", result["sr"]))
    if save_png:
        _save_mel_png(result["gen_mel"],
                      os.path.join(out_dir, base + "_gen.png"), "Generated mel")
        if "real_mel" in result:
            _save_mel_png(result["real_mel"],
                          os.path.join(out_dir, base + "_real.png"), "Real mel")
    return out_npz


def sample_batch_from_npz(
    npz_paths,
    ckpt_path: str,
    out_dir: str,
    steps: Optional[int] = None,
    guidance_weight: Optional[float] = None,
    method: Optional[str] = None,
    seed: int = 0,
    cfg: Optional[LM2AConfig] = None,
    models: Optional[LoadedModels] = None,
    batch_size: int = 8,
    ddim_steps: Optional[int] = None,
):
    """Batched multi-clip generation over a list of npz files.

    Clips are grouped by mel length and generated ``batch_size`` at a time in
    one compiled chain each; writes a ``<base>_gen.npz`` per clip.
    """
    if models is None:
        models = load_models(ckpt_path, cfg=cfg)
    results = compute_batch_from_npz(
        models, npz_paths, steps=steps, guidance_weight=guidance_weight,
        method=method, seed=seed, batch_size=batch_size, ddim_steps=ddim_steps,
    )
    return [write_clip_outputs(r, out_dir) for r in results]


def sample_from_npz(
    npz_path: str,
    ckpt_path: str,
    out_dir: str,
    steps: Optional[int] = None,
    guidance_weight: Optional[float] = None,
    method: Optional[str] = None,
    seed: int = 0,
    cfg: Optional[LM2AConfig] = None,
    save_png: bool = True,
    models: Optional[LoadedModels] = None,
    debug: bool = False,
    ddim_steps: Optional[int] = None,
) -> str:
    """End-to-end: npz conds + checkpoint -> ``<base>_gen.npz`` (+PNGs)."""
    if models is None:
        models = load_models(ckpt_path, cfg=cfg)
    result = compute_single_from_npz(
        models, npz_path, steps=steps, guidance_weight=guidance_weight,
        method=method, seed=seed, debug=debug, ddim_steps=ddim_steps,
    )
    return write_clip_outputs(result, out_dir, save_png=save_png)


def _save_mel_png(mel: np.ndarray, path: str, title: str) -> None:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return
    plt.figure(figsize=(8, 4))
    plt.imshow(mel, aspect="auto", origin="lower")
    plt.colorbar()
    plt.title(title)
    plt.savefig(path)
    plt.close()
