"""Why does the full fused train step cost 39 ms when its parts sum to 29?

Compiles (no run) the production K-step scan (`make_device_data_multistep`)
and the isolated fwd+bwd scan on the attached TPU, then prints:

  - ``memory_analysis()`` (peak bytes, temp/output/argument split)
  - convolution-op counts in the optimized while-loop body vs the unscanned
    single step — if the scanned body holds MORE convs than fwd+bwd needs,
    XLA is rematerializing the forward under memory pressure (the suspected
    source of the 10 ms gap, /tmp/train_breakdown2.log)
  - copy/fusion-op counts in the while body (carry double-buffer copies)

Optionally pass ``bf16`` to audit the same program with bf16 Adan moments
(see ``TrainConfig.opt_dtype``) for the before/after.

Usage: python scripts/audit_trainstep_memory.py [K] [fp32|bf16]
"""

import re
import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from lm2a_tpu.core.config import LM2AConfig  # noqa: E402
from lm2a_tpu.diffusion.schedule import make_schedule  # noqa: E402
from lm2a_tpu.models.factory import build_cond_projection, build_denoiser  # noqa: E402
from lm2a_tpu.training.train_step import (  # noqa: E402
    init_train_state,
    make_device_data_multistep,
)

K = int(sys.argv[1]) if len(sys.argv) > 1 else 50
B, T, N = 16, 516, 64


_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "s64": 8, "u64": 8, "f64": 8,
                "u16": 2, "s16": 2}


def _shape_bytes(shape: str) -> int:
    """'f32[16,516,80]{2,1,0}' -> bytes (tuples/invalid -> 0)."""
    m = re.match(r"([a-z0-9]+)\[([\d,]*)\]", shape)
    if not m or m.group(1) not in _DTYPE_BYTES:
        return 0
    dims = [int(d) for d in m.group(2).split(",") if d] or [1]
    n = 1
    for d in dims:
        n *= d
    return n * _DTYPE_BYTES[m.group(1)]


def count_ops(hlo_text: str):
    """Op histogram of the while-loop body (the scanned step)."""
    # crude but effective: every op line is '  %name = type op(...)'
    body = hlo_text
    convs = len(re.findall(r"= \S+ convolution\(", body))
    copies = re.findall(r"= (\S+) copy\(", body)
    dots = len(re.findall(r"= \S+ dot\(", body))
    fusions = len(re.findall(r"= \S+ fusion\(", body))
    copy_bytes = sum(_shape_bytes(s) for s in copies)
    return {"convolution": convs, "copy": len(copies),
            "copy_MB": round(copy_bytes / 1e6, 1), "dot": dots,
            "fusion": fusions}


def main():
    cfg = LM2AConfig()
    if len(sys.argv) > 2 and sys.argv[2] == "bf16":
        import dataclasses
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, opt_dtype="bfloat16"))
        print("auditing with bf16 Adan moments")
    denoiser = build_denoiser(cfg.model, cfg.train.compute_dtype)
    cond_proj = build_cond_projection(cfg.model, cfg.train.compute_dtype)
    schedule = make_schedule(cfg.diffusion)
    state, tx = init_train_state(denoiser, cond_proj, cfg, jax.random.PRNGKey(0))

    data = {
        "mel": jnp.zeros((N, T, 80), jnp.float32),
        "motion": jnp.zeros((N, T, 234), jnp.float32),
        "lyrics": jnp.zeros((N, T, 768), jnp.float32),
    }
    idx = jnp.zeros((K, B), jnp.int32)
    offsets = jnp.arange(K, dtype=jnp.int32)

    full = make_device_data_multistep(denoiser, cond_proj, schedule, cfg, tx)
    lowered = full.lower(state, data, idx, jax.random.PRNGKey(1), offsets)
    compiled = lowered.compile()

    ma = compiled.memory_analysis()
    if ma is not None:
        for field in ("argument_size_in_bytes", "output_size_in_bytes",
                      "temp_size_in_bytes", "generated_code_size_in_bytes",
                      "alias_size_in_bytes"):
            v = getattr(ma, field, None)
            if v is not None:
                print(f"{field:>32}: {v/2**30:8.3f} GiB")
    else:
        print("memory_analysis() unavailable on this backend")

    hlo = compiled.as_text()
    # split out the while-body computation(s)
    bodies = re.findall(
        r"%?while_body[^\{]*\{(.*?)\n\}", hlo, flags=re.S)
    if not bodies:
        # GSPMD/latest XLA name scheme: find computations referenced by while
        m = re.findall(r"body=%?([\w.\-]+)", hlo)
        bodies = []
        for name in set(m):
            mm = re.search(
                rf"^\s*%?{re.escape(name)}[^\{{]*\{{(.*?)\n\}}", hlo,
                flags=re.S | re.M)
            if mm:
                bodies.append(mm.group(1))
    print(f"while bodies found: {len(bodies)}")
    for i, b in enumerate(bodies):
        print(f"  body[{i}] ops: {count_ops(b)}")
        sizes = sorted((_shape_bytes(s) for s in
                        re.findall(r"= (\S+) copy\(", b)), reverse=True)
        print(f"  body[{i}] top copies MB: "
              f"{['%.1f' % (x/1e6) for x in sizes[:10]]}")
    print(f"whole-module ops: {count_ops(hlo)}")

    # Reference point: convolution count of ONE unscanned fwd+bwd step.
    from functools import partial

    from lm2a_tpu.training.train_step import _loss

    loss_kw = dict(
        denoiser=denoiser, cond_proj=cond_proj, schedule=schedule,
        cond_drop_prob=cfg.train.cond_drop_prob,
        dataset_mean=0.0, dataset_std=1.0, train=True,
    )
    batch = {k: jnp.zeros((B,) + v.shape[1:], v.dtype) for k, v in data.items()}

    def one_step(params):
        return jax.value_and_grad(
            partial(_loss, batch=batch, key=jax.random.PRNGKey(2), **loss_kw)
        )(params)

    hlo1 = jax.jit(one_step).lower(state.params).compile().as_text()
    print(f"single fwd+bwd step ops: {count_ops(hlo1)}")


if __name__ == "__main__":
    main()
