"""Audit: is the cond K/V projection work hoisted out of the sampling scan?

Compiles the exact headline sampler (bench.py geometry) and scans the
optimized HLO: every convolution/custom-call is attributed to its enclosing
computation; we report which attention-projection ops (motion_kv_proj,
text_kv_proj, k_proj, v_proj) land inside the while body vs the entry.

MEASURED CONCLUSION (round 2, real v5e through the relay): XLA's
loop-invariant code motion hoists ALL 54 condition K/V projection matmuls
out of the 1000-step while loop (54 in entry-only computations, 0 reachable
from the while body; 105 conv/dot ops remain in the body — q/out/fuse
projections, resblock convs, score/AV einsums). Manually precomputing the
cond K/V outside the scan would therefore save nothing; the per-step
attention cost is the Q-side and score/AV work only. Same result on a toy
``h @ W1 + relu(c @ W2)`` scan: the invariant matmul is computed once in
ENTRY and carried into the loop as extra while-state.
"""
import os
import re
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lm2a_tpu.core.config import DiffusionConfig, ModelConfig  # noqa: E402
from lm2a_tpu.diffusion import make_sampler, make_schedule  # noqa: E402
from lm2a_tpu.models.factory import build_denoiser  # noqa: E402

cfg = ModelConfig(fused_resblock=os.environ.get("LM2A_FUSED_RESBLOCK", "1") == "1")
B, T, steps, guidance = 1, 516, 1000, 2.1

denoiser = build_denoiser(cfg, "bfloat16")
schedule = make_schedule(DiffusionConfig(timesteps=steps))
key = jax.random.key(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
x = jax.random.normal(k1, (B, T, cfg.in_dim), jnp.float32)
motion_f = jax.random.normal(k2, (B, T, cfg.cond_dim), jnp.float32)
text_f = jax.random.normal(k3, (B, T, cfg.cond_dim), jnp.float32)
params = jax.jit(denoiser.init)(k4, x, jnp.zeros((B,), jnp.int32), motion_f, text_f)

sampler = make_sampler(denoiser.apply, schedule, guidance_weight=guidance,
                       uncond_fast=True)
shape = (B, T, cfg.in_dim)

print("lowering+compiling...", file=sys.stderr)
compiled = jax.jit(sampler, static_argnums=(2,)).lower(
    params, jax.random.key(1), shape, motion_f, text_f).compile()
txt = compiled.as_text()
print(f"HLO text: {len(txt)/1e6:.1f} MB", file=sys.stderr)

# Split into computations (separated by blank lines); classify each.
PROJ = re.compile(r"(motion_kv_proj|text_kv_proj|/k_proj|/v_proj)")
CONV = re.compile(r"= \S+ (convolution|dot)\(")
comps = {}
for block in txt.split("\n\n"):
    lines = block.splitlines()
    if not lines:
        continue
    header = lines[0].strip()
    name = header.split(" ")[0].lstrip("%")
    convs = sum(1 for ln in lines if CONV.search(ln))
    proj_ops = [ln for ln in lines if PROJ.search(ln) and CONV.search(ln)]
    fusion_calls = re.findall(r"calls=%(\S+?)[,)]", block)
    is_entry = header.startswith("ENTRY")
    comps[name] = dict(convs=convs, proj=proj_ops, calls=fusion_calls,
                       entry=is_entry, block=block)

# Find the while body computation: referenced as body=%NAME
bodies = set(re.findall(r"body=%(\S+?)[,)]", txt))
print("while bodies:", bodies)


def reachable(start):
    seen, stack = set(), [start]
    while stack:
        n = stack.pop()
        if n in seen or n not in comps:
            continue
        seen.add(n)
        stack.extend(comps[n]["calls"])
        # also computations referenced via to_apply / calls=%x inside lines
        for m in re.findall(r"(?:to_apply|calls|condition|body)=%(\S+?)[,)]", comps[n]["block"]):
            stack.append(m)
    return seen


entry_name = next(n for n, c in comps.items() if c["entry"])
body_reach = set()
for b in bodies:
    body_reach |= reachable(b)
entry_only = reachable(entry_name) - body_reach

def tally(names, label):
    convs = sum(comps[n]["convs"] for n in names if n in comps)
    proj = [p for n in names if n in comps for p in comps[n]["proj"]]
    print(f"{label}: {convs} conv/dot ops, {len(proj)} are kv/k/v projections")
    for p in proj[:12]:
        m = re.search(r'op_name="([^"]+)"', p)
        print("   ", (m.group(1) if m else p.strip())[:140])

tally(body_reach, "INSIDE while body")
tally(entry_only, "entry only (hoisted)")
