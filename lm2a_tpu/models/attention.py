"""Cross-attention condition fusion.

Functional parity with ``/root/reference/models/cross_attention.py:9-67``:
mel hidden states attend separately over projected motion and lyric features
(Q = mel, K/V = condition), the two attention outputs are concatenated and
linearly fused back to the mel width.

``MultiheadAttention`` reproduces torch ``nn.MultiheadAttention`` semantics
(joint q/k/v projections with bias, per-head scaling 1/sqrt(E/h), output
projection) but with explicit Dense modules so torch checkpoints convert by
splitting ``in_proj_weight`` — no packed-weight gymnastics. Attention is a
pair of einsums that XLA maps straight onto the MXU; at the reference's
T=516 / C<=1024 a flash-style Pallas kernel is unnecessary (the full score
matrix fits comfortably in VMEM), so we keep the fusable XLA form.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Dtype = Any


class MultiheadAttention(nn.Module):
    """Batched multi-head attention over (B, T, E) with (B, S, E) keys.

    ``fused=True`` routes the attention core through the Pallas flash kernel
    (``lm2a_tpu.ops.pallas_attention``), which keeps scores/probs in VMEM
    instead of materializing (B, h, T, S) tensors in HBM.
    """

    embed_dim: int
    num_heads: int
    dtype: Dtype = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, query, key, value):
        e, h = self.embed_dim, self.num_heads
        if e % h:
            raise ValueError(f"embed_dim {e} not divisible by heads {h}")
        hd = e // h
        q = nn.Dense(e, dtype=self.dtype, name="q_proj")(query)
        k = nn.Dense(e, dtype=self.dtype, name="k_proj")(key)
        v = nn.Dense(e, dtype=self.dtype, name="v_proj")(value)

        # head split by reshape only — contraction einsums carry the head
        # axis in place, avoiding (0,2,1,3) transposes that show up as
        # relayout copies in device traces (~72 per forward at 9 attn sites)
        q = q.reshape(q.shape[:-1] + (h, hd))  # (B, T, h, hd)
        k = k.reshape(k.shape[:-1] + (h, hd))
        v = v.reshape(v.shape[:-1] + (h, hd))
        if self.fused:
            from lm2a_tpu.ops.pallas_attention import attention_core

            out = attention_core(
                q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                v.transpose(0, 2, 1, 3),
            ).transpose(0, 2, 1, 3)
        else:
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
                jnp.asarray(hd, dtype=q.dtype)
            )
            probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
        out = out.reshape(out.shape[0], -1, e)
        return nn.Dense(e, dtype=self.dtype, name="out_proj")(out)


class CrossAttentionFusion(nn.Module):
    """Fuse mel hidden states with motion and lyric conditions.

    ``mel_hidden (B,T,C)``; ``motion_f``/``text_f (B,T,cond_dim)`` are first
    projected to C so K/V width matches Q, then each branch cross-attends and
    the concatenated results are fused by a Dense(2C -> C).

    ``folded=True`` (serving-only rewrite, same parameters) collapses the
    linear algebra around the two attention cores:

    - the two branches' Q projections run as ONE ``(C -> 2C)`` matmul over
      concatenated kernels (the concat is parameter-only, hoisted out of the
      sampling scan by XLA — scripts/audit_sampler_licm.py);
    - score/AV einsums carry a branch axis instead of running twice;
    - per-branch ``out_proj`` followed by concat + ``fuse_proj`` is exactly
      ``core_m @ (Wo_m Wf_top) + core_l @ (Wo_l Wf_bot) + folded_bias`` — the
      weight-weight products are scan-invariant and hoisted, halving the
      per-step output-path matmul FLOPs (4 C^2 T -> 2 C^2 T MACs per site).

    Identical math to the unfolded path up to float reassociation; the folded
    products are computed in fp32 before casting to the compute dtype.
    """

    mel_dim: int
    cond_dim: int = 128
    num_heads: int = 4
    dtype: Dtype = jnp.float32
    fused: bool = False
    folded: bool = False

    def _folded(self, mel_hidden, motion_f, text_f):
        p = self.variables["params"]
        dt = self.dtype
        e, h = self.mel_dim, self.num_heads
        hd = e // h
        b, t = mel_hidden.shape[0], mel_hidden.shape[1]

        wq = jnp.concatenate(
            [p["attn_motion"]["q_proj"]["kernel"],
             p["attn_text"]["q_proj"]["kernel"]], axis=-1,
        ).astype(dt)
        bq = jnp.concatenate(
            [p["attn_motion"]["q_proj"]["bias"],
             p["attn_text"]["q_proj"]["bias"]],
        ).astype(dt)
        q = mel_hidden.astype(dt) @ wq + bq  # (B, T, 2e), one matmul
        q = q.reshape(b, t, 2, h, hd)

        ks, vs = [], []
        for branch, cond in (("motion", motion_f), ("text", text_f)):
            kv_p = p[f"{branch}_kv_proj"]
            kv = cond.astype(dt) @ kv_p["kernel"].astype(dt) + kv_p["bias"].astype(dt)
            a = p[f"attn_{branch}"]
            ks.append(kv @ a["k_proj"]["kernel"].astype(dt) + a["k_proj"]["bias"].astype(dt))
            vs.append(kv @ a["v_proj"]["kernel"].astype(dt) + a["v_proj"]["bias"].astype(dt))
        s = ks[0].shape[1]
        k = jnp.stack(ks, axis=2).reshape(b, s, 2, h, hd)
        v = jnp.stack(vs, axis=2).reshape(b, s, 2, h, hd)

        scores = jnp.einsum("bqnhd,bknhd->bnhqk", q, k) / jnp.sqrt(
            jnp.asarray(hd, dtype=q.dtype)
        )
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
        core = jnp.einsum("bnhqk,bknhd->bqnhd", probs, v)  # (B, T, 2, h, hd)
        core = core.reshape(b, t, 2 * e)

        wf = p["fuse_proj"]["kernel"].astype(jnp.float32)  # (2e, e)
        wo_m = p["attn_motion"]["out_proj"]["kernel"].astype(jnp.float32)
        wo_l = p["attn_text"]["out_proj"]["kernel"].astype(jnp.float32)
        w = jnp.concatenate([wo_m @ wf[:e], wo_l @ wf[e:]], axis=0).astype(dt)
        bias = (
            p["attn_motion"]["out_proj"]["bias"].astype(jnp.float32) @ wf[:e]
            + p["attn_text"]["out_proj"]["bias"].astype(jnp.float32) @ wf[e:]
            + p["fuse_proj"]["bias"].astype(jnp.float32)
        ).astype(dt)
        return core @ w + bias

    @nn.compact
    def __call__(self, mel_hidden, motion_f, text_f):
        if self.folded and not self.fused and not self.is_initializing():
            return self._folded(mel_hidden, motion_f, text_f)
        motion_kv = nn.Dense(self.mel_dim, dtype=self.dtype, name="motion_kv_proj")(
            motion_f.astype(self.dtype)
        )
        text_kv = nn.Dense(self.mel_dim, dtype=self.dtype, name="text_kv_proj")(
            text_f.astype(self.dtype)
        )
        attn_motion = MultiheadAttention(
            self.mel_dim, self.num_heads, dtype=self.dtype, fused=self.fused,
            name="attn_motion",
        )(mel_hidden, motion_kv, motion_kv)
        attn_text = MultiheadAttention(
            self.mel_dim, self.num_heads, dtype=self.dtype, fused=self.fused,
            name="attn_text",
        )(mel_hidden, text_kv, text_kv)
        fused = jnp.concatenate([attn_motion, attn_text], axis=-1)
        return nn.Dense(self.mel_dim, dtype=self.dtype, name="fuse_proj")(fused)
