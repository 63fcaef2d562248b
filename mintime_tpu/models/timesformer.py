"""Size-Invariant TimeSformer in Flax — the flagship MINTIME model.

Re-designed TPU-first from the reference
``models/size_invariant_timesformer.py:147-276``: NHWC feature maps in,
divided space-time attention expressed as batched 5-D einsums (see
:mod:`mintime_tpu.ops.attention`) instead of the reference's
``(b*h*n, F, F+1)`` reshape-and-concat dance, fp32 softmax under bf16
activations, and no ``(B*H*n, F, F+1)``-materialized masks — masks stay at
``(B, F, F+1)`` / ``(B, 1+F*n)`` and broadcast inside the kernel.

Conscious divergences from the reference (documented per SURVEY.md §7):
* Embedding tables are sized ``1 + F * num_patches`` (positions) and
  ``1 + NUM_SIZE_BUCKETS`` (sizes) — the actual index ranges — instead of
  the reference's oversized ``num_frames * channels + 1`` tables
  (:174,178-180). The torch-checkpoint converter slices the used rows, which
  is numerics-preserving (unused rows never receive gradient).
* ``enable-identity-attention`` actually disables identity masking here
  (replaces ``identities_mask`` with all-True); in the reference the flag is
  dead code (it only guards an unreachable dataset branch,
  deepfakes_dataset.py:284-287).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from mintime_tpu.config import ModelConfig
from mintime_tpu.data.assembler import NUM_SIZE_BUCKETS
from mintime_tpu.ops.attention import (
    build_cls_mask,
    build_frame_mask,
    cls_attention,
    grouped_attention_with_cls,
)

_INIT = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


class GEGLU(nn.Module):
    """GEGLU feed-forward (reference :60-76): Dense -> x * gelu(gates) -> Dense.

    Uses exact (erf) GELU to match torch's default.
    """

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = nn.Dense(self.dim * self.mult * 2, kernel_init=_INIT, dtype=self.dtype)(x)
        val, gates = jnp.split(h, 2, axis=-1)
        h = val * jax.nn.gelu(gates, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.dim, kernel_init=_INIT, dtype=self.dtype)(h)


class DividedAttention(nn.Module):
    """One attention op over either the time or the space axis.

    ``axis='time'``: groups are the n spatial patches, sequence is F frames,
    masked by ``frame_mask``. ``axis='space'``: groups are the F frames,
    sequence is the n patches, unmasked (CLS row still uses ``cls_mask``).
    Mirrors reference :109-144.
    """

    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.0
    dtype: Any = None
    use_pallas: bool = False  # fused Pallas kernel for the grouped attention

    @nn.compact
    def __call__(
        self,
        x,  # (B, 1 + F*n, dim)
        *,
        axis: str,
        f: int,
        n: int,
        frame_mask=None,  # (B, F, F+1) bool
        cls_mask=None,  # (B, 1+F*n) bool
        deterministic: bool = True,
    ):
        B, N, _ = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(inner * 3, use_bias=False, kernel_init=_INIT, dtype=self.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):  # (B, N, inner) -> (B, H, N, d)
            return t.reshape(B, N, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = map(heads_first, (q, k, v))
        q = q * (self.dim_head ** -0.5)

        cls_out, cls_attn = cls_attention(q[:, :, :1], k, v, cls_mask)

        def to_groups(t):  # (B, H, F*n, d) -> (B, H, G, L, d)
            t = t.reshape(B, self.heads, f, n, self.dim_head)
            if axis == "time":
                return t.transpose(0, 1, 3, 2, 4)  # groups=n, seq=F
            return t  # groups=F, seq=n

        q_g, k_g, v_g = (to_groups(t[:, :, 1:]) for t in (q, k, v))
        if self.use_pallas:
            from mintime_tpu.ops.pallas_attention import (
                fused_grouped_attention,
                mask_to_bias,
            )

            bias = (
                mask_to_bias(frame_mask)
                if axis == "time" and frame_mask is not None
                else None
            )
            out_g = fused_grouped_attention(
                q_g, k_g, v_g, k[:, :, :1], v[:, :, :1], bias, heads=self.heads
            ).astype(v_g.dtype)
        else:
            mask = (
                frame_mask[:, None]
                if axis == "time" and frame_mask is not None
                else None
            )
            # mask (B, 1, F, F+1) broadcasts over the n groups
            out_g = grouped_attention_with_cls(
                q_g, k_g, v_g, k[:, :, :1], v[:, :, :1], mask
            )

        if axis == "time":
            out_g = out_g.transpose(0, 1, 3, 2, 4)  # back to (B, H, F, n, d)
        out_tok = out_g.reshape(B, self.heads, f * n, self.dim_head)
        out = jnp.concatenate([cls_out, out_tok], axis=2)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, inner)
        out = nn.Dense(self.dim, kernel_init=_INIT, dtype=self.dtype)(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out, cls_attn


class SizeInvariantTimeSformer(nn.Module):
    """Video-level pristine/fake classifier over per-face CNN feature maps.

    Forward contract (reference :224-276), NHWC-adapted:
      x:              (B, F, h, w, C) feature maps (h*w == num_patches)
      mask:           (B, F) bool — True for real faces
      identities_mask:(B, F, F) bool — block diagonal per identity
      size_embedding: (B, F) int — quantized face/frame area buckets, 0 = pad
      positions:      (B, 1 + F*num_patches) int — 0 = CLS

    Returns logits ``(B, num_classes)``; with ``require_attention`` also the
    last layer's CLS-row attentions ``[space, time]``, each reshaped to the
    reference's ``(B*heads, 1, 1+F*n)`` layout for ``aggregate_attentions``.
    """

    config: ModelConfig
    require_attention: bool = False
    dtype: Any = None  # compute dtype for matmuls (softmax always fp32)
    use_pallas: bool = False  # route grouped attention through the Pallas kernel

    @nn.compact
    def __call__(
        self,
        x,
        mask=None,
        identities_mask=None,
        size_embedding=None,
        positions=None,
        deterministic: bool = True,
    ):
        cfg = self.config
        B, F, h, w, C = x.shape
        n = h * w
        if n != cfg.num_patches:
            raise ValueError(f"feature grid {h}x{w} != num-patches {cfg.num_patches}")

        tokens = nn.Dense(
            cfg.dim, kernel_init=_INIT, dtype=self.dtype, name="to_patch_embedding"
        )(x.reshape(B, F * n, C))
        cls_token = self.param("cls_token", _INIT, (1, cfg.dim))
        xseq = jnp.concatenate(
            [jnp.broadcast_to(cls_token[None], (B, 1, cfg.dim)).astype(tokens.dtype), tokens],
            axis=1,
        )

        pos_table = nn.Embed(
            1 + F * cfg.num_patches, cfg.dim, embedding_init=_INIT, name="pos_emb"
        )
        if cfg.enable_pos_emb and positions is not None:
            xseq = xseq + pos_table(positions)
        else:
            xseq = xseq + pos_table(jnp.arange(1 + F * n))[None]

        if cfg.enable_size_emb:
            size_table = nn.Embed(
                1 + NUM_SIZE_BUCKETS, cfg.dim, embedding_init=_INIT, name="size_emb"
            )
            size_idx = jnp.concatenate(
                [
                    jnp.zeros((B, 1), dtype=jnp.int32),
                    jnp.repeat(size_embedding.astype(jnp.int32), n, axis=-1),
                ],
                axis=1,
            )
            xseq = xseq + size_table(size_idx)

        if mask is None:
            mask = jnp.ones((B, F), dtype=bool)
        if identities_mask is None or not cfg.enable_identity_attention:
            identities_mask = jnp.ones((B, F, F), dtype=bool)
        frame_mask = build_frame_mask(mask, identities_mask)
        cls_mask = build_cls_mask(mask, n)

        space_attn_out = time_attn_out = None
        for layer in range(cfg.depth):
            y = nn.LayerNorm(epsilon=1e-5, name=f"time_norm_{layer}")(xseq)
            y, time_attn_out = DividedAttention(
                cfg.dim, cfg.heads, cfg.dim_head, cfg.attn_dropout,
                dtype=self.dtype, use_pallas=self.use_pallas,
                name=f"time_attn_{layer}",
            )(
                y, axis="time", f=F, n=n, frame_mask=frame_mask, cls_mask=cls_mask,
                deterministic=deterministic,
            )
            xseq = xseq + y
            y = nn.LayerNorm(epsilon=1e-5, name=f"space_norm_{layer}")(xseq)
            y, space_attn_out = DividedAttention(
                cfg.dim, cfg.heads, cfg.dim_head, cfg.attn_dropout,
                dtype=self.dtype, use_pallas=self.use_pallas,
                name=f"space_attn_{layer}",
            )(
                y, axis="space", f=F, n=n, cls_mask=cls_mask,
                deterministic=deterministic,
            )
            xseq = xseq + y
            y = nn.LayerNorm(epsilon=1e-5, name=f"ff_norm_{layer}")(xseq)
            xseq = xseq + GEGLU(cfg.dim, dropout=cfg.ff_dropout, dtype=self.dtype, name=f"ff_{layer}")(
                y, deterministic=deterministic
            )

        cls_out = nn.LayerNorm(epsilon=1e-5, name="out_norm")(xseq[:, 0])
        logits = nn.Dense(cfg.num_classes, kernel_init=_INIT, name="out_proj")(cls_out)

        if self.require_attention:
            def ref_layout(a):  # (B, H, 1, N) -> (B*H, 1, N), reference :120
                Bh = a.shape[0] * a.shape[1]
                return a.reshape(Bh, 1, a.shape[-1])

            return logits, [ref_layout(space_attn_out), ref_layout(time_attn_out)]
        return logits
