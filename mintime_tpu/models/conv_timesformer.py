"""Convolutional TimeSformer (MINTIME-EF "conv" variant) in Flax.

Rebuild of the reference ``models/convolutional_timesformer_base.py:144-240``:
a frozen EfficientNet-B0 tapped at a configurable block
(``efficient-net-block``, :209 — 20 means full head features), whose output
``(B, F, h, w, C)`` is tokenized **channel-wise**:
``'b f c h w -> b (f c) (h w)'`` (:211) — each of the F·C channel maps is
one token of dimension h·w. Divided attention then alternates over the
frame axis (time) and the channel axis ("space"), with no masks (:228-230).

Documented divergences (the shipped reference file cannot run as written):
* ``to_patch_embedding`` is ``Linear(patch_dim=patch_size², dim)`` (:173,
  :212) but receives h·w-dim tokens — a latent shape bug. We use
  ``Linear(h·w, dim)``, the only consistent reading.
* the reference's size-embedding flatten order ``(p b f)`` (:221-223)
  mismatches the frame-major token order for b>1; we give every token of
  frame f that frame's size bucket.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mintime_tpu.config import ModelConfig
from mintime_tpu.data.assembler import NUM_SIZE_BUCKETS
from mintime_tpu.models.efficientnet import EfficientNet
from mintime_tpu.models.timesformer import _INIT, DividedAttention, GEGLU


class ConvolutionalTimeSformer(nn.Module):
    """frames (B,F,H,W,3) → logits (B, num_classes).

    ``head`` routes frame/mask/size batches through the shared train-step
    machinery (:func:`mintime_tpu.train.model_inputs`).
    """

    config: ModelConfig
    dtype: Any = None
    head: str = "conv_timesformer"
    use_pallas: bool = False  # fused attention + GEGLU-FFN kernels

    @nn.compact
    def __call__(self, frames, mask=None, size_embedding=None, train: bool = False):
        cfg = self.config
        B, F = frames.shape[:2]
        x = frames.reshape((B * F,) + frames.shape[2:])
        if self.dtype is not None:
            x = x.astype(self.dtype)
        elif not jnp.issubdtype(x.dtype, jnp.floating):
            x = x.astype(jnp.float32)  # uint8 batches from the loader
        # frozen backbone tap (reference :165-171, :209)
        feats = EfficientNet(
            "efficientnet-b0",
            tap_block=cfg.efficient_net_block,
            dtype=self.dtype,
            name="extractor",
        )(x, train=False)
        feats = jax.lax.stop_gradient(feats)
        _, h, w, C = feats.shape
        n = C  # channel tokens
        patch_dim = h * w
        # 'b f h w c -> b f c (h w)' — two-stream token layout (see
        # timesformer.py): frames × channel-tokens, CLS carried separately
        tokens = feats.reshape(B, F, h * w, C).transpose(0, 1, 3, 2)
        x_tok = nn.Dense(cfg.dim, kernel_init=_INIT, dtype=self.dtype,
                         name="to_patch_embedding")(tokens)  # (B, F, C, dim)

        cls_token = self.param("cls_token", _INIT, (1, cfg.dim))
        x_cls = jnp.broadcast_to(cls_token[None], (B, 1, cfg.dim)).astype(x_tok.dtype)
        pos_table = nn.Embed(1 + F * C, cfg.dim, embedding_init=_INIT,
                             dtype=self.dtype, name="pos_emb")
        table = pos_table(jnp.arange(1 + F * C))
        x_cls = x_cls + table[:1][None]
        x_tok = x_tok + table[1:].reshape(F, C, cfg.dim)[None]

        if size_embedding is not None:
            size_table = nn.Embed(
                1 + NUM_SIZE_BUCKETS, cfg.dim, embedding_init=_INIT,
                dtype=self.dtype, name="size_emb"
            )
            # every channel token of frame f gets frame f's bucket
            x_tok = x_tok + size_table(size_embedding.astype(jnp.int32))[:, :, None, :]
            x_cls = x_cls + size_table(jnp.zeros((B, 1), jnp.int32))

        for layer in range(cfg.depth):
            for ax, kind in (("time", "time"), ("space", "space")):
                ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                  name=f"{kind}_norm_{layer}")
                y_tok, y_cls, _ = DividedAttention(
                    cfg.dim, cfg.heads, cfg.dim_head, cfg.attn_dropout,
                    dtype=self.dtype, use_pallas=self.use_pallas,
                    name=f"{kind}_attn_{layer}",
                )(ln(x_tok), ln(x_cls), axis=ax, deterministic=not train,
                  need_attn=False)
                x_tok = x_tok + y_tok
                x_cls = x_cls + y_cls
            ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                              name=f"ff_norm_{layer}")
            ff = GEGLU(cfg.dim, dropout=cfg.ff_dropout, dtype=self.dtype,
                       use_pallas=self.use_pallas, name=f"ff_{layer}")
            x_tok = x_tok + ff(ln(x_tok), deterministic=not train)
            x_cls = x_cls + ff(ln(x_cls), deterministic=not train)

        cls_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(
            x_cls[:, 0]
        )
        return nn.Dense(cfg.num_classes, kernel_init=_INIT, name="out_proj")(
            cls_out
        ).astype(jnp.float32)
