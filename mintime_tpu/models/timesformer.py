"""Size-Invariant TimeSformer in Flax — the flagship MINTIME model.

Re-designed TPU-first from the reference
``models/size_invariant_timesformer.py:147-276``. Three deliberate layout
decisions drive the performance (all measured on v5e, see PARITY.md):

* **Two residual streams** — patch tokens stay ``(B, F, n, dim)`` and the
  CLS token ``(B, 1, dim)`` for the whole block stack, instead of the
  reference's ``(B, 1+F*n, dim)`` concatenated sequence. Divided attention
  regroups tokens by frame (space) or by patch (time) every layer; with the
  4-D layout that regrouping needs no slice/reshape/concat traffic, which
  on TPU would each materialize a full pass over the activation in HBM.
* **Grouped-layout projections** — q/k/v are projected straight into the
  ``(B, heads, groups, len, dim_head)`` attention layout with single
  einsums (XLA fuses matmul + relayout), replacing the reference's
  split → heads-first transpose → group-rearrange chain
  (reference :102,109-116).
* **Compute-dtype residual stream** — embeddings/LayerNorms run in the
  model dtype (bf16 on TPU; LN statistics still accumulate fp32), because
  a silently fp32-promoted residual stream doubles HBM traffic everywhere.

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

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mintime_tpu.config import ModelConfig
from mintime_tpu.data.assembler import NUM_SIZE_BUCKETS
from mintime_tpu.ops.attention import build_frame_mask, grouped_attention_with_cls

_INIT = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


class _Proj(nn.Module):
    """Dense-shaped parameter holder (kernel + bias, nn.Dense naming) so the
    fused FFN kernel can consume raw weights while the param tree stays
    converter- and TP-rule-compatible (utils/torch_convert.py, parallel/mesh.py)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", _INIT, (self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class GEGLU(nn.Module):
    """GEGLU feed-forward (reference :60-76): Dense -> x * gelu(gates) -> Dense.

    Uses exact (erf) GELU to match torch's default. With ``use_pallas`` (and
    dropout inactive — every reference config has ff-dropout 0) the whole FF
    runs as one Pallas kernel per row tile so the (tokens, 2·hidden)
    intermediate never touches HBM (ops/pallas_ffn.py), forward and backward.
    """

    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: Any = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        hidden = self.dim * self.mult
        w0, b0 = _Proj(self.dim, 2 * hidden, name="Dense_0")()
        w1, b1 = _Proj(hidden, self.dim, name="Dense_1")()
        x, w0, b0, w1, b1 = nn.dtypes.promote_dtype(
            x, w0, b0, w1, b1, dtype=self.dtype
        )
        if self.use_pallas and (self.dropout == 0.0 or deterministic):
            from mintime_tpu.ops.pallas_ffn import geglu_ffn

            return geglu_ffn(x, w0, b0, w1, b1)
        h = x @ w0 + b0
        val, gates = jnp.split(h, 2, axis=-1)
        h = val * jax.nn.gelu(gates, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return h @ w1 + b1


class DividedAttention(nn.Module):
    """One attention op over either the time or the space axis.

    ``axis='time'``: groups are the n spatial patches, sequence is F frames,
    masked by ``frame_mask``. ``axis='space'``: groups are the F frames,
    sequence is the n patches, unmasked. The CLS row always attends to all
    tokens under ``cls_mask``, and every token additionally attends to the
    CLS key/value (reference :109-144).

    Operates on the two-stream layout: ``x_tok (B, f, n, dim)`` +
    ``x_cls (B, 1, dim)`` → same shapes out.
    """

    dim: int
    heads: int
    dim_head: int
    dropout: float = 0.0
    dtype: Any = None
    use_pallas: bool = False  # fused Pallas divided-attention kernel

    @nn.compact
    def __call__(
        self,
        x_tok,  # (B, f, n, dim)
        x_cls,  # (B, 1, dim)
        *,
        axis: str,
        frame_mask=None,  # (B, F, F+1) bool, column 0 = CLS key
        cls_mask=None,  # (B, F) bool frame validity for the CLS row
        deterministic: bool = True,
        need_attn: bool = True,  # compute the CLS-row attention map
    ):
        B, f, n, D = x_tok.shape
        H, dh = self.heads, self.dim_head
        inner = H * dh
        # packed projections as raw params (reference to_qkv/to_out,
        # :102,141) so the Pallas kernel can consume them directly; qkv
        # columns are HEAD-major — (H, [q|k|v], dh) — so tensor-parallel
        # column shards hold whole heads (parallel/mesh.py TP rules)
        w_qkv = self.param("qkv_kernel", _INIT, (D, inner * 3))
        w_proj = self.param("proj_kernel", _INIT, (inner, self.dim))
        b_proj = self.param("proj_bias", nn.initializers.zeros, (self.dim,))

        def cast(t):
            return t.astype(self.dtype) if self.dtype is not None else t

        x_tok, x_cls = cast(x_tok), cast(x_cls)
        scale = dh ** -0.5

        # Pallas handles short attended sequences (flagship: L=F=16 or
        # L=n=49; conv time axis: L=F=8). A wide axis (conv SPACE axis,
        # L=n≈1280) would need (L, 1+L) fp32 logits per group in VMEM —
        # ~6.5 MB × unrolled heads — so that op stays on the XLA path,
        # which fuses the plain unmasked attention well at that size.
        L_axis = f if axis == "time" else n
        if self.use_pallas and not need_attn and L_axis <= 256:
            from mintime_tpu.ops.pallas_attention import (
                divided_attention,
                mask_to_bias,
            )

            # qkv in the natural (B, f, n, 3*inner) layout — a pure matmul;
            # the time axis takes ONE XLA transpose into grouped layout
            # (cheaper than per-head VMEM swaps inside the kernel)
            qkv_tok = jnp.einsum("bfnd,dc->bfnc", x_tok, cast(w_qkv))
            qkv_cls = x_cls[:, 0] @ cast(w_qkv)  # (B, 3*inner)
            rbias = mask_to_bias(cls_mask) if cls_mask is not None else None
            if axis == "time":  # groups = n patches, seq = f frames
                qkv_g = qkv_tok.swapaxes(1, 2)
                seq_bias = mask_to_bias(frame_mask) if frame_mask is not None else None
                row_bias = rbias[:, None, :] if rbias is not None else None
            else:  # groups = f frames, seq = n patches
                qkv_g = qkv_tok
                seq_bias = None
                row_bias = rbias[:, :, None] if rbias is not None else None
            o_g, o_cls = divided_attention(
                qkv_g, qkv_cls[:, None], seq_bias, row_bias,
                heads=H, dim_head=dh,
            )
            o_tok = o_g.swapaxes(1, 2) if axis == "time" else o_g
            out_tok = jnp.einsum("bfni,ic->bfnc", o_tok, cast(w_proj)) + cast(b_proj)
            out_cls = o_cls @ cast(w_proj) + cast(b_proj)
            drop = nn.Dropout(self.dropout)
            return (
                drop(out_tok, deterministic=deterministic),
                drop(out_cls, deterministic=deterministic),
                None,
            )

        # ---- XLA path (also the attention-map path): project straight into
        # the grouped (B, H, G, L, d) layout — ONE fused matmul+relayout per
        # tensor instead of the reference's transpose chain
        # head-major packed columns (H, [q|k|v], dh) — see qkv_kernel note
        w3 = cast(w_qkv).reshape(D, H, 3, dh)
        spec = "bfnd,dhe->bhnfe" if axis == "time" else "bfnd,dhe->bhfne"
        q_g = jnp.einsum(spec, x_tok, w3[:, :, 0]) * scale  # (B, H, G, L, d)
        k_g = jnp.einsum(spec, x_tok, w3[:, :, 1])
        v_g = jnp.einsum(spec, x_tok, w3[:, :, 2])
        xc = x_cls[:, 0]  # (B, D)
        q_cls = jnp.einsum("bd,dhe->bhe", xc, w3[:, :, 0]) * scale
        k_cls = jnp.einsum("bd,dhe->bhe", xc, w3[:, :, 1])
        v_cls = jnp.einsum("bd,dhe->bhe", xc, w3[:, :, 2])

        # CLS row: attends to all tokens + itself (reference :117-120).
        # Softmax is order-independent, so compute it in grouped layout.
        lt = jnp.einsum("bhe,bhgle->bhgl", q_cls, k_g).astype(jnp.float32)
        lc = jnp.einsum("bhe,bhe->bh", q_cls, k_cls).astype(jnp.float32)
        if cls_mask is not None:
            tok_mask = jnp.broadcast_to(cls_mask[:, :, None], (B, f, n))
            if axis == "time":
                tok_mask = tok_mask.swapaxes(1, 2)  # (B, n, f)
            neg = -jnp.finfo(jnp.float32).max
            lt = jnp.where(tok_mask[:, None], lt, neg)
        m = jnp.maximum(jnp.max(lt, axis=(2, 3)), lc)  # (B, H)
        pt = jnp.exp(lt - m[:, :, None, None])
        pc = jnp.exp(lc - m)
        z = jnp.sum(pt, axis=(2, 3)) + pc
        pt = pt / z[:, :, None, None]
        pc = pc / z
        cls_out = (
            jnp.einsum("bhgl,bhgle->bhe", pt.astype(v_g.dtype), v_g)
            + pc[:, :, None].astype(v_cls.dtype) * v_cls
        )  # (B, H, d)

        cls_attn = None
        if need_attn:
            # reference layout (B, H, 1, 1+F*n): CLS first, tokens f-major
            p_tok = pt.swapaxes(2, 3) if axis == "time" else pt  # (B,H,f,n)
            cls_attn = jnp.concatenate(
                [pc[:, :, None], p_tok.reshape(B, H, f * n)], axis=-1
            )[:, :, None, :].astype(jnp.float32)

        # token rows: grouped attention with the CLS key/value column
        k_cls4 = k_cls[:, :, None]  # (B, H, 1, d)
        v_cls4 = v_cls[:, :, None]
        mask = (
            frame_mask[:, None]
            if axis == "time" and frame_mask is not None
            else None
        )
        # mask (B, 1, F, F+1) broadcasts over the n groups
        out_g = grouped_attention_with_cls(q_g, k_g, v_g, k_cls4, v_cls4, mask)

        # output projection straight from the grouped layout
        wp = cast(w_proj).reshape(H, dh, self.dim)
        ospec = "bhnfe,hec->bfnc" if axis == "time" else "bhfne,hec->bfnc"
        out_tok = jnp.einsum(ospec, out_g, wp) + cast(b_proj)
        out_cls = jnp.einsum("bhe,hec->bc", cls_out, wp)[:, None] + cast(b_proj)
        drop = nn.Dropout(self.dropout)
        return (
            drop(out_tok, deterministic=deterministic),
            drop(out_cls, deterministic=deterministic),
            cls_attn,
        )


def pre_token_shift(x_tok):
    """PreTokenShift (reference ``size_invariant_timesformer.py:28-56``):
    split the channel dim into ``dim // 3``-wide chunks and shift the first
    three along the frame axis by (-1, 0, +1) — zero-filling the vacated
    frame — leaving any remainder chunk untouched. Applies to patch tokens
    only; the CLS token is spliced out in the reference (:43) and is a
    separate stream here, so it passes through unchanged.

    Reference quirks, decided as follows (PARITY.md #8):
    * The flag is unreachable in the reference: its wiring passes the bare
      name ``num_frames`` (:189), a NameError — only ``self.num_frames``
      exists — so ``shift-tokens: True`` crashes the reference at
      construction. We implement the evident intent (frames = F).
    * ``amt is 0`` (:31) is an identity comparison that CPython small-int
      caching makes behave as ``== 0``; replicated here as a plain ``== 0``.
    """
    D = x_tok.shape[-1]
    dc = D // 3

    def sh(t, amt):
        if amt == 0:
            return t
        # torch F.pad((0,0, 0,0, amt,-amt)): pad |amt| zero frames on one
        # end of the frame axis, crop the other
        t = jnp.pad(t, ((0, 0), (max(amt, 0), max(-amt, 0)), (0, 0), (0, 0)))
        return t[:, :-amt] if amt > 0 else t[:, -amt:]

    return jnp.concatenate(
        [
            sh(x_tok[..., :dc], -1),
            x_tok[..., dc : 2 * dc],
            sh(x_tok[..., 2 * dc : 3 * dc], 1),
            x_tok[..., 3 * dc :],
        ],
        axis=-1,
    )


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
    use_pallas: bool = False  # route attention through the Pallas kernel

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

        # two-stream layout: tokens (B, F, n, dim) + CLS (B, 1, dim)
        x_tok = nn.Dense(
            cfg.dim, kernel_init=_INIT, dtype=self.dtype, name="to_patch_embedding"
        )(x.reshape(B, F, n, C))
        cls_token = self.param("cls_token", _INIT, (1, cfg.dim))
        x_cls = jnp.broadcast_to(cls_token[None], (B, 1, cfg.dim)).astype(x_tok.dtype)

        # keep the residual stream in the compute dtype: nn.Embed lookups are
        # fp32 and bf16+fp32 promotes, which would silently double the HBM
        # traffic of every residual/LayerNorm pass in the block stack
        pos_table = nn.Embed(
            1 + F * cfg.num_patches, cfg.dim, embedding_init=_INIT,
            dtype=self.dtype, name="pos_emb"
        )
        if cfg.enable_pos_emb and positions is not None:
            x_cls = x_cls + pos_table(positions[:, :1])
            x_tok = x_tok + pos_table(positions[:, 1:].reshape(B, F, n))
        else:
            table = pos_table(jnp.arange(1 + F * n))
            x_cls = x_cls + table[:1][None]
            x_tok = x_tok + table[1:].reshape(F, n, cfg.dim)[None]

        if cfg.enable_size_emb:
            size_table = nn.Embed(
                1 + NUM_SIZE_BUCKETS, cfg.dim, embedding_init=_INIT,
                dtype=self.dtype, name="size_emb"
            )
            # every patch of frame f gets frame f's bucket; CLS gets bucket 0
            x_tok = x_tok + size_table(size_embedding.astype(jnp.int32))[:, :, None, :]
            x_cls = x_cls + size_table(jnp.zeros((B, 1), jnp.int32))

        if mask is None:
            mask = jnp.ones((B, F), dtype=bool)
        if identities_mask is None or not cfg.enable_identity_attention:
            identities_mask = jnp.ones((B, F, F), dtype=bool)
        frame_mask = build_frame_mask(mask, identities_mask)

        # PreNorm wraps PreTokenShift in the reference (:188-192), so the
        # shift sees NORMALIZED tokens: x + fn(shift(ln(x)))
        shift = pre_token_shift if cfg.shift_tokens else (lambda t: t)

        space_attn_out = time_attn_out = None
        for layer in range(cfg.depth):
            # attention maps are only consumed from the LAST layer
            # (reference :271-275) — earlier layers take the fused fast path
            need_attn = self.require_attention and layer == cfg.depth - 1
            for ax, kind in (("time", "time"), ("space", "space")):
                ln = nn.LayerNorm(
                    epsilon=1e-5, dtype=self.dtype, name=f"{kind}_norm_{layer}"
                )
                y_tok, y_cls, attn = DividedAttention(
                    cfg.dim, cfg.heads, cfg.dim_head, cfg.attn_dropout,
                    dtype=self.dtype, use_pallas=self.use_pallas,
                    name=f"{kind}_attn_{layer}",
                )(
                    shift(ln(x_tok)), ln(x_cls), axis=ax,
                    frame_mask=frame_mask if ax == "time" else None,
                    cls_mask=mask,
                    deterministic=deterministic, need_attn=need_attn,
                )
                x_tok = x_tok + y_tok
                x_cls = x_cls + y_cls
                if ax == "time":
                    time_attn_out = attn
                else:
                    space_attn_out = attn
            ln = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"ff_norm_{layer}")
            ff = GEGLU(cfg.dim, dropout=cfg.ff_dropout, dtype=self.dtype,
                       use_pallas=self.use_pallas, name=f"ff_{layer}")
            x_tok = x_tok + ff(shift(ln(x_tok)), deterministic=deterministic)
            x_cls = x_cls + ff(ln(x_cls), deterministic=deterministic)

        cls_out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="out_norm")(
            x_cls[:, 0]
        )
        logits = nn.Dense(cfg.num_classes, kernel_init=_INIT, name="out_proj")(cls_out)

        if self.require_attention:
            def ref_layout(a):  # (B, H, 1, N) -> (B*H, 1, N), reference :120
                Bh = a.shape[0] * a.shape[1]
                return a.reshape(Bh, 1, a.shape[-1])

            return logits, [ref_layout(space_attn_out), ref_layout(time_attn_out)]
        return logits
