"""Divided space-time attention with CLS token and identity masking.

TPU-first re-design of the reference Attention
(``models/size_invariant_timesformer.py:89-144``): instead of materializing
``(b*h*n, F, F+1)`` masks and physically concatenating broadcast CLS
keys/values per group (reference :124-129), we keep heads and groups as
batch axes of a single 5-D einsum and let the masks broadcast — the CLS
column is concatenated once per group axis. Everything is static-shaped and
fuses into two MXU matmuls + a VPU softmax per attention. Softmax runs in
fp32 regardless of input dtype (bf16-safe).

Semantics (kept bit-compatible in fp32 with the reference):
* the CLS query attends to all ``1 + F*n`` tokens, masked by ``cls_mask``
* each non-CLS token attends within its time (or space) group plus the CLS
  key/value, masked by ``frame_mask`` (time only)
* masked logits are filled with ``-finfo.max`` before softmax
  (reference :80-87)
"""

from __future__ import annotations

import jax.numpy as jnp


def _masked_softmax(logits: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """Softmax over the last axis in fp32; False mask entries get -finfo.max."""
    logits = logits.astype(jnp.float32)
    if mask is not None:
        neg = -jnp.finfo(jnp.float32).max
        logits = jnp.where(mask, logits, neg)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits)
    return unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)


def grouped_attention_with_cls(q_g, k_g, v_g, k_cls, v_cls, mask):
    """Attention within groups (time or space), each group augmented with CLS.

    Args:
      q_g, k_g, v_g: (B, H, G, L, d) — G groups of L tokens
        (time: G=n patches, L=F frames; space: G=F frames, L=n patches).
      k_cls, v_cls: (B, H, 1, d) CLS key/value, shared across groups.
      mask: (B, G_or_1, L, 1+L) bool or None, broadcast over heads. Column 0
        is the CLS key.

    Returns out (B, H, G, L, d).
    """
    # token-vs-token logits: (B, H, G, L, L)
    logits_tok = jnp.einsum("bhgld,bhgmd->bhglm", q_g, k_g)
    # token-vs-CLS logits: (B, H, G, L, 1)
    logits_cls = jnp.einsum("bhgld,bhd->bhgl", q_g, k_cls[:, :, 0])[..., None]
    logits = jnp.concatenate([logits_cls, logits_tok], axis=-1)  # (B,H,G,L,1+L)
    m = mask[:, None] if mask is not None else None  # (B,1,G|1,L,1+L)
    attn = _masked_softmax(logits, m).astype(v_g.dtype)
    out = jnp.einsum("bhglm,bhgmd->bhgld", attn[..., 1:], v_g)
    # add the CLS value weighted by each token's attention to the CLS key
    out = out + attn[..., :1] * v_cls[:, :, 0][:, :, None, None, :]
    return out


def build_frame_mask(mask: jnp.ndarray, identities_mask: jnp.ndarray | None) -> jnp.ndarray:
    """Time-attention mask ``(B, F, F+1)``.

    ``frame_mask[b, q, k] = mask[b, k] AND identities_mask[b, q, k]`` with an
    always-True leading CLS-key column (reference :251-255).
    """
    b, f = mask.shape
    fm = jnp.broadcast_to(mask[:, None, :], (b, f, f))
    if identities_mask is not None:
        fm = jnp.logical_and(fm, identities_mask)
    return jnp.concatenate([jnp.ones((b, f, 1), dtype=bool), fm], axis=-1)
