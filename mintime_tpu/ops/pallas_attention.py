"""Fused divided-attention Pallas TPU kernel.

Fuses, per (batch·head) grid cell, the whole grouped attention of
:func:`mintime_tpu.ops.attention.grouped_attention_with_cls` — token-vs-token
logits, token-vs-CLS logits, additive mask, fp32 softmax, and both PV
matmuls — into ONE kernel, so the ``(B,H,G,L,1+L)`` probability tensor
never round-trips through HBM (the XLA path materializes it between the
softmax and the value matmul when fusion falls apart under a transpose).

Shapes are the divided space-time attention's (SURVEY.md §3.4): time axis
``G=n(49), L=F(16)``, space axis ``G=F, L=n``; D = dim_head. All tiny per
group, so each grid cell processes ALL groups of one (b,h) slice with
G-batched MXU ``dot_general``s — VMEM per cell is ~G·L·D·3·4B ≈ 600 KB at
the flagship config, far under the 16 MB budget.

Numerics: MXU matmuls run at bf16-internal precision (like every bf16
matmul in the model); the softmax itself is fp32. The plain-XLA path in
``ops.attention`` stays the fp32-exact reference — the model flag
``use_pallas_attention`` selects this kernel for the hot path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0.7 * float(np.finfo(np.float32).max)


def _kernel(q_ref, k_ref, v_ref, kc_ref, vc_ref, bias_ref, o_ref):
    # blocks: q/k/v (1, G, L, D); kc/vc (1, 1, D); bias (1, L, 1+L); o like q
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    kc = kc_ref[0]  # (1, D)
    vc = vc_ref[0]  # (1, D)
    bias = bias_ref[0]  # (L, 1+L)

    # (G, L, L) token-token logits
    logits_tok = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )
    # (G, L, 1) token-CLS logits as a VPU multiply-reduce — a 3D-vs-2D
    # dot_general would force a Mosaic-unsupported (G,L,D)->(G*L,D) reshape
    logits_cls = jnp.sum(
        q.astype(jnp.float32) * kc[0].astype(jnp.float32)[None, None, :],
        axis=-1,
        keepdims=True,
    )
    logits = jnp.concatenate([logits_cls, logits_tok], axis=-1)  # (G, L, 1+L)
    logits = logits + bias[None]

    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    attn = p / jnp.sum(p, axis=-1, keepdims=True)
    attn = attn.astype(v.dtype)

    out = jax.lax.dot_general(
        attn[..., 1:], v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out = out + attn[..., :1].astype(jnp.float32) * vc[0].astype(jnp.float32)[None, None]
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads",))
def fused_grouped_attention(q_g, k_g, v_g, k_cls, v_cls, bias, heads: int):
    """Pallas version of ``grouped_attention_with_cls``.

    Args:
      q_g, k_g, v_g: (B, H, G, L, D) — q pre-scaled.
      k_cls, v_cls: (B, H, 1, D).
      bias: (B, L, 1+L) fp32 additive mask (0 / -inf), shared over heads and
        groups — or None.
    Returns (B, H, G, L, D) fp32-accumulated in the value matmul.
    """
    B, H, G, L, D = q_g.shape
    BH = B * H
    flat = lambda t: t.reshape(BH, G, L, D)
    q, k, v = flat(q_g), flat(k_g), flat(v_g)
    kc = k_cls.reshape(BH, 1, D)
    vc = v_cls.reshape(BH, 1, D)
    if bias is None:
        bias = jnp.zeros((1, L, 1 + L), jnp.float32)
        bias_index = lambda p: (0, 0, 0)
    else:
        bias = bias.astype(jnp.float32)
        bias_index = lambda p: (p // heads, 0, 0)

    out = pl.pallas_call(
        _kernel,
        grid=(BH,),
        interpret=jax.default_backend() == "cpu",  # CI runs on CPU
        in_specs=[
            pl.BlockSpec((1, G, L, D), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, L, D), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, L, D), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, D), lambda p: (p, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, 1 + L), bias_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, G, L, D), lambda p: (p, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((BH, G, L, D), q.dtype),
    )(q, k, v, kc, vc, bias)
    return out.reshape(B, H, G, L, D)


def mask_to_bias(mask) -> jnp.ndarray:
    """bool (B, L, 1+L) mask → additive fp32 bias (0 where True, -big)."""
    return jnp.where(mask, 0.0, NEG).astype(jnp.float32)
