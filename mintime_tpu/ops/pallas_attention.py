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


# ---------------------------------------------------------------------------
# v2: whole divided attention (token rows + CLS row) from packed grouped
# qkv, one kernel per (batch) grid cell.
#
# The qkv projection stays an XLA matmul with NO transposed output; the
# caller hands the kernel a (B, G, L, 3*inner) grouped layout — for the
# space axis that IS the natural (B, F, n, ·) layout, for the time axis
# one XLA transpose to (B, n, F, ·) (cheaper than per-head VMEM swaps,
# measured on v5e). Per-head lane slicing + head stacking happen on
# VMEM-resident data (near-free: ~0.02 ms vs the 0.10 ms streaming floor),
# then every matmul batches over heads×groups — the per-head-loop variant
# measured MXU-issue-bound. Mosaic constraints probed on v5e: sublane
# reshapes like (784, d) → (16, 49, d) are unsupported; 64-wide lane
# slices, leading-dim stacks, and leading-dim merges are fine; multi-axis
# reduces need a unit trailing dim (hence the ones-matvec group sums).
# HBM traffic per layer ≈ read qkv + write out, ~6× less than the
# grouped-einsum XLA path.
# ---------------------------------------------------------------------------


def _divided_kernel(qkv_ref, qkvc_ref, sbias_ref, rbias_ref, otok_ref,
                    ocls_ref, *, heads: int, dim_head: int):
    """Whole-(b)-slice forward: heads×groups collapsed into ONE batched
    matmul per stage.

    The first version of this kernel looped over heads with per-head
    (G, L, L) matmuls; profiling on v5e showed it MXU-issue-bound (392
    tiny matmuls per cell), ~5× above the pure-streaming floor
    (copy-through kernel: 0.10 ms for the flagship 103 MB). Stacking the
    per-head slices (a VMEM copy measured at ~0.02 ms, near-free) and
    batching the dot_generals over H·G cut device self-time 0.54→0.48 ms
    (time axis) / 0.62→0.49 ms (space axis), with BITWISE-identical token
    rows. The CLS row is all-matvec on the MXU: its probability·value sum
    runs as a bf16 batched (1,L)@(L,dh) + a ones-matvec group reduction
    (fp32 accumulate), which differs from the old fp32 multiply-reduce by
    ≤3e-4 — inside the kernel-vs-XLA test tolerance.
    """
    f32 = jnp.float32
    dh = dim_head
    H = heads
    scale = dh ** -0.5
    qkv = qkv_ref[0]  # (G, L, 3*inner)
    qkvc = qkvc_ref[0]  # (1, 3*inner)
    sbias = sbias_ref[0]  # (L, 1+L) fp32 shared over groups, or (1, 1) zeros
    rbias = rbias_ref[0]  # CLS-row bias: (1, L), (G, 1), or (1, 1) zeros
    G, L, _ = qkv.shape

    # head-major packing (H, [q|k|v], dh): contiguous column shards of the
    # qkv kernel are whole heads (Megatron TP-alignable). The 64-wide lane
    # slices + leading-dim stack are cheap VMEM copies.
    qs = jnp.stack([qkv[:, :, h*3*dh:h*3*dh + dh] for h in range(H)]) * scale
    ks = jnp.stack([qkv[:, :, h*3*dh + dh:h*3*dh + 2*dh] for h in range(H)])
    vs = jnp.stack([qkv[:, :, h*3*dh + 2*dh:h*3*dh + 3*dh] for h in range(H)])
    qcs = jnp.stack([qkvc[:, h*3*dh:h*3*dh + dh] for h in range(H)]) * scale
    kcs = jnp.stack([qkvc[:, h*3*dh + dh:h*3*dh + 2*dh] for h in range(H)])
    vcs = jnp.stack([qkvc[:, h*3*dh + 2*dh:h*3*dh + 3*dh] for h in range(H)])
    qf = qs.reshape(H * G, L, dh)
    kf = ks.reshape(H * G, L, dh)
    vf = vs.reshape(H * G, L, dh)
    kcf = jnp.broadcast_to(kcs[:, None], (H, G, 1, dh)).reshape(H * G, 1, dh)
    vcf = jnp.broadcast_to(vcs[:, None], (H, G, 1, dh)).reshape(H * G, 1, dh)

    # ---- token rows: grouped attention + CLS key column, all heads/groups
    # in one batched dot_general
    logits_tok = jax.lax.dot_general(
        qf, kf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*G, L, L)
    logits_cls = jax.lax.dot_general(
        qf, kcf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*G, L, 1) batched matvec
    logits = jnp.concatenate([logits_cls, logits_tok], axis=-1)
    logits = logits + sbias[None]  # (L, 1+L) shared over heads and groups
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vf.dtype)
    og = jax.lax.dot_general(
        attn[..., 1:], vf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    og = og + attn[..., :1].astype(f32) * vcf.astype(f32)
    og = og.reshape(H, G, L, dh)
    for h in range(H):
        otok_ref[0, :, :, h*dh:(h+1)*dh] = og[h].astype(otok_ref.dtype)

    # ---- CLS row: attends to every token (order-independent softmax).
    # All matmuls: fp32 multiply-reduce materializations of (G, L, dh)
    # dominated the loop variant.
    qcf = jnp.broadcast_to(qcs[:, None], (H, G, 1, dh)).reshape(H * G, 1, dh)
    lrf = jax.lax.dot_general(
        qcf, kf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*G, 1, L)
    if rbias.shape == (1, 1):
        lrf = lrf + rbias.reshape(1, 1, 1)
    elif rbias.shape[0] == 1:  # (1, L): frame validity, shared over groups
        lrf = lrf + rbias.reshape(1, 1, L)
    else:  # (G, 1): per-group bias (space axis)
        lrf = lrf + jnp.broadcast_to(
            rbias[None], (H, G, 1)
        ).reshape(H * G, 1, 1)
    ls = jnp.sum(qcs.astype(f32) * kcs.astype(f32), axis=-1, keepdims=True)
    mg = jnp.max(lrf, axis=2, keepdims=True).reshape(H, G, 1)
    m2 = jnp.maximum(jnp.max(mg, axis=1, keepdims=True), ls)  # (H, 1, 1)
    m2b = jnp.broadcast_to(m2, (H, G, 1)).reshape(H * G, 1, 1)
    pr = jnp.exp(lrf - m2b)
    ps = jnp.exp(ls - m2)
    zg = jnp.sum(pr, axis=2, keepdims=True).reshape(H, G, 1)
    z = jnp.sum(zg, axis=1, keepdims=True) + ps  # (H, 1, 1)
    accg = jax.lax.dot_general(
        pr.astype(vf.dtype), vf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    ).reshape(H, G, dh)
    ones = jnp.ones((H, 1, G), f32)
    acc = jax.lax.dot_general(  # Σ_G via matvec (multi-axis reduces with a
        ones, accg, (((2,), (1,)), ((0,), (0,))),  # non-unit trailing dim
        preferred_element_type=f32,  # are unsupported in Mosaic)
    )
    co = (acc + ps * vcs.astype(f32)) / z  # (H, 1, dh)
    for h in range(H):
        ocls_ref[0, :, h*dh:(h+1)*dh] = co[h].astype(ocls_ref.dtype)


def _bias_specs(seq_bias, row_bias, L):
    """Normalize optional biases to arrays + their BlockSpecs."""
    if seq_bias is None:
        seq_bias = jnp.zeros((1, 1, 1), jnp.float32)
        sb_block, sb_index = (1, 1, 1), (lambda b: (0, 0, 0))
    else:
        seq_bias = seq_bias.astype(jnp.float32)
        sb_block, sb_index = (1, L, 1 + L), (lambda b: (b, 0, 0))
    if row_bias is None:
        row_bias = jnp.zeros((1, 1, 1), jnp.float32)
    else:
        row_bias = row_bias.astype(jnp.float32)
    rb_block = (1,) + row_bias.shape[1:]
    rb_index = lambda b, _n=row_bias.shape[0]: (b % _n, 0, 0)
    return seq_bias, row_bias, (sb_block, sb_index), (rb_block, rb_index)


def _fwd_call(qkv_g, qkv_cls, seq_bias, row_bias, heads, dim_head):
    B, G, L, c3 = qkv_g.shape
    inner = c3 // 3
    seq_bias, row_bias, (sb_block, sb_index), (rb_block, rb_index) = _bias_specs(
        seq_bias, row_bias, L
    )
    kernel = functools.partial(_divided_kernel, heads=heads, dim_head=dim_head)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        interpret=jax.default_backend() == "cpu",  # CI runs on CPU
        # the stacked (H·G, L, ·) intermediates exceed the default 16 MB
        # scoped-vmem budget; v5e has headroom above it
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, G, L, c3), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sb_block, sb_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(rb_block, rb_index, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, G, L, inner), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, inner), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G, L, inner), qkv_g.dtype),
            jax.ShapeDtypeStruct((B, 1, inner), qkv_g.dtype),
        ],
    )(qkv_g, qkv_cls, seq_bias, row_bias)


def _divided_bwd_kernel(qkv_ref, qkvc_ref, sbias_ref, rbias_ref, dtok_ref,
                        dcls_ref, dqkv_ref, dqkvc_ref, *, heads: int,
                        dim_head: int):
    """Flash-style recompute backward of :func:`_divided_kernel`.

    Recomputes the softmax from the saved packed qkv (cheaper than spilling
    the (G, L, 1+L) probabilities to HBM in the forward) and accumulates
    gradients from BOTH attention patterns — the grouped token rows with
    their CLS key/value column, and the global CLS row — into the packed
    d_qkv layout the projection matmul's backward consumes directly.
    """
    f32 = jnp.float32
    dh = dim_head
    H = heads
    scale = dh ** -0.5
    qkv = qkv_ref[0]  # (G, L, 3*inner)
    qkvc = qkvc_ref[0]  # (1, 3*inner)
    sbias = sbias_ref[0]
    rbias = rbias_ref[0]
    dtok = dtok_ref[0]  # (G, L, inner) cotangent of token outputs
    dcls = dcls_ref[0]  # (1, inner) cotangent of the CLS output
    G, L, _ = qkv.shape

    # stack heads once, batch every matmul over H·G — same restructure as
    # the forward (the per-head loop was MXU-issue-bound; see
    # _divided_kernel's docstring)
    qs = jnp.stack([qkv[:, :, h*3*dh:h*3*dh + dh] for h in range(H)]) * scale
    ks = jnp.stack([qkv[:, :, h*3*dh + dh:h*3*dh + 2*dh] for h in range(H)])
    vs = jnp.stack([qkv[:, :, h*3*dh + 2*dh:h*3*dh + 3*dh] for h in range(H)])
    qcs = jnp.stack([qkvc[:, h*3*dh:h*3*dh + dh] for h in range(H)]) * scale
    kcs = jnp.stack([qkvc[:, h*3*dh + dh:h*3*dh + 2*dh] for h in range(H)])
    vcs = jnp.stack([qkvc[:, h*3*dh + 2*dh:h*3*dh + 3*dh] for h in range(H)])
    dos = jnp.stack([dtok[:, :, h*dh:(h+1)*dh] for h in range(H)])
    dcs = jnp.stack([dcls[:, h*dh:(h+1)*dh] for h in range(H)])  # (H, 1, dh)
    qf = qs.reshape(H * G, L, dh)
    kf = ks.reshape(H * G, L, dh)
    vf = vs.reshape(H * G, L, dh)
    dof = dos.reshape(H * G, L, dh)
    bcast = lambda t: jnp.broadcast_to(t[:, None], (H, G, 1, dh)).reshape(
        H * G, 1, dh)
    qcf, kcf, vcf, dcf = bcast(qcs), bcast(kcs), bcast(vcs), bcast(dcs)

    # ---- token rows: recompute softmax exactly as the forward
    logits_tok = jax.lax.dot_general(
        qf, kf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*G, L, L)
    logits_cls = jax.lax.dot_general(
        qf, kcf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*G, L, 1)
    logits = jnp.concatenate([logits_cls, logits_tok], axis=-1) + sbias[None]
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    attn = p / jnp.sum(p, axis=-1, keepdims=True)  # (H*G, L, 1+L) fp32

    # d attn
    dattn_tok = jax.lax.dot_general(
        dof, vf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*G, L, L)
    dattn_cls = jax.lax.dot_general(
        dof, vcf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*G, L, 1)
    dattn = jnp.concatenate([dattn_cls, dattn_tok], axis=-1)
    # softmax backward: dS = p ⊙ (dP − Σ_j dP_j p_j)
    dlogits = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
    dl_cls = dlogits[..., :1]  # (H*G, L, 1)

    # grads into q/k/v (token rows)
    dq = jax.lax.dot_general(
        dlogits[..., 1:], kf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    ) + jax.lax.dot_general(  # (L,1)@(1,dh) outer product per batch cell
        dl_cls, kcf.astype(f32), (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    dk = jax.lax.dot_general(
        dlogits[..., 1:], qf.astype(f32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # (H*G, L_k, dh): contract the query axis
    # Σ_{L} dl_cls·q per cell via a contraction, then Σ_G via ones-matvec
    dkc_g = jax.lax.dot_general(
        dl_cls, qf.astype(f32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    ).reshape(H, G, dh)
    ones = jnp.ones((H, 1, G), f32)
    sum_g = lambda t: jax.lax.dot_general(
        ones, t, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H, G, dh) -> (H, 1, dh)
    dkc_tok = sum_g(dkc_g)
    dv = jax.lax.dot_general(
        attn[..., 1:], dof.astype(f32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # (H*G, L_k, dh)
    dvc_tok = sum_g(
        jax.lax.dot_general(
            attn[..., :1], dof.astype(f32), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        ).reshape(H, G, dh)
    )

    # ---- CLS row: recompute global softmax (same algebra as the forward)
    lrf = jax.lax.dot_general(
        qcf, kf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*G, 1, L)
    if rbias.shape == (1, 1):
        lrf = lrf + rbias.reshape(1, 1, 1)
    elif rbias.shape[0] == 1:
        lrf = lrf + rbias.reshape(1, 1, L)
    else:
        lrf = lrf + jnp.broadcast_to(
            rbias[None], (H, G, 1)
        ).reshape(H * G, 1, 1)
    ls = jnp.sum(qcs.astype(f32) * kcs.astype(f32), axis=-1, keepdims=True)
    mg = jnp.max(lrf, axis=2, keepdims=True).reshape(H, G, 1)
    mc = jnp.maximum(jnp.max(mg, axis=1, keepdims=True), ls)  # (H, 1, 1)
    mcb = jnp.broadcast_to(mc, (H, G, 1)).reshape(H * G, 1, 1)
    pru = jnp.exp(lrf - mcb)  # (H*G, 1, L) unnormalized
    psu = jnp.exp(ls - mc)  # (H, 1, 1)
    zg = jnp.sum(pru, axis=2, keepdims=True).reshape(H, G, 1)
    z = jnp.sum(zg, axis=1, keepdims=True) + psu  # (H, 1, 1)
    zb = jnp.broadcast_to(z, (H, G, 1)).reshape(H * G, 1, 1)
    pr = pru / zb  # (H*G, 1, L) normalized
    ps = psu / z  # (H, 1, 1)

    dpr = jax.lax.dot_general(
        dcf.astype(f32), vf.astype(f32), (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=f32,
    )  # (H*G, 1, L)
    dps = jnp.sum(vcs.astype(f32) * dcs.astype(f32), axis=-1, keepdims=True)
    sd_g = jnp.sum(pr * dpr, axis=2, keepdims=True).reshape(H, G, 1)
    s_dot = jnp.sum(sd_g, axis=1, keepdims=True) + ps * dps  # (H, 1, 1)
    s_dot_b = jnp.broadcast_to(s_dot, (H, G, 1)).reshape(H * G, 1, 1)
    dlr = pr * (dpr - s_dot_b)  # (H*G, 1, L)
    dls = ps * (dps - s_dot)  # (H, 1, 1)

    dqc = scale * (
        sum_g(
            jax.lax.dot_general(
                dlr, kf.astype(f32), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=f32,
            ).reshape(H, G, dh)
        )
        + dls * kcs.astype(f32)
    )  # (H, 1, dh); qc = raw·scale ⇒ chain the scale back
    dk = dk + jax.lax.dot_general(  # dlrᵀ ⊗ qc per cell: (L,1)@(1,dh)
        dlr, qcf.astype(f32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    dkc = dkc_tok + dls * qcs.astype(f32)
    dv = dv + jax.lax.dot_general(  # prᵀ ⊗ dc per cell
        pr, dcf.astype(f32), (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    dvc = dvc_tok + ps * dcs.astype(f32)

    dqh = (scale * dq).reshape(H, G, L, dh)
    dkh = dk.reshape(H, G, L, dh)
    dvh = dv.reshape(H, G, L, dh)
    for h in range(H):
        dqkv_ref[0, :, :, h*3*dh:h*3*dh + dh] = dqh[h].astype(dqkv_ref.dtype)
        dqkv_ref[0, :, :, h*3*dh + dh:h*3*dh + 2*dh] = dkh[h].astype(dqkv_ref.dtype)
        dqkv_ref[0, :, :, h*3*dh + 2*dh:h*3*dh + 3*dh] = dvh[h].astype(dqkv_ref.dtype)
        dqkvc_ref[0, :, h*3*dh:h*3*dh + dh] = dqc[h].astype(dqkvc_ref.dtype)
        dqkvc_ref[0, :, h*3*dh + dh:h*3*dh + 2*dh] = dkc[h].astype(dqkvc_ref.dtype)
        dqkvc_ref[0, :, h*3*dh + 2*dh:h*3*dh + 3*dh] = dvc[h].astype(dqkvc_ref.dtype)


def _bwd_call(qkv_g, qkv_cls, seq_bias, row_bias, d_tok, d_cls, heads,
              dim_head):
    B, G, L, c3 = qkv_g.shape
    inner = c3 // 3
    seq_bias, row_bias, (sb_block, sb_index), (rb_block, rb_index) = _bias_specs(
        seq_bias, row_bias, L
    )
    kernel = functools.partial(_divided_bwd_kernel, heads=heads,
                               dim_head=dim_head)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec((1, G, L, c3), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(sb_block, sb_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(rb_block, rb_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, L, inner), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, inner), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, G, L, c3), lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c3), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G, L, c3), qkv_g.dtype),
            jax.ShapeDtypeStruct((B, 1, c3), qkv_g.dtype),
        ],
    )(qkv_g, qkv_cls, seq_bias, row_bias, d_tok, d_cls)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _divided_attention_core(qkv_g, qkv_cls, seq_bias, row_bias, heads,
                            dim_head):
    return _fwd_call(qkv_g, qkv_cls, seq_bias, row_bias, heads, dim_head)


def _core_fwd(qkv_g, qkv_cls, seq_bias, row_bias, heads, dim_head):
    out = _fwd_call(qkv_g, qkv_cls, seq_bias, row_bias, heads, dim_head)
    return out, (qkv_g, qkv_cls, seq_bias, row_bias)


def _core_bwd(heads, dim_head, res, cot):
    qkv_g, qkv_cls, seq_bias, row_bias = res
    d_tok, d_cls = cot
    d_qkv, d_qkvc = _bwd_call(
        qkv_g, qkv_cls, seq_bias, row_bias,
        d_tok.astype(qkv_g.dtype), d_cls.astype(qkv_cls.dtype),
        heads, dim_head,
    )
    zero = lambda t: None if t is None else jnp.zeros_like(t)
    return d_qkv, d_qkvc, zero(seq_bias), zero(row_bias)


_divided_attention_core.defvjp(_core_fwd, _core_bwd)


# ---------------------------------------------------------------------------
# v3: G-tiled token rows for large-G geometries (VERDICT r2 next#5).
#
# The conv-TimeSformer's time axis has G≈1280 channel groups of L=8 rows —
# a whole-(b) block (G·L·3·inner ≈ 24 MB bf16) blows the VMEM budget and
# trips Mosaic relayouts. Here the token rows tile over G with grid
# (B, G/TG): each tile is independent (groups never interact in the token
# rows), so only the CLS k/v gradient needs a cross-tile reduction, done by
# revisiting one accumulator block (index map constant in g — the TPU grid
# is sequential, so read-modify-write is well-defined). The single CLS row
# itself (1 query over all G·L keys) is a cheap XLA reduction and stays
# outside the kernel — autodiff composes its vjp with the token-row
# custom_vjp automatically.
# ---------------------------------------------------------------------------


def _token_rows_kernel(qkv_ref, qkvc_ref, sbias_ref, otok_ref, *, heads: int,
                       dim_head: int):
    # NOTE: deliberately NOT restructured like _divided_kernel's
    # heads×groups batching — measured SLOWER here (1.04 → 1.33 ms device
    # on the conv geometry B=8, G=1280, L=8, H=6): stacking (TG, 8, dh)
    # slices breaks bf16's (16, 128) sublane tiling at L=8, and the
    # relayouts cost more than the batched dot_general saves.
    qkv = qkv_ref[0]  # (TG, L, 3*inner)
    qkvc = qkvc_ref[0]  # (1, 3*inner)
    sbias = sbias_ref[0]
    scale = dim_head ** -0.5
    for h in range(heads):
        oq = h * 3 * dim_head
        ok, ov = oq + dim_head, oq + 2 * dim_head
        oo = h * dim_head
        qg = qkv[:, :, oq:oq + dim_head] * scale
        kg = qkv[:, :, ok:ok + dim_head]
        vg = qkv[:, :, ov:ov + dim_head]
        kc = qkvc[:, ok:ok + dim_head]
        vc = qkvc[:, ov:ov + dim_head]
        logits_tok = jax.lax.dot_general(
            qg, kg, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        logits_cls = jnp.sum(
            qg.astype(jnp.float32) * kc[0].astype(jnp.float32)[None, None, :],
            axis=-1, keepdims=True,
        )
        logits = jnp.concatenate([logits_cls, logits_tok], axis=-1)
        logits = logits + sbias[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vg.dtype)
        og = jax.lax.dot_general(
            attn[..., 1:], vg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        og = og + attn[..., :1].astype(jnp.float32) * vc[0].astype(jnp.float32)[None, None]
        otok_ref[0, :, :, oo:oo + dim_head] = og.astype(otok_ref.dtype)


def _token_rows_bwd_kernel(qkv_ref, qkvc_ref, sbias_ref, dtok_ref, dqkv_ref,
                           dqkvc_ref, *, heads: int, dim_head: int):
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _init():
        dqkvc_ref[...] = jnp.zeros_like(dqkvc_ref)

    qkv = qkv_ref[0]
    qkvc = qkvc_ref[0]
    sbias = sbias_ref[0]
    dtok = dtok_ref[0]
    scale = dim_head ** -0.5
    f32 = jnp.float32
    for h in range(heads):
        oq = h * 3 * dim_head
        ok, ov = oq + dim_head, oq + 2 * dim_head
        oo = h * dim_head
        qg = qkv[:, :, oq:oq + dim_head] * scale
        kg = qkv[:, :, ok:ok + dim_head]
        vg = qkv[:, :, ov:ov + dim_head]
        kc = qkvc[:, ok:ok + dim_head]
        vc = qkvc[:, ov:ov + dim_head]
        do = dtok[:, :, oo:oo + dim_head].astype(f32)

        logits_tok = jax.lax.dot_general(
            qg, kg, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )
        logits_cls = jnp.sum(
            qg.astype(f32) * kc[0].astype(f32)[None, None, :],
            axis=-1, keepdims=True,
        )
        logits = jnp.concatenate([logits_cls, logits_tok], axis=-1) + sbias[None]
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        attn = p / jnp.sum(p, axis=-1, keepdims=True)

        dattn_tok = jax.lax.dot_general(
            do, vg, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
        )
        dattn_cls = jnp.sum(
            do * vc[0].astype(f32)[None, None, :], axis=-1, keepdims=True
        )
        dattn = jnp.concatenate([dattn_cls, dattn_tok], axis=-1)
        dlogits = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))

        dq = jax.lax.dot_general(
            dlogits[..., 1:], kg, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        ) + dlogits[..., :1] * kc[0].astype(f32)[None, None, :]
        dk = jax.lax.dot_general(
            dlogits[..., 1:], qg.astype(f32), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        dkc = jnp.sum(dlogits[..., :1] * qg.astype(f32), axis=(0, 1),
                      keepdims=True)[0]
        dv = jax.lax.dot_general(
            attn[..., 1:], do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=f32,
        )
        dvc = jnp.sum(attn[..., :1] * do, axis=(0, 1), keepdims=True)[0]

        dqkv_ref[0, :, :, oq:oq + dim_head] = (scale * dq).astype(dqkv_ref.dtype)
        dqkv_ref[0, :, :, ok:ok + dim_head] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[0, :, :, ov:ov + dim_head] = dv.astype(dqkv_ref.dtype)
        dqkvc_ref[0, :, ok:ok + dim_head] += dkc.astype(dqkvc_ref.dtype)
        dqkvc_ref[0, :, ov:ov + dim_head] += dvc.astype(dqkvc_ref.dtype)


def _pick_group_tile(G: int, L: int, c3: int, itemsize: int,
                     budget: int = 2 * 1024 * 1024) -> int:
    """Largest divisor of G whose (TG, L, 3*inner) block fits the budget
    (divisor, not ceil-div: a padded tail block would feed garbage rows
    into the cross-tile CLS-k/v gradient accumulation)."""
    max_rows = max(1, budget // max(1, L * c3 * itemsize))
    tg = 1
    for d in range(1, G + 1):
        if G % d == 0 and d <= max_rows:
            tg = d
    return tg


def _token_rows_specs(B, G, L, c3, inner, seq_bias, itemsize):
    tg = _pick_group_tile(G, L, c3, itemsize)
    if seq_bias is None:
        seq_bias = jnp.zeros((1, 1, 1), jnp.float32)
        sb_block, sb_index = (1, 1, 1), (lambda b, g: (0, 0, 0))
    else:
        seq_bias = seq_bias.astype(jnp.float32)
        sb_block, sb_index = (1, L, 1 + L), (lambda b, g: (b, 0, 0))
    in_specs = [
        pl.BlockSpec((1, tg, L, c3), lambda b, g: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, c3), lambda b, g: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(sb_block, sb_index, memory_space=pltpu.VMEM),
    ]
    return tg, seq_bias, in_specs


def _token_rows_fwd_call(qkv_g, qkv_cls, seq_bias, heads, dim_head):
    B, G, L, c3 = qkv_g.shape
    inner = c3 // 3
    tg, seq_bias, in_specs = _token_rows_specs(
        B, G, L, c3, inner, seq_bias, qkv_g.dtype.itemsize
    )
    return pl.pallas_call(
        functools.partial(_token_rows_kernel, heads=heads, dim_head=dim_head),
        grid=(B, G // tg),
        interpret=jax.default_backend() == "cpu",
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tg, L, inner), lambda b, g: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, G, L, inner), qkv_g.dtype),
    )(qkv_g, qkv_cls, seq_bias)


def _token_rows_bwd_call(qkv_g, qkv_cls, seq_bias, d_tok, heads, dim_head):
    B, G, L, c3 = qkv_g.shape
    inner = c3 // 3
    tg, seq_bias, in_specs = _token_rows_specs(
        B, G, L, c3, inner, seq_bias, qkv_g.dtype.itemsize
    )
    in_specs = in_specs + [
        pl.BlockSpec((1, tg, L, inner), lambda b, g: (b, g, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_token_rows_bwd_kernel, heads=heads,
                          dim_head=dim_head),
        grid=(B, G // tg),
        interpret=jax.default_backend() == "cpu",
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, tg, L, c3), lambda b, g: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            # CLS k/v grad: one block per b, revisited by every g step —
            # the cross-tile accumulator
            pl.BlockSpec((1, 1, c3), lambda b, g: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, G, L, c3), qkv_g.dtype),
            jax.ShapeDtypeStruct((B, 1, c3), jnp.float32),
        ],
    )(qkv_g, qkv_cls, seq_bias, d_tok)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _token_rows_core(qkv_g, qkv_cls, seq_bias, heads, dim_head):
    return _token_rows_fwd_call(qkv_g, qkv_cls, seq_bias, heads, dim_head)


def _tr_fwd(qkv_g, qkv_cls, seq_bias, heads, dim_head):
    out = _token_rows_fwd_call(qkv_g, qkv_cls, seq_bias, heads, dim_head)
    return out, (qkv_g, qkv_cls, seq_bias)


def _tr_bwd(heads, dim_head, res, d_tok):
    qkv_g, qkv_cls, seq_bias = res
    d_qkv, d_qkvc = _token_rows_bwd_call(
        qkv_g, qkv_cls, seq_bias, d_tok.astype(qkv_g.dtype), heads, dim_head
    )
    return (
        d_qkv,
        d_qkvc.astype(qkv_cls.dtype),
        None if seq_bias is None else jnp.zeros_like(seq_bias),
    )


_token_rows_core.defvjp(_tr_fwd, _tr_bwd)


def _cls_row_xla(qkv_g, qkv_cls, row_bias, heads, dim_head):
    """The single CLS row over all G·L tokens in plain XLA (one matvec-like
    reduction — no benefit from a kernel; differentiable by autodiff)."""
    B, G, L, c3 = qkv_g.shape
    f32 = jnp.float32
    scale = dim_head ** -0.5
    t = qkv_g.reshape(B, G, L, heads, 3, dim_head)
    k_g, v_g = t[..., 1, :], t[..., 2, :]  # (B, G, L, H, dh)
    tc = qkv_cls.reshape(B, heads, 3, dim_head)
    qc, kc, vc = tc[:, :, 0] * scale, tc[:, :, 1], tc[:, :, 2]  # (B, H, dh)
    lr = jnp.einsum("bhd,bglhd->bhgl", qc.astype(f32), k_g.astype(f32))
    if row_bias is not None:
        lr = lr + row_bias.astype(f32)[:, None]
    ls = jnp.sum(qc.astype(f32) * kc.astype(f32), axis=-1)  # (B, H)
    m = jnp.maximum(jnp.max(lr, axis=(2, 3)), ls)
    pr = jnp.exp(lr - m[:, :, None, None])
    ps = jnp.exp(ls - m)
    z = jnp.sum(pr, axis=(2, 3)) + ps
    out = (
        jnp.einsum("bhgl,bglhd->bhd", (pr / z[:, :, None, None]).astype(v_g.dtype), v_g)
        + (ps / z)[:, :, None].astype(vc.dtype) * vc
    )
    return out.reshape(B, 1, heads * dim_head)


#: whole-(b)-slice kernel block budget; above it, tile over groups
_WHOLE_SLICE_BYTES = 6 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("heads", "dim_head"))
def divided_attention(qkv_g, qkv_cls, seq_bias, row_bias, *, heads: int,
                      dim_head: int):
    """Grouped attention with a CLS row from packed grouped qkv.

    Differentiable: a flash-style recompute backward kernel
    (:func:`_divided_bwd_kernel`) is registered via ``jax.custom_vjp``, so
    the training step can route attention through Pallas too (the
    probability tensor never exists in HBM in either direction).

    Two regimes, picked from the static shapes:
    * small slices (flagship TimeSformer: G·L·3·inner ≲ 6 MB) — the whole
      (b) slice in one grid cell, CLS row fused in (``_divided_kernel``);
    * large G (conv-TimeSformer time axis, G≈1280 × L=8) — token rows tile
      over G (``_token_rows_kernel``), the CLS row is an XLA reduction.

    The regime split was re-litigated head-to-head on v5e (2026-08-19,
    ``experiments/attn_kernel_variants.py``): in ISOLATION the G-tiled +
    XLA-CLS path measures 19% faster at the flagship SPACE geometry
    (G=16 × L=49: 0.84 vs 1.03 ms/call), but routing the space axis to it
    inside the full flagship forward measured **-25%** end to end
    (616 → 461 videos/s, interleaved best-of-4) — the XLA CLS row's
    re-read of qkv forces relayouts of the surrounding graph that the
    standalone harness's free jit-boundary layouts hide. A chunked-dense
    variant (P groups packed into the 128-sublane MXU tile, dense logits
    + block-diagonal mask — 7× fewer MXU issues on the logits phase) lost
    at BOTH geometries (1.32 vs 1.07 / 1.03 ms): the P× wider softmax adds
    more VPU work than the saved MXU issues. The whole-slice kernel stays
    the dispatch for both flagship axes on measurement, not taste.

    Args:
      qkv_g: (B, G, L, 3*inner) head-major packed token projections —
        columns ordered (head, [q|k|v], dim_head) so TP column-shards are
        whole heads (pre-scale; the kernel applies dim_head**-0.5 to q).
        Space axis: the natural (B, F, n, ·); time axis: caller transposes
        to (B, n, F, ·).
      qkv_cls: (B, 1, 3*inner) CLS projections.
      seq_bias: (B, L, 1+L) fp32 additive per-row mask shared over groups
        (column 0 = CLS key) or None.
      row_bias: fp32 additive CLS-row token-validity bias broadcastable to
        (B, G, L) — e.g. (B, G, 1) or (B, 1, L) — or None.
    Returns (out (B, G, L, inner), out_cls (B, 1, inner)).
    """
    B, G, L, c3 = qkv_g.shape
    if G * L * c3 * qkv_g.dtype.itemsize <= _WHOLE_SLICE_BYTES:
        return _divided_attention_core(qkv_g, qkv_cls, seq_bias, row_bias,
                                       heads, dim_head)
    out_tok = _token_rows_core(qkv_g, qkv_cls, seq_bias, heads, dim_head)
    out_cls = _cls_row_xla(qkv_g, qkv_cls, row_bias, heads, dim_head)
    return out_tok, out_cls
