"""Measure divided-attention kernel variants at flagship shapes (VERDICT r3 #2).

The fused kernel's 18 forward calls cost 9.1 ms vs a 1.8 ms streaming floor
(README per-op table). Per call the work is tiny-matmul-bound: 392 batched
(16,64)@(64,16) MXU ops per (b) cell plus a CLS row built from matvecs.
Candidates measured head-to-head on the real chip:

  A  current _divided_kernel (token rows + CLS row fused, grid=(B,))
  B  token rows in the kernel, CLS row as one XLA einsum (re-reads qkv)
  C  B with multi-(b) blocks per grid cell (2 and 4)
  D  pure-XLA dense block-masked attention (no Pallas; 785x785 with mask)
  E  pure-XLA grouped einsum path (ops.attention reference path)

Run on TPU:  python experiments/attn_kernel_variants.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from mintime_tpu.ops import pallas_attention as pa

B, H, DH = 32, 8, 64
INNER = H * DH
C3 = 3 * INNER
GEOMS = {"time": (49, 16), "space": (16, 49)}  # (G, L)


def make_inputs(G, L, seed=0):
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.standard_normal((B, G, L, C3)), jnp.bfloat16)
    qkvc = jnp.asarray(rng.standard_normal((B, 1, C3)), jnp.bfloat16)
    sbias = jnp.asarray(
        np.where(rng.random((B, L, 1 + L)) > 0.1, 0.0, pa.NEG), jnp.float32
    )
    rbias = jnp.asarray(
        np.where(rng.random((B, 1, L)) > 0.1, 0.0, pa.NEG), jnp.float32
    )
    return qkv, qkvc, sbias, rbias


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax.tree.leaves(out)[0].block_until_ready() if hasattr(
        jax.tree.leaves(out)[0], "block_until_ready") else None
    np.asarray(jax.tree.leaves(out)[0])  # axon: fetch = sync
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters * 1000.0


# --- variant A: current fused kernel -----------------------------------------
@functools.partial(jax.jit, static_argnames=("heads", "dim_head"))
def variant_a(qkv, qkvc, sbias, rbias, heads, dim_head):
    return pa._divided_attention_core(qkv, qkvc, sbias, rbias, heads, dim_head)


# --- variant B: token rows kernel + XLA CLS row -------------------------------
@functools.partial(jax.jit, static_argnames=("heads", "dim_head"))
def variant_b(qkv, qkvc, sbias, rbias, heads, dim_head):
    out_tok = pa._token_rows_core(qkv, qkvc, sbias, heads, dim_head)
    out_cls = pa._cls_row_xla(qkv, qkvc, rbias, heads, dim_head)
    return out_tok, out_cls


# --- variant D: dense block-masked attention, pure XLA ------------------------
@functools.partial(jax.jit, static_argnames=("heads", "dim_head"))
def variant_d(qkv, qkvc, sbias, rbias, heads, dim_head):
    b, G, L, c3 = qkv.shape
    dh = dim_head
    t = qkv.reshape(b, G * L, heads, 3, dh)
    q, k, v = t[..., 0, :], t[..., 1, :], t[..., 2, :]  # (B, GL, H, dh)
    tc = qkvc.reshape(b, 1, heads, 3, dh)
    qc, kc, vc = tc[..., 0, :], tc[..., 1, :], tc[..., 2, :]
    qa = jnp.concatenate([qc, q], axis=1) * (dh ** -0.5)  # (B, 1+GL, H, dh)
    ka = jnp.concatenate([kc, k], axis=1)
    va = jnp.concatenate([vc, v], axis=1)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qa, ka,
                        preferred_element_type=jnp.float32)
    # block-diagonal group mask + CLS row/col always visible
    gl = G * L
    gid = jnp.arange(gl) // L
    blk = gid[:, None] == gid[None, :]
    mask = jnp.ones((1 + gl, 1 + gl), bool)
    mask = mask.at[1:, 1:].set(blk)
    logits = jnp.where(mask[None, None], logits, pa.NEG)
    # seq_bias rows (per-frame masks) fold into the token rows
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn.astype(va.dtype), va,
                     preferred_element_type=jnp.float32)
    out = out.astype(qkv.dtype).reshape(b, 1 + gl, heads * dh)
    return out[:, 1:].reshape(b, G, L, heads * dh), out[:, :1]


# --- variant E: plain grouped einsum (XLA) ------------------------------------
@functools.partial(jax.jit, static_argnames=("heads", "dim_head"))
def variant_e(qkv, qkvc, sbias, rbias, heads, dim_head):
    b, G, L, c3 = qkv.shape
    dh = dim_head
    t = qkv.reshape(b, G, L, heads, 3, dh)
    q, k, v = t[..., 0, :] * (dh ** -0.5), t[..., 1, :], t[..., 2, :]
    tc = qkvc.reshape(b, heads, 3, dh)
    kc, vc = tc[:, :, 1], tc[:, :, 2]
    lt = jnp.einsum("bglhd,bgmhd->bhglm", q, k,
                    preferred_element_type=jnp.float32)
    lc = jnp.einsum("bglhd,bhd->bhgl", q, kc,
                    preferred_element_type=jnp.float32)
    logits = jnp.concatenate([lc[..., None], lt], axis=-1)
    logits = logits + sbias[:, None, None]
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhglm,bgmhd->bglhd", attn[..., 1:].astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out + attn[..., :1].astype(jnp.float32).transpose(0, 2, 3, 1)[..., None] * vc[:, None, None].astype(jnp.float32)
    return out.reshape(b, G, L, heads * dh).astype(qkv.dtype), None


def main():
    print(f"devices: {jax.devices()}")
    for name, (G, L) in GEOMS.items():
        qkv, qkvc, sbias, rbias = make_inputs(G, L)
        rows = []
        rows.append(("A fused kernel", timeit(
            variant_a, qkv, qkvc, sbias, rbias, H, DH)))
        rows.append(("B tok-kernel + XLA cls", timeit(
            variant_b, qkv, qkvc, sbias, rbias, H, DH)))
        rows.append(("D dense masked XLA", timeit(
            variant_d, qkv, qkvc, sbias, rbias, H, DH)))
        rows.append(("E grouped einsum XLA", timeit(
            variant_e, qkv, qkvc, sbias, rbias, H, DH)))
        print(f"\n=== {name} axis: G={G} L={L} B={B} H={H} dh={DH} ===")
        for label, ms in rows:
            print(f"  {label:28s} {ms:7.3f} ms/call")
        # numerics cross-check A vs B (token rows must agree closely)
        oa = variant_a(qkv, qkvc, sbias, rbias, H, DH)
        ob = variant_b(qkv, qkvc, sbias, rbias, H, DH)
        tok_err = float(jnp.max(jnp.abs(
            oa[0].astype(jnp.float32) - ob[0].astype(jnp.float32))))
        cls_err = float(jnp.max(jnp.abs(
            oa[1].astype(jnp.float32) - ob[1].astype(jnp.float32))))
        print(f"  B-vs-A max |err| tok {tok_err:.2e} cls {cls_err:.2e}")


if __name__ == "__main__":
    main()
