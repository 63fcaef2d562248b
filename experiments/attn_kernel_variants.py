"""Measure divided-attention kernel variants at flagship shapes (VERDICT r3 #2).

The fused kernel's 18 forward calls cost 9.1 ms vs a 1.8 ms streaming floor
(README per-op table). Per call the work is tiny-matmul-bound: 392 batched
(16,64)@(64,16) MXU ops per (b) cell plus a CLS row built from matvecs.
Candidates measured head-to-head on the real chip:

  A  current _divided_kernel (token rows + CLS row fused, grid=(B,))
  B  token rows in the kernel, CLS row as one XLA einsum (re-reads qkv)
  D  pure-XLA dense block-masked attention (no Pallas; 785x785 with mask)
  E  pure-XLA grouped einsum path (ops.attention reference path)
  G  chunked-dense Pallas kernel: P groups packed into the MXU's 128-row
     tile, dense logits per chunk + additive block-diagonal mask (H*G/P
     MXU issues instead of H*G on the logits phase)

Timing: each variant is looped ITERS times ON DEVICE inside one jitted
lax.scan (output feeds the next input) — a host-side loop would measure
the axon tunnel's ~15 ms per-call dispatch latency, not the sub-ms kernel.

Run on TPU:  python experiments/attn_kernel_variants.py

MEASURED on v5e (2026-08-19), ms/call incl. the constant scan-body
carry-update overhead (identical across variants — deltas are real):

  === time axis: G=49 L=16 ===      === space axis: G=16 L=49 ===
  A fused kernel          1.067     A fused kernel          1.028
  B tok-kernel + XLA cls  1.375     B tok-kernel + XLA cls  0.837
  G chunked-dense P=8     1.321     G chunked-dense P=2     1.326
  D dense masked XLA      3.771     D dense masked XLA      3.792
  E grouped einsum XLA    3.943     E grouped einsum XLA    3.709

Verdict (why the production dispatch is unchanged):
* G loses at BOTH geometries: the P× wider per-chunk softmax (dense
  (P·L)×(1+P·L) fp32 exp/max on the VPU) costs more than the 7× (time) /
  2× (space) saved MXU issues. The kernels are softmax-VPU co-bound, not
  purely issue-bound — packing more rows per matmul is net-negative.
* B's isolated 19% space-axis win did NOT survive in the full model:
  routing L>G to B measured 616 → 461 videos/s (-25%, interleaved
  best-of-4 at batch 32) — the XLA CLS row re-reads qkv and forces
  relayouts of the surrounding in-graph tensors that this standalone
  harness (free jit-boundary layouts) hides.
* Mosaic constraint probed: the chunk pack reshape (H, Gp, L, dh) ->
  (H*C, P*L, dh) needs L % 8 == 0; L=49 must be padded to 56 (variant_g
  does) or Mosaic rejects the sublane merge.
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


ITERS = 100


@functools.lru_cache(maxsize=None)
def _chained(fn, heads, dim_head):
    """Loop the variant ITERS times ON DEVICE (output feeds the next input):
    a host-side loop measures the axon tunnel's ~15 ms per-call dispatch
    latency, not the sub-ms kernel. One fetch at the end."""

    @jax.jit
    def run(qkv, qkvc, sbias, rbias):
        def body(carry, _):
            out_tok = fn(carry, qkvc, sbias, rbias, heads, dim_head)[0]
            delta = jnp.concatenate([out_tok] * 3, axis=-1)
            return carry + (delta * 1e-6).astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, qkv, None, length=ITERS)
        return final[0, 0, 0, :8]

    return run


def timeit(fn, *args, reps=3):
    run = _chained(fn, H, DH)
    args = args[:4]  # (qkv, qkvc, sbias, rbias); heads/dim_head are baked in
    np.asarray(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1000.0


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


# --- variant G: chunked-dense Pallas kernel ------------------------------------
# Pack P groups into the MXU's 128-sublane tile and compute DENSE attention
# per chunk with an additive block-diagonal mask: H*(G/P) MXU ops of
# (P·L, dh)@(dh, P·L) instead of H*G tiny (L, dh)@(dh, L) ops. On the time
# axis (G=49, L=16, P=8) that is 7x fewer MXU issues on the logits phase at
# the cost of P x more logit FLOPs (each pass is the same ~dh cycles, so
# issue count is what matters) and a wider softmax.

import jax.experimental.pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chunked_kernel(qkv_ref, qkvc_ref, sbias_ref, rbias_ref, otok_ref,
                    ocls_ref, *, heads, dim_head, P):
    f32 = jnp.float32
    dh = dim_head
    H = heads
    scale = dh ** -0.5
    qkv = qkv_ref[0]      # (Gp, L, 3*inner), zero-padded to Gp = C*P groups
    qkvc = qkvc_ref[0]    # (1, 3*inner)
    sbias = sbias_ref[0]  # (L, 1+L)
    rbias = rbias_ref[0]  # (Gp, L) full CLS-row bias (NEG on padded groups)
    Gp, L, _ = qkv.shape
    C = Gp // P
    PL = P * L
    qs = jnp.stack([qkv[:, :, h*3*dh:h*3*dh + dh] for h in range(H)]) * scale
    ks = jnp.stack([qkv[:, :, h*3*dh + dh:h*3*dh + 2*dh] for h in range(H)])
    vs = jnp.stack([qkv[:, :, h*3*dh + 2*dh:h*3*dh + 3*dh] for h in range(H)])
    qcs = jnp.stack([qkvc[:, h*3*dh:h*3*dh + dh] for h in range(H)]) * scale
    kcs = jnp.stack([qkvc[:, h*3*dh + dh:h*3*dh + 2*dh] for h in range(H)])
    vcs = jnp.stack([qkvc[:, h*3*dh + 2*dh:h*3*dh + 3*dh] for h in range(H)])
    qf = qs.reshape(H * C, PL, dh)
    kf = ks.reshape(H * C, PL, dh)
    vf = vs.reshape(H * C, PL, dh)
    kcf = jnp.broadcast_to(kcs[:, None], (H, C, 1, dh)).reshape(H * C, 1, dh)
    vcf = jnp.broadcast_to(vcs[:, None], (H, C, 1, dh)).reshape(H * C, 1, dh)

    logits_tok = jax.lax.dot_general(
        qf, kf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*C, PL, PL) dense within the chunk
    logits_cls = jax.lax.dot_general(
        qf, kcf, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*C, PL, 1)
    rowg = jax.lax.broadcasted_iota(jnp.int32, (PL, PL), 0) // L
    colg = jax.lax.broadcasted_iota(jnp.int32, (PL, PL), 1) // L
    blockmask = jnp.where(rowg == colg, 0.0, pa.NEG).astype(f32)
    sb_tok = jnp.tile(sbias[:, 1:], (P, P)) + blockmask
    sb_cls = jnp.tile(sbias[:, :1], (P, 1))
    logits = jnp.concatenate(
        [logits_cls + sb_cls[None], logits_tok + sb_tok[None]], axis=-1
    )
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(vf.dtype)
    og = jax.lax.dot_general(
        attn[..., 1:], vf, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    )
    og = og + attn[..., :1].astype(f32) * vcf.astype(f32)
    og = og.reshape(H, Gp, L, dh)
    for h in range(H):
        otok_ref[0, :, :, h*dh:(h+1)*dh] = og[h].astype(otok_ref.dtype)

    # CLS row: identical to the fused kernel's, with a full (Gp, L) bias so
    # zero-padded groups are excluded from the global softmax
    kfg = ks.reshape(H * Gp, L, dh)
    vfg = vs.reshape(H * Gp, L, dh)
    qcf = jnp.broadcast_to(qcs[:, None], (H, Gp, 1, dh)).reshape(H * Gp, 1, dh)
    lrf = jax.lax.dot_general(
        qcf, kfg, (((2,), (2,)), ((0,), (0,))), preferred_element_type=f32
    )  # (H*Gp, 1, L)
    lrf = lrf + jnp.broadcast_to(rbias[None, :, None], (H, Gp, 1, L)).reshape(
        H * Gp, 1, L)
    ls = jnp.sum(qcs.astype(f32) * kcs.astype(f32), axis=-1, keepdims=True)
    mg = jnp.max(lrf, axis=2, keepdims=True).reshape(H, Gp, 1)
    m2 = jnp.maximum(jnp.max(mg, axis=1, keepdims=True), ls)
    m2b = jnp.broadcast_to(m2, (H, Gp, 1)).reshape(H * Gp, 1, 1)
    pr = jnp.exp(lrf - m2b)
    ps = jnp.exp(ls - m2)
    zg = jnp.sum(pr, axis=2, keepdims=True).reshape(H, Gp, 1)
    z = jnp.sum(zg, axis=1, keepdims=True) + ps
    accg = jax.lax.dot_general(
        pr.astype(vfg.dtype), vfg, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=f32,
    ).reshape(H, Gp, dh)
    ones = jnp.ones((H, 1, Gp), f32)
    acc = jax.lax.dot_general(
        ones, accg, (((2,), (1,)), ((0,), (0,))), preferred_element_type=f32
    )
    co = (acc + ps * vcs.astype(f32)) / z
    for h in range(H):
        ocls_ref[0, :, h*dh:(h+1)*dh] = co[h].astype(ocls_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "dim_head", "P"))
def variant_g(qkv, qkvc, sbias, rbias, heads, dim_head, P=8):
    b, G, L, c3 = qkv.shape
    inner = c3 // 3
    Gp = -(-G // P) * P
    # Mosaic only merges (P, L) sublane dims when L is a multiple of 8
    # (probed on v5e: (8,16,49,64)->(64,98,64) is rejected, 16-wide L is
    # fine) — pad L up and NEG-mask the padded key columns.
    Lp = -(-L // 8) * 8
    qkv_p = jnp.pad(qkv, ((0, 0), (0, Gp - G), (0, Lp - L), (0, 0)))
    # sbias (B, L, 1+L) -> (B, Lp, 1+Lp): padded QUERY rows are dropped at
    # the end (zero-pad keeps them finite); padded KEY columns get NEG.
    sb_p = jnp.pad(sbias.astype(jnp.float32),
                   ((0, 0), (0, Lp - L), (0, 0)))
    sb_p = jnp.pad(sb_p, ((0, 0), (0, 0), (0, Lp - L)),
                   constant_values=pa.NEG)
    # rbias arrives (B, 1, L): broadcast over real groups, NEG on padding
    rb_full = jnp.concatenate(
        [
            jnp.broadcast_to(rbias.astype(jnp.float32), (b, G, L)),
            jnp.full((b, Gp - G, L), pa.NEG, jnp.float32),
        ],
        axis=1,
    )
    rb_full = jnp.pad(rb_full, ((0, 0), (0, 0), (0, Lp - L)),
                      constant_values=pa.NEG)
    kernel = functools.partial(
        _chunked_kernel, heads=heads, dim_head=dim_head, P=P
    )
    out_tok, out_cls = pl.pallas_call(
        kernel,
        grid=(b,),
        interpret=jax.default_backend() == "cpu",
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        in_specs=[
            pl.BlockSpec((1, Gp, Lp, c3), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, 1 + Lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Gp, Lp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Gp, Lp, inner), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, inner), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, Gp, Lp, inner), qkv.dtype),
            jax.ShapeDtypeStruct((b, 1, inner), qkv.dtype),
        ],
    )(qkv_p, qkvc, sb_p, rb_full)
    return out_tok[:, :G, :L], out_cls


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
    cls_w = attn[..., 0].astype(jnp.float32).transpose(0, 2, 3, 1)  # (B,G,L,H)
    out = out + cls_w[..., None] * vc[:, None, None].astype(jnp.float32)
    return out.reshape(b, G, L, heads * dh).astype(qkv.dtype), None


def main():
    print(f"devices: {jax.devices()}")
    for name, (G, L) in GEOMS.items():
        qkv, qkvc, sbias, rbias = make_inputs(G, L)
        P = 8 if L * 8 <= 128 else 2  # pack to ~the 128-sublane MXU tile
        gfn = functools.partial(variant_g, P=P)
        rows = []
        rows.append(("A fused kernel", timeit(
            variant_a, qkv, qkvc, sbias, rbias, H, DH)))
        rows.append(("B tok-kernel + XLA cls", timeit(
            variant_b, qkv, qkvc, sbias, rbias, H, DH)))
        rows.append((f"G chunked-dense P={P}", timeit(
            gfn, qkv, qkvc, sbias, rbias, H, DH)))
        rows.append(("D dense masked XLA", timeit(
            variant_d, qkv, qkvc, sbias, rbias, H, DH)))
        rows.append(("E grouped einsum XLA", timeit(
            variant_e, qkv, qkvc, sbias, rbias, H, DH)))
        print(f"\n=== {name} axis: G={G} L={L} B={B} H={H} dh={DH} ===")
        for label, ms in rows:
            print(f"  {label:28s} {ms:7.3f} ms/call")
        # numerics cross-check vs A (token rows must agree closely)
        oa = variant_a(qkv, qkvc, sbias, rbias, H, DH)
        for label, fn in (("B", variant_b), (f"G(P={P})", gfn)):
            ob = fn(qkv, qkvc, sbias, rbias, H, DH)
            tok_err = float(jnp.max(jnp.abs(
                oa[0].astype(jnp.float32) - ob[0].astype(jnp.float32))))
            cls_err = float(jnp.max(jnp.abs(
                oa[1].astype(jnp.float32) - ob[1].astype(jnp.float32))))
            print(f"  {label}-vs-A max |err| tok {tok_err:.2e}"
                  f" cls {cls_err:.2e}")


if __name__ == "__main__":
    main()
