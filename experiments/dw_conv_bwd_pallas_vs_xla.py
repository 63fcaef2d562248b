"""Scratch experiment: Pallas depthwise-conv WEIGHT-GRADIENT vs XLA.

Motivation (train-step profile, 2026-08-19, `profiling --train`): the
backward's 76.4 ms of conv_general_dilated is the largest train-step slice,
and within it the *pointwise* conv grads run at 660-745 GB/s (≈ the v5e HBM
roofline) while the *depthwise* conv grads run at only 265-580 GB/s — the
one non-rooflined slice. The dw weight-grad is a reduction
    dW[kh,kw,c] = Σ_{b,oh,ow} x_pad[b, oh·s+kh, ow·s+kw, c] · dy[b,oh,ow,c]
— NOT the stencil the three forward Pallas attempts lost on: it reads x and
dy exactly once and reduces to a tiny (K,K,C) output, so its floor is pure
streaming.  XLA lowers it as a conv with batch-as-contraction, which is
where the 1.5-3× bandwidth gap lives.

Candidates, measured head-to-head per EfficientNet-B0 stride-1 geometry at
the bench batch (32 videos × 16 faces = 512 images):

  xla_wgrad   jax.vjp of lax.conv_general_dilated wrt w   (today's path)
  xla_dgrad   jax.vjp wrt x                                (today's path)
  pl_flat     Pallas wgrad, flattened (W·C) lane axis — full lane
              utilization at any C; the kw·C window shift is a lane
              ROTATE (pltpu.roll) + offset-0 slice, because static lane
              offsets are only Mosaic-legal at 128-multiples; the OW-sum
              is deferred to XLA on the tiny (K², OW·C) partial.
  pl_chan     Pallas wgrad, channels-in-lanes (NB,H,W,C) blocks — natural
              layout at C≥240 (lane pad ≤ 1.07×), taps shift sublanes.

Timing: on-device lax.scan chain (output feeds next input), one fetch at
the end — a host-side loop measures the axon tunnel's ~15 ms dispatch
latency, not the kernel.  The constant carry-update overhead (one extra
dy read+write) is identical across variants, so deltas are real; the
printed `floor` column is (x+dy bytes)/819 GB/s for calibration.

Run on TPU:  python experiments/dw_conv_bwd_pallas_vs_xla.py [--check]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# (tag, H, C, K, stride) — B0 dw layers at 224² input, N = 512 images.
# s2 layers are listed for the XLA split numbers but have no Pallas
# candidate yet (the phase-split relayout would double x traffic).
GEOMS = [
    ("b0  112² C32   K3 s1", 112, 32, 3, 1),
    ("b1  112² C96   K3 s2", 112, 96, 3, 2),
    ("b2  56²  C144  K3 s1", 56, 144, 3, 1),
    ("b3  56²  C144  K5 s2", 56, 144, 5, 2),
    ("b4  28²  C240  K5 s1", 28, 240, 5, 1),
    ("b6  14²  C480  K3 s1", 14, 480, 3, 1),
    ("b8  14²  C672  K5 s1", 14, 672, 5, 1),
    ("b12 7²   C1152 K5 s1", 7, 1152, 5, 1),
    ("b15 7²   C1152 K3 s1", 7, 1152, 3, 1),
]
N = 512
ITERS = 30
PEAK_GBS = 819.0  # v5e HBM


def make_inputs(H, C, K, s, n=N, seed=0):
    rng = np.random.default_rng(seed)
    oh = H // s
    x = jnp.asarray(rng.standard_normal((n, H, H, C)), jnp.bfloat16)
    dy = jnp.asarray(rng.standard_normal((n, oh, oh, C)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, K, 1, C)), jnp.bfloat16)
    return x, dy, w


def conv(x, w, s):
    return jax.lax.conv_general_dilated(
        x, w, (s, s), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
    )


def xla_wgrad(x, dy, w, s):
    _, vjp = jax.vjp(lambda wv: conv(x, wv, s), w)
    return vjp(dy)[0]


def xla_dgrad(x, dy, w, s):
    _, vjp = jax.vjp(lambda xv: conv(xv, w, s), x)
    return vjp(dy)[0]


# ---------------------------------------------------------------- pl_flat
def _flat_kernel(x_ref, dy_ref, o_ref, *, K: int, OH: int, OW: int, C: int):
    from jax.experimental.pallas import tpu as pltpu

    dy = dy_ref[...].astype(jnp.float32)  # (NB, OH, OW*C)
    rows = []
    for kh in range(K):
        xs_full = x_ref[:, kh:kh + OH, :]  # (NB, OH, (OW+K-1)*C) full lanes
        for kw in range(K):
            # static lane offsets kw*C are only Mosaic-legal when 128-aligned;
            # a lane ROTATE by kw*C + an offset-0 slice is legal at any C
            # (roll wants a non-negative shift: left-by-s == right-by-len-s)
            lanes = (OW + K - 1) * C
            shifted = (
                pltpu.roll(xs_full, lanes - kw * C, axis=2) if kw else xs_full
            )
            xs = shifted[:, :, : OW * C].astype(jnp.float32)
            rows.append((xs * dy).sum(axis=(0, 1)))  # (OW*C,)
    acc = jnp.stack(rows)  # (K², OW*C)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        o_ref[...] += acc


def _pick_nb(n, block_bytes, budget=6 * 1024 * 1024):
    """Largest divisor of n whose double-buffered blocks fit the budget."""
    nb = max(1, budget // max(block_bytes, 1))
    while n % nb:
        nb -= 1
    return int(nb)


def pl_flat_wgrad(x, dy, *, K: int, NB: int | None = None):
    """stride-1 SAME dw weight grad; returns (K,K,1,C) fp32."""
    n, H, W, C = x.shape
    p = K // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    xp = xp.reshape(n, H + 2 * p, (W + 2 * p) * C)
    dyf = dy.reshape(n, H, W * C)
    if NB is None:
        NB = _pick_nb(n, (H + 2 * p) * (W + 2 * p) * C * 2 * 2)
    assert n % NB == 0
    part = pl.pallas_call(
        functools.partial(_flat_kernel, K=K, OH=H, OW=W, C=C),
        grid=(n // NB,),
        in_specs=[
            pl.BlockSpec((NB, H + 2 * p, (W + 2 * p) * C), lambda i: (i, 0, 0)),
            pl.BlockSpec((NB, H, W * C), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K * K, W * C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K * K, W * C), jnp.float32),
    )(xp, dyf)
    return part.reshape(K, K, W, C).sum(axis=2).reshape(K, K, 1, C)


# ---------------------------------------------------------------- pl_chan
def _chan_kernel(x_ref, dy_ref, o_ref, *, K: int, OH: int, OW: int):
    dy = dy_ref[...].astype(jnp.float32)  # (NB, OH, OW, C)
    rows = []
    for kh in range(K):
        for kw in range(K):
            xs = x_ref[:, kh:kh + OH, kw:kw + OW, :].astype(jnp.float32)
            rows.append((xs * dy).sum(axis=(0, 1, 2)))  # (C,)
    acc = jnp.stack(rows)  # (K², C)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        o_ref[...] += acc


def pl_chan_wgrad(x, dy, *, K: int, NB: int | None = None):
    n, H, W, C = x.shape
    p = K // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    if NB is None:
        # lanes pad to 128-multiples, sublanes to 8 — budget the PADDED bytes
        cp = -(-C // 128) * 128
        wp = -(-(W + 2 * p) // 8) * 8
        NB = _pick_nb(n, (H + 2 * p) * wp * cp * 2 * 2)
    assert n % NB == 0
    part = pl.pallas_call(
        functools.partial(_chan_kernel, K=K, OH=H, OW=W),
        grid=(n // NB,),
        in_specs=[
            pl.BlockSpec((NB, H + 2 * p, W + 2 * p, C),
                         lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((NB, H, W, C), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((K * K, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K * K, C), jnp.float32),
    )(xp, dy)
    return part.reshape(K, K, 1, C)


# ---------------------------------------------------------------- timing
@functools.lru_cache(maxsize=None)
def _chained(fn_name, H, C, K, s):
    fns = {
        "xla_wgrad": lambda x, dy, w: xla_wgrad(x, dy, w, s),
        "xla_dgrad": lambda x, dy, w: xla_dgrad(x, dy, w, s),
        "pl_flat": lambda x, dy, w: pl_flat_wgrad(x, dy, K=K),
        "pl_chan": lambda x, dy, w: pl_chan_wgrad(x, dy, K=K),
    }
    fn = fns[fn_name]

    @jax.jit
    def run(x, dy, w):
        def body(carry, _):
            out = fn(x, carry, w)
            scalar = jnp.sum(out.astype(jnp.float32)) * 1e-30
            return carry + scalar.astype(carry.dtype), ()

        final, _ = jax.lax.scan(body, dy, None, length=ITERS)
        return final[0, 0, 0, :8]

    return run


def timeit(fn_name, H, C, K, s):
    x, dy, w = make_inputs(H, C, K, s)
    run = _chained(fn_name, H, C, K, s)
    np.asarray(run(x, dy, w))  # compile + warm (fetch = sync on axon)
    t0 = time.perf_counter()
    np.asarray(run(x, dy, w))
    return (time.perf_counter() - t0) / ITERS * 1000.0


def check(H, C, K, s):
    x, dy, w = make_inputs(H, C, K, s, n=8, seed=1)
    ref = np.asarray(
        xla_wgrad(x.astype(jnp.float32), dy.astype(jnp.float32),
                  w.astype(jnp.float32), s)
    )
    for name, fn in (("pl_flat", pl_flat_wgrad), ("pl_chan", pl_chan_wgrad)):
        try:
            got = np.asarray(fn(x, dy, K=K))
        except Exception as e:
            print(f"  {name}: COMPILE FAIL — {type(e).__name__}: "
                  f"{str(e)[:120]}")
            continue
        err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-6)
        print(f"  {name}: rel err {err:.2e} "
              f"{'OK' if err < 2e-2 else 'MISMATCH'}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    for tag, H, C, K, s in GEOMS:
        oh = H // s
        bytes_gb = (N * H * H * C + N * oh * oh * C) * 2 / 1e9
        floor = bytes_gb / PEAK_GBS * 1e3
        print(f"=== {tag}  floor {floor:.2f} ms ===")
        if args.check and s == 1:
            check(H, C, K, s)
        for name in ("xla_wgrad", "xla_dgrad", "pl_flat", "pl_chan"):
            if s != 1 and name.startswith("pl_"):
                continue
            try:
                ms = timeit(name, H, C, K, s)
                print(f"  {name:10} {ms:8.3f} ms")
            except Exception as e:
                print(f"  {name:10} FAIL — {type(e).__name__}: "
                      f"{str(e)[:120]}")


if __name__ == "__main__":
    main()
