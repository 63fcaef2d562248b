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
  pl_roll     Pallas wgrad, chan layout, NO window slices at all: dy is
              zero-padded to x's padded shape and each (kh,kw) tap is a
              circular pltpu.roll on the H (outer) / W (sublane) axes —
              wraparound lands on the zero borders, so it's exact.
  xla_shift   pure-XLA control: K² static slices of x_pad × dy, fused
              multiply-reduce — no Mosaic involved, tests whether XLA
              fuses the shifted reductions into one streaming pass.

Timing: on-device lax.scan chain (output feeds next input), one fetch at
the end — a host-side loop measures the axon tunnel's ~15 ms dispatch
latency, not the kernel.  The constant carry-update overhead (one extra
dy read+write) is identical across variants, so deltas are real; the
printed `floor` column is (x+dy bytes)/819 GB/s for calibration.

Run on TPU:  python experiments/dw_conv_bwd_pallas_vs_xla.py [--check]

SETTLED (measured on v5e, 2026-08-19) — XLA's conv lowering keeps the
weight grad; every alternative either fails Mosaic compile, miscompiles,
or loses:

  geometry          floor   xla_wgrad   xla_shift   pl_roll      pl_flat/pl_chan
  b0  112² C32  K3   1.00      3.411      14.423    Mosaic-500   Mosaic-500
  b2  56²  C144 K3   1.13      4.096      16.238    Mosaic-500*  Mosaic-500
  b4  28²  C240 K5   0.47      2.657      16.536    Mosaic-500   Mosaic-500
  b6  14²  C480 K3   0.24      1.110       3.832    2.163*       Mosaic-500
  b8  14²  C672 K5   0.33      2.394      11.505    Mosaic-500   Mosaic-500
  b12 7²   C1152 K5  0.14      1.225       5.259    4.109*       chan compiles, loses
  b15 7²   C1152 K3  0.14      1.361       2.632    Mosaic-500   Mosaic-500

  (ms per bench batch of 512 images; Mosaic-500 = tpu_compile_helper
  subprocess crash, an internal compiler failure with no diagnostics;
  * = where pl_roll DID compile its output is WRONG, rel err ≈ 1.3-1.5 —
  pltpu.roll on non-lane axes is not a trustworthy circular roll on this
  toolchain, so even its rare compiling geometries are unusable.)

Conclusion: the wgrad's ~3.5 ms streaming floor (vs XLA's ~16.3 ms total)
is real but unreachable here — three Pallas layouts (slice-window flat,
slice-window chan, roll-only chan) all die in Mosaic, and the pure-XLA
shifted-reduction control shows XLA will NOT fuse K² shifted reductions
into one pass (2-7× slower than its conv lowering). The train path keeps
jax.vjp of the XLA conv; this file is the reproduction for that decision,
same standard as experiments/dw_conv_pallas_vs_xla.py (forward) and
experiments/attn_kernel_variants.py.
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


# ---------------------------------------------------------------- pl_roll
def _roll_kernel(x_ref, dy_ref, o_ref, *, K: int):
    from jax.experimental.pallas import tpu as pltpu

    p = K // 2
    xp = x_ref[...].astype(jnp.float32)    # (NB, Hp, Wp, C)
    dyp = dy_ref[...].astype(jnp.float32)  # (NB, Hp, Wp, C) zero-padded
    Hp, Wp = xp.shape[1], xp.shape[2]
    rows = []
    for kh in range(K):
        sh = (p - kh) % Hp
        a = pltpu.roll(dyp, sh, axis=1) if sh else dyp
        for kw in range(K):
            sw = (p - kw) % Wp
            b = pltpu.roll(a, sw, axis=2) if sw else a
            rows.append((xp * b).sum(axis=(0, 1, 2)))
    acc = jnp.stack(rows)  # (K², C)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        o_ref[...] = acc

    @pl.when(pl.program_id(0) > 0)
    def _acc():
        o_ref[...] += acc


def pl_roll_wgrad(x, dy, *, K: int, NB: int | None = None):
    n, H, W, C = x.shape
    p = K // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)))
    dyp = jnp.pad(dy, ((0, 0), (p, p), (p, p), (0, 0)))
    if NB is None:
        cp = -(-C // 128) * 128
        wp = -(-(W + 2 * p) // 8) * 8
        NB = _pick_nb(n, (H + 2 * p) * wp * cp * 2 * 2 * 2)  # 2 padded ins
    part = pl.pallas_call(
        functools.partial(_roll_kernel, K=K),
        grid=(n // NB,),
        in_specs=[pl.BlockSpec((NB, H + 2 * p, W + 2 * p, C),
                               lambda i: (i, 0, 0, 0))] * 2,
        out_specs=pl.BlockSpec((K * K, C), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((K * K, C), jnp.float32),
    )(xp, dyp)
    return part.reshape(K, K, 1, C)


# -------------------------------------------------------------- xla_shift
def xla_shift_wgrad(x, dy, *, K: int):
    """Pure-XLA control: K² shifted fused multiply-reduces (no Mosaic)."""
    n, H, W, C = x.shape
    p = K // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0))).astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    rows = []
    for kh in range(K):
        for kw in range(K):
            xs = jax.lax.slice(xp, (0, kh, kw, 0), (n, kh + H, kw + W, C))
            rows.append(jnp.sum(xs * dyf, axis=(0, 1, 2)))
    return jnp.stack(rows).reshape(K, K, 1, C)


# ---------------------------------------------------------------- timing
@functools.lru_cache(maxsize=None)
def _chained(fn_name, H, C, K, s):
    fns = {
        "xla_wgrad": lambda x, dy, w: xla_wgrad(x, dy, w, s),
        "xla_dgrad": lambda x, dy, w: xla_dgrad(x, dy, w, s),
        "pl_flat": lambda x, dy, w: pl_flat_wgrad(x, dy, K=K),
        "pl_chan": lambda x, dy, w: pl_chan_wgrad(x, dy, K=K),
        "pl_roll": lambda x, dy, w: pl_roll_wgrad(x, dy, K=K),
        "xla_shift": lambda x, dy, w: xla_shift_wgrad(x, dy, K=K),
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
    for name, fn in (("pl_flat", pl_flat_wgrad), ("pl_chan", pl_chan_wgrad),
                     ("pl_roll", pl_roll_wgrad),
                     ("xla_shift", lambda x, dy, K: xla_shift_wgrad(x, dy, K=K))):
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
        for name in ("xla_wgrad", "xla_dgrad", "pl_flat", "pl_chan",
                     "pl_roll", "xla_shift"):
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
