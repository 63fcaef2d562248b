"""Scratch experiment: Pallas fused depthwise-conv(+bias+SiLU) vs XLA.

Measures the stride-1 depthwise layers of EfficientNet-B0 at the bench
geometry (batch 32 videos x 16 faces = 512 images) head-to-head:
  a) XLA grouped conv + scale/bias + silu (what the model runs today)
  b) Pallas kernel over a flattened (W*C) lane axis: K*K shifted vector
     FMAs in VMEM (dh = sublane shift, dw = lane shift by C), weights
     pre-tiled along W, bias+SiLU fused into the epilogue. The flattened
     lane axis keeps full (8,128) lane utilization at ANY channel count
     (C=32 or 144 would waste 4x / 1.8x lanes in a channels-in-lanes
     layout).
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def dw_kernel(x_ref, w_ref, b_ref, o_ref, *, K: int, H: int, C: int):
    NB = o_ref.shape[0]
    WC = o_ref.shape[2]
    acc = jnp.zeros((NB, H, WC), jnp.float32)
    for dh in range(K):
        for dw in range(K):
            acc += x_ref[:, dh : dh + H, dw * C : dw * C + WC].astype(
                jnp.float32
            ) * w_ref[dh, dw, :]
    y = acc + b_ref[0]
    y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


def pallas_dwconv(x, w, b, *, K: int, NB: int = 1):
    """x: (N,H,W,C) bf16; w: (K,K,C) fp32 (scale-folded); b: (C,). s1, SAME."""
    N, H, W, C = x.shape
    pad = K // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    xp = xp.reshape(N, H + 2 * pad, (W + 2 * pad) * C)
    wt = jnp.tile(w.astype(jnp.float32), (1, 1, W))  # (K, K, W*C)
    bt = jnp.tile(b.astype(jnp.float32), W).reshape(1, W * C)
    assert N % NB == 0
    grid = (N // NB,)
    out = pl.pallas_call(
        functools.partial(dw_kernel, K=K, H=H, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((NB, H + K - 1, (W + K - 1) * C), lambda n: (n, 0, 0)),
            pl.BlockSpec((K, K, W * C), lambda n: (0, 0, 0)),
            pl.BlockSpec((1, W * C), lambda n: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NB, H, W * C), lambda n: (n, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, W * C), x.dtype),
    )(xp, wt, bt)
    return out.reshape(N, H, W, C)


def xla_dwconv(x, w, b, *, K: int):
    y = jax.lax.conv_general_dilated(
        x,
        w.reshape(K, K, 1, -1).astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=x.shape[-1],
        preferred_element_type=jnp.float32,
    )
    y = y + b
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


GEOMS = [  # (H, W, C, K, count_in_b0, images_per_block)
    (112, 112, 32, 3, 1, 1),
    (56, 56, 144, 3, 1, 1),
    (28, 28, 240, 5, 1, 1),
    (14, 14, 480, 3, 2, 4),
    (14, 14, 480, 5, 1, 4),
    (14, 14, 672, 5, 2, 4),
    (7, 7, 1152, 5, 3, 8),
    (7, 7, 1152, 3, 1, 8),
]


def timeit(f, *args, iters=20):
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    N = 512
    key = jax.random.PRNGKey(0)
    print(f"devices: {jax.devices()}")
    total_xla = total_pl = 0.0
    for H, W, C, K, cnt, NB in GEOMS:
        kx, kw, kb = jax.random.split(key, 3)
        x = jax.random.normal(kx, (N, H, W, C), jnp.bfloat16)
        w = jax.random.normal(kw, (K, K, C), jnp.float32) * 0.1
        b = jax.random.normal(kb, (C,), jnp.float32) * 0.1
        f_xla = jax.jit(functools.partial(xla_dwconv, K=K))
        f_pl = jax.jit(functools.partial(pallas_dwconv, K=K, NB=NB))
        try:
            ya = np.asarray(f_xla(x, w, b), np.float32)
            yb = np.asarray(f_pl(x, w, b), np.float32)
            err = np.max(np.abs(ya - yb))
            t_xla = timeit(f_xla, x, w, b)
            t_pl = timeit(f_pl, x, w, b)
        except Exception as e:
            print(f"{H:4d}x{W:<4d} C={C:<5d} K={K}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        total_xla += t_xla * cnt
        total_pl += t_pl * cnt
        print(
            f"{H:4d}x{W:<4d} C={C:<5d} K={K} x{cnt}: xla {t_xla:7.3f} ms  "
            f"pallas {t_pl:7.3f} ms  ({t_xla/t_pl:4.2f}x)  maxerr {err:.4f}"
        )
    print(f"TOTAL (stride-1 layers): xla {total_xla:.2f} ms  pallas {total_pl:.2f} ms")


if __name__ == "__main__":
    main()
