"""Stretch probe (VERDICT r4 #8): can the token-embed slice get cheaper?

The forward's per-op table charges 2.7 ms/batch-32 to "uint8→bf16 input
convert + embeds/reshapes" (README). The named candidate — folding the
embedding ADD into the qkv matmul's epilogue — cannot compose through the
LayerNorm that sits between embed and qkv (LN(x+e) is not LN(x)+f(e)), so
the testable version is one level down: does pre-combining the three adds
after ``to_patch_embedding`` (bias + positional gather + size gather →
one fused add) beat the current three-add chain, or does XLA already fuse
the chain to the same thing?

Method: the embed slice isolated at flagship shapes (B=32, F=16, n=49,
C=1280, D=512, bf16), two jitted variants, median-of-20 wall (fetch-sync)
+ the compiled module's fusion count.

MEASURED 2026-08-20 (v5e over the remote tunnel):

  current (matmul + bias + pos-add + size-add)  median 25.67 ms  85 fusions
  folded  (matmul + ONE precombined add)        median 25.51 ms  85 fusions
  max |current - folded| over all outputs: 0.0 (bit-identical)

The wall medians are round-trip-dominated on this rig (~25 ms/call), so
the sharper evidence is structural: the compiled modules have the SAME
fusion count and produce BIT-identICAL bf16 outputs — XLA reassociates
and fuses the three-add chain into the matmul consumer exactly as it does
the precombined form, so there is no unfused elementwise pass to save.
The 2.7 ms forward-table slice is the uint8→bf16 conversion + gather
bandwidth itself, not missing fusion. RECORDED NO — the forward table's
attribution stands as written (README.md per-op table).

Run on the real TPU:  python experiments/embed_fusion.py
"""
from __future__ import annotations

import os
import statistics
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache")
)


def main():
    import jax
    import jax.numpy as jnp

    B, F, n, C, D = 32, 16, 49, 1280, 512
    rng = np.random.default_rng(0)
    feats = jax.device_put(
        rng.integers(0, 255, (B, F, n, C), dtype=np.uint8)
    )
    Wd = jax.device_put(rng.standard_normal((C, D)).astype(np.float32) * 0.02)
    bias = jax.device_put(np.zeros((D,), np.float32))
    pos_tab = jax.device_put(
        rng.standard_normal((1 + F * n, D)).astype(np.float32) * 0.02
    )
    size_tab = jax.device_put(
        rng.standard_normal((9, D)).astype(np.float32) * 0.02
    )
    positions = jax.device_put(
        np.tile(np.arange(1 + F * n, dtype=np.int32), (B, 1))
    )
    size_ids = jax.device_put(
        rng.integers(0, 9, (B, F), dtype=np.int32)
    )

    @jax.jit
    def current(feats, Wd, bias, pos_tab, size_tab, positions, size_ids):
        x = feats.astype(jnp.bfloat16) @ Wd.astype(jnp.bfloat16)
        x = x + bias.astype(jnp.bfloat16)
        x = x + pos_tab.astype(jnp.bfloat16)[positions[:, 1:]].reshape(
            B, F, n, D
        )
        x = x + size_tab.astype(jnp.bfloat16)[size_ids][:, :, None, :]
        return x

    @jax.jit
    def folded(feats, Wd, bias, pos_tab, size_tab, positions, size_ids):
        extra = (
            bias.astype(jnp.bfloat16)
            + pos_tab.astype(jnp.bfloat16)[positions[:, 1:]].reshape(
                B, F, n, D
            )
            + size_tab.astype(jnp.bfloat16)[size_ids][:, :, None, :]
        )
        return feats.astype(jnp.bfloat16) @ Wd.astype(jnp.bfloat16) + extra

    args = (feats, Wd, bias, pos_tab, size_tab, positions, size_ids)
    for name, fn in (("current", current), ("folded", folded)):
        out = fn(*args)
        np.asarray(out[0, 0, 0, 0])  # warm + fetch-sync
        times = []
        for _ in range(20):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out[0, 0, 0, 0])
            times.append((time.perf_counter() - t0) * 1000.0)
        hlo = fn.lower(*args).compile().as_text()
        print(
            f"{name:8s} median {statistics.median(times):.2f} ms  "
            f"spread [{min(times):.2f}, {max(times):.2f}]  "
            f"fusions {hlo.count('fusion(') + hlo.count('fusion.')}"
        )
    # numerical identity check (same adds, reassociated — bf16 tolerance)
    a = np.asarray(current(*args), np.float32)
    b = np.asarray(folded(*args), np.float32)
    print("max |delta|:", float(np.abs(a - b).max()))


if __name__ == "__main__":
    main()
