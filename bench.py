"""End-to-end throughput benchmark: flagship MINTIME forward on one chip.

Measures videos/sec for the full per-video inference compute — EfficientNet-B0
over all F=16 face crops (224x224) + Size-Invariant TimeSformer (dim 512,
depth 9, identity masking, size+pos embeddings) — as ONE jitted bf16 XLA
program, the deployment-shaped hot path.

The reference publishes no throughput numbers (BASELINE.md §Throughput);
``vs_baseline`` is reported against a documented proxy of 20 videos/sec for
the reference's two-stage GPU pipeline (bs 8, ~128 backbone images/step plus
a host round-trip between extractor and transformer, train.py:344-368).
"""

from __future__ import annotations

import json
import time

import numpy as np

REFERENCE_PROXY_VIDEOS_PER_SEC = 20.0


def main():
    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                       ".jax_cache"))
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mintime_tpu.config import load_config
    from mintime_tpu.models.classifier import MintimeVideoClassifier
    from __graft_entry__ import _example_batch

    cfg = load_config("configs/size_invariant_timesformer.yaml").model
    cfg = type(cfg)(**{**cfg.__dict__, "channels": 1280})
    model = MintimeVideoClassifier(
        cfg, backbone="efficientnet-b0", head="timesformer",
        dtype=jnp.bfloat16, use_pallas=True,
    )

    batch_size = 32
    batch = _example_batch(batch_size, cfg)
    # device-resident inputs: the deployment shape keeps data on-chip; host
    # transfer rides the async dispatch queue and is benchmarked separately.
    args = tuple(
        jax.device_put(batch[k])
        for k in ("frames", "mask", "identities_mask", "size_embedding", "positions")
    )
    variables = jax.device_put(jax.jit(model.init)(jax.random.key(0), *args))

    fwd = jax.jit(lambda v, *a: model.apply(v, *a))
    # warmup / compile; NB on the axon tunnel block_until_ready does not
    # actually block, so every sync point must fetch output bytes.
    np.asarray(fwd(variables, *args))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, *args)
    np.asarray(out)  # device executes launches in order: last done => all done
    dt = time.perf_counter() - t0

    videos_per_sec = batch_size * iters / dt
    print(
        json.dumps(
            {
                "metric": "end_to_end_videos_per_sec_per_chip",
                "value": round(videos_per_sec, 2),
                "unit": "videos/s",
                "vs_baseline": round(videos_per_sec / REFERENCE_PROXY_VIDEOS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
