"""Where do the e2e predict tail stages (forward, embed_cluster) spend time?

bench.py's e2e table charges ~115-164 ms/video to "forward" and ~99-185
ms/video to "embed_cluster" — both orders of magnitude above the
underlying device compute (the flagship forward runs ~615 videos/s at
batch 32; IRV1 at batch 32 is single-digit ms). This splits each stage
into host prep / upload / device call / output fetch so the next
optimization targets the real line, not the aggregate.

MEASURED 2026-08-20 (v5e over the remote tunnel; sync = output fetch,
since block_until_ready is fire-and-forget on this rig):

  forward, batch 3:
    call with DEVICE-resident args     33-36 ms   (≈ one tunnel round-trip;
                                                   device compute is ~1.6
                                                   ms/video at batch 32)
    call with numpy args              687-691 ms  (the 7.2 MB uint8 frames
                                                   + 4 small arrays cross
                                                   as 5 serialized
                                                   transfers at the day's
                                                   ~10-25 MB/s link)
    output fetch (logits+attn rows)    0.01-0.03 ms (already CLS-row
                                                   slices — nothing to
                                                   shave there)
    require_attention adds ~0 on top of the round-trip (32.8 vs 36.0 ms).

  embed_cluster, 20 crops:
    host PIL resize ×20                ~6 ms
    upload 32×128×128×3 uint8          ~55-73 ms  (1.5 MB, link-bound)
    jitted IRV1 call (staged)          ~28 ms     (≈ one round-trip)
    embedding fetch (32×512 f32)       ~0.01 ms

VERDICT: both tail stages are TUNNEL-bound — argument upload plus one
round-trip of latency each; device compute and output fetches are
single-digit ms or less. On a directly-attached host (PCIe ~10 GB/s,
~µs dispatch) the same stages cost single-digit ms. The two shave
candidates named in r4 (CLS-row-only attention fetch, donated assemble
buffers) are respectively already the case (the model emits only
(B·H, 1, 1+F·n) CLS rows — fetch measures 0.03 ms) and immaterial next
to the frames upload itself.

Run on the real TPU:  python experiments/e2e_tail_profile.py
"""

from __future__ import annotations

import time

import numpy as np


def timed(label, fn, reps=5):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    dt = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{label:44s} {dt:8.2f} ms")
    return out, dt


def main():
    import jax
    import jax.numpy as jnp

    from mintime_tpu.config import ModelConfig
    from mintime_tpu.models.classifier import MintimeVideoClassifier
    from __graft_entry__ import _example_batch

    cfg = ModelConfig()
    n = 3  # the e2e bench's batch
    ex = _example_batch(n, cfg)
    args = tuple(
        ex[k]
        for k in ("frames", "mask", "identities_mask", "size_embedding", "positions")
    )

    print("== forward stage (batch 3, e2e bench config) ==")
    for require_attention in (False, True):
        model = MintimeVideoClassifier(
            cfg, backbone="efficientnet-b0", head="timesformer",
            require_attention=require_attention, dtype=jnp.bfloat16,
            use_pallas=True,
        )
        variables = jax.device_put(jax.jit(model.init)(jax.random.key(0), *args))
        fwd = jax.jit(model.apply)
        dargs = jax.device_put(args)

        # sync by fetching the logits: on the axon tunnel block_until_ready
        # is fire-and-forget — only an output fetch actually waits (same
        # convention as bench._sync), so "call" rows here are call+sync
        def call_only():
            out = fwd(variables, *dargs)
            np.asarray(out[0] if isinstance(out, tuple) else out)
            return out

        out, t_call = timed(f"attn={require_attention}: call (device args)", call_only)

        def call_np_args():
            out = fwd(variables, *args)
            np.asarray(out[0] if isinstance(out, tuple) else out)
            return out

        timed(f"attn={require_attention}: call (numpy args)", call_np_args)

        def fetch():
            return jax.tree.map(np.asarray, out)

        timed(f"attn={require_attention}: full output fetch", fetch)

    print("\n== embed_cluster stage (20 crops, e2e bench scenario) ==")
    from mintime_tpu.preprocessing.cluster_faces import FaceEmbedder

    emb = FaceEmbedder(FaceEmbedder.init_variables())
    rng = np.random.default_rng(0)
    crops = [rng.integers(0, 255, (140, 140, 3), np.uint8) for _ in range(20)]
    emb(crops)  # warm the padded-batch program

    timed("embedder __call__ total", lambda: emb(crops))

    from PIL import Image

    def resize_only():
        return np.stack(
            [
                np.asarray(Image.fromarray(c).resize((128, 128), Image.BILINEAR))
                for c in crops
            ]
        )

    resized, _ = timed("  host PIL resize x20", resize_only)
    padded = np.concatenate([resized, np.zeros((12, 128, 128, 3), np.uint8)])

    def upload():
        x = jax.device_put(padded)
        np.asarray(x[0, 0, 0])  # fetch-sync (see note above)
        return x

    x, _ = timed("  upload 32x128x128x3 uint8", upload)

    def device_call():
        out = emb._fn(emb.variables, x)
        np.asarray(out[0, 0])  # fetch-sync
        return out

    out, _ = timed("  jitted IRV1 call (staged input)", device_call)
    timed("  embedding fetch (32x512 f32)", lambda: np.asarray(out))

    from mintime_tpu.predict import cluster_crops

    rows = [(i // 2, i % 2, crops[i]) for i in range(len(crops))]
    timed("cluster_crops total (embed+union-find)", lambda: cluster_crops(rows, emb))


if __name__ == "__main__":
    main()
