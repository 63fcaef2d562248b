"""Offline feature extraction: pre-compute backbone feature maps per crop.

Parity with the reference's optional path (``preprocessing/extract_features.py:17-74``
+ ``faces_dataset.py:9-29``): every face PNG is resized to 224 and pushed
through the (frozen) EfficientNet-B0; features are saved one file per crop.
The reference ``torch.save``s tensors; we write ``.npy`` (and the data layer
accepts either layout via ``backbone='none'``). Same caveat as the
reference notes (extract_features.py:3): features are much larger than the
crops — prefer the fused on-the-fly path.

Unlike the reference's per-image loop this sweeps jitted fixed-size batches.
NOTE the reference applies ImageNet normalization here (faces_dataset.py:19-21)
while the training path feeds raw 0..255 — we default to raw for
consistency with training; pass ``--imagenet_norm`` for the reference's
offline behavior.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def extract_features(
    image_paths: Sequence[str],
    variables,
    output_root: str,
    input_root: str,
    image_size: int = 224,
    batch_size: int = 64,
    imagenet_norm: bool = False,
):
    import cv2
    import jax
    import jax.numpy as jnp

    from mintime_tpu.models.efficientnet import EfficientNet

    model = EfficientNet("efficientnet-b0", dtype=jnp.bfloat16)
    fwd = jax.jit(lambda v, x: model.apply(v, x).astype(jnp.float32))

    n_written = 0
    for start in range(0, len(image_paths), batch_size):
        chunk = image_paths[start : start + batch_size]
        imgs = []
        for p in chunk:
            img = cv2.imread(p)
            if img is None:
                img = np.zeros((image_size, image_size, 3), np.uint8)
            img = cv2.resize(img, (image_size, image_size))
            imgs.append(img)
        x = np.stack(imgs).astype(np.float32)
        if imagenet_norm:
            x = (x / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        pad = batch_size - len(chunk)
        if pad:
            x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], np.float32)])
        feats = np.asarray(fwd(variables, x))[: len(chunk)]
        for p, f in zip(chunk, feats):
            rel = os.path.relpath(p, input_root)
            out = os.path.join(output_root, os.path.splitext(rel)[0] + ".npy")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            np.save(out, f)
            n_written += 1
    return n_written


def main(argv=None):
    import argparse
    import glob

    p = argparse.ArgumentParser("mintime-tpu extract_features")
    p.add_argument("--faces_path", required=True)
    p.add_argument("--output_path", required=True)
    p.add_argument("--extractor_weights", default=None)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--imagenet_norm", action="store_true")
    opt = p.parse_args(argv)

    if opt.extractor_weights:
        import torch

        from mintime_tpu.utils.torch_convert import efficientnet_params_from_torch

        variables = efficientnet_params_from_torch(
            torch.load(opt.extractor_weights, map_location="cpu")
        )
    else:
        import jax
        import jax.numpy as jnp

        from mintime_tpu.models.efficientnet import EfficientNet

        print("WARNING: no --extractor_weights; random features (structural run)")
        variables = jax.jit(EfficientNet("efficientnet-b0").init)(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3))
        )

    paths = sorted(glob.glob(os.path.join(opt.faces_path, "**", "*.png"), recursive=True))
    n = extract_features(
        paths, variables, opt.output_path, opt.faces_path,
        batch_size=opt.batch_size, imagenet_norm=opt.imagenet_norm,
    )
    print(f"wrote {n} feature files")


if __name__ == "__main__":
    main()
