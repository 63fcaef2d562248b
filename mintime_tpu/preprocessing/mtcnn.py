"""MTCNN face-detection cascade (P-Net / R-Net / O-Net) in Flax.

TPU-native replacement for the reference's ``facenet_pytorch.MTCNN`` wrapper
(``preprocessing/face_detector.py:42-52``, thresholds [.85, .95, .95],
margin 0): the three convnets are jitted JAX programs batched over frames
and candidate boxes; the image pyramid, NMS, and box bookkeeping run on the
host (tiny N per frame). Candidate counts are padded to power-of-two
buckets so every R-Net/O-Net call hits a cached XLA executable.

Weight layout matches facenet-pytorch's ``PNet/RNet/ONet`` state_dicts
(``pnet.pt`` etc.); load with :func:`mtcnn_params_from_torch`. Face crops
are normalized ``(x - 127.5) * 0.0078125`` exactly like the reference stack.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class PReLU(nn.Module):
    """Channelwise PReLU (torch nn.PReLU(num_parameters=C))."""

    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.constant(0.25), (self.channels,))
        return jnp.where(x >= 0, x, alpha * x)


def _pool_ceil(x, window, stride):
    """MaxPool with ceil_mode=True semantics (torch MTCNN uses ceil)."""
    h, w = x.shape[1:3]
    ph = max(0, (-(h - window) % stride)) if h > window else max(0, window - h)
    pw = max(0, (-(w - window) % stride)) if w > window else max(0, window - w)
    return nn.max_pool(
        x,
        (window, window),
        strides=(stride, stride),
        padding=((0, ph), (0, pw)),
    )


class PNet(nn.Module):
    """Proposal net: fully-convolutional 12x12 cell scorer."""

    @nn.compact
    def __call__(self, x):  # (N, H, W, 3)
        x = nn.Conv(10, (3, 3), padding="VALID", name="conv1")(x)
        x = PReLU(10, name="prelu1")(x)
        x = _pool_ceil(x, 2, 2)
        x = nn.Conv(16, (3, 3), padding="VALID", name="conv2")(x)
        x = PReLU(16, name="prelu2")(x)
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv3")(x)
        x = PReLU(32, name="prelu3")(x)
        prob = jax.nn.softmax(nn.Conv(2, (1, 1), name="conv4_1")(x), axis=-1)
        reg = nn.Conv(4, (1, 1), name="conv4_2")(x)
        return prob, reg


class RNet(nn.Module):
    """Refine net over 24x24 crops."""

    @nn.compact
    def __call__(self, x):  # (N, 24, 24, 3)
        x = nn.Conv(28, (3, 3), padding="VALID", name="conv1")(x)
        x = PReLU(28, name="prelu1")(x)
        x = _pool_ceil(x, 3, 2)
        x = nn.Conv(48, (3, 3), padding="VALID", name="conv2")(x)
        x = PReLU(48, name="prelu2")(x)
        x = _pool_ceil(x, 3, 2)
        x = nn.Conv(64, (2, 2), padding="VALID", name="conv3")(x)
        x = PReLU(64, name="prelu3")(x)
        # facenet-pytorch flattens permute(0,3,2,1) of NCHW = (N, W, H, C)
        x = x.transpose(0, 2, 1, 3).reshape(x.shape[0], -1)
        x = nn.Dense(128, name="dense4")(x)
        x = PReLU(128, name="prelu4")(x)
        prob = jax.nn.softmax(nn.Dense(2, name="dense5_1")(x), axis=-1)
        reg = nn.Dense(4, name="dense5_2")(x)
        return prob, reg


class ONet(nn.Module):
    """Output net over 48x48 crops; also predicts 5 landmarks."""

    @nn.compact
    def __call__(self, x):  # (N, 48, 48, 3)
        x = nn.Conv(32, (3, 3), padding="VALID", name="conv1")(x)
        x = PReLU(32, name="prelu1")(x)
        x = _pool_ceil(x, 3, 2)
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv2")(x)
        x = PReLU(64, name="prelu2")(x)
        x = _pool_ceil(x, 3, 2)
        # conv3 is 3x3 (NOT 2x2): 48→46→23→21→10→8→4→conv4(2)→3, flatten
        # 3·3·128 = 1152 = facenet-pytorch's dense5 fan-in. The oracle test
        # (tests/test_mtcnn_oracle.py) loads real-layout state dicts and
        # would reject any deviation here.
        x = nn.Conv(64, (3, 3), padding="VALID", name="conv3")(x)
        x = PReLU(64, name="prelu3")(x)
        x = _pool_ceil(x, 2, 2)
        x = nn.Conv(128, (2, 2), padding="VALID", name="conv4")(x)
        x = PReLU(128, name="prelu4")(x)
        # facenet-pytorch flatten order (N, W, H, C)
        x = x.transpose(0, 2, 1, 3).reshape(x.shape[0], -1)
        x = nn.Dense(256, name="dense5")(x)
        x = PReLU(256, name="prelu5")(x)
        prob = jax.nn.softmax(nn.Dense(2, name="dense6_1")(x), axis=-1)
        reg = nn.Dense(4, name="dense6_2")(x)
        landmarks = nn.Dense(10, name="dense6_3")(x)
        return prob, reg, landmarks


# --------------------------------------------------------------- host helpers
def nms_tv(boxes: np.ndarray, scores: np.ndarray, threshold: float) -> np.ndarray:
    """torchvision.ops.nms semantics — what facenet-pytorch's ``batched_nms``
    uses for the stage-1 (0.5 per scale, 0.7 across scales) and stage-2
    (0.7) passes: areas WITHOUT the MATLAB +1, suppress IoU > threshold,
    stable descending-score order.

    The suppression recurrence runs in C when the native tier is built
    (mintime_tpu/native/nms.c — bit-equal keep sets, ~30× less per-call
    overhead than this numpy loop, which remains as fallback + oracle);
    the argsort stays here because its tie semantics are the contract."""
    if len(boxes) == 0:
        return np.zeros(0, dtype=int)
    order = np.argsort(-scores, kind="stable")
    if boxes.dtype in (np.float32, np.float64):
        from mintime_tpu.native import greedy_nms

        keep = greedy_nms(boxes, order, threshold,
                          method_min=False, plus_one=False)
        if keep is not None:
            return keep
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        rest = order[1:]
        w = np.maximum(0.0, np.minimum(x2[i], x2[rest]) - np.maximum(x1[i], x1[rest]))
        h = np.maximum(0.0, np.minimum(y2[i], y2[rest]) - np.maximum(y1[i], y1[rest]))
        inter = w * h
        with np.errstate(invalid="ignore", divide="ignore"):
            o = inter / (area[i] + area[rest] - inter)
        o = np.where(np.isnan(o), np.inf, o)  # degenerate boxes: suppress
        order = rest[o <= threshold]
    return np.asarray(keep, dtype=int)


def nms(boxes: np.ndarray, scores: np.ndarray, threshold: float, method: str = "union"):
    """Greedy NMS with MATLAB +1 areas — facenet-pytorch's ``nms_numpy``,
    used by its stage-3 pass with ``method='min'``. Native suppression loop
    when built (see ``nms_tv``); argsort (UNstable, reversed — the
    reference's exact tie behavior) stays host-side."""
    if len(boxes) == 0:
        return np.zeros(0, dtype=int)
    order = scores.argsort()[::-1]
    if boxes.dtype in (np.float32, np.float64):
        from mintime_tpu.native import greedy_nms

        keep = greedy_nms(boxes, order, threshold,
                          method_min=method == "min", plus_one=True)
        if keep is not None:
            return keep
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    keep = []
    while order.size > 0:
        i = order[0]
        keep.append(i)
        xx1 = np.maximum(x1[i], x1[order[1:]])
        yy1 = np.maximum(y1[i], y1[order[1:]])
        xx2 = np.minimum(x2[i], x2[order[1:]])
        yy2 = np.minimum(y2[i], y2[order[1:]])
        w = np.maximum(0.0, xx2 - xx1 + 1)
        h = np.maximum(0.0, yy2 - yy1 + 1)
        inter = w * h
        # Degenerate boxes (inf/NaN coords from wild regression offsets on
        # garbage inputs) make the division 0/0. facenet-pytorch silently
        # keeps NaN comparisons False, which *drops* the box; make that
        # explicit: NaN overlap → +inf → suppressed.
        with np.errstate(invalid="ignore", divide="ignore"):
            if method == "min":
                o = inter / np.minimum(area[i], area[order[1:]])
            else:
                o = inter / (area[i] + area[order[1:]] - inter)
        o = np.where(np.isnan(o), np.inf, o)
        order = order[1:][o <= threshold]
    return np.asarray(keep, dtype=int)


def rerec(boxes: np.ndarray) -> np.ndarray:
    """Convert boxes to squares around their centers."""
    out = boxes.copy()
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    side = np.maximum(w, h)
    out[:, 0] = boxes[:, 0] + w * 0.5 - side * 0.5
    out[:, 1] = boxes[:, 1] + h * 0.5 - side * 0.5
    out[:, 2] = out[:, 0] + side
    out[:, 3] = out[:, 1] + side
    return out


def apply_regression(boxes: np.ndarray, reg: np.ndarray) -> np.ndarray:
    """facenet-pytorch ``bbreg`` (stages 2-3): +1 width/height convention."""
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    out = boxes.copy()
    out[:, 0] += reg[:, 0] * w
    out[:, 1] += reg[:, 1] * h
    out[:, 2] += reg[:, 2] * w
    out[:, 3] += reg[:, 3] * h
    return out


def apply_regression_stage1(boxes: np.ndarray, reg: np.ndarray) -> np.ndarray:
    """Stage-1 regression after the cross-scale NMS: facenet-pytorch's
    ``detect_face`` inlines it WITHOUT the +1 (``regw = x2 - x1``)."""
    w = boxes[:, 2] - boxes[:, 0]
    h = boxes[:, 3] - boxes[:, 1]
    out = boxes.copy()
    out[:, 0] += reg[:, 0] * w
    out[:, 1] += reg[:, 1] * h
    out[:, 2] += reg[:, 2] * w
    out[:, 3] += reg[:, 3] * h
    return out


def _area_resize_hw(img: np.ndarray, size: int) -> np.ndarray:
    """(h, w, c) → (size, size, c) with torch ``interpolate(mode='area')``
    semantics — facenet-pytorch's ``imresample`` for the R/O-Net crops.

    BLAS ``tensordot`` rather than ``np.einsum`` (measured 29 µs vs 251 µs
    per 50×50→24 crop — einsum's C loop was 85% of the per-candidate cost,
    ~9 s/video at spread-logit candidate load), and the area matrices come
    from the memoized :func:`_area_matrix` (≤360 distinct sizes per clip).
    The BLAS reduction order differs from einsum's in the last ulp; every
    consumer compares at ≥1e-5 tolerance (tests/test_mtcnn_oracle.py)."""
    h, w = img.shape[:2]
    out = np.tensordot(_area_matrix(h, size), img, axes=(1, 0))  # (size, w, c)
    return np.tensordot(
        _area_matrix(w, size), out, axes=(1, 1)
    ).transpose(1, 0, 2)  # (size, size, c)


def _crop_resize(
    img: np.ndarray, boxes: np.ndarray, size: int, scale: int = 1
) -> tuple:
    """facenet-pytorch crop semantics (``pad`` + slice + ``imresample``):
    boxes are truncated to int, clipped to the 1-based image extent, the
    CLIPPED region (no zero padding) is area-resized to (size, size).
    Returns (crops, valid) — a box whose clipped region is empty is marked
    invalid and must be dropped by the caller (the reference upstream would
    misalign its batch here, a known facenet-pytorch edge; dropping is the
    sane equivalent since such a box detects nothing).

    ``scale > 1``: boxes are in downscaled coordinates while ``img`` is the
    full-resolution frame (``MTCNNDetector.input_scale``) — the sliced
    region is exactly the ×scale image of the downscaled-region slice, so
    the area resize composes the 2× shrink and the crop resample in one
    pass."""
    H = img.shape[0] // scale
    W = img.shape[1] // scale
    n = len(boxes)
    out = np.zeros((n, size, size, 3), np.float32)
    valid = np.ones(n, dtype=bool)
    ib = np.trunc(boxes[:, :4]).astype(int)
    for i, (x, y, ex, ey) in enumerate(ib):
        x, y = max(x, 1), max(y, 1)
        ex, ey = min(ex, W), min(ey, H)
        if not (ey > y - 1 and ex > x - 1):
            valid[i] = False
            continue
        region = img[(y - 1) * scale : ey * scale, (x - 1) * scale : ex * scale]
        out[i] = _area_resize_hw(region.astype(np.float32), size)
    return out, valid


def _bucket(n: int, minimum: int = 8) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


from functools import lru_cache


@lru_cache(maxsize=2048)
def _area_matrix(si: int, so: int) -> np.ndarray:
    """Row-stochastic (so, si) matrix applying torch ``interpolate(mode=
    'area')`` / adaptive-avg-pool semantics: output pixel i uniformly
    averages input pixels [floor(i*si/so), ceil((i+1)*si/so)) — the resize
    the reference's facenet-pytorch pyramid uses. Separable: a 2-D area
    resize is ``A_h @ img @ A_w.T``, i.e. two MXU matmuls on TPU.

    Memoized (crop sizes are small ints, ≤ a few hundred distinct values
    per clip) and returned READ-ONLY so cache entries cannot be mutated."""
    a = np.zeros((so, si), np.float32)
    for i in range(so):
        lo = (i * si) // so
        hi = -(-((i + 1) * si) // so)
        a[i, lo:hi] = 1.0 / (hi - lo)
    a.setflags(write=False)
    return a


def _pnet_grid(sh: int, sw: int) -> tuple[int, int]:
    """P-Net output grid dims for an (sh, sw) input: 3x3 VALID conv (-2),
    2/2 ceil max-pool, then two more 3x3 VALID convs (-4)."""
    return -(-(sh - 2) // 2) - 4, -(-(sw - 2) // 2) - 4


def _bucket_frames(t: int) -> int:
    """Frame-count bucket for the P-Net pyramid: next multiple of 32 (min 8).

    Every distinct (T, H, W) triple is a fresh XLA program per pyramid level
    (~12 levels x seconds of remote compile); videos differ by a few frames
    all the time, so quantize T. A multiple-of-32 step bounds the padding
    waste at ~10% of a 300-frame clip while collapsing all 289..320-frame
    videos onto one set of programs (the persistent compile cache then makes
    repeat resolutions free across runs)."""
    return 8 if t <= 8 else -(-t // 32) * 32


@dataclass
class MTCNNDetector:
    """Full 3-stage cascade. ``variables`` maps net name → flax variables."""

    variables: dict
    thresholds: tuple = (0.85, 0.95, 0.95)  # face_detector.py:42-46
    min_face_size: int = 20
    factor: float = 0.709
    #: MTCNN(select_largest=True) default the reference inherits: final
    #: boxes ordered by area descending (facenet_pytorch models/mtcnn.py)
    select_largest: bool = True
    # device→host compaction cap: per frame and pyramid level, only the
    # top-K P-Net cells come back to the host (K ≥ the above-threshold
    # count in practice; raise for pathological inputs / low thresholds).
    # Interplay with min_face_size: the coarsest pyramid scale is
    # 12/min_face_size, so a SMALLER min_face_size means larger scaled
    # images, hence more P-Net grid cells per level competing for the same
    # K slots. At the defaults (min_face_size=20, threshold 0.85) a 512-cap
    # never truncates on real footage; if you lower min_face_size or the
    # stage-1 threshold, scale pnet_topk up proportionally — detect_batch
    # warns when the cap clips an above-threshold cell.
    pnet_topk: int = 512
    #: device→host fetch cap: of the per-level top-K survivors, only the
    #: global top-k_fetch cells ACROSS all pyramid levels are read back per
    #: frame (the readback, not the convnet, is stage 1's wall-clock).
    #: None → pnet_topk, which keeps the stress-test contract: raising
    #: pnet_topk for low thresholds raises the fetch budget with it.
    pnet_fetch_k: int | None = None
    #: lazy-fetch head size: the global top-k_fetch outputs are split on
    #: device into a HEAD of this many score-desc cells (always fetched)
    #: and a TAIL (fetched only when the head's last score is still ≥ the
    #: stage-1 threshold, i.e. when above-threshold cells might extend past
    #: the head). Above-threshold cells per frame number in the tens on
    #: real footage, so the common case reads ~4× fewer bytes per frame —
    #: measured 50 ms device pyramid vs ~340 ms of readback at 512 slots
    #: (experiments/detect_stage_profile.py); bit-exact because tail cells
    #: below threshold are discarded by the very first host mask anyway.
    pnet_head_k: int = 128
    #: color order of the INPUT frames. The cascade's numerics are defined
    #: on RGB (facenet-pytorch contract); with ``"bgr"`` the detector
    #: accepts raw cv2-decoded frames and performs the swap ON DEVICE (a
    #: channel-axis reverse that XLA fuses into the pyramid's first matmul
    #: for free) / on the tiny R/O-Net candidate crops. Host cv2.cvtColor
    #: over a 300-frame clip measures ~0.7 s on a 1-core host — pure waste
    #: when a free device gather produces bit-identical values (BGR→RGB is
    #: a permutation, so it commutes exactly with resize and crop).
    channel_order: str = "rgb"
    #: integer downscale applied ON DEVICE before the pyramid: with
    #: ``input_scale=2`` the detector accepts FULL-resolution frames and
    #: produces the same half-resolution-coordinate boxes the reference
    #: contract defines (face_detector.py:78's cv2.resize(w//2, h//2)) —
    #: but the 2× shrink happens as one more area-resize matmul pair on the
    #: MXU instead of a per-frame host cv2.resize (~93 ms/video of the
    #: predict decode stage, experiments/decode_floor.py). R/O-Net
    #: candidate crops come from the full-res frames with box coords scaled
    #: by the same factor (the composed area-resize full→24 equals
    #: half→24 up to fp rounding where window boundaries align; cv2's path
    #: additionally rounds the half-res image to uint8, so the two modes
    #: agree to that rounding, not bitwise — tests pin exact equality on
    #: 2×2-constant frames where both are exact). Measured verdict
    #: (experiments/decode_floor.py): on a retain-then-detect host pipeline
    #: the mode is a net LOSS — holding the clip's full-res frames (~830 MB
    #: vs ~200 MB at half res) costs more in allocator churn than the
    #: ~80 ms resize it saves — so it pays only where decoded frames
    #: STREAM to the device instead of being retained (attached-host
    #: serving with incremental staging; frames cross the link at 4× the
    #: bytes, so never on the slow remote tunnel).
    input_scale: int = 1
    #: run the R/O-Net candidate crop-and-resize ON DEVICE, fused into the
    #: net's jitted program: the host ships only integer box coordinates
    #: (~KBs) and the crops are computed as per-candidate area-weight
    #: matmuls against the already-device-resident frames — MXU work —
    #: instead of a per-candidate host resample plus a crops upload
    #: (~200 MB/video at spread-logit candidate load, the dominant staged
    #: detect cost on a slow link). fp32 matmul reduction order differs
    #: from the host BLAS path in the last ulp, so results are
    #: tolerance-equivalent, not bitwise (exact on constant frames);
    #: default off to preserve the host path's bit-parity contract.
    device_crops: bool = False

    def __post_init__(self):
        if self.input_scale < 1:
            raise ValueError(f"input_scale must be >= 1, got {self.input_scale}")
        if self.channel_order not in ("rgb", "bgr"):
            # the decode helpers convert only on == "rgb" and the detector
            # swaps only on == "bgr" — any other spelling would silently run
            # the cascade on wrong-color frames, so fail loudly instead
            raise ValueError(
                f"channel_order must be 'rgb' or 'bgr', got {self.channel_order!r}"
            )
        self._rnet = jax.jit(partial(RNet().apply))
        self._onet = jax.jit(partial(ONet().apply))

        # Fused crop-and-resize + R/O-Net as ONE XLA program (device_crops):
        # for each candidate box the torch-'area' resample is two small
        # matmuls, crop = Wy @ frame @ Wx^T, whose weight matrices are
        # computed on device from integer box coords with the EXACT
        # [floor(i·L/size), ceil((i+1)·L/size)) window arithmetic of
        # ``_area_matrix`` (int32 products stay < 2^17). lax.map walks the
        # frame axis so only one frame's (K, size, W, 3) intermediate is
        # live at a time; the net runs inside the map body and only packed
        # (T, K, 5) [score, reg4] ever returns to the host — one fetch.
        @partial(jax.jit, static_argnames=("size", "net", "scale", "bgr"))
        def fused_stage(variables, frames, boxes, size, net, scale, bgr):
            # frames: (T, H, W, 3); boxes: (T, K, 4) int32 [x, y, ex, ey],
            # 1-based clipped DETECTION coords; invalid slots zero-length
            H, W = frames.shape[1:3]
            x = frames[..., ::-1] if bgr else frames

            def axis_weights(start1, end1, length):
                # region rows [(start1-1)·scale, end1·scale) → `size` cells
                r0 = (start1 - 1) * scale  # (K,)
                L = (end1 - start1 + 1) * scale  # (K,)
                i = jnp.arange(size, dtype=jnp.int32)
                lo = (i[None, :] * L[:, None]) // size  # (K, size)
                hi = -(-((i[None, :] + 1) * L[:, None]) // size)
                den = jnp.maximum(hi - lo, 1).astype(jnp.float32)
                r = jnp.arange(length, dtype=jnp.int32)
                rel = r[None, None, :] - r0[:, None, None]  # (K, 1, len)
                inside = (rel >= lo[..., None]) & (rel < hi[..., None])
                ok = (L > 0)[:, None, None]
                return jnp.where(inside & ok, 1.0 / den[..., None], 0.0)

            def per_frame(args):
                frame, bx = args
                wy = axis_weights(bx[:, 1], bx[:, 3], H)  # (K, size, H)
                wx = axis_weights(bx[:, 0], bx[:, 2], W)  # (K, size, W)
                t1 = jnp.einsum(
                    "ksh,hwc->kswc", wy, frame.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
                crops = jnp.einsum(
                    "ktw,kswc->kstc", wx, t1,
                    preferred_element_type=jnp.float32,
                )
                inp = (crops - 127.5) * 0.0078125
                if net == "rnet":
                    prob, reg = RNet().apply(variables, inp)
                else:
                    prob, reg, _ = ONet().apply(variables, inp)
                return jnp.concatenate([prob[:, 1:2], reg], axis=-1)  # (K, 5)

            return jax.lax.map(per_frame, (x, boxes))  # (T, K, 5)

        self._fused_stage = fused_stage

        # Stage-1 pyramid as ONE XLA program: raw uint8 frames cross the
        # host→device link once (lossless — the pyramid is computed on
        # device in fp32 via area-resize matmuls, reference numerics), every
        # level's P-Net runs in the same dispatch, and only a compacted
        # GLOBAL top-k_fetch of cells per frame (score, within-level flat
        # index, level id, 4 regressions) comes back — the dense
        # (T, h', w', 6) maps, the 12-levels-of-resized-frames traffic, AND
        # the per-level top-K slack never touch the link. Two-tier
        # compaction: per-level top-k bounds the concat (capacity
        # guarantee, k ≥ any level's above-threshold count), then one
        # global top-k over all levels picks what is actually fetched —
        # above-threshold cells per frame number in the tens, so fetching
        # 512 globally instead of 512 × levels cuts stage-1 readback ~5.5×
        # (measured 78.5 → 14.4 KB/frame; the fetch, not the convnet, is
        # the detect stage's wall-clock on both the tunnel and PCIe).
        # Per-level boundary scores (T, levels) ride along so the host can
        # still detect per-level truncation exactly.
        @partial(
            jax.jit,
            static_argnames=("scales", "k", "k_fetch", "head_k", "bgr", "down"),
        )
        def pnet_pyramid(variables, frames, scales, k, k_fetch, head_k, bgr,
                         down=1):
            if bgr:  # free device-side channel swap (see ``channel_order``)
                frames = frames[..., ::-1]
            x = frames.astype(jnp.float32)
            h, w = x.shape[1:3]
            if down > 1:  # device-side 2× shrink (see ``input_scale``)
                hh, ww = h // down, w // down
                x = jnp.einsum(
                    "ah,thwc->tawc", jnp.asarray(_area_matrix(h, hh)), x,
                    preferred_element_type=jnp.float32,
                )
                x = jnp.einsum(
                    "bw,tawc->tabc", jnp.asarray(_area_matrix(w, ww)), x,
                    preferred_element_type=jnp.float32,
                )
                h, w = hh, ww
            scores_all, idx_all, lvl_all, reg_all, bound_all = [], [], [], [], []
            for li, s in enumerate(scales):
                # facenet-pytorch level size: int(dim * scale + 1)
                sh, sw = int(h * s + 1), int(w * s + 1)
                lvl = jnp.einsum(
                    "ah,thwc->tawc", jnp.asarray(_area_matrix(h, sh)), x,
                    preferred_element_type=jnp.float32,
                )
                lvl = jnp.einsum(
                    "bw,tawc->tabc", jnp.asarray(_area_matrix(w, sw)), lvl,
                    preferred_element_type=jnp.float32,
                )
                prob, reg = PNet().apply(variables, (lvl - 127.5) * 0.0078125)
                t, gh, gw = prob.shape[:3]
                scores = prob[..., 1].reshape(t, gh * gw)
                reg = reg.reshape(t, gh * gw, 4)
                top_scores, idx = jax.lax.top_k(scores, min(k, gh * gw))
                scores_all.append(top_scores)
                idx_all.append(idx)
                lvl_all.append(jnp.full(idx.shape, li, jnp.int32))
                reg_all.append(jnp.take_along_axis(reg, idx[..., None], axis=1))
                bound_all.append(top_scores[:, -1])
            scores = jnp.concatenate(scores_all, axis=1)
            kf = min(k_fetch, scores.shape[1])
            # global top-k is score-desc with ties broken by concat index —
            # within a level that is exactly the per-level top_k order, so
            # the host-side per-level candidate order (hence NMS) is
            # bit-identical to fetching every level in full
            g_scores, g_pos = jax.lax.top_k(scores, kf)
            take = lambda a: jnp.take_along_axis(a, g_pos, axis=1)
            g_idx = take(jnp.concatenate(idx_all, axis=1))
            g_lvl = take(jnp.concatenate(lvl_all, axis=1))
            g_reg = jnp.take_along_axis(
                jnp.concatenate(reg_all, axis=1), g_pos[..., None], axis=1
            )
            # head/tail split: outputs stay device-resident until fetched,
            # so returning the score-desc prefix separately lets the host
            # read only ``head_k`` cells per frame unless the boundary score
            # proves above-threshold cells spill into the tail.
            # Each side is PACKED into one f32 buffer ([score, idx, lvl,
            # reg4] per cell, bounds appended to the head) because every
            # separate device array the host reads is its own blocking
            # transfer — on the remote-TPU tunnel the old 5-array head
            # (scores/idx/lvl/reg/bounds) paid 5 round-trips per video where
            # one buffer pays 1 (~128 ms → ~50 ms host stage measured,
            # experiments/detect_stage_profile.py). f32 round-trips idx and
            # lvl exactly only while idx < 2^24 — NOT a given (a half-res 4K
            # input's coarsest level is already ~1.8·10^5 cells, and a
            # ≥ ~14k×14k still would cross the bound), so _dispatch_stage1
            # asserts the invariant host-side before dispatch.
            hk = min(head_k, kf)

            def pack(lo, hi):  # cells [lo:hi) -> (T, (hi-lo)*7)
                cells = jnp.concatenate(
                    [
                        g_scores[:, lo:hi, None],
                        g_idx[:, lo:hi, None].astype(jnp.float32),
                        g_lvl[:, lo:hi, None].astype(jnp.float32),
                        g_reg[:, lo:hi],
                    ],
                    axis=-1,
                )
                return cells.reshape(cells.shape[0], (hi - lo) * 7)

            head = jnp.concatenate(
                [pack(0, hk), jnp.stack(bound_all, axis=1)], axis=1
            )  # (T, hk*7 + levels): cells + per-level truncation probe
            return head, pack(hk, kf)

        self._pnet_pyramid = pnet_pyramid

    @staticmethod
    def init_variables(rng=None) -> dict:
        """Random-init variables (for tests / structural runs)."""
        rng = rng if rng is not None else jax.random.key(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        return {
            "pnet": PNet().init(k1, jnp.zeros((1, 12, 12, 3))),
            "rnet": RNet().init(k2, jnp.zeros((1, 24, 24, 3))),
            "onet": ONet().init(k3, jnp.zeros((1, 48, 48, 3))),
        }

    def detect(self, img: np.ndarray) -> np.ndarray:
        """Detect faces in one RGB uint8 image → ``(N, 5)`` [x1,y1,x2,y2,score]."""
        return self.detect_batch([img])[0]

    def stage_frames(self, frames: Sequence[np.ndarray]):
        """Upload a video's frames to the device once (padded to the same
        frame bucket ``detect_batch`` uses). Passing the result via
        ``staged=`` skips the per-call host→device transfer — on a slow
        link (the remote-TPU tunnel moves ~25-55 MB/s and a 300-frame
        360p clip is ~200 MB) that transfer, not the cascade, dominates
        ``detect_batch`` wall-clock."""
        batch = np.stack([np.asarray(f) for f in frames])
        tb = _bucket_frames(len(frames))
        if tb > len(frames):
            batch = np.concatenate(
                [batch, np.zeros((tb - len(frames),) + batch.shape[1:], batch.dtype)]
            )
        return jax.device_put(batch)

    def _dispatch_stage1(self, frames: Sequence[np.ndarray], staged=None):
        """Launch the stage-1 pyramid for a video WITHOUT fetching results.

        The returned handle holds un-fetched device arrays — on the async
        dispatch path the pyramid executes while the host does other work
        (another video's NMS/stages). ``_finish_detect`` consumes it.
        """
        T = len(frames)
        if T == 0:
            return None
        # detection coordinates live at the (possibly device-downscaled) dims
        H = frames[0].shape[0] // self.input_scale
        W = frames[0].shape[1] // self.input_scale
        # scale pyramid with facenet-pytorch's exact accumulation (detect_face:
        # minl *= factor each level, checked before appending)
        m = 12.0 / self.min_face_size
        minl = min(H, W) * m
        scales: list[float] = []
        scale_i = m
        while minl >= 12:
            scales.append(scale_i)
            scale_i *= self.factor
            minl *= self.factor
        if not scales:  # image smaller than the minimum face
            return (tuple(), None, None)
        # f32 cell-index packing in pnet_pyramid is exact only below 2^24
        # cells; the largest grid is the first (coarsest-downscale) level's
        gh0, gw0 = _pnet_grid(int(H * scales[0] + 1), int(W * scales[0] + 1))
        if gh0 * gw0 >= 2**24:
            raise ValueError(
                f"P-Net grid {gh0}x{gw0} exceeds the f32-exact packing bound"
                " (2^24 cells); raise min_face_size or downscale the input"
            )
        if staged is not None:
            batch = staged  # pre-uploaded + bucket-padded (stage_frames)
        else:
            batch = np.stack(frames)  # uint8, lossless transfer
            tb = _bucket_frames(T)
            if tb > T:  # quantize the frame axis so XLA programs repeat
                batch = np.concatenate(
                    [batch, np.zeros((tb - T,) + batch.shape[1:], batch.dtype)]
                )
            if self.device_crops:
                # retain the device copy so the fused R/O-Net crop programs
                # read the frames that are already on device (one upload
                # total; the pyramid call below reuses the same buffer)
                batch = jax.device_put(batch)
        out = self._pnet_pyramid(
            self.variables["pnet"], batch, scales=tuple(scales),
            k=self.pnet_topk,
            k_fetch=self.pnet_fetch_k or self.pnet_topk,
            head_k=self.pnet_head_k,
            bgr=self.channel_order == "bgr",
            down=self.input_scale,
        )
        return (tuple(scales), out, batch if self.device_crops else None)

    def detect_batch(
        self, frames: Sequence[np.ndarray], staged=None
    ) -> list[np.ndarray]:
        """Batched detection over same-shape frames (a video).

        SURVEY §2.1's "batched MTCNN": ONE P-Net call per pyramid level over
        ALL frames, and ONE bucketed R-Net / O-Net call over all surviving
        candidates of all frames — device dispatches per video drop from
        O(frames × levels) to O(levels + 2), which is where the wall-clock
        goes (per-call dispatch dominates these tiny convnets). NMS and box
        bookkeeping stay per-frame on host. Matches the per-frame cascade
        bit-for-bit (same pyramid, thresholds, regression, rounding).
        """
        frames = [np.asarray(f) for f in frames]
        pre = self._dispatch_stage1(frames, staged=staged)
        return self._finish_detect(frames, pre)

    def detect_videos(
        self, videos: Sequence[Sequence[np.ndarray]]
    ) -> list[list[np.ndarray]]:
        """Pipelined detection over several videos.

        One-video-deep lookahead: video ``i+1``'s stage-1 pyramid is
        dispatched (async) before video ``i``'s host-side NMS and R/O-Net
        stages run, so device pyramid compute and host box bookkeeping
        overlap instead of strictly alternating. Results are bit-identical
        to per-video ``detect_batch`` calls.
        """
        return list(self.detect_videos_iter(iter(videos)))

    def detect_videos_iter(self, videos):
        """Streaming form of ``detect_videos``: consumes an ITERATOR of
        frame-lists and yields each video's boxes as soon as they finish,
        holding at most two videos' frames in memory. This is the
        dataset-scale entry point (``preprocessing/detect_faces.py`` drives
        163,909 videos at ForgeryNet scale through it): the upstream
        iterator is pulled one video AHEAD of the video being finished, so
        a lazily-decoding source overlaps its cv2 decode with device
        pyramid compute AND host NMS/R-O-Net work. Same bit-identical
        contract as ``detect_batch``.
        """
        pending = None  # (frames, stage-1 handle) of the in-flight video
        for fs in videos:
            fs = [np.asarray(f) for f in fs]
            nxt = (fs, self._dispatch_stage1(fs))
            if pending is not None:
                yield self._finish_detect(pending[0], pending[1])
            pending = nxt
        if pending is not None:
            yield self._finish_detect(pending[0], pending[1])

    def _finish_detect(self, frames, pre) -> list[np.ndarray]:
        """Host NMS + R/O-Net stages for one video's dispatched stage 1."""
        T = len(frames)
        if pre is None:
            return []
        scales, handles, dev_frames = pre
        if not scales:
            return [np.zeros((0, 5)) for _ in range(T)]
        H = frames[0].shape[0] // self.input_scale
        W = frames[0].shape[1] // self.input_scale
        per_frame: list[list] = [[] for _ in range(T)]
        head_h, tail_h = handles
        L = len(scales)

        def unpack(buf, k):  # (T, k*7) -> scores, idx, lvl, reg4
            cells = buf[:, : k * 7].reshape(buf.shape[0], k, 7)
            return (
                cells[..., 0],
                # f32→int is exact: both were ints < 2^24 before packing
                cells[..., 1].astype(np.int64),
                cells[..., 2].astype(np.int32),
                cells[..., 3:7],
            )

        head_buf = np.asarray(head_h)[:T]  # ONE transfer: cells + bounds
        hk = (head_buf.shape[1] - L) // 7
        head = unpack(head_buf, hk)
        bounds = head_buf[:, hk * 7 :]
        tail_k = tail_h.shape[1] // 7
        if tail_k and (
            hk == 0 or (head[0][:, -1] >= self.thresholds[0]).any()
        ):
            # the head's boundary score is still above threshold somewhere:
            # above-threshold cells may spill into the tail — fetch it.
            # Otherwise every tail score is ≤ the boundary < threshold and
            # the first host mask below would discard it, so skipping the
            # fetch is bit-exact (see ``pnet_head_k``).
            tail = unpack(np.asarray(tail_h)[:T], tail_k)
            all_scores, all_idx, all_lvl, all_reg = (
                np.concatenate([h, t], axis=1) for h, t in zip(head, tail)
            )
        else:
            all_scores, all_idx, all_lvl, all_reg = head
        grids = [_pnet_grid(int(H * s + 1), int(W * s + 1)) for s in scales]
        # the fetch BUDGET (head+tail): the truncation warning asks whether
        # this budget clipped above-threshold cells — when the tail was
        # skipped, all_scores[:, -1] is the head boundary (< threshold), so
        # the warning correctly cannot fire
        n_fetched = hk + tail_k
        n_slots = sum(min(self.pnet_topk, gh * gw) for gh, gw in grids)
        import warnings

        for li, s in enumerate(scales):
            gh, gw = grids[li]
            if self.pnet_topk < gh * gw and (
                bounds[:, li] >= self.thresholds[0]
            ).any():
                warnings.warn(
                    f"P-Net top-{self.pnet_topk} truncated above-threshold"
                    f" cells at scale {s:.3f}; raise MTCNNDetector.pnet_topk",
                    stacklevel=2,
                )
        if n_fetched < n_slots and (
            all_scores[:, -1] >= self.thresholds[0]
        ).any():
            warnings.warn(
                f"P-Net global fetch top-{n_fetched} truncated"
                " above-threshold cells; raise MTCNNDetector.pnet_fetch_k",
                stacklevel=2,
            )
        for t in range(T):
            keep_t = all_scores[t] >= self.thresholds[0]
            if not keep_t.any():
                continue
            lv_t, idx_t = all_lvl[t][keep_t], all_idx[t][keep_t]
            sc_t, rg_t = all_scores[t][keep_t], all_reg[t][keep_t]
            for li, s in enumerate(scales):
                # generateBoundingBox: mask = probs >= threshold; box corners
                # q1 = floor((2·cell_xy + 1)/scale), q2 = floor((2·cell_xy +
                # 12)/scale); per-scale NMS 0.5 runs on the UNregressed boxes
                # (regression is applied once, after the 0.7 pass below).
                # The global top-k is score-desc with concat-index
                # tie-break, so this level's cells appear here in exactly
                # the order the per-level top_k produced — NMS inputs are
                # bit-identical to the unfetched-compaction path.
                keep_k = lv_t == li
                if not keep_k.any():
                    continue
                gh, gw = grids[li]
                # float32 THROUGHOUT, like the reference's torch tensors: the
                # floor() result genuinely differs between f32 and f64 at
                # some cells (e.g. 3/0.6 is 4.9999998f but 5.0000000000000009
                # in f64), so dtype is part of the contract
                stride, cell = np.float32(2), np.float32(12)
                score = sc_t[keep_k].astype(np.float32)
                ys, xs = np.divmod(idx_t[keep_k], gw)
                xy = np.stack([xs, ys], axis=1).astype(np.float32) * stride
                s32 = np.float32(s)
                q1 = np.floor((xy + np.float32(1)) / s32)
                q2 = np.floor((xy + cell) / s32)
                boxes = np.concatenate(
                    [q1, q2, score[:, None], rg_t[keep_k]], axis=1
                )
                keep = nms_tv(boxes[:, :4], boxes[:, 4], 0.5)
                per_frame[t].append(boxes[keep])

        cand: list[np.ndarray] = []
        for t in range(T):
            if per_frame[t]:
                b = np.concatenate(per_frame[t])
                keep = nms_tv(b[:, :4], b[:, 4], 0.7)
                b = b[keep]
                # regression (no +1) then square; boxes stay float — the
                # reference never rounds, only pad() truncates for cropping
                out5 = np.concatenate(
                    [apply_regression_stage1(b[:, :4], b[:, 5:9]), b[:, 4:5]],
                    axis=1,
                )
                b = rerec(out5)
            else:
                b = np.zeros((0, 5))
            cand.append(b)

        # stage 2: refine — one bucketed R-Net call over all frames;
        # NMS 0.7 on the pre-regression boxes, then bbreg (+1), then rerec
        cand = self._run_stage_multi(frames, cand, 24, self._rnet, "rnet",
                                     self.thresholds[1], dev_frames)
        for t in range(T):
            b, mv = cand[t]
            if len(b):
                keep = nms_tv(b[:, :4], b[:, 4], 0.7)
                b, mv = b[keep], mv[keep]
                b[:, :4] = apply_regression(b[:, :4], mv)[:, :4]
                b = rerec(b)
            cand[t] = b

        # stage 3: output — one bucketed O-Net call over all frames;
        # bbreg FIRST, then the 'min' NMS with MATLAB +1 areas
        cand = self._run_stage_multi(frames, cand, 48, self._onet, "onet",
                                     self.thresholds[2], dev_frames)
        out = []
        for b, mv in cand:
            if len(b):
                b[:, :4] = apply_regression(b[:, :4], mv)[:, :4]
                b = b[nms(b[:, :4], b[:, 4], 0.7, method="min")]
            if len(b) and self.select_largest:
                # MTCNN.detect(select_largest=True) orders by box area desc
                area = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
                b = b[np.argsort(area)[::-1]]
            out.append(b)
        return out

    def _run_stage_multi(self, frames, cand, size, net, name, threshold,
                         dev_frames=None):
        """Run R/O-Net over all frames' candidates in one bucketed call.
        Returns per frame ``(boxes5, reg4)`` with the refined score in
        column 4 and the raw regression output for the caller to apply in
        the stage's correct order. With ``device_crops`` and device-resident
        frames, the crop-and-resize runs fused inside the net's program
        (``_fused_stage``) and only box coordinates cross the link."""
        counts = [len(b) for b in cand]
        n = sum(counts)
        empty = (np.zeros((0, 5)), np.zeros((0, 4)))
        if n == 0:
            return [empty for _ in cand]
        if self.device_crops and dev_frames is not None:
            return self._run_stage_device(cand, size, name, threshold,
                                          dev_frames)
        crops = np.zeros((n, size, size, 3), np.float32)
        valids = []
        off = 0
        bgr = self.channel_order == "bgr"
        for t, b in enumerate(cand):
            if len(b):
                # BGR inputs: swap as a zero-cost VIEW of the source frame —
                # the resize's BLAS tensordot copies its operand anyway, so
                # this is free AND keeps the crops bitwise identical to the
                # RGB detector on pre-swapped frames (resize-then-swap lands
                # a different sgemm column order, ~1-ulp off)
                img = frames[t][..., ::-1] if bgr else frames[t]
                c, v = _crop_resize(img, b, size, scale=self.input_scale)
                crops[off : off + len(b)] = c
                valids.append(v)
                off += len(b)
            else:
                valids.append(np.ones(0, dtype=bool))
        # pad candidate count to a bucket so the jit cache stays warm
        bkt = _bucket(n)
        if bkt > n:
            crops = np.concatenate(
                [crops, np.zeros((bkt - n,) + crops.shape[1:], np.float32)]
            )
        out = net(self.variables[name], (crops - 127.5) * 0.0078125)
        prob = np.asarray(out[0])[:n, 1]
        reg = np.asarray(out[1])[:n]
        results = []
        off = 0
        for t, b in enumerate(cand):
            k = len(b)
            p, r, v = prob[off : off + k], reg[off : off + k], valids[t]
            off += k
            keep = (p > threshold) & v  # fp: score > threshold (strict)
            if not keep.any():
                results.append(empty)
                continue
            new = b[keep].copy()
            new[:, 4] = p[keep]
            results.append((new, r[keep]))
        return results


    def _run_stage_device(self, cand, size, name, threshold, dev_frames):
        """Device-crop variant of ``_run_stage_multi``: identical pad/clip/
        valid bookkeeping on the host, but only the (T, K, 4) int32 box
        coordinates cross the link; crops, resample, and the net run in one
        fused program and a packed (T, K, 5) [score, reg4] comes back in a
        single fetch."""
        Tb = dev_frames.shape[0]
        H_det = dev_frames.shape[1] // self.input_scale
        W_det = dev_frames.shape[2] // self.input_scale
        counts = [len(b) for b in cand]
        K = _bucket(max(counts), minimum=8)
        boxes = np.zeros((Tb, K, 4), np.int32)
        boxes[..., :2] = 1  # [1, 1, 0, 0]: zero-length → zero weights
        valids = []
        for t, b in enumerate(cand):
            if not len(b):
                valids.append(np.ones(0, dtype=bool))
                continue
            ib = np.trunc(b[:, :4]).astype(np.int64)
            x = np.maximum(ib[:, 0], 1)
            y = np.maximum(ib[:, 1], 1)
            ex = np.minimum(ib[:, 2], W_det)
            ey = np.minimum(ib[:, 3], H_det)
            v = (ey > y - 1) & (ex > x - 1)
            valids.append(v)
            k = len(b)
            boxes[t, :k, 0] = np.where(v, x, 1)
            boxes[t, :k, 1] = np.where(v, y, 1)
            boxes[t, :k, 2] = np.where(v, ex, 0)
            boxes[t, :k, 3] = np.where(v, ey, 0)
        out = np.asarray(
            self._fused_stage(
                self.variables[name], dev_frames, boxes, size=size, net=name,
                scale=self.input_scale, bgr=self.channel_order == "bgr",
            )
        )  # (Tb, K, 5) — ONE blocking transfer
        empty = (np.zeros((0, 5)), np.zeros((0, 4)))
        results = []
        for t, b in enumerate(cand):
            k = len(b)
            if not k:
                results.append(empty)
                continue
            p, r, v = out[t, :k, 0], out[t, :k, 1:5], valids[t]
            keep = (p > threshold) & v  # fp: score > threshold (strict)
            if not keep.any():
                results.append(empty)
                continue
            new = b[keep].copy()
            new[:, 4] = p[keep]
            results.append((new, r[keep]))
        return results


def mtcnn_params_from_torch(pnet_sd, rnet_sd, onet_sd) -> dict:
    """Convert facenet-pytorch P/R/O-Net state_dicts to our variables."""
    from mintime_tpu.utils.torch_convert import _np

    def conv(sd, name):
        return {
            "kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{name}.bias"]),
        }

    def dense(sd, name):
        return {"kernel": _np(sd[f"{name}.weight"]).T, "bias": _np(sd[f"{name}.bias"])}

    def prelu(sd, name):
        return {"alpha": _np(sd[f"{name}.weight"]).reshape(-1)}

    pnet = {
        "conv1": conv(pnet_sd, "conv1"), "prelu1": prelu(pnet_sd, "prelu1"),
        "conv2": conv(pnet_sd, "conv2"), "prelu2": prelu(pnet_sd, "prelu2"),
        "conv3": conv(pnet_sd, "conv3"), "prelu3": prelu(pnet_sd, "prelu3"),
        "conv4_1": conv(pnet_sd, "conv4_1"), "conv4_2": conv(pnet_sd, "conv4_2"),
    }
    rnet = {
        "conv1": conv(rnet_sd, "conv1"), "prelu1": prelu(rnet_sd, "prelu1"),
        "conv2": conv(rnet_sd, "conv2"), "prelu2": prelu(rnet_sd, "prelu2"),
        "conv3": conv(rnet_sd, "conv3"), "prelu3": prelu(rnet_sd, "prelu3"),
        "dense4": dense(rnet_sd, "dense4"), "prelu4": prelu(rnet_sd, "prelu4"),
        "dense5_1": dense(rnet_sd, "dense5_1"), "dense5_2": dense(rnet_sd, "dense5_2"),
    }
    onet = {
        "conv1": conv(onet_sd, "conv1"), "prelu1": prelu(onet_sd, "prelu1"),
        "conv2": conv(onet_sd, "conv2"), "prelu2": prelu(onet_sd, "prelu2"),
        "conv3": conv(onet_sd, "conv3"), "prelu3": prelu(onet_sd, "prelu3"),
        "conv4": conv(onet_sd, "conv4"), "prelu4": prelu(onet_sd, "prelu4"),
        "dense5": dense(onet_sd, "dense5"), "prelu5": prelu(onet_sd, "prelu5"),
        "dense6_1": dense(onet_sd, "dense6_1"), "dense6_2": dense(onet_sd, "dense6_2"),
        "dense6_3": dense(onet_sd, "dense6_3"),
    }
    return {
        "pnet": {"params": pnet},
        "rnet": {"params": rnet},
        "onet": {"params": onet},
    }
