"""MTCNN cascade parity against a transliteration of facenet-pytorch's
``detect_face`` algorithm (VERDICT r2 missing#2).

The reference delegates detection to ``facenet_pytorch.MTCNN``
(preprocessing/face_detector.py:42-52). That package isn't installed here,
so this module transliterates its public ``models/utils/detect_face.py``
algorithm (MIT) into a ~150-line torch/numpy oracle — pyramid sizes
``int(dim*scale+1)``, per-scale NMS 0.5 and cross-scale 0.7 with
torchvision IoU semantics on UNregressed boxes, stage-1 regression without
the +1, ``pad``-trunc-clip crops with area resampling, stage-2 NMS before
bbreg, stage-3 bbreg before the MATLAB 'Min' NMS, and the
``select_largest`` area ordering of ``MTCNN.detect`` — and asserts our
cascade (mintime_tpu/preprocessing/mtcnn.py) produces the same boxes from
the same (converter-shared) weights on multi-face synthetic videos.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

from mintime_tpu.preprocessing.mtcnn import (
    MTCNNDetector,
    mtcnn_params_from_torch,
)

# ---------------------------------------------------------- torch P/R/O nets
# Architectures exactly as facenet_pytorch/models/mtcnn.py defines them
# (layer names match so the state_dicts feed mtcnn_params_from_torch).


class TorchPNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 10, 3)
        self.prelu1 = tnn.PReLU(10)
        self.pool1 = tnn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(10, 16, 3)
        self.prelu2 = tnn.PReLU(16)
        self.conv3 = tnn.Conv2d(16, 32, 3)
        self.prelu3 = tnn.PReLU(32)
        self.conv4_1 = tnn.Conv2d(32, 2, 1)
        self.conv4_2 = tnn.Conv2d(32, 4, 1)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.prelu2(self.conv2(x))
        x = self.prelu3(self.conv3(x))
        a = torch.softmax(self.conv4_1(x), dim=1)
        b = self.conv4_2(x)
        return b, a


class TorchRNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 28, 3)
        self.prelu1 = tnn.PReLU(28)
        self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(28, 48, 3)
        self.prelu2 = tnn.PReLU(48)
        self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = tnn.Conv2d(48, 64, 2)
        self.prelu3 = tnn.PReLU(64)
        self.dense4 = tnn.Linear(576, 128)
        self.prelu4 = tnn.PReLU(128)
        self.dense5_1 = tnn.Linear(128, 2)
        self.dense5_2 = tnn.Linear(128, 4)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.prelu3(self.conv3(x))
        x = x.permute(0, 3, 2, 1).contiguous()
        x = self.prelu4(self.dense4(x.view(x.shape[0], -1)))
        a = torch.softmax(self.dense5_1(x), dim=1)
        b = self.dense5_2(x)
        return b, a


class TorchONet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 32, 3)
        self.prelu1 = tnn.PReLU(32)
        self.pool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv2 = tnn.Conv2d(32, 64, 3)
        self.prelu2 = tnn.PReLU(64)
        self.pool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
        self.conv3 = tnn.Conv2d(64, 64, 3)
        self.prelu3 = tnn.PReLU(64)
        self.pool3 = tnn.MaxPool2d(2, 2, ceil_mode=True)
        self.conv4 = tnn.Conv2d(64, 128, 2)
        self.prelu4 = tnn.PReLU(128)
        self.dense5 = tnn.Linear(1152, 256)
        self.prelu5 = tnn.PReLU(256)
        self.dense6_1 = tnn.Linear(256, 2)
        self.dense6_2 = tnn.Linear(256, 4)
        self.dense6_3 = tnn.Linear(256, 10)

    def forward(self, x):
        x = self.pool1(self.prelu1(self.conv1(x)))
        x = self.pool2(self.prelu2(self.conv2(x)))
        x = self.pool3(self.prelu3(self.conv3(x)))
        x = self.prelu4(self.conv4(x))
        x = x.permute(0, 3, 2, 1).contiguous()
        x = self.prelu5(self.dense5(x.view(x.shape[0], -1)))
        a = torch.softmax(self.dense6_1(x), dim=1)
        b = self.dense6_2(x)
        c = self.dense6_3(x)
        return b, c, a


# ------------------------------------------------------------------- oracle


def _tv_nms(boxes, scores, threshold):
    """torchvision.ops.nms: areas without +1, suppress IoU > threshold."""
    if len(boxes) == 0:
        return np.zeros(0, dtype=int)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        r = order[1:]
        w = np.maximum(0, np.minimum(x2[i], x2[r]) - np.maximum(x1[i], x1[r]))
        h = np.maximum(0, np.minimum(y2[i], y2[r]) - np.maximum(y1[i], y1[r]))
        inter = w * h
        iou = inter / (area[i] + area[r] - inter)
        order = r[iou <= threshold]
    return np.asarray(keep, dtype=int)


def _min_nms(boxes, scores, threshold):
    """facenet-pytorch nms_numpy(method='Min'): MATLAB +1 areas."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1 + 1) * (y2 - y1 + 1)
    order = np.argsort(scores)
    keep = []
    while order.size:
        i = order[-1]
        keep.append(i)
        r = order[:-1]
        w = np.maximum(
            0.0, np.minimum(x2[i], x2[r]) - np.maximum(x1[i], x1[r]) + 1
        )
        h = np.maximum(
            0.0, np.minimum(y2[i], y2[r]) - np.maximum(y1[i], y1[r]) + 1
        )
        o = w * h / np.minimum(area[i], area[r])
        order = r[o <= threshold]
    return np.asarray(keep, dtype=int)


def _bbreg(boxes, reg):
    w = boxes[:, 2] - boxes[:, 0] + 1
    h = boxes[:, 3] - boxes[:, 1] + 1
    out = boxes.copy()
    out[:, 0] = boxes[:, 0] + reg[:, 0] * w
    out[:, 1] = boxes[:, 1] + reg[:, 1] * h
    out[:, 2] = boxes[:, 2] + reg[:, 2] * w
    out[:, 3] = boxes[:, 3] + reg[:, 3] * h
    return out


def _rerec(b):
    h = b[:, 3] - b[:, 1]
    w = b[:, 2] - b[:, 0]
    l = np.maximum(w, h)
    out = b.copy()
    out[:, 0] = b[:, 0] + w * 0.5 - l * 0.5
    out[:, 1] = b[:, 1] + h * 0.5 - l * 0.5
    out[:, 2] = out[:, 0] + l
    out[:, 3] = out[:, 1] + l
    return out


def _pad(boxes, w, h):
    ib = np.trunc(boxes[:, :4]).astype(int)
    x = np.maximum(ib[:, 0], 1)
    y = np.maximum(ib[:, 1], 1)
    ex = np.minimum(ib[:, 2], w)
    ey = np.minimum(ib[:, 3], h)
    return y, ey, x, ex


def _stage_crops(imgs, boxes, y, ey, x, ex, size):
    data = []
    for k in range(len(y)):
        assert ey[k] > y[k] - 1 and ex[k] > x[k] - 1, "degenerate box in oracle"
        crop = imgs[:, :, y[k] - 1 : ey[k], x[k] - 1 : ex[k]]
        data.append(F.interpolate(crop, size=(size, size), mode="area"))
    return (torch.cat(data, dim=0) - 127.5) * 0.0078125


def oracle_detect(img_u8, pnet, rnet, onet, thresholds, minsize=20,
                  factor=0.709, select_largest=True):
    """Transliterated facenet-pytorch detect_face + MTCNN.detect ordering,
    single image; returns float32 (N, 5) [x1 y1 x2 y2 score]."""
    imgs = torch.tensor(img_u8[None].astype(np.float32)).permute(0, 3, 1, 2)
    h, w = imgs.shape[2:4]
    m = 12.0 / minsize
    minl = min(h, w) * m
    scales, scale_i = [], m
    while minl >= 12:
        scales.append(scale_i)
        scale_i *= factor
        minl *= factor

    stage1 = []
    for scale in scales:
        im = F.interpolate(imgs, size=(int(h * scale + 1), int(w * scale + 1)),
                           mode="area")
        im = (im - 127.5) * 0.0078125
        with torch.no_grad():
            reg, probs = pnet(im)
        probs = probs[0, 1].numpy()
        reg = reg[0].numpy()
        mask = probs >= thresholds[0]
        yy, xx = np.nonzero(mask)
        score = probs[mask].astype(np.float32)
        r = reg[:, mask].T.astype(np.float32)
        bb = np.stack([xx, yy], axis=1).astype(np.float32) * np.float32(2)
        q1 = np.floor((bb + np.float32(1)) / np.float32(scale))
        q2 = np.floor((bb + np.float32(12)) / np.float32(scale))
        b = np.concatenate([q1, q2, score[:, None], r], axis=1)
        b = b[_tv_nms(b[:, :4], b[:, 4], 0.5)]
        stage1.append(b)
    boxes = (
        np.concatenate(stage1) if stage1 else np.zeros((0, 9), np.float32)
    )
    boxes = boxes[_tv_nms(boxes[:, :4], boxes[:, 4], 0.7)]
    if len(boxes) == 0:
        return np.zeros((0, 5), np.float32)
    regw = boxes[:, 2] - boxes[:, 0]
    regh = boxes[:, 3] - boxes[:, 1]
    qq = np.stack(
        [
            boxes[:, 0] + boxes[:, 5] * regw,
            boxes[:, 1] + boxes[:, 6] * regh,
            boxes[:, 2] + boxes[:, 7] * regw,
            boxes[:, 3] + boxes[:, 8] * regh,
            boxes[:, 4],
        ],
        axis=1,
    )
    boxes = _rerec(qq)

    # stage 2
    y, ey, x, ex = _pad(boxes, w, h)
    with torch.no_grad():
        out0, out1 = rnet(_stage_crops(imgs, boxes, y, ey, x, ex, 24))
    score = out1[:, 1].numpy().astype(np.float32)
    ipass = score > thresholds[1]
    boxes = np.concatenate(
        [boxes[ipass, :4], score[ipass, None]], axis=1
    )
    mv = out0.numpy()[ipass].astype(np.float32)
    if len(boxes) == 0:
        return np.zeros((0, 5), np.float32)
    pick = _tv_nms(boxes[:, :4], boxes[:, 4], 0.7)
    boxes, mv = boxes[pick], mv[pick]
    boxes = _rerec(_bbreg(boxes, mv))

    # stage 3
    y, ey, x, ex = _pad(boxes, w, h)
    with torch.no_grad():
        out0, _, out2 = onet(_stage_crops(imgs, boxes, y, ey, x, ex, 48))
    score = out2[:, 1].numpy().astype(np.float32)
    ipass = score > thresholds[2]
    mv = out0.numpy()[ipass].astype(np.float32)
    boxes = np.concatenate([boxes[ipass, :4], score[ipass, None]], axis=1)
    if len(boxes) == 0:
        return np.zeros((0, 5), np.float32)
    boxes = _bbreg(boxes, mv)
    boxes = boxes[_min_nms(boxes[:, :4], boxes[:, 4], 0.7)]
    if select_largest and len(boxes):
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        boxes = boxes[np.argsort(area)[::-1]]
    return boxes.astype(np.float32)


# -------------------------------------------------------------------- tests


@pytest.fixture(scope="module")
def nets_and_detector():
    torch.manual_seed(11)
    pnet, rnet, onet = TorchPNet().eval(), TorchRNet().eval(), TorchONet().eval()
    # Default init produces logits so tiny every prob sits within ±0.005 of
    # 0.5 — any threshold there is flip-flaky under 1e-6 backend noise.
    # Widen the score-layer logits so probs spread over (0,1) and threshold
    # decisions are robustly far from the cut for both implementations.
    with torch.no_grad():
        for layer in (pnet.conv4_1, rnet.dense5_1, onet.dense6_1):
            layer.weight *= 75.0
            layer.bias *= 75.0
    return pnet, rnet, onet


def _videos(seed=0, n_frames=4, shape=(120, 160)):
    """Three synthetic multi-blob videos: noise, gradient+noise, blocky."""
    rng = np.random.default_rng(seed)
    h, w = shape
    vids = []
    base = rng.integers(0, 255, (h, w, 3)).astype(np.uint8)
    vids.append([np.roll(base, 3 * t, axis=1) for t in range(n_frames)])
    gy, gx = np.mgrid[0:h, 0:w]
    grad = ((gx + gy) % 255).astype(np.uint8)[..., None].repeat(3, -1)
    noise = rng.integers(0, 80, (n_frames, h, w, 3)).astype(np.uint8)
    vids.append([np.clip(grad + noise[t] - 40, 0, 255).astype(np.uint8)
                 for t in range(n_frames)])
    blocks = np.kron(
        rng.integers(0, 255, (h // 8, w // 8, 3)), np.ones((8, 8, 1))
    ).astype(np.uint8)
    vids.append([np.roll(blocks, -5 * t, axis=0) for t in range(n_frames)])
    return vids


THRESHOLDS = (0.6, 0.5, 0.5)  # random weights score ~0.5; keep flow alive


def test_cascade_matches_facenet_pytorch_algorithm(nets_and_detector):
    pnet, rnet, onet = nets_and_detector
    det = MTCNNDetector(
        mtcnn_params_from_torch(
            pnet.state_dict(), rnet.state_dict(), onet.state_dict()
        ),
        thresholds=THRESHOLDS,
        pnet_topk=2048,
    )
    total = 0
    for vid_i, frames in enumerate(_videos()):
        ours = det.detect_batch(frames)
        for t, frame in enumerate(frames):
            want = oracle_detect(frame, pnet, rnet, onet, THRESHOLDS)
            got = ours[t]
            assert len(got) == len(want), (
                f"video {vid_i} frame {t}: {len(got)} vs oracle {len(want)}"
            )
            if len(want):
                np.testing.assert_allclose(
                    got, want, atol=2e-2, rtol=0,
                    err_msg=f"video {vid_i} frame {t}",
                )
                total += len(want)
    assert total >= 6, "test inputs must actually produce detections"


def _detector(nets, **kw):
    pnet, rnet, onet = nets
    return MTCNNDetector(
        mtcnn_params_from_torch(
            pnet.state_dict(), rnet.state_dict(), onet.state_dict()
        ),
        **kw,
    )


def _corner_frames(seed=3, n_frames=3, shape=(120, 160)):
    """Texture concentrated in the corners on a flat background: stage-1
    proposals cluster at the frame borders, so regression + ``rerec``
    squaring pushes boxes PAST the image extent — the ``pad``-clip geometry
    (facenet-pytorch detect_face ``pad``; our ``_crop_resize``,
    PARITY #22)."""
    rng = np.random.default_rng(seed)
    h, w = shape
    frames = []
    for t in range(n_frames):
        f = np.full((h, w, 3), 128, np.uint8)
        f[:40, :40] = rng.integers(0, 255, (40, 40, 3))
        f[-40:, -40:] = rng.integers(0, 255, (40, 40, 3))
        f[:24, -24:] = rng.integers(0, 255, (24, 24, 3))
        frames.append(np.roll(f, t, axis=0))
    return frames


def test_border_clipped_boxes_match_oracle(nets_and_detector):
    """Boxes regressed past the frame borders: the trunc-clip crop geometry
    must agree with facenet-pytorch's ``pad`` semantics end to end
    (VERDICT r3 #7 — the _crop_resize validity-mask divergence)."""
    th = (0.4, 0.35, 0.35)  # corner texture scores lower than full-noise
    det = _detector(nets_and_detector, thresholds=th, pnet_topk=4096)
    pnet, rnet, onet = nets_and_detector
    frames = _corner_frames(seed=1)
    ours = det.detect_batch(frames)
    total = clipped = 0
    h, w = frames[0].shape[:2]
    for t, frame in enumerate(frames):
        want = oracle_detect(frame, pnet, rnet, onet, th)
        assert len(ours[t]) == len(want), f"frame {t}"
        if len(want):
            np.testing.assert_allclose(ours[t], want, atol=2e-2, rtol=0,
                                       err_msg=f"frame {t}")
            total += len(want)
            clipped += int(
                ((want[:, 0] < 1) | (want[:, 1] < 1)
                 | (want[:, 2] > w) | (want[:, 3] > h)).sum()
            )
    assert total >= 1, "corner inputs must produce detections"
    assert clipped >= 1, "at least one final box must overhang the frame"


@pytest.mark.parametrize(
    "minsize", [20, 60, 100, 120, 121]
)  # 120 = exactly one pyramid scale on a 120-row image; 121 = zero scales
def test_minsize_pyramid_boundary(nets_and_detector, minsize):
    """The pyramid's minsize boundary: scale count, the single-scale case,
    and the zero-scale early-exit must all match the oracle (facenet-pytorch
    detect_face's ``minl >= 12`` loop)."""
    low = (0.3, 0.3, 0.3)  # tiny grids at large minsize: keep the flow alive
    det = _detector(
        nets_and_detector, thresholds=low, min_face_size=minsize,
        pnet_topk=4096,
    )
    pnet, rnet, onet = nets_and_detector
    for vid_i, frames in enumerate(_videos(seed=7, n_frames=2)):
        ours = det.detect_batch(frames)
        for t, frame in enumerate(frames):
            want = oracle_detect(frame, pnet, rnet, onet, low, minsize=minsize)
            assert len(ours[t]) == len(want), (
                f"minsize {minsize} video {vid_i} frame {t}:"
                f" {len(ours[t])} vs oracle {len(want)}"
            )
            if len(want):
                np.testing.assert_allclose(
                    ours[t], want, atol=2e-2, rtol=0,
                    err_msg=f"minsize {minsize} video {vid_i} frame {t}",
                )
    if minsize > 120:
        assert all(len(b) == 0 for b in det.detect_batch(_videos()[0])), (
            "minsize above the image extent must detect nothing"
        )


def test_overlap_nms_stress_matches_oracle(nets_and_detector):
    """Hundreds of heavily overlapping proposals through all four NMS
    passes (per-scale 0.5, cross-scale 0.7, stage-2 0.7, stage-3 'Min'):
    low thresholds keep the population dense, so tie-breaking, ordering,
    and suppression semantics are all load-bearing."""
    low = (0.35, 0.35, 0.35)
    det = _detector(nets_and_detector, thresholds=low, pnet_topk=8192)
    pnet, rnet, onet = nets_and_detector
    frames = _videos(seed=5, n_frames=2)[1]
    ours = det.detect_batch(frames)
    total = 0
    for t, frame in enumerate(frames):
        want = oracle_detect(frame, pnet, rnet, onet, low)
        assert len(ours[t]) == len(want), f"frame {t}"
        if len(want):
            np.testing.assert_allclose(ours[t], want, atol=2e-2, rtol=0,
                                       err_msg=f"frame {t}")
        total += len(want)
    assert total >= 8, "low thresholds must keep a dense box population"


def test_crop_resize_matches_oracle_pad_on_edge_boxes(nets_and_detector):
    """Hand-built edge boxes straight through the stage-2 crop geometry:
    negative corners, beyond-extent corners, 1-pixel slivers, and a fully
    outside box (ours flags it invalid; the reference upstream would
    misalign — PARITY #22)."""
    from mintime_tpu.preprocessing.mtcnn import _crop_resize

    rng = np.random.default_rng(9)
    img = rng.integers(0, 255, (80, 100, 3)).astype(np.uint8)
    h, w = img.shape[:2]
    boxes = np.array(
        [
            [10.6, 12.2, 40.9, 44.1, 0.9],   # interior
            [-15.3, -9.7, 30.0, 35.0, 0.9],  # clipped at top-left
            [70.2, 50.5, 130.0, 95.0, 0.9],  # clipped at bottom-right
            [-20.0, 60.0, 25.0, 120.0, 0.9], # straddles bottom-left corner
            [5.7, 8.1, 6.9, 9.9, 0.9],       # 1-pixel sliver after trunc
            [120.0, 20.0, 150.0, 50.0, 0.9], # fully outside right
        ],
        np.float32,
    )
    crops, valid = _crop_resize(img, boxes, 24)
    assert valid.tolist() == [True, True, True, True, True, False]
    imgs = torch.tensor(img[None].astype(np.float32)).permute(0, 3, 1, 2)
    keep = boxes[valid]
    y, ey, x, ex = _pad(keep, w, h)
    want = _stage_crops(imgs, keep, y, ey, x, ex, 24)
    want = want.numpy().transpose(0, 2, 3, 1) / 0.0078125 + 127.5
    np.testing.assert_allclose(crops[valid], want, atol=1e-2, rtol=0)


def test_per_frame_matches_batch(nets_and_detector):
    pnet, rnet, onet = nets_and_detector
    det = MTCNNDetector(
        mtcnn_params_from_torch(
            pnet.state_dict(), rnet.state_dict(), onet.state_dict()
        ),
        thresholds=THRESHOLDS,
        pnet_topk=2048,
    )
    frames = _videos()[0]
    batched = det.detect_batch(frames)
    for t, frame in enumerate(frames):
        single = det.detect(frame)
        assert len(single) == len(batched[t])
        if len(single):
            np.testing.assert_allclose(single, batched[t], atol=1e-5)
