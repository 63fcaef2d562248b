"""Native greedy-NMS (mintime_tpu/native/nms.c) vs the numpy oracle.

The C recurrence must produce BIT-equal keep sets to the numpy loops in
preprocessing/mtcnn.py for both flavors (torchvision semantics and the
MATLAB +1 / 'min' flavor), across dtypes, score ties, degenerate and
NaN/inf boxes — the numpy implementations remain in place as the fallback
and as this oracle."""

import numpy as np
import pytest

import mintime_tpu.native as native
from mintime_tpu.preprocessing.mtcnn import nms, nms_tv

# NOT a module-level skipif: the build-guard test below must RUN (and fail)
# when the native tier silently stops building — a skip would defeat it
_needs_native = pytest.mark.skipif(
    native._lib is None, reason="native tier unavailable (no C compiler)"
)


def _numpy_only(monkeypatch):
    monkeypatch.setattr(native, "greedy_nms", lambda *a, **k: None)


def _random_boxes(rng, n, dtype, wild=False):
    cx = rng.uniform(0, 200, n)
    cy = rng.uniform(0, 200, n)
    s = rng.uniform(0.5, 60, n)
    boxes = np.stack([cx - s / 2, cy - s / 2, cx + s / 2, cy + s / 2], 1)
    if wild and n >= 8:
        boxes[0] = [10, 10, 10, 10]  # zero-area
        boxes[1] = [50, 50, 30, 30]  # inverted
        boxes[2, 2] = np.nan
        boxes[3, 1] = np.inf
        boxes[4] = boxes[5]  # exact duplicate
    return boxes.astype(dtype)


@_needs_native
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("flavor", ["tv", "union", "min"])
def test_native_matches_numpy(monkeypatch, dtype, flavor):
    rng = np.random.default_rng(42)
    for trial in range(25):
        n = int(rng.integers(0, 600))
        boxes = _random_boxes(rng, n, dtype, wild=trial % 3 == 0)
        # quantized scores force ties → exercises both argsort contracts
        scores = (rng.uniform(0, 1, n) * 8).round() / 8
        scores = scores.astype(dtype)
        thr = [0.5, 0.7][trial % 2]
        if flavor == "tv":
            run = lambda: nms_tv(boxes, scores, thr)
        else:
            run = lambda: nms(boxes, scores, thr, method=flavor)
        got = run()
        with pytest.MonkeyPatch.context() as mp:
            mp.setattr(native, "greedy_nms", lambda *a, **k: None)
            want = run()
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_native_is_actually_used():
    """Guard against silently falling back: the built library must load on
    this image (gcc is part of the baked toolchain). Deliberately NOT
    skipped when _lib is None — that is exactly the regression this test
    exists to catch."""
    assert native._lib is not None, (
        "native NMS failed to build/load — the cascade is silently running "
        "the ~30x slower numpy fallback"
    )
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11]], np.float32)
    order = np.array([0, 1])
    out = native.greedy_nms(
        boxes, order, 0.5, method_min=False, plus_one=False
    )
    assert out is not None and out.tolist() == [0]
    np.testing.assert_array_equal(order, [0, 1])  # caller's order unmutated
