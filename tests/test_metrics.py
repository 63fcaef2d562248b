"""Metrics + attention-aggregation tests (sklearn as ground truth where
available)."""

import numpy as np
import pytest

from mintime_tpu.utils.attention_viz import aggregate_attentions
from mintime_tpu.utils.metrics import (
    accuracy,
    check_correct,
    evaluation_report,
    f1_score,
    roc_auc,
    sigmoid,
)


class TestMetrics:
    def test_check_correct(self):
        logits = [2.0, -3.0, 0.5, -0.1]  # sigmoid-round: 1, 0, 1, 0
        labels = [1, 0, 0, 1]
        correct, pos, neg = check_correct(logits, labels)
        assert (correct, pos, neg) == (2, 2, 2)

    def test_check_correct_multiclass_errors(self):
        logits = [2.0, -3.0]
        labels = [0, 1]  # both wrong
        mc = [3.0, float("nan")]
        errors = {3.0: [0], 5.0: [0]}
        correct, pos, neg, errors, vid_errors = check_correct(
            logits, labels, mc, errors, videos_ids=["a", "b"]
        )
        assert correct == 0
        assert errors[3.0][0] == 1
        assert vid_errors == ["a", "b"]

    def test_auc_matches_sklearn(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        for _ in range(10):
            y = rng.integers(0, 2, 50)
            if y.min() == y.max():
                continue
            s = rng.random(50)
            s[::7] = s[0]  # inject ties
            np.testing.assert_allclose(
                roc_auc(y, s), sk.roc_auc_score(y, s), atol=1e-12
            )

    def test_f1_matches_sklearn(self, rng):
        sk = pytest.importorskip("sklearn.metrics")
        y = rng.integers(0, 2, 100)
        p = rng.integers(0, 2, 100)
        np.testing.assert_allclose(f1_score(y, p), sk.f1_score(y, p), atol=1e-12)

    def test_report(self):
        logits = np.array([5.0, -5.0, 5.0, -5.0])
        labels = np.array([1, 0, 0, 1])
        rep = evaluation_report(logits, labels, [np.nan, np.nan, 2.0, 4.0])
        assert rep["accuracy"] == 0.5
        assert rep["per_method_errors"] == {2.0: 1, 4.0: 1}


class TestAggregateAttentions:
    def test_shapes_and_normalization(self):
        heads, F, n = 2, 8, 4
        N = 1 + F * n
        rng = np.random.default_rng(0)
        attns = [rng.random((heads, 1, N)) * 1e-4 for _ in range(2)]
        frames_per_identity = [4, 8]  # cumulative
        agg, per_identity = aggregate_attentions(attns, heads, F, frames_per_identity)
        assert len(agg) == 3  # space, time, combined
        for a in agg:
            assert len(a) == F
            np.testing.assert_allclose(np.sum(a), 1.0, rtol=1e-9)
        assert len(per_identity) == 2

    def test_reference_identity_ranges(self):
        """identity sums use the reference's exact [prev-1 : cur-1] slicing
        (utils.py:87-95)."""
        heads, F, n = 1, 4, 1
        N = 1 + F * n
        # craft combined attention concentrated on frame 0
        a = np.zeros((heads, 1, N))
        a[..., 1] = 1e-3  # token of frame 0
        agg, per_identity = aggregate_attentions([a, a], heads, F, [2, 4])
        # identity 0 sums frames [0, 2-1) = frame 0 only
        assert per_identity[0] == pytest.approx(float(agg[-1][0]))
        # identity 1 sums frames [1, 3)
        assert per_identity[1] == pytest.approx(float(np.sum(agg[-1][1:3])))


def test_op_stats_requires_trace_dir(tmp_path):
    """op_stats raises cleanly on an empty/missing trace directory."""
    import pytest as _pytest

    from mintime_tpu.utils.profiling import op_stats

    with _pytest.raises(FileNotFoundError):
        op_stats(str(tmp_path))
