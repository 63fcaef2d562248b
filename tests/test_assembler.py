"""Unit + property tests for the sequence assembler.

Hand-computed cases mirror the observable behavior of the reference's
``deepfakes_dataset.get_sorted_identities`` (deepfakes_dataset.py:123-188)
and mask/position generation (:314-329).
"""

import random

import numpy as np
import pytest

from mintime_tpu.data import (
    IdentityFaces,
    assign_slots,
    build_identities_mask,
    build_positions,
    build_sequence_plan,
    size_bucket,
    sort_identities,
    subsample_indices,
)


class TestAssignSlots:
    def test_single_identity_gets_all_frames(self):
        # Even with fewer available faces, a lone identity is assigned F
        # (dummy-padded later) — deepfakes_dataset.py:167-169.
        assert assign_slots([3], 16) == [16]
        assert assign_slots([100], 8) == [8]

    def test_two_identities_even_split(self):
        assert assign_slots([10, 10], 16) == [8, 8]

    def test_two_identities_deficit_flows_forward(self):
        # id0 has 5 < 8: deficit 3 flows to id1 (which has plenty).
        assert assign_slots([5, 20], 16) == [5, 11]

    def test_two_identities_backfill_from_surplus(self):
        # id0 has 12 > 8 (banks 4); id1 has 4 < 8+... : id1 short, backfill
        # from id0's bank.
        out = assign_slots([12, 4], 16)
        assert out == [12, 4]  # id0 8+4 backfilled, id1 4 → [12, 4]
        assert sum(out) == 16

    def test_dummy_padding_on_last_identity(self):
        out = assign_slots([2, 3], 16)
        # id0: 2 (<8, deficit 6 → id1 count 9); id1: 9 > 8 → 8, bank 1;
        # total 10 < 16 → backfill 1 from id1 → 11; still short 5 → pad last.
        assert sum(out) == 16
        assert out[0] == 2

    def test_three_identities(self):
        out = assign_slots([10, 10, 10], 16)
        # quotas [5, 5, 4]: all over quota → [5, 5, 4], total 14 < 16 →
        # backfill front-to-back from banks: id0 +2 → [7, 5, 4].
        assert out == [7, 5, 4]
        assert sum(out) == 16

    def test_four_identities(self):
        out = assign_slots([4, 4, 4, 4], 16)
        # quotas [5, 5, 2, 2]: id0 4<5 → id1 count 5; id1 5==5; id2 4>2 →
        # bank 2; id3 4>2 → bank 2 → [4, 5, 2, 2]=13 <16 → backfill id2 +2,
        # id3 +1 → [4, 5, 4, 3].
        assert out == [4, 5, 4, 3]
        assert sum(out) == 16

    @pytest.mark.parametrize("num_frames", [8, 16, 32])
    def test_property_sums_to_num_frames(self, num_frames):
        rnd = random.Random(42)
        for _ in range(500):
            n = rnd.randint(1, 4)
            counts = [rnd.randint(0, 40) for _ in range(n)]
            out = assign_slots(counts, num_frames)
            assert sum(out) == num_frames
            assert all(c >= 0 for c in out)


class TestSortIdentities:
    def _ids(self):
        return [
            IdentityFaces("a", frames=[1, 2], mean_side=50),
            IdentityFaces("b", frames=[1, 2, 3, 4], mean_side=150),
            IdentityFaces("c", frames=[1, 2, 3], mean_side=100),
        ]

    def test_by_size(self):
        assert [i.key for i in sort_identities(self._ids(), 0)] == ["b", "c", "a"]

    def test_by_length(self):
        assert [i.key for i in sort_identities(self._ids(), 1)] == ["b", "c", "a"]

    def test_random_is_permutation(self):
        out = sort_identities(self._ids(), 2, rng=random.Random(0))
        assert sorted(i.key for i in out) == ["a", "b", "c"]


class TestSubsample:
    def test_no_subsample_needed(self):
        np.testing.assert_array_equal(subsample_indices(5, 8), np.arange(5))

    def test_even_parity_matches_reference(self):
        # reference (index % 2 == 0): linspace(1, n-1, need)
        np.testing.assert_array_equal(
            subsample_indices(10, 4, parity=0),
            np.round(np.linspace(1, 9, 4)).astype(int),
        )

    def test_odd_parity_matches_reference(self):
        np.testing.assert_array_equal(
            subsample_indices(10, 4, parity=1),
            np.round(np.linspace(0, 8, 4)).astype(int),
        )


class TestMasksPositions:
    def test_identities_mask_block_diagonal(self):
        m = build_identities_mask([3, 5], 8)
        expect = np.zeros((8, 8), bool)
        expect[:3, :3] = True
        expect[3:, 3:] = True
        np.testing.assert_array_equal(m, expect)

    def test_positions_rank_ordered(self):
        # frames [30, 10, 20] → ranks [3, 1, 2]; P=2
        pos = build_positions([30, 10, 20], 2)
        assert pos[0] == 0  # CLS
        np.testing.assert_array_equal(pos[1:], [5, 6, 1, 2, 3, 4])

    def test_positions_duplicate_frames_share_rank(self):
        pos = build_positions([7, 7], 3)
        np.testing.assert_array_equal(pos, [0, 1, 2, 3, 1, 2, 3])

    def test_positions_bounds(self):
        f, p = 16, 49
        frames = list(range(0, 32, 2))[:f]
        pos = build_positions(frames, p)
        assert pos.shape == (1 + f * p,)
        assert pos.max() == f * p
        assert pos.min() == 0


class TestSizeBucket:
    def test_buckets(self):
        # ratio 0-5 → bucket 1 (SIZE_EMB_DICT[0] == (0, 5))
        assert size_bucket(10, 10, 100, 100) == 1  # ratio 1 → (0,5)
        assert size_bucket(32, 32, 100, 100) == 2  # ratio 10.2 → int 10 → (6,10)
        assert size_bucket(100, 100, 100, 100) == 20  # ratio 100 → (96,100)
        assert size_bucket(71, 71, 100, 100) == 10  # ratio 50.4 → 50 → (46,50)

    def test_legacy_predict_doubles(self):
        # predict.py omits the face-area halving → ratio 20 → (16,20) → 4
        assert size_bucket(32, 32, 100, 100, legacy_predict_double_ratio=True) == 4


class TestBuildSequencePlan:
    def test_single_identity_padding(self):
        ids = [IdentityFaces("identity_0", frames=[0, 30, 60], mean_side=80)]
        plan = build_sequence_plan(ids, num_frames=8, num_patches=49)
        assert plan.assigned == [8]
        np.testing.assert_array_equal(plan.mask, [1, 1, 1, 0, 0, 0, 0, 0])
        np.testing.assert_array_equal(plan.face_index[:3], [0, 1, 2])
        assert (plan.face_index[3:] == -1).all()
        # dummy frames repeat the max seen frame
        assert (plan.frame_numbers[3:] == 60).all()
        assert plan.identities_mask.all()  # one identity: full block
        assert plan.positions.shape == (1 + 8 * 49,)

    def test_legacy_all_ones_mask(self):
        ids = [IdentityFaces("identity_0", frames=[0, 30], mean_side=80)]
        plan = build_sequence_plan(
            ids, num_frames=8, num_patches=49, legacy_all_ones_mask=True
        )
        assert plan.mask.all()

    def test_two_identities(self):
        ids = [
            IdentityFaces("small", frames=list(range(0, 300, 30)), mean_side=40),
            IdentityFaces("big", frames=list(range(0, 300, 30)), mean_side=90),
        ]
        plan = build_sequence_plan(ids, num_frames=16, num_patches=49)
        assert plan.identity_keys == ["big", "small"]  # size-sorted desc
        assert plan.assigned == [8, 8]
        assert plan.mask.all()
        assert plan.identities_mask[:8, :8].all()
        assert not plan.identities_mask[:8, 8:].any()
        assert plan.tokens_per_identity == [("big", 8 * 49), ("small", 16 * 49)]

    def test_faces_time_sorted_within_identity(self):
        ids = [IdentityFaces("x", frames=[60, 0, 30], mean_side=10)]
        plan = build_sequence_plan(ids, num_frames=8, num_patches=1)
        np.testing.assert_array_equal(plan.frame_numbers[:3], [0, 30, 60])

    @pytest.mark.parametrize("parity", [0, 1])
    @pytest.mark.parametrize("num_frames", [8, 16, 32])
    def test_property_shapes(self, num_frames, parity):
        rnd = random.Random(7)
        for _ in range(100):
            n_ids = rnd.randint(1, 4)
            ids = [
                IdentityFaces(
                    f"id{k}",
                    frames=sorted(rnd.sample(range(1000), rnd.randint(1, 50))),
                    mean_side=rnd.random() * 200,
                )
                for k in range(n_ids)
            ]
            plan = build_sequence_plan(
                ids,
                num_frames=num_frames,
                num_patches=49,
                max_identities=rnd.randint(1, 4),
                ordering=rnd.randint(0, 2),
                parity=parity,
                rng=rnd,
            )
            F = num_frames
            assert plan.mask.shape == (F,)
            assert plan.identities_mask.shape == (F, F)
            assert plan.positions.shape == (1 + F * 49,)
            assert sum(plan.assigned) == F
            assert plan.positions.min() == 0 and plan.positions.max() <= F * 49
            # every slot's row in identities_mask covers its own slot
            assert all(plan.identities_mask[i, i] for i in range(F))
            # masked (real) faces reference valid face indices
            real = plan.mask
            assert (plan.face_index[real] >= 0).all()
            assert (plan.face_index[~real] == -1).all()
