"""Unit tests for the calm-gate harness's per-repeat window logic
(scripts/calm_scaling.py).

The harness decides whether a 2->8-core scaling pair is honest evidence.
The inflate-risk side is the 2-core one (contention there makes it
slower, which INFLATES efficiency), so its acceptance logic — attribute
each in-flight probe sample to the benchmark repeat it completed in,
then accept the fastest repeat whose own window was calm — must be
exactly right.  These tests pin it without touching Spark.
"""

import importlib.util
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "calm_scaling",
    os.path.join(os.path.dirname(__file__), "..", "scripts", "calm_scaling.py"),
)
calm = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(calm)


class TestAnnotateSide:
    def test_samples_attributed_to_their_window(self):
        side = {"run_windows": [[100.0, 200.0], [200.0, 300.0]]}
        samples = [(150.0, 5.0), (160.0, 6.0), (250.0, 3.0)]
        calm.annotate_side_with_samples(side, samples)
        assert side["inflight_thr2"] == [5.0, 6.0, 3.0]
        assert side["inflight_min_thr2"] == 3.0
        assert side["repeat_inflight_min"] == [5.0, 3.0]

    def test_straddling_sample_charged_to_completion_window(self):
        # a probe that STARTED during repeat 0 but completed at t=200.0
        # (the boundary belongs to both closed intervals) is charged to
        # both; one completing just after goes only to repeat 1
        side = {"run_windows": [[100.0, 200.0], [200.0, 300.0]]}
        calm.annotate_side_with_samples(side, [(200.0, 4.0), (200.1, 2.0)])
        assert side["repeat_inflight_min"] == [4.0, 2.0]

    def test_window_with_no_samples_is_none(self):
        side = {"run_windows": [[100.0, 110.0], [110.0, 300.0]]}
        calm.annotate_side_with_samples(side, [(150.0, 5.5)])
        assert side["repeat_inflight_min"] == [None, 5.5]

    def test_no_samples_at_all(self):
        side = {"run_windows": [[100.0, 200.0]]}
        calm.annotate_side_with_samples(side, [])
        assert side["inflight_thr2"] == []
        assert side["inflight_min_thr2"] is None
        assert side["repeat_inflight_min"] == [None]

    def test_side_without_run_windows_key(self):
        # older bench.py output had no run_windows; the whole-side fields
        # must still populate and the per-repeat list be empty
        side = {}
        calm.annotate_side_with_samples(side, [(1.0, 5.0)])
        assert side["inflight_min_thr2"] == 5.0
        assert side["repeat_inflight_min"] == []


class TestSelectCleanRepeat:
    def test_fastest_clean_repeat_wins(self):
        # repeat 1 is fastest overall but its window dipped; repeat 2 is
        # the fastest CLEAN one
        got = calm.select_clean_repeat(
            [400.0, 380.0, 390.0], [5.5, 3.0, 5.2], min_inflight_thr2=5.0)
        assert got == (390.0, 2)

    def test_unprobed_window_counts_as_calm(self):
        got = calm.select_clean_repeat([420.0, 410.0], [None, 4.0], 5.0)
        assert got == (420.0, 0)

    def test_all_dipped_returns_none(self):
        assert calm.select_clean_repeat([400.0, 410.0], [2.0, 3.0], 5.0) is None

    def test_repeat_without_window_entry_is_excluded(self):
        # bench.py emits one window per repeat; a shorter list (e.g. an
        # old-format record) must not let the unattributed repeat through
        assert calm.select_clean_repeat([400.0, 390.0], [4.0], 5.0) is None

    def test_boundary_exactly_at_threshold_is_calm(self):
        assert calm.select_clean_repeat([400.0], [5.0], 5.0) == (400.0, 0)

    def test_single_clean_repeat(self):
        assert calm.select_clean_repeat([415.5], [5.9], 5.0) == (415.5, 0)


class TestGateDirectionInvariants:
    """The acceptance rules must only ever err in the DEFLATE direction
    (rejecting good pairs is safe; accepting inflated ones is not)."""

    def test_clean_selection_never_picks_a_dipped_faster_repeat(self):
        # even when the dipped repeat is much faster (the exact shape a
        # mid-run burst on the OTHER side's stragglers produces)
        got = calm.select_clean_repeat([300.0, 450.0], [1.0, 5.5], 5.0)
        assert got == (450.0, 1)

    @pytest.mark.parametrize("mins,expect_idx", [
        ([5.5, 5.5, 5.5], 0),   # all calm -> global fastest
        ([4.9, 5.5, 5.5], 1),   # fastest dipped -> next fastest
        ([4.9, 4.9, 5.5], 2),
    ])
    def test_ordering(self, mins, expect_idx):
        secs = [380.0, 390.0, 400.0]
        got = calm.select_clean_repeat(secs, mins, 5.0)
        assert got == (secs[expect_idx], expect_idx)
