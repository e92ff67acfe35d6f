"""bench.py's driver-poll contamination detector.

The driver polls PROGRESS.jsonl every ~15 min and the poll runs its
own Spark work; a bench query whose wall-clock window overlaps that
gets an inflated timing. ``bench._suspect_band`` turns that from
folklore into a machine-readable flag — these tests pin its overlap
semantics without running any Spark.
"""

from __future__ import annotations

import json
import sys

import pytest

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


@pytest.fixture()
def fake_progress(monkeypatch, tmp_path):
    """Point bench's PROGRESS.jsonl lookup at a writable stand-in."""
    p = tmp_path / "PROGRESS.jsonl"

    def write(ts_list):
        p.write_text(
            "".join(json.dumps({"ts": t}) + "\n" for t in ts_list)
        )

    monkeypatch.setattr(
        bench.os.path, "dirname", lambda _: str(tmp_path)
    )
    return write


def test_overlapping_queries_flagged(fake_progress):
    fake_progress([1100.0])
    starts = {"a": 1000.0, "b": 1010.0, "c": 1200.0, "d": 1300.0}
    timings = {"a": 5.0, "b": 100.0, "c": 2.0, "d": 3.0}
    # b: [1010, 1110] overlaps [1095, 1220]; c: [1200, 1202] inside it;
    # a ends at 1005 (before), d starts at 1300 (after)
    assert bench._suspect_band(starts, timings) == ["b", "c"]


def test_no_polls_in_window_means_no_flags(fake_progress):
    fake_progress([500.0, 99999.0])
    starts = {"a": 1000.0}
    timings = {"a": 5.0}
    assert bench._suspect_band(starts, timings) == []


def test_missing_progress_file_is_silent(monkeypatch, tmp_path):
    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(tmp_path))
    assert bench._suspect_band({"a": 1000.0}, {"a": 1.0}) == []


def test_poll_just_after_last_query_still_flags_it(fake_progress):
    # a poll recorded up to 5 s after the LAST query ends must still
    # flag that query (the prefilter's hi bound includes the +5 s the
    # per-query overlap test allows)
    fake_progress([1008.0])
    starts = {"a": 1000.0}
    timings = {"a": 5.0}  # ends 1005; poll at 1008 is within p-5 <= t1
    assert bench._suspect_band(starts, timings) == ["a"]


def test_malformed_lines_skipped(fake_progress, tmp_path):
    p = tmp_path / "PROGRESS.jsonl"
    p.write_text('not json\n{"ts": "string"}\n{"ts": 1100.0}\n')
    starts = {"a": 1100.0}
    timings = {"a": 1.0}
    assert bench._suspect_band(starts, timings) == ["a"]
