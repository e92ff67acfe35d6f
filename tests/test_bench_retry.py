"""bench.py's noise-retry (VERDICT r6 #2).

Ambient co-tenant noise inflates individual bench queries 2-3x in ways
the driver-poll band detector can't see. bench.py re-runs a query once
when its measurement exceeds 2x the committed clean reference (and no
poll explains it), keeping the min and emitting both raw values. These
tests pin the trigger decision and the reference loader without running
any Spark.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402


def test_synthetic_noise_triggers_retry():
    # clean ref 3.6s, ambient-noise measurement 12.4s (the real st33
    # r6 artifact shape): 12.4 > 2*3.6 and delta > 1s -> retry
    assert bench._should_retry(12.4, 3.6, poll_overlapped=False)


def test_clean_measurement_is_not_retried():
    assert not bench._should_retry(4.1, 3.6, poll_overlapped=False)


def test_poll_overlap_suppresses_retry():
    # poll contamination is flagged via suspect_band instead; a retry
    # inside the poll's window would be just as contaminated
    assert not bench._should_retry(12.4, 3.6, poll_overlapped=True)


def test_no_reference_means_no_retry():
    assert not bench._should_retry(12.4, None, poll_overlapped=False)


def test_subsecond_jitter_ignored():
    # 0.1s -> 0.35s is >2x but under the 1s delta floor
    assert not bench._should_retry(0.35, 0.1, poll_overlapped=False)


def test_reference_loader_reads_queries_map(monkeypatch, tmp_path):
    (tmp_path / "BENCH_REFERENCE.json").write_text(
        json.dumps({"queries": {"q1": 1.5, "bad": "x"}, "_comment": "c"})
    )
    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(tmp_path))
    assert bench._load_reference() == {"q1": 1.5}


def test_reference_loader_missing_file_is_silent(monkeypatch, tmp_path):
    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(tmp_path))
    assert bench._load_reference() == {}
