"""bench.py throttle defense: pure-function tests of the probe-based
clean-rep certification (no Spark — importing bench must not start a
session)."""

from __future__ import annotations

import importlib
import sys


def _bench():
    sys.path.insert(0, "/root/repo")
    return importlib.import_module("bench")


def _run(rep, cores, probe):
    return {"rep": rep, "cores": cores, "machine_hash_per_sec": probe}


def test_clean_reps_all_clean():
    b = _bench()
    lo, hi = b.SCALE_LOW, b.SCALE_HIGH
    runs = [
        _run(0, lo, 100.0), _run(0, hi, 220.0),
        _run(1, lo, 98.0), _run(1, hi, 210.0),
    ]
    clean, throttled = b._clean_reps_of(runs)
    assert clean == [0, 1] and not throttled


def test_clean_reps_detects_throttled_window():
    b = _bench()
    lo, hi = b.SCALE_LOW, b.SCALE_HIGH
    runs = [
        _run(0, lo, 100.0), _run(0, hi, 220.0),
        # rep 1 low-side ran at 40% of best low probe -> throttled
        _run(1, lo, 40.0), _run(1, hi, 215.0),
        _run(2, lo, 97.0), _run(2, hi, 208.0),
    ]
    clean, throttled = b._clean_reps_of(runs)
    assert clean == [0, 2] and throttled


def test_clean_reps_one_sided_throttle_kills_the_pair():
    """Efficiency is a per-rep low/high RATIO: one throttled side
    poisons the pair even if the other side was clean."""
    b = _bench()
    lo, hi = b.SCALE_LOW, b.SCALE_HIGH
    runs = [
        _run(0, lo, 100.0), _run(0, hi, 130.0),  # hi at 59% of best hi
        _run(1, lo, 99.0), _run(1, hi, 220.0),
    ]
    clean, throttled = b._clean_reps_of(runs)
    assert clean == [1] and throttled
