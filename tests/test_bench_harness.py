"""Pure-math tests for the scaling harness's out-of-band pair re-run
(bench.py::_rerun_out_of_band_pairs) — the r5 response to window 22, where
one host-stalled pair contaminated the per-leg medians through cross-pair
mixing. No Spark: the rerun callable is faked."""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _probe_band_deviation, _rerun_out_of_band_pairs


def _pair(p8, p32, t8=10_000.0, t32=30_000.0):
    return {"probe8": p8, "probe32": p32, "t8": t8, "t32": t32}


# window 22's actual probe readings: pair 1's 32-leg stalled
W22 = lambda: [_pair(107.05, 244.2), _pair(96.04, 380.87), _pair(132.28, 403.64)]


def test_in_band_pairs_trigger_no_rerun():
    pairs = [_pair(100, 380), _pair(105, 390), _pair(98, 400)]
    calls = []
    displaced = _rerun_out_of_band_pairs(pairs, lambda: calls.append(1), reruns=2)
    assert displaced == [] and calls == []


def test_window22_stalled_pair_is_rerun_and_displaced():
    pairs = W22()
    stalled = pairs[0]
    fresh = _pair(120.0, 395.0)
    displaced = _rerun_out_of_band_pairs(pairs, lambda: dict(fresh), reruns=2)
    assert displaced == [stalled]
    assert stalled not in pairs and fresh in pairs
    # after the replacement everything is in band — one rerun was enough
    assert len(pairs) == 3


def test_band_tightens_after_replacement_cascade_bounded_by_allowance():
    """Replacing the stalled pair re-computes the band; a sibling that was
    marginal against the OLD band (window 22's turbo-8-leg pair 3, probe8
    132.28) can land out of the tightened one and consume the next
    allowance. The cascade only ever swaps out-of-band pairs for in-band
    ones and is hard-bounded by the rerun allowance."""
    pairs = W22()
    seq = iter([_pair(110.0, 395.0), _pair(112.0, 398.0), _pair(111.0, 396.0)])
    displaced = _rerun_out_of_band_pairs(pairs, lambda: next(seq), reruns=2)
    assert len(displaced) == 2  # stalled pair 1, then marginal pair 3
    assert all("rerun_rejected" not in d for d in displaced)
    assert len(pairs) == 3
    # every surviving probe is now within the band of its siblings
    import statistics

    p8m = statistics.median(p["probe8"] for p in pairs)
    p32m = statistics.median(p["probe32"] for p in pairs)
    assert all(_probe_band_deviation(p, p8m, p32m) <= 0.20 for p in pairs)


def test_rejected_rerun_keeps_original_and_stops():
    pairs = W22()
    original = list(pairs)
    also_stalled = _pair(107.0, 200.0)  # the re-run hit another stall
    calls = []

    def rerun():
        calls.append(1)
        return dict(also_stalled)

    displaced = _rerun_out_of_band_pairs(pairs, rerun, reruns=2)
    assert pairs == original  # nothing replaced
    assert len(calls) == 1  # stopped after the first rejected attempt
    assert displaced[0]["rerun_rejected"] is True


def test_fewer_than_three_pairs_skips_band_logic():
    pairs = [_pair(100, 400), _pair(50, 150)]  # wildly divergent but n=2
    assert _rerun_out_of_band_pairs(pairs, lambda: 1 / 0, reruns=2) == []


def test_reruns_zero_disables():
    pairs = W22()
    assert _rerun_out_of_band_pairs(pairs, lambda: 1 / 0, reruns=0) == []


def test_band_deviation_is_worst_leg():
    p = _pair(80.0, 400.0)
    # 8-leg 20% low vs median 100, 32-leg exactly at median
    assert abs(_probe_band_deviation(p, 100.0, 400.0) - 0.2) < 1e-9
    # 32-leg 50% low dominates
    assert abs(_probe_band_deviation(_pair(100, 200), 100.0, 400.0) - 0.5) < 1e-9
