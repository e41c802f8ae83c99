"""Pin bench.py's cross-run best-merge rules.

The store exists so one clean rerun heals a throttled record
(BENCH/BASELINE.md round-5 reconciliation); a wrong merge direction
silently publishes the WORST run instead.  Regression pinned here:
"probe_block_keys_per_sec" also ends with "_sec", so the min-rule
suffix check must not shadow the throughput max-rule.
"""
import importlib.util
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", os.path.join(_REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_keys_per_sec_suffix_not_shadowed_by_sec():
    b = _bench()
    # throughput rows merge toward the BEST (max) run
    assert b._extras_merge_rule("probe_block_keys_per_sec") == "max"
    assert b._extras_merge_rule("build_block_keys_per_sec") == "max"
    assert b._extras_merge_rule("scaling_build_keys_per_s") == "max"
    # latency rows merge toward the best (min) run
    assert b._extras_merge_rule("taffy_block_probe_ns_per_key") == "min"
    assert b._extras_merge_rule("build_block_sec") == "min"
    # unrecognized rows keep the latest value
    assert b._extras_merge_rule("build_block_strategy") is None
    assert b._extras_merge_rule("tbf_grown_forest_levels") is None


def test_merge_num_directions():
    b = _bench()
    assert b._merge_num(2_469_291, 1_023_459, "max") == 2_469_291
    assert b._merge_num(2_469_291, 1_023_459, "min") == 1_023_459
    assert b._merge_num(None, 7, "max") == 7
    assert b._merge_num(7, None, "min") == 7
