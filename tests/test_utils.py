"""Utility-module coverage: tree paths/updates, timers, jsonl recovery."""

import json
import time

import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.utils.jsonl import (
    append_jsonl,
    read_jsonl,
    recover_json_from_text,
    write_jsonl,
)
from reflectionflow_tpu.utils.timing import PhaseTimer
from reflectionflow_tpu.utils.tree import cast_tree, tree_bytes, tree_paths, tree_size, update_path


def test_tree_paths_and_update():
    tree = {"a": {"b": jnp.zeros((2, 2))}, "c": [jnp.ones((3,)), jnp.ones((4,))]}
    paths = dict(tree_paths(tree))
    assert set(paths) == {"a/b", "c/0", "c/1"}
    assert tree_size(tree) == 4 + 3 + 4
    new = update_path(tree, "c/1", jnp.full((4,), 7.0))
    assert float(new["c"][1][0]) == 7.0
    assert float(tree["c"][1][0]) == 1.0  # original untouched
    assert tree_bytes(tree) > 0


def test_cast_tree_keeps_ints():
    tree = {"w": jnp.ones((2,), jnp.float32), "idx": jnp.ones((2,), jnp.int32)}
    out = cast_tree(tree, jnp.bfloat16)
    assert out["w"].dtype == jnp.bfloat16
    assert out["idx"].dtype == jnp.int32


def test_phase_timer_percentiles():
    t = PhaseTimer()
    for dur in (0.01, 0.02, 0.03):
        with t.span("x"):
            time.sleep(dur)
    s = t.summary()
    assert s["x"]["count"] == 3
    assert s["x"]["p50_s"] >= 0.015
    assert s["x"]["total_s"] >= 0.055


def test_jsonl_roundtrip(tmp_path):
    p = tmp_path / "x.jsonl"
    write_jsonl(p, [{"a": 1}, {"b": 2}])
    append_jsonl(p, {"c": 3})
    rows = read_jsonl(p)
    assert rows == [{"a": 1}, {"b": 2}, {"c": 3}]


def test_recover_json_variants():
    assert recover_json_from_text('{"x": 1}') == {"x": 1}
    assert recover_json_from_text('```json\n{"x": 2}\n```') == {"x": 2}
    assert recover_json_from_text('the answer is {"x": 3} ok?') == {"x": 3}
    assert recover_json_from_text("scores: [1, 2, 3] done") == [1, 2, 3]
    try:
        recover_json_from_text("no json here")
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_phase_timer_counts_and_rate():
    """SURVEY §5 candidates/sec metric plumbing: counters + rate()."""
    import time as _time

    from reflectionflow_tpu.utils.timing import PhaseTimer

    t = PhaseTimer()
    with t.span("generate"):
        _time.sleep(0.01)
    t.add_count("candidates", 4)
    t.add_count("candidates", 2)
    assert t.counts["candidates"] == 6
    assert t.rate("candidates", "generate") > 0
    # nan when the span never ran or the counter is absent
    assert t.rate("candidates", "missing") != t.rate("candidates", "missing")
    assert t.rate("missing", "generate") != t.rate("missing", "generate")
