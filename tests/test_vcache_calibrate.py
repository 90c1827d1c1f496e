"""Velocity-cache calibration harness: selection logic, the hermetic
end-to-end sweep, and bench.py's headline-eligibility gating.

Quality-evidence tiers (strongest first): a REAL-weight calibration whose
selected schedule passed the score/latent gates; a LITERATURE anchor
(schedule family quality-evaluated on public FLUX.1-dev in the cited
papers — bench runs it when no real artifact exists); SYNTHETIC harness
validation, which never leads the headline sweep.
"""

import json
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from reflectionflow_tpu.sampler.vcache_calibrate import (
    calibrate,
    default_candidates,
    load_calibration,
    save_calibration,
    select_schedule,
)


def _row(name, speedup, err, drop=None):
    r = {"name": name, "vcache": {"interval": 2}, "n_full": 10,
         "speedup_est": speedup, "latent_rel_err": err, "latent_rel_err_max": err}
    if drop is not None:
        r["score_drop"] = drop
    return r


def test_select_schedule_gates_and_tiebreaks():
    rows = [
        _row("fast_bad_quality", 3.0, 0.1, drop=1.0),   # fails score gate
        _row("fast_bad_latent", 3.0, 0.9, drop=0.0),    # fails latent gate
        _row("ok_slow", 1.5, 0.05, drop=0.1),
        _row("ok_fast", 2.5, 0.2, drop=0.2),
    ]
    sel = select_schedule(rows, eps_score=0.25, max_latent_rel_err=0.35)
    assert sel["name"] == "ok_fast"
    # equal speedup -> lower latent error wins
    rows = [_row("a", 2.0, 0.3, drop=0.0), _row("b", 2.0, 0.1, drop=0.0)]
    assert select_schedule(rows)["name"] == "b"
    # no score field -> latent gate alone
    rows = [_row("nv", 2.0, 0.1)]
    assert select_schedule(rows)["name"] == "nv"
    # nothing passes -> None (never promote a failed sweep)
    assert select_schedule([_row("x", 9.0, 0.99, drop=9.0)]) is None


def test_calibrate_hermetic_dense_is_exact(tmp_path):
    """The library end-to-end on a tiny pipeline: an interval-1 'schedule'
    (every step full) must match the dense trajectory exactly, skipping
    schedules report fewer full forwards + a positive error, and the
    artifact round-trips with the honesty tag."""
    from reflectionflow_tpu.config import (
        CLIPTextConfig, FluxDiTConfig, FluxVAEConfig, T5Config,
    )
    from reflectionflow_tpu.sampler.pipeline import FluxPipeline
    from reflectionflow_tpu.verifiers import FakeVerifier

    pipe = FluxPipeline.random_init(
        jax.random.PRNGKey(0), dit_cfg=FluxDiTConfig.tiny(), vae_cfg=FluxVAEConfig.tiny(),
        t5_cfg=T5Config.tiny(), clip_cfg=CLIPTextConfig.tiny(), dtype=jnp.float32,
    )
    cands = [
        {"name": "interval1", "vcache": {"interval": 1}},
        {"name": "interval3", "vcache": {"interval": 3, "warmup": 2, "tail": 1}},
    ]
    res = calibrate(
        pipe, ["a cat", "a dog"], verifier=FakeVerifier(), height=16, width=16,
        num_steps=6, candidates=cands, eps_score=10.0, max_latent_rel_err=1.0,
    )
    by_name = {r["name"]: r for r in res["results"]}
    assert by_name["interval1"]["n_full"] == 6
    assert by_name["interval1"]["latent_rel_err"] == 0.0
    assert by_name["interval1"]["score_drop"] == 0.0
    assert by_name["interval3"]["n_full"] < 6
    assert by_name["interval3"]["latent_rel_err"] > 0.0
    # wide-open gates -> the faster schedule wins
    assert res["selected"] == "interval3"

    save_calibration(str(tmp_path / "cal.json"), res, "synthetic", "fake")
    loaded = load_calibration(str(tmp_path / "cal.json"))
    assert loaded["weights_kind"] == "synthetic"
    assert loaded["selected_vcache"] == by_name["interval3"]["vcache"]
    # the honesty tag is mandatory and validated
    try:
        save_calibration(str(tmp_path / "bad.json"), res, "maybe", None)
        raise AssertionError("weights_kind 'maybe' should be rejected")
    except ValueError:
        pass


def test_save_calibration_refuses_headline_tier_without_scores(tmp_path):
    """Gate hardening (VERDICT r4 weak item 5): the sensitivity sweep shows
    latent error does not bound score drop (interval2: rel_err 0.089, drop
    2.35), so a verifier-free (score-less) selection must never be saved as
    weights_kind='real' — that tag is what makes a calibration
    headline-eligible in bench.py."""
    import pytest

    scoreless = {
        "results": [_row("nv", 2.0, 0.1)],  # no score_drop field
        "selected": "nv",
        "selected_vcache": {"interval": 2},
    }
    with pytest.raises(ValueError, match="verifier-scored"):
        save_calibration(str(tmp_path / "cal.json"), scoreless, "real", None)
    # the same evidence is fine at the synthetic (never-headline) tier
    save_calibration(str(tmp_path / "cal.json"), scoreless, "synthetic", None)
    # and a scored selection may be promoted to the real tier
    scored = {
        "results": [_row("ok", 2.0, 0.1, drop=0.05)],
        "selected": "ok",
        "selected_vcache": {"interval": 2},
    }
    save_calibration(str(tmp_path / "cal2.json"), scored, "real", "nvila_jax")
    assert load_calibration(str(tmp_path / "cal2.json"))["weights_kind"] == "real"
    # a failed sweep (no selection) has nothing to promote — saving the
    # evidence table itself is allowed at either tier
    save_calibration(str(tmp_path / "cal3.json"),
                     {"results": [], "selected": None, "selected_vcache": None},
                     "real", "nvila_jax")


def test_default_candidates_cover_both_modes():
    names = [c["name"] for c in default_candidates()]
    assert any(n.startswith("interval") for n in names)
    assert any(n.startswith("threshold") for n in names)
    # Taylor-predicted variants sweep too (deeper intervals at order > 0)
    assert any(c["vcache"].get("order") for c in default_candidates())


def test_anchor_calibration_shape_and_math():
    """The literature anchor must be calibration-shaped (bench reads the
    same keys as a real artifact), carry its citation, and compute the
    structural n_full from the actual step mask."""
    from reflectionflow_tpu.sampler.generate import make_step_mask
    from reflectionflow_tpu.sampler.vcache_calibrate import (
        HEADLINE_ANCHOR,
        LITERATURE_ANCHORS,
        anchor_calibration,
    )

    cal = anchor_calibration(30)
    assert cal["weights_kind"] == "literature"
    assert cal["selected"] == HEADLINE_ANCHOR
    row = cal["results"][0]
    vc = row["vcache"]
    # The headline anchor is the METHOD-EXACT TeaCache config: dynamic
    # threshold (data-dependent skip count -> n_full is None, speedup_est
    # carries the citation's published operating point), residual cache.
    assert "threshold" in vc and vc["residual"] and vc["poly"]
    assert row["n_full"] is None
    assert row["speedup_est"] == 2.0 and "published" in row["speedup_basis"]
    assert "arXiv" in row["quality_basis"]
    assert "METHOD-EXACT" in row["quality_basis"]
    assert cal["selected_vcache"] is vc and cal["settings"]["num_steps"] == 30

    # static anchors still compute structural n_full from the step mask
    cal_t = anchor_calibration(30, name="taylor_o2_interval6")
    row_t = cal_t["results"][0]
    vc_t = row_t["vcache"]
    assert row_t["n_full"] == int(make_step_mask(
        30, vc_t["interval"], warmup=vc_t["warmup"], tail=vc_t["tail"]).sum()) == 9
    assert row_t["speedup_est"] == round(30 / 9, 3)
    # every shipped anchor cites its source and parses through the one
    # schedule grammar
    from reflectionflow_tpu.sampler.generate import vcache_kwargs

    for name, a in LITERATURE_ANCHORS.items():
        assert "arXiv" in a["anchor"], name
        assert vcache_kwargs(a["vcache"], 30)


def test_teacache_preset_matches_method_exact_schedule():
    """The shipped serving preset carries EXACTLY the method-exact TeaCache
    schedule (one source of truth: teacache_flux_schedule)."""
    import os

    from reflectionflow_tpu.config import TTSConfig
    from reflectionflow_tpu.sampler.vcache_calibrate import teacache_flux_schedule

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = TTSConfig.load(os.path.join(repo, "configs", "flux.1_dev_qwenscore_v5e_teacache.json"))
    want = teacache_flux_schedule()
    got = dict(cfg.pipeline_args.vcache)
    got["residual"] = bool(got["residual"])
    assert got == want


def test_bench_vcache_headline_gating(tmp_path, monkeypatch):
    """Evidence-tier policy: with no real-weight artifact the headline
    source is the shipped literature anchor (vcache stage still leads);
    a synthetic artifact is IGNORED by the headline source (it only runs
    via explicit env override, and never persists the record); a
    real-weight artifact supersedes the anchor; a real artifact whose
    sweep selected nothing falls back to the anchor."""
    import bench

    monkeypatch.delenv("REFLECTIONFLOW_VCACHE_CALIBRATION", raising=False)
    monkeypatch.setattr(bench, "VCACHE_CALIBRATION_PATH", tmp_path / "none.json")
    assert bench._sweep_stages()[0] == "e2e_swap_vcache"
    assert bench._headline_vcache_source()["weights_kind"] == "literature"

    cal = {"selected": "interval3", "selected_vcache": {"interval": 3},
           "results": [{"name": "interval3", "vcache": {"interval": 3},
                        "n_full": 10, "speedup_est": 3.0, "latent_rel_err": 0.1}],
           "settings": {"num_steps": 30}, "weights_kind": "synthetic"}
    p = tmp_path / "cal.json"
    p.write_text(json.dumps(cal))
    monkeypatch.setattr(bench, "VCACHE_CALIBRATION_PATH", p)
    src = bench._headline_vcache_source()
    assert src["weights_kind"] == "literature"  # synthetic: never headline
    assert not bench._vcache_headline_eligible(cal)

    cal["weights_kind"] = "real"
    p.write_text(json.dumps(cal))
    assert bench._headline_vcache_source()["weights_kind"] == "real"
    assert bench._sweep_stages()[0] == "e2e_swap_vcache"

    # a real calibration whose sweep selected nothing cannot back the
    # stage — the anchor takes over rather than running gate-failed skips
    cal["selected_vcache"] = None
    p.write_text(json.dumps(cal))
    assert bench._headline_vcache_source()["weights_kind"] == "literature"


def test_vcache_calibrate_tool_and_tiny_bench_stage(tmp_path):
    """Turn-key chain, hermetically: the calibration tool writes an
    artifact, then `bench.py --tiny --stage e2e_swap_vcache` consumes it
    and emits a one-line measurement whose config names the calibrated
    schedule and whose detail carries the selection evidence."""
    import bench

    out = tmp_path / "cal.json"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "vcache_calibrate.py"),
         "--synthetic_weights", "--prompts", "2", "--steps", "4", "--out", str(out)],
        capture_output=True, text=True, timeout=600, cwd=root,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    cal = json.loads(out.read_text())
    assert cal["weights_kind"] == "synthetic"
    assert cal["results"] and {"n_full", "speedup_est", "latent_rel_err"} <= set(cal["results"][0])

    if cal["selected_vcache"] is None:  # tiny-synthetic sweep may gate everything out
        return
    env = dict(os.environ, REFLECTIONFLOW_VCACHE_CALIBRATION=str(out))
    proc = subprocess.run(
        [sys.executable, bench.__file__, "--tiny", "--stage", "e2e_swap_vcache"],
        capture_output=True, text=True, timeout=600, env=env, cwd=root,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = json.loads(proc.stdout.strip().splitlines()[-1])
    d = line["detail"]
    assert "vcache(synthetic:" in d["config"]
    assert d["vcache_evidence"]["weights_kind"] == "synthetic"
    assert d["vcache_evidence"]["selected"]["name"] == cal["selected"]
    assert d["n_full_forwards"] >= 1
