"""Control-flow tests for bench.py's stage sweep and outage recovery.

bench.py is the driver-facing artifact: a regression in its fallback logic
silently costs the round its headline number. The device-touching stages run
in subprocesses, so the sweep itself is pure host control flow — testable by
stubbing subprocess.run.
"""

import subprocess
import sys
import types

import bench


def _args(batch=None, stage=None):
    return types.SimpleNamespace(batch=batch, stage=stage)


class _Proc:
    def __init__(self, rc=0, stdout="", stderr=""):
        self.returncode = rc
        self.stdout = stdout
        self.stderr = stderr


def test_try_stages_prints_first_success_and_skips_batch_stage(monkeypatch, capsys):
    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        stage = cmd[cmd.index("--stage") + 1]
        if stage == "e2e_swap":
            return _Proc(0, stdout='{"metric": "m", "value": 1}\n')
        return _Proc(1)

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._try_stages(_args()) is True
    out = capsys.readouterr().out.strip().splitlines()
    assert out[-1] == '{"metric": "m", "value": 1}'
    # sweep children know they're in a sweep (dense-fallback wording is
    # only true there — a standalone --stage run gets neutral wording)
    assert all("--in-sweep" in c for c in calls)
    tried = [c[c.index("--stage") + 1] for c in calls]
    # BEST_BATCH == 1 makes e2e_swap_batch redundant — it must be skipped
    assert bench.BEST_BATCH == 1
    assert "e2e_swap_batch" not in tried
    # best-first order (literature-anchored vcache leads), stopping at the
    # first success
    assert tried == ["e2e_swap_vcache", "e2e_swap_pipe", "e2e_swap"]


def test_try_stages_timeout_probes_service_then_continues(monkeypatch, capsys):
    seq = []

    def fake_run(cmd, **kw):
        if "--stage" in cmd:
            stage = cmd[cmd.index("--stage") + 1]
            seq.append(("stage", stage))
            if stage == "e2e_swap_vcache":
                raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))
            return _Proc(0, stdout='{"metric": "m", "value": 2}\n')
        seq.append(("probe", kw.get("timeout")))
        return _Proc(0, stdout="1.0\n")

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._try_stages(_args()) is True
    # a hung stage triggers a probe BEFORE the next stage launches, and the
    # probe must use the wedge-safe long timeout (never a sub-3000s kill)
    assert seq[0] == ("stage", "e2e_swap_vcache")
    assert seq[1][0] == "probe" and seq[1][1] >= 3000
    assert seq[2] == ("stage", "e2e_swap_pipe")
    assert capsys.readouterr().out.strip().endswith('{"metric": "m", "value": 2}')


def test_try_stages_timeout_with_hung_probe_aborts_sweep(monkeypatch, capsys):
    """Wedge mode: a stage timeout whose follow-up probe ALSO hangs means
    every remaining stage would burn its full hour — the sweep must abort
    to the caller's outage wait instead of marching on."""
    seq = []

    def fake_run(cmd, **kw):
        if "--stage" in cmd:
            seq.append(cmd[cmd.index("--stage") + 1])
            raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))  # probe hangs too

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._try_stages(_args()) is False
    assert seq == ["e2e_swap_vcache"]  # no further stages launched
    capsys.readouterr()


def test_try_stages_all_fail_returns_false(monkeypatch, capsys):
    monkeypatch.setattr(subprocess, "run", lambda cmd, **kw: _Proc(1))
    assert bench._try_stages(_args()) is False
    assert capsys.readouterr().out.strip() == ""


def test_explicit_batch_flows_into_stage_commands(monkeypatch, capsys):
    cmds = []

    def fake_run(cmd, **kw):
        cmds.append(cmd)
        return _Proc(0, stdout='{"metric": "m", "value": 3}\n')

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._try_stages(_args(batch=2)) is True
    assert cmds[0][-2:] == ["--batch", "2"]
    capsys.readouterr()


def test_probe_service_timeout_is_false_not_raise(monkeypatch):
    def fake_run(cmd, **kw):
        raise subprocess.TimeoutExpired(cmd, kw.get("timeout"))

    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench._probe_service(timeout_s=1) is False


def test_wait_for_service_recovers_and_gives_up(monkeypatch):
    monkeypatch.setattr(bench, "_probe_service", lambda timeout_s=3000.0: True)
    assert bench._wait_for_service(max_wait_s=1.0, poll_s=0.01) is True
    monkeypatch.setattr(bench, "_probe_service", lambda timeout_s=3000.0: False)
    assert bench._wait_for_service(max_wait_s=0.05, poll_s=0.01) is False


def test_stale_fallback_emits_last_recorded_measurement(monkeypatch, capsys, tmp_path):
    """A persistent outage (both sweeps fail, probe-wait exhausted) must
    still produce the one JSON line: the last hardware-validated record,
    loudly marked stale. With no record, main fails outright."""
    import json

    monkeypatch.setattr(bench, "LAST_BENCH_PATH", tmp_path / "LAST_BENCH.json")
    monkeypatch.setattr(bench, "LAST_BENCH_LOCAL_PATH", tmp_path / "LAST_BENCH.local.json")
    monkeypatch.setattr(bench, "_try_stages", lambda args: False)
    monkeypatch.setattr(bench, "_wait_for_service", lambda: False)
    monkeypatch.setattr(sys, "argv", ["bench.py"])

    # no record yet -> hard failure, never an invented number
    try:
        bench.main()
        raise AssertionError("main() should have raised SystemExit")
    except SystemExit as e:
        assert "all bench stages failed" in str(e)

    bench._record_last(json.dumps(
        {"metric": "m", "value": 0.1, "unit": "u", "vs_baseline": 1.0,
         "detail": {"t_image_s": 10.0}}))
    capsys.readouterr()
    bench.main()
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.1
    assert out["detail"]["stale"] is True
    assert "unavailable" in out["detail"]["stale_reason"]
    # the original detail survives alongside the stale marker
    assert out["detail"]["t_image_s"] == 10.0


def test_stale_fallback_requires_confirmed_outage(monkeypatch, capsys, tmp_path):
    """If the service probe ANSWERS but every stage still fails, that's a
    code/config regression — bench must fail loudly, never emit the stale
    record with a false 'service unavailable' reason."""
    import json

    monkeypatch.setattr(bench, "LAST_BENCH_PATH", tmp_path / "LAST_BENCH.json")
    monkeypatch.setattr(bench, "LAST_BENCH_LOCAL_PATH", tmp_path / "LAST_BENCH.local.json")
    bench._record_last(json.dumps({"metric": "m", "value": 0.1, "detail": {}}))
    monkeypatch.setattr(bench, "_try_stages", lambda args: False)
    monkeypatch.setattr(bench, "_wait_for_service", lambda: True)  # healthy!
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    try:
        bench.main()
        raise AssertionError("main() should have raised SystemExit")
    except SystemExit as e:
        assert "all bench stages failed" in str(e)
    assert capsys.readouterr().out.strip() == ""


def test_committed_last_bench_record_is_loadable():
    """docs/LAST_BENCH.json ships in-repo so the fallback works on a fresh
    clone; it must parse and carry the same contract fields bench prints."""
    import json

    rec = json.loads(bench.LAST_BENCH_PATH.read_text())
    assert rec["metric"] == "flux_1024px_candidate_images_per_sec_per_chip"
    assert {"value", "unit", "vs_baseline", "detail"} <= set(rec)
    assert rec["detail"].get("stale") is None  # recorded lines are never pre-marked


def test_tiny_pipe_stage_end_to_end():
    """--tiny runs the full e2e_swap_pipe stage body on CPU: phase-swap
    ordering, interpret-mode pallas denoise, per-image decode, the
    dispatch-then-fetch pipelined measurement, and the one-JSON-line
    contract. This is the hermetic guard for the stage the driver runs
    first on hardware."""
    import json

    proc = subprocess.run(
        [sys.executable, bench.__file__, "--tiny", "--stage", "e2e_swap_pipe"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["metric"] == "flux_1024px_candidate_images_per_sec_per_chip"
    d = out["detail"]
    assert d["pipelined_candidates"] == 2
    assert d["t_pipelined_total_s"] > 0
    assert "deferred fetch" in d["config"] and "TINY-CPU" in d["config"]
    # per-phase numbers stay in the detail alongside the pipelined total
    assert {"t_encode_s", "t_denoise_s", "t_decode_fetch_s"} <= set(d)
    # the self-audit contract fields ship in every e2e line; tiny-CPU runs
    # carry the derivation (flops, floor hash) but null the efficiency
    # claims the v5e floor model can't back on CPU
    assert {"flops_per_image_pflop", "floor_s", "floor_hash", "achieved_tflops",
            "pct_of_floor"} <= set(d)
    assert d["achieved_tflops"] is None and d["pct_of_floor"] is None
    assert len(d["floor_hash"]) == 12
    # dense lines carry the velocity-cache lever so BENCH_r*.json is
    # self-auditing: what the headline schedule buys and why this dense
    # line printed instead (the literature-anchored vcache stage leads the
    # sweep; a dense line means it failed at runtime)
    ov = d["vcache_lever"]
    assert ov["selected"] and ov["speedup_est"] is not None
    assert ov["weights_kind"] == "literature"
    # a standalone --stage run must NOT claim the vcache stage failed at
    # runtime (it was never attempted); that wording is sweep-only
    assert "explicit --stage run" in ov["not_this_line_because"]
    assert "did not produce a result" not in ov["not_this_line_because"]


def test_tiny_vcache_stage_end_to_end():
    """--tiny runs the headline e2e_swap_vcache stage body on CPU: the
    literature-anchored schedule resolves (real-weight artifact absent,
    synthetic artifact ignored), flows through vcache_kwargs into the
    interpret-mode denoise, and the printed line carries the full quality
    evidence (tier, basis, dense reference)."""
    import json

    proc = subprocess.run(
        [sys.executable, bench.__file__, "--tiny", "--stage", "e2e_swap_vcache"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    d = out["detail"]
    assert "vcache(literature:teacache_flux_t0.6)" in d["config"]
    ev = d["vcache_evidence"]
    assert ev["weights_kind"] == "literature"
    # the headline anchor is METHOD-EXACT TeaCache: no variant clause
    assert "METHOD-EXACT" in ev["selected"]["quality_basis"]
    assert "differs" not in ev["selected"]["quality_basis"]
    vc = ev["selected"]["vcache"]
    assert vc["threshold"] == 0.6 and vc["residual"] and len(vc["poly"]) == 5
    # dynamic schedule on a random-init tree: the skip rate must be pinned
    # to the published operating point (the signal is weight-dependent)
    pin = ev["operating_point_pin"]
    assert pin["n_full_pinned"] >= 2 and "published operating point" in pin["basis"]
    assert d["n_full_forwards"] == pin["n_full_pinned"]


def test_tiny_round_stage_end_to_end():
    """--tiny runs the e2e_round stage body on CPU: the real
    run_reflectionflow_block loop (2 rounds x branch 2) with the pinned
    headline vcache schedule, both prompt passes, and a round-latency
    metric line (BASELINE.json's third metric). TINY must not fake a
    hardware ratio (vs_baseline null)."""
    import json

    proc = subprocess.run(
        [sys.executable, bench.__file__, "--tiny", "--stage", "e2e_round"],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["metric"] == "p50_reflection_round_latency_s"
    assert out["unit"] == "s" and out["value"] > 0
    assert out["vs_baseline"] is None
    d = out["detail"]
    assert "vcache(literature:teacache_flux_t0.6)" in d["config"]
    assert d["round_candidates_per_sec_per_chip"] > 0
    fixed = d["phases_fixed_prompts"]
    assert fixed["round"]["count"] == 2 and fixed["generate"]["count"] >= 2
    # the refined pass exercises reflect+refine (the full loop)
    refined = d["phases_refined_prompts"]
    assert refined["reflect"]["count"] == 2 and refined["refine"]["count"] == 2
    assert d["vcache_operating_point_pin"]["n_full_pinned"] >= 2
    assert "NO round-latency number" in d["vs_baseline_basis"]


def test_sweep_is_led_by_literature_anchored_vcache(monkeypatch):
    """With no real-weight calibration artifact, the headline source is the
    shipped literature anchor and the vcache stage leads the sweep; a
    synthetic artifact must not change either fact; a real-weight artifact
    supersedes the anchor."""
    stages = bench._sweep_stages()
    assert stages[0] == "e2e_swap_vcache"

    src = bench._headline_vcache_source()
    assert src["weights_kind"] == "literature"
    # the method-exact TeaCache anchor leads (no variant clause); the
    # Taylor family variant stays as a measured alternate
    assert src["selected"] == "teacache_flux_t0.6"
    sel = src["results"][0]
    assert sel["speedup_est"] == 2.0  # the citation's published FLUX point
    assert sel["n_full"] is None  # dynamic: measured at bench time (pinned)

    real = {"selected_vcache": {"interval": 2}, "selected": "x", "results": [],
            "weights_kind": "real"}
    monkeypatch.setattr(bench, "_load_vcache_calibration", lambda: real)
    assert bench._headline_vcache_source() is real

    # an env-pointed artifact is the experiment the user asked for — the
    # stage runs it, but only real/literature tiers may persist the record
    synth = dict(real, weights_kind="synthetic")
    monkeypatch.setattr(bench, "_load_vcache_calibration", lambda: synth)
    monkeypatch.setenv("REFLECTIONFLOW_VCACHE_CALIBRATION", "/tmp/x.json")
    assert bench._vcache_stage_source() is synth
    assert not bench._vcache_headline_eligible(synth)
    monkeypatch.delenv("REFLECTIONFLOW_VCACHE_CALIBRATION")
    assert bench._vcache_stage_source()["weights_kind"] == "literature"
    monkeypatch.setattr(bench, "_load_vcache_calibration", lambda: real)
    assert bench._vcache_stage_source()["weights_kind"] == "real"


def test_round_stage_env_pointed_schedule(monkeypatch):
    """The round stage mirrors the vcache stage's env semantics: an
    env-pointed calibration is an explicit round-level experiment and runs
    whatever its tier; without the env var, a synthetic source must NOT
    reach the round's corrector generate (headline eligibility applies)."""
    captured = []

    def fake_passes(schedule):
        captured.append(schedule)
        return {"fixed_prompts": {"round": {"p50_s": 1.0, "p90_s": 1.0},
                                  "candidates_per_sec_per_chip": 1.0}}

    monkeypatch.setattr(bench, "TINY", True)
    monkeypatch.setattr(bench, "_tiny_round_passes", fake_passes)
    synth = {"selected_vcache": {"interval": 4, "warmup": 1, "tail": 1},
             "selected": "interval4",
             "results": [{"name": "interval4", "n_full": 8}],
             "weights_kind": "synthetic"}
    monkeypatch.setattr(bench, "_load_vcache_calibration", lambda: synth)

    monkeypatch.setenv("REFLECTIONFLOW_VCACHE_CALIBRATION", "/tmp/x.json")
    out = bench.bench_e2e_round(rtt=0.0)
    assert captured[-1] is not None and captured[-1]["interval"] == 4
    assert "vcache(synthetic:interval4)" in out["config"]

    monkeypatch.delenv("REFLECTIONFLOW_VCACHE_CALIBRATION")
    monkeypatch.setattr(bench, "_headline_vcache_source", lambda: synth)
    out2 = bench.bench_e2e_round(rtt=0.0)
    assert captured[-1] is None and "vcache" not in out2["config"]


def test_pinned_schedule_unit():
    """Dynamic schedules get their forward count pinned to the known
    operating point (random-init signal trajectories are meaningless):
    a calibration-measured n_full scales to the bench step count, a
    published speedup converts to a count, static schedules pass through."""
    cal = {"selected_vcache": {"threshold": 0.6}, "settings": {"num_steps": 15}}
    sched, pin = bench._pinned_schedule(cal, {"n_full": 5})
    assert sched["pin_n_full"] == round(5 * bench.NUM_STEPS / 15)
    assert "calibration-measured" in pin["basis"]

    sched2, pin2 = bench._pinned_schedule(
        {"selected_vcache": {"threshold": 0.6}}, {"n_full": None, "speedup_est": 2.0})
    assert sched2["pin_n_full"] == round(bench.NUM_STEPS / 2.0)
    assert "published operating point" in pin2["basis"]

    sched3, pin3 = bench._pinned_schedule(
        {"selected_vcache": {"interval": 6}}, {"n_full": 9})
    assert pin3 is None and "pin_n_full" not in sched3


def test_anchor_sweep_reference_covers_shipped_anchors():
    """Every TeaCache-threshold anchor we ship (the method-exact published
    operating points) must have a back-to-back hardware measurement in the
    recorded sweep note — the self-auditing contract is that a vcache bench
    line carries the measured number for each selectable anchor, and the
    measured vs-dense ratio must land near the citation's published speedup
    (the pin converts published speedup -> forward count, so a big gap means
    the pin math and the recorded evidence diverged)."""
    from reflectionflow_tpu.sampler.vcache_calibrate import LITERATURE_ANCHORS

    sweep = bench._anchor_sweep_reference()
    assert sweep is not None
    dense_vs = 1.0477  # BENCH_NOTES dense reference (vs_baseline)
    for name, a in LITERATURE_ANCHORS.items():
        if "speedup_published" not in a:
            continue
        entry = sweep.get(name)
        assert entry is not None, f"anchor {name} has no recorded hardware sweep entry"
        assert entry["imgs_per_sec_per_chip"] > 0 and entry["n_full_forwards"] >= 2
        vs_dense = entry["vs_baseline"] / dense_vs
        published = a["speedup_published"]
        assert abs(vs_dense - published) / published < 0.15, (
            f"{name}: measured {vs_dense:.2f}x vs dense, published {published}x")
    # the method-variant Taylor alternate ships its measured number too
    assert "taylor_o2_interval6" in sweep


def test_floor_analysis_reproduces_bench_notes_arithmetic():
    """The emitted floor fields must reproduce the audited derivation in
    docs/BENCH_NOTES.json::floor_arithmetic at FLUX-dev scale: ~1.78 PFLOP
    of linears + ~0.45 PFLOP of attention per 30-step 1024px image, an
    ~8.6 s v5e floor, and 9.268 s measured = ~92% of floor."""
    from reflectionflow_tpu.config import FluxDiTConfig

    cfg = FluxDiTConfig()
    fl = bench.denoise_flop_breakdown(cfg, 4096, 512, 30)
    assert abs(fl["linear_flops"] / 1e15 - 1.78) < 0.03
    assert abs(fl["attn_flops"] / 1e15 - 0.446) < 0.01

    a = bench.floor_analysis(cfg, 4096, 512, 30, t_denoise_per_image_s=9.268)
    assert abs(a["floor_s"] - 8.55) < 0.15
    assert 90.0 < a["pct_of_floor"] < 94.0
    assert abs(a["achieved_tflops"] - 240.0) < 5.0
    # the hash fingerprints the derivation: stable across calls, sensitive
    # to any change in the model dims or the measured rate constants
    assert a["floor_hash"] == bench.floor_analysis(cfg, 4096, 512, 30, 5.0)["floor_hash"]
    assert a["floor_hash"] != bench.floor_analysis(cfg, 4096, 513, 30, 9.268)["floor_hash"]


def test_record_last_never_touches_the_committed_snapshot(monkeypatch, tmp_path):
    """Bench-artifact hygiene (VERDICT r4 item 9): a bench run records to the
    gitignored local file only; the committed snapshot changes exclusively
    via tools/promote_bench_record.py. Reads prefer the fresher local record."""
    import json

    committed = tmp_path / "LAST_BENCH.json"
    local = tmp_path / "LAST_BENCH.local.json"
    committed.write_text(json.dumps({"metric": "m", "value": 0.1, "detail": {}}) + "\n")
    monkeypatch.setattr(bench, "LAST_BENCH_PATH", committed)
    monkeypatch.setattr(bench, "LAST_BENCH_LOCAL_PATH", local)

    before = committed.read_text()
    bench._record_last(json.dumps({"metric": "m", "value": 0.2, "detail": {}}))
    assert committed.read_text() == before  # untouched
    assert local.exists()
    assert bench._read_last_record()["value"] == 0.2  # local wins
    local.unlink()
    assert bench._read_last_record()["value"] == 0.1  # committed fallback


def test_promote_bench_record_tool(tmp_path, monkeypatch):
    import json

    import tools.promote_bench_record as promote

    local = tmp_path / "LAST_BENCH.local.json"
    committed = tmp_path / "LAST_BENCH.json"
    monkeypatch.setattr(promote, "LOCAL", local)
    monkeypatch.setattr(promote, "COMMITTED", committed)
    monkeypatch.setattr(sys, "argv", ["promote_bench_record.py"])
    assert promote.main() == 1  # nothing to promote

    rec = {"metric": "m", "value": 0.3, "unit": "u", "vs_baseline": 3.0,
           "detail": {"t_image_s": 3.3}}
    local.write_text(json.dumps(rec) + "\n")
    monkeypatch.setattr(sys, "argv", ["promote_bench_record.py", "--check"])
    assert promote.main() == 1  # differs -> nonzero under --check
    monkeypatch.setattr(sys, "argv", ["promote_bench_record.py"])
    assert promote.main() == 0
    assert json.loads(committed.read_text()) == rec
    assert promote.main() == 0  # idempotent

    # a malformed local record (missing contract fields) must not promote
    local.write_text(json.dumps({"value": 1}) + "\n")
    assert promote.main() == 1
    assert json.loads(committed.read_text()) == rec
