"""Offline regression tests for the driver benchmark harness (bench.py).

The real stages need the TPU; these tests stub the subprocess layer and
check the orchestration contract the driver relies on: a flushed JSON line
after every stage, combo-result fan-out with per-stage fallback, the
Pallas-decoder upgrade-only rule, and the analytic composite math.
"""
import io
import json
import sys

import pytest

import bench


def _run_main(monkeypatch, stage_results, e2e_result=None):
    """Run bench.main() with canned stage results; returns parsed lines."""

    def fake_run_stage(stage, timeout_s):
        assert timeout_s >= 20
        return stage_results.get(stage)

    monkeypatch.setattr(bench, "run_stage", fake_run_stage)
    monkeypatch.setattr(bench, "run_e2e", lambda t: e2e_result)
    monkeypatch.setattr(bench, "probe_devices",
                        lambda t: {"platform": "tpu", "n": 1})
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    lines = [json.loads(l) for l in out.getvalue().splitlines() if l.strip()]
    assert lines, "main() must print at least one JSON line"
    return lines


def test_hung_device_init_fast_fails(monkeypatch):
    """A wedged tunnel must produce ONE diagnostic line, not a silent 900 s
    burn (round-3 failure mode: BENCH_r03 spent the whole budget on nothing)."""
    monkeypatch.setattr(bench, "probe_devices", lambda t: None)

    def no_stage(*a, **k):  # pragma: no cover - must not be reached
        raise AssertionError("stages must not run when device init hangs")

    monkeypatch.setattr(bench, "run_stage", no_stage)
    monkeypatch.setattr(bench, "run_e2e", no_stage)
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    lines = [json.loads(l) for l in out.getvalue().splitlines() if l.strip()]
    assert len(lines) == 1
    assert lines[0]["value"] == 0.0
    assert lines[0]["detail"]["device_init"] == "hung"


def test_probe_subprocess_roundtrip(monkeypatch):
    """The real probe subprocess parses on a healthy (CPU) backend."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    got = bench.probe_devices(120.0)
    assert got and got["platform"] == "cpu" and got["n"] >= 1


COARSE = {"stage": "coarse", "batch": 4, "steps": 20,
          "sec_per_call": 0.019, "rtt_s": 0.03}
DEC_XLA = {"stage": "decoder64xla", "batch": 2, "steps": 1,
           "sec_per_call": 0.0745, "rtt_s": 0.03, "model_channels": 64}
DEC_PAL = {"stage": "decoder64", "batch": 2, "steps": 1,
           "sec_per_call": 0.0366, "rtt_s": 0.03, "model_channels": 64}
BASE = {"stage": "base192", "batch": 16, "steps": 1,
        "sec_per_call": 0.020, "rtt_s": 0.03, "model_channels": 192}


COMBO_TAG = "combo:coarse,base192,decoder64"


def test_combo_success_measures_pallas(monkeypatch):
    lines = _run_main(monkeypatch, {
        COMBO_TAG: {"coarse": COARSE, "base192": BASE, "decoder64": DEC_PAL},
    })
    final = lines[-1]
    d = final["detail"]
    assert d["decoder_variant"] == "decoder64"  # serving default, in-combo
    assert d["decoder_b2_fwd_ms"] == pytest.approx(36.6)
    # composite: 1 decoder + 4.5 latent + 0.3 coarse forwards per tile
    t_tile = 0.0366 / 2 + 4.5 * 0.020 / 16 + 0.3 * 0.019 / 4
    assert d["tiles_per_sec_per_chip"] == pytest.approx(1 / t_tile, rel=1e-3)
    assert final["vs_baseline"] == pytest.approx((1 / t_tile) / 2.5, rel=1e-3)
    assert "partial" not in final


def test_decoder_xla_fallback_when_pallas_fails(monkeypatch):
    lines = _run_main(monkeypatch, {
        COMBO_TAG: {"coarse": COARSE, "base192": BASE},
        "decoder64xla": DEC_XLA,
    })
    final = lines[-1]
    assert final["detail"]["decoder_variant"] == "decoder64xla"
    assert any(n.startswith("decoder measured with XLA fallback")
               for n in final["detail"]["notes"])
    assert "tiles_per_sec_per_chip" in final["detail"]


def test_combo_partial_falls_back_per_stage(monkeypatch):
    # combo died after coarse; decoder/base must be re-attempted singly
    lines = _run_main(monkeypatch, {
        COMBO_TAG: {"coarse": COARSE},
        "decoder64xla": DEC_XLA,
        "base192": BASE,
    })
    d = lines[-1]["detail"]
    assert d["decoder_variant"] == "decoder64xla"
    assert "tiles_per_sec_per_chip" in d


def test_total_failure_still_emits(monkeypatch):
    lines = _run_main(monkeypatch, {})
    final = lines[-1]
    assert final["value"] == 0.0
    assert final["vs_baseline"] == 0.0
    assert any(n.startswith("coarse stage failed/timed out")
               for n in final["detail"]["notes"])


def test_e2e_fields_merged(monkeypatch):
    lines = _run_main(monkeypatch, {
        COMBO_TAG: {"coarse": COARSE, "base192": BASE, "decoder64": DEC_PAL},
    }, e2e_result={"e2e_steady_device_tiles_per_sec": 21.9})
    assert lines[-1]["detail"]["e2e_steady_device_tiles_per_sec"] == 21.9


def test_every_line_is_valid_json_with_metric(monkeypatch):
    lines = _run_main(monkeypatch, {
        COMBO_TAG: {"coarse": COARSE},
        "decoder64xla": None, "base192": None,
    })
    for l in lines:
        assert set(l) >= {"metric", "value", "unit", "vs_baseline", "detail"}


def test_e2e_runs_before_stages(monkeypatch):
    """Round-5 contract: the measured e2e serving stage gets first claim on
    the budget (round 4 lost it by running it last)."""
    calls = []

    def fake_run_stage(stage, timeout_s):
        calls.append(("stage", stage))
        return {COMBO_TAG: {
            "coarse": COARSE, "base192": BASE,
            "decoder64": DEC_PAL}}.get(stage)

    def fake_run_e2e(timeout_s):
        calls.append(("e2e", timeout_s))
        return {"e2e_steady_device_tiles_per_sec": 21.9, "phase": "done"}

    monkeypatch.setattr(bench, "run_stage", fake_run_stage)
    monkeypatch.setattr(bench, "run_e2e", fake_run_e2e)
    monkeypatch.setattr(bench, "probe_devices",
                        lambda t: {"platform": "tpu", "n": 1})
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    assert calls[0][0] == "e2e", "e2e must be attempted before any stage"
    # a completed e2e must NOT be re-run by the completion pass
    assert sum(1 for kind, _ in calls if kind == "e2e") == 1
    final = json.loads(out.getvalue().splitlines()[-1])
    assert final["detail"]["e2e_steady_device_tiles_per_sec"] == 21.9
    assert "notes" in final["detail"]
    assert not any("incomplete" in n for n in final["detail"]["notes"])


def test_incomplete_e2e_gets_completion_pass(monkeypatch):
    """An e2e attempt that stopped before the contract metric is retried with
    the leftover budget, and a successful retry leaves no failure note."""
    e2e_results = iter([
        {"warmup_s": 12.0, "phase": "device_warm"},          # first: partial
        {"warmup_s": 3.0, "phase": "done",                   # retry: complete
         "e2e_steady_device_tiles_per_sec": 22.1},
    ])

    monkeypatch.setattr(bench, "run_e2e", lambda t: next(e2e_results))
    monkeypatch.setattr(bench, "run_stage", lambda s, t: {
        COMBO_TAG: {"coarse": COARSE, "base192": BASE,
                    "decoder64": DEC_PAL}}.get(s))
    monkeypatch.setattr(bench, "probe_devices",
                        lambda t: {"platform": "tpu", "n": 1})
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    final = json.loads(out.getvalue().splitlines()[-1])
    assert final["detail"]["e2e_steady_device_tiles_per_sec"] == 22.1
    assert not any("incomplete" in n for n in final["detail"]["notes"])


def test_never_complete_e2e_is_noted_with_phase(monkeypatch):
    """If even the completion pass cannot finish, the final line says so and
    reports how far the e2e script got (its last flushed phase)."""
    partial = {"warmup_s": 12.0, "e2e_device_tiles_per_sec": 20.5,
               "phase": "wire_warm"}
    monkeypatch.setattr(bench, "run_e2e", lambda t: dict(partial))
    monkeypatch.setattr(bench, "run_stage", lambda s, t: {
        COMBO_TAG: {"coarse": COARSE, "base192": BASE,
                    "decoder64": DEC_PAL}}.get(s))
    monkeypatch.setattr(bench, "probe_devices",
                        lambda t: {"platform": "tpu", "n": 1})
    out = io.StringIO()
    monkeypatch.setattr(sys, "stdout", out)
    bench.main()
    final = json.loads(out.getvalue().splitlines()[-1])
    d = final["detail"]
    # partial device number still surfaces, with the stall point named
    assert d["e2e_device_tiles_per_sec"] == 20.5
    assert d["e2e_partial_phase"] == "wire_warm"
    assert any("incomplete" in n and "wire_warm" in n for n in d["notes"])


WEDGE_NO_FLUSH = "import time\ntime.sleep(600)"
WEDGE_AFTER_FLUSH = ("import json, os, sys, time\n"
                     "p = sys.argv[1]\n"
                     "open(p + '.tmp', 'w').write(json.dumps({'a': 1}))\n"
                     "os.replace(p + '.tmp', p)\n"
                     "time.sleep(600)")


def test_watchdog_kills_connection_that_never_flushes(monkeypatch):
    """Round-5 wedge mode: a subprocess that never produces its first flush
    (connection wedged at device init) must be killed at init_grace, not
    ride out the whole hard timeout."""
    monkeypatch.setattr(bench, "_POLL_S", 0.1)
    import time as _time
    t0 = _time.monotonic()
    got = bench._run_sub([WEDGE_NO_FLUSH], timeout_s=60.0, tag="wedge-test",
                         init_grace_s=1.0, stall_s=2.0)
    elapsed = _time.monotonic() - t0
    assert got is None
    # killed after ~1s grace per attempt (up to _MAX_ATTEMPTS), not 60s
    assert elapsed < 30
    assert "wedged connection killed" in bench.LAST_FAILURE["wedge-test"]
    assert "no first flush" in bench.LAST_FAILURE["wedge-test"]


def test_watchdog_keeps_flushed_results_across_stall_kill(monkeypatch):
    """A subprocess that flushes partial results then stalls is killed on the
    stall window and its flushed results survive the kill (and any retry)."""
    monkeypatch.setattr(bench, "_POLL_S", 0.1)
    monkeypatch.setattr(bench, "_MAX_ATTEMPTS", 1)
    got = bench._run_sub([WEDGE_AFTER_FLUSH], timeout_s=60.0,
                         tag="stall-test", init_grace_s=5.0, stall_s=1.0)
    assert got == {"a": 1}
    assert "no progress for" in bench.LAST_FAILURE["stall-test"]


def test_run_stage_filters_marker_only_results(monkeypatch):
    """A stage whose subprocess only got as far as the watchdog progress
    markers must report as failed (None), not as a result dict missing
    'sec_per_call' (which would crash the composite math)."""
    monkeypatch.setattr(bench, "_run_sub",
                        lambda *a, **k: {"phase": "device_up"})
    assert bench.run_stage("coarse", 100.0) is None
    # combo results keyed by stage names pass through untouched
    monkeypatch.setattr(bench, "_run_sub",
                        lambda *a, **k: {"coarse": COARSE})
    assert bench.run_stage(COMBO_TAG, 100.0) == {"coarse": COARSE}
