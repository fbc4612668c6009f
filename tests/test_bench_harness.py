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


def test_combo_success_and_pallas_upgrade(monkeypatch):
    lines = _run_main(monkeypatch, {
        "combo:coarse,decoder64xla,base192": {
            "coarse": COARSE, "decoder64xla": DEC_XLA, "base192": BASE},
        "decoder64": DEC_PAL,
    })
    final = lines[-1]
    d = final["detail"]
    assert d["decoder_variant"] == "decoder64"  # upgrade adopted (faster)
    assert d["decoder_b2_fwd_ms"] == pytest.approx(36.6)
    # composite: 1 decoder + 4.5 latent + 0.3 coarse forwards per tile
    t_tile = 0.0366 / 2 + 4.5 * 0.020 / 16 + 0.3 * 0.019 / 4
    assert d["tiles_per_sec_per_chip"] == pytest.approx(1 / t_tile, rel=1e-3)
    assert final["vs_baseline"] == pytest.approx((1 / t_tile) / 2.5, rel=1e-3)
    assert "partial" not in final


def test_slower_pallas_not_adopted(monkeypatch):
    slow = dict(DEC_PAL, sec_per_call=0.09)
    lines = _run_main(monkeypatch, {
        "combo:coarse,decoder64xla,base192": {
            "coarse": COARSE, "decoder64xla": DEC_XLA, "base192": BASE},
        "decoder64": slow,
    })
    assert lines[-1]["detail"]["decoder_variant"] == "decoder64xla"


def test_combo_partial_falls_back_per_stage(monkeypatch):
    # combo died after coarse; decoder/base must be re-attempted singly
    lines = _run_main(monkeypatch, {
        "combo:coarse,decoder64xla,base192": {"coarse": COARSE},
        "decoder64xla": DEC_XLA,
        "base192": BASE,
        "decoder64": None,
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
        "combo:coarse,decoder64xla,base192": {
            "coarse": COARSE, "decoder64xla": DEC_XLA, "base192": BASE},
        "decoder64": DEC_PAL,
    }, e2e_result={"e2e_steady_device_tiles_per_sec": 21.9})
    assert lines[-1]["detail"]["e2e_steady_device_tiles_per_sec"] == 21.9


def test_every_line_is_valid_json_with_metric(monkeypatch):
    lines = _run_main(monkeypatch, {
        "combo:coarse,decoder64xla,base192": {"coarse": COARSE},
        "decoder64xla": None, "base192": None, "decoder64": None,
    })
    for l in lines:
        assert set(l) >= {"metric", "value", "unit", "vs_baseline", "detail"}


def test_e2e_runs_before_stages(monkeypatch):
    """Round-5 contract: the measured e2e serving stage gets first claim on
    the budget (round 4 lost it by running it last)."""
    calls = []

    def fake_run_stage(stage, timeout_s):
        calls.append(("stage", stage))
        return {"combo:coarse,decoder64xla,base192": {
            "coarse": COARSE, "decoder64xla": DEC_XLA, "base192": BASE},
            "decoder64": DEC_PAL}.get(stage)

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
        "combo:coarse,decoder64xla,base192": {
            "coarse": COARSE, "decoder64xla": DEC_XLA, "base192": BASE},
        "decoder64": DEC_PAL}.get(s))
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
        "combo:coarse,decoder64xla,base192": {
            "coarse": COARSE, "decoder64xla": DEC_XLA, "base192": BASE},
        "decoder64": DEC_PAL}.get(s))
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
