"""The seal tool is process-critical (VERDICT r6/r7: two rounds of
asserted-but-unrecorded verification chains) — a silently broken parser
would let a red chain read GREEN. Pin its step-verdict logic and the
notes-section writer on canned outputs; no subprocesses involved."""

from __future__ import annotations

import importlib.util
import json
import pathlib

spec = importlib.util.spec_from_file_location(
    "seal_round",
    pathlib.Path(__file__).resolve().parent.parent / "tools" / "seal_round.py",
)
seal = importlib.util.module_from_spec(spec)
spec.loader.exec_module(seal)


ORACLE_GREEN = "PASS a (1 rows, 0.1s)\nSKIP b: no oracle (2 rows, rows-only)\n\n0 failures"
ORACLE_RED = "PASS a (1 rows, 0.1s)\nFAIL c: value mismatch\n\n1 failures: ['c']"
PYTEST_GREEN = "...\n463 passed, 1 skipped in 903.78s (0:15:03)\n"
PYTEST_RED = "...\n1 failed, 462 passed in 900s\n"


def _bench_line(regs=(), ext_regs=(), errors=None):
    return json.dumps(
        {
            "metric": "m", "value": 25.0, "unit": "sec", "queries": {},
            "sf": 0.1, "regressions": list(regs),
            "extended_regressions": list(ext_regs),
            "errors": errors or {},
            "calibration_sec": {"pre": 0.5, "post": 0.3},
        }
    )


def test_oracle_step_verdicts():
    assert seal._step_ok("oracle_sf0.01", ORACLE_GREEN, 0)
    assert not seal._step_ok("oracle_sf0.01", ORACLE_RED, 1)
    # rc 0 but failures in output (defensive: never trust rc alone)
    assert not seal._step_ok("oracle_sf0.01", ORACLE_RED, 0)
    # no summary line at all (crashed before printing) -> red
    assert not seal._step_ok("oracle_sf0.01", "PASS a (1 rows, 0.1s)", 0)


def test_pytest_step_verdicts():
    assert seal._step_ok("pytest", PYTEST_GREEN, 0)
    assert not seal._step_ok("pytest", PYTEST_RED, 1)
    assert not seal._step_ok("pytest", PYTEST_RED, 0)


def test_bench_step_verdicts():
    assert seal._step_ok("bench", _bench_line(), 0)
    assert not seal._step_ok("bench", _bench_line(regs=["q: 9s vs 1s"]), 0)
    assert not seal._step_ok("bench", _bench_line(ext_regs=["q: 9s"]), 0)
    assert not seal._step_ok("bench", _bench_line(errors={"q": "boom"}), 0)
    assert not seal._step_ok("bench", _bench_line(), 4)
    # the extended_regressions key must not satisfy the headline
    # regressions check (substring trap: '"extended_regressions": []'
    # contains the text 'regressions": []'): build an output whose ONLY
    # regressions-shaped key is the extended decoy — the '"regressions"'
    # key is dropped entirely — and assert the step still reads red.
    decoy_only = _bench_line().replace('"regressions": [], ', "")
    assert '"regressions": []' not in decoy_only.replace(
        '"extended_regressions": []', ""
    ), "fixture must drop the headline key, keeping only the decoy"
    assert not seal._step_ok("bench", decoy_only, 0)


def test_perturb_step_verdicts():
    green = "PASS overview\nPASS doc_stats\n0 failures (10 perturbation checks)\n"
    red = "PASS overview\nFAIL doc_stats: delta wrong\n1 failures: ['doc_stats']\n"
    assert seal._step_ok("perturb", green, 0)
    assert not seal._step_ok("perturb", red, 1)
    assert not seal._step_ok("perturb", red, 0)
    assert not seal._step_ok("perturb", "PASS overview\n", 0)
    s = seal._summarize("perturb", green, 0)
    assert "2 PASS" in s and "0 failures" in s


def test_summarize_extracts_evidence():
    s = seal._summarize("oracle_sf0.01", ORACLE_GREEN, 0)
    assert "1 PASS" in s and "0 failures" in s
    s = seal._summarize("pytest", PYTEST_GREEN, 0)
    assert s.startswith("463 passed")
    s = seal._summarize("bench", _bench_line(), 0)
    assert "vs" in s and "regressions=[]" in s


def test_summarize_survives_missing_baseline_total(tmp_path, monkeypatch):
    """ADVICE r8: a BASELINE_BENCH.json without total_sec must record a
    '?' evidence line, not crash the seal step with a KeyError."""
    (tmp_path / "BASELINE_BENCH.json").write_text(json.dumps({"queries": {}}))
    monkeypatch.setattr(seal, "REPO", tmp_path)
    s = seal._summarize("bench", _bench_line(), 0)
    assert "= ?x" in s and "vs ?s baseline" in s


GREEN_NOTES = (
    "# notes\n" + seal.BEGIN + "\n"
    "Chain run by `tools/seal_round.py 13` at git `abc1234` (tree clean"
    " at start)\n"
    "- [x] `pytest` (100s): PASS — 500 passed\n\n"
    "Seal verdict: **GREEN** — commit this file.\n" + seal.END + "\n"
)


def test_check_stamp_current_when_only_docs_changed():
    """VERDICT r12 #6: evidence/docs commits after the sealed run are fine;
    the stamp only goes stale on RUNTIME changes."""
    ok, msg = seal.check_stamp(GREEN_NOTES, [])
    assert ok, msg
    ok, msg = seal.check_stamp(
        GREEN_NOTES, ["NOTES_r13.md", "VERDICT.md", "BENCH_r13.json"]
    )
    assert ok, msg


def test_check_stamp_stale_on_runtime_change():
    for path in (
        "xboard_spark/oracles.py", "tools/perturb_check.py",
        "tests/test_seal_tool.py", "__spark_entry__.py", "bench.py",
    ):
        ok, msg = seal.check_stamp(GREEN_NOTES, ["NOTES_r13.md", path])
        assert not ok and path in msg, (path, msg)


def test_check_stamp_requires_green_seal():
    ok, msg = seal.check_stamp("# notes, no seal section", [])
    assert not ok and "no SEAL section" in msg
    red = GREEN_NOTES.replace("**GREEN**", "**RED**")
    ok, msg = seal.check_stamp(red, [])
    assert not ok and "not GREEN" in msg


def test_write_section_is_idempotent(tmp_path):
    notes = tmp_path / "NOTES_rX.md"
    notes.write_text("# header\n\nbody\n")
    seal._write_section(notes, ["- [x] step1: PASS"])
    first = notes.read_text()
    assert "step1: PASS" in first and first.count(seal.BEGIN) == 1
    # a second write REPLACES the section, never appends a duplicate
    seal._write_section(notes, ["- [x] step1: PASS", "- [x] step2: PASS"])
    second = notes.read_text()
    assert second.count(seal.BEGIN) == 1 and "step2: PASS" in second
    assert second.startswith("# header")
