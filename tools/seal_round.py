"""Round-seal tool (VERDICT r7 #1): run the full verification chain on
the CURRENT tree and write the recorded results into the round notes —
so the committed tree never again asserts a verification chain without
its evidence (the r6/r7 failure mode: an unchecked checklist in NOTES).

Chain (sequential; bench last so it runs isolated):
  1. full oracle gate at sf0.001
  2. full oracle gate at sf0.01   (the driver's correctness scale)
  3. full oracle sweep at sf0.1   (10x gate scale; catches
     convergence/iteration bugs invisible at sf0.01 — see round 5)
  4. planted-perturbation checks  (tools/perturb_check.py — twin-free
     closed-form deltas; the gate a twin-mirrored bug cannot pass)
  5. full pytest
  6. isolated bench.py            (headline + extended regression gates)

Results are written between SEAL:BEGIN/SEAL:END markers in
``NOTES_r{N}.md`` (section created if absent) after EVERY step — a
crash mid-chain still leaves the completed steps recorded. Exit 0 iff
every step is green; commit the notes together with the tree the chain
ran on, THEN snapshot.

Usage: python tools/seal_round.py ROUND [--skip-sf01] [--skip STEP ...]
  --skip-sf01     alias for --skip oracle_sf0.1 (the ~15-20 min sweep)
  --skip STEP     skip a named step, recorded as SKIPPED in the notes
  --check-stamp   don't run the chain; verify the recorded seal is still
                  current: the notes' recorded git hash must be GREEN and
                  no RUNTIME file (xboard_spark/, tools/, tests/,
                  __spark_entry__.py, bench.py) may have changed between
                  it and HEAD. Exit 1 = a post-seal runtime commit landed
                  (the r12 ``b0bce4a``-after-``cfba517`` gap) — re-run
                  the chain (or the focused gates) and re-stamp.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import re
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
PY = sys.executable
BEGIN, END = "<!-- SEAL:BEGIN -->", "<!-- SEAL:END -->"

STEPS = [
    ("oracle_sf0.001", [PY, "tools/check_oracle.py", "/root/testdata/sf0.001"]),
    ("oracle_sf0.01", [PY, "tools/check_oracle.py", "/root/testdata/sf0.01"]),
    ("oracle_sf0.1", [PY, "tools/check_oracle.py", "/root/testdata/sf0.1"]),
    # twin-free closed-form delta checks (round 12; VERDICT r11 task 4):
    # the one gate a twin-mirrored bug cannot pass
    ("perturb", [PY, "tools/perturb_check.py", "/root/testdata/sf0.001"]),
    ("pytest", [PY, "-m", "pytest", "tests/", "-q"]),
    ("bench", [PY, "bench.py"]),
]


def _summarize(name: str, out: str, rc: int) -> str:
    """One evidence line per step, pulled from the tool's own output."""
    if name.startswith("oracle"):
        m = re.search(r"^(\d+) failures.*$", out, re.M)
        passes = len(re.findall(r"^PASS ", out, re.M))
        skips = len(re.findall(r"^SKIP ", out, re.M))
        tail = m.group(0) if m else "NO SUMMARY LINE"
        return f"{passes} PASS / {skips} rows-only SKIP / {tail}"
    if name == "pytest":
        m = re.search(r"^\d+ (passed|failed).*$", out, re.M)
        return m.group(0) if m else f"no pytest summary (rc {rc})"
    if name == "bench":
        for line in reversed(out.splitlines()):
            if line.startswith("{"):
                try:
                    j = json.loads(line)
                except ValueError:
                    continue
                # every lookup is guarded: a missing/invalid baseline file
                # or a bench JSON missing a key must record "?" in the
                # evidence line, never crash the seal after the whole
                # chain already ran (the verdict line would be lost)
                try:
                    base = json.loads(
                        (REPO / "BASELINE_BENCH.json").read_text()
                    )
                except (OSError, ValueError):
                    base = {}
                total = base.get("total_sec")
                value = j.get("value")
                ratio = (
                    round(value / total, 2)
                    if total and value is not None
                    else "?"
                )
                return (
                    f"headline {value}s vs {total or '?'}s baseline"
                    f" = {ratio}x; regressions={j.get('regressions')}"
                    f" extended_regressions={j.get('extended_regressions')}"
                    f" errors={list(j.get('errors') or {})}"
                    f" calibration={j.get('calibration_sec')}"
                )
        return f"no JSON line from bench.py (rc {rc})"
    if name == "perturb":
        m = re.search(r"^\d+ failures.*$", out, re.M)
        passes = len(re.findall(r"^PASS ", out, re.M))
        return f"{passes} PASS / {m.group(0) if m else 'NO SUMMARY LINE'}"
    return f"rc {rc}"


def _step_ok(name: str, out: str, rc: int) -> bool:
    if rc != 0:
        return False
    if name.startswith("oracle"):
        return bool(re.search(r"^0 failures", out, re.M))
    if name == "pytest":
        return " failed" not in out
    if name == "perturb":
        return bool(re.search(r"^0 failures", out, re.M))
    if name == "bench":
        return (
            bool(re.search(r'"errors": \{\}', out))
            and bool(re.search(r'"regressions": \[\]', out))
            and bool(re.search(r'"extended_regressions": \[\]', out))
        )
    return True


def _write_section(notes: pathlib.Path, lines: list[str]) -> None:
    body = "\n".join([BEGIN, *lines, END])
    text = notes.read_text() if notes.exists() else ""
    if BEGIN in text and END in text:
        pre, rest = text.split(BEGIN, 1)
        _, post = rest.split(END, 1)
        text = pre + body + post
    else:
        if text and not text.endswith("\n"):
            text += "\n"
        text += (
            "\n## Verification on the final tree (sealed run — written by"
            " tools/seal_round.py)\n\n" + body + "\n"
        )
    notes.write_text(text)


# Paths whose post-seal change invalidates the recorded verification
# (everything that can alter query results, gates, or measurements;
# docs/evidence files are free to land after the seal).
RUNTIME_PATHS = (
    "xboard_spark/", "tools/", "tests/", "__spark_entry__.py", "bench.py",
)


def _is_runtime_path(path: str) -> bool:
    return any(
        path == p or path.startswith(p) for p in RUNTIME_PATHS
    )


def check_stamp(notes_text: str, changed_paths: list[str]) -> tuple[bool, str]:
    """Pure core of --check-stamp: is the recorded seal still current?

    ``changed_paths`` = files differing between the recorded seal hash and
    HEAD. Returns (ok, message). Process fix for VERDICT r12 #6: a runtime
    commit after the sealed run leaves the record one commit stale.
    """
    if BEGIN not in notes_text:
        return False, "no SEAL section in the round notes — run the chain"
    if "Seal verdict: **GREEN**" not in notes_text:
        return False, "recorded seal is not GREEN — fix and re-run the chain"
    stale = sorted({p for p in changed_paths if _is_runtime_path(p)})
    if stale:
        return False, (
            "RUNTIME files changed after the sealed run — re-run the chain "
            f"(or focused gates) and re-stamp: {stale}"
        )
    return True, "seal stamp current (post-seal diff touches no runtime file)"


def _run_check_stamp(round_no: int) -> int:
    notes = REPO / f"NOTES_r{round_no}.md"
    if not notes.exists():
        print(f"STAMP FAIL: {notes} missing")
        return 1
    text = notes.read_text()
    m = re.search(r"Chain run by `tools/seal_round\.py \d+` at git `(\w+)`",
                  text)
    if not m:
        print("STAMP FAIL: no recorded git hash in the SEAL section")
        return 1
    sealed = m.group(1)
    diff = subprocess.run(
        ["git", "diff", "--name-only", sealed, "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    )
    if diff.returncode != 0:
        print(f"STAMP FAIL: git diff {sealed}..HEAD failed: {diff.stderr}")
        return 1
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout
    changed = [ln for ln in diff.stdout.splitlines() if ln.strip()]
    changed += [ln[3:].strip() for ln in dirty.splitlines() if ln.strip()]
    ok, msg = check_stamp(text, changed)
    print(f"STAMP {'OK' if ok else 'FAIL'}: {msg} (sealed `{sealed}`)")
    return 0 if ok else 1


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("round", type=int)
    ap.add_argument("--skip-sf01", action="store_true")
    ap.add_argument("--skip", action="append", default=[])
    ap.add_argument("--check-stamp", action="store_true")
    args = ap.parse_args()
    if args.check_stamp:
        return _run_check_stamp(args.round)
    skips = set(args.skip) | ({"oracle_sf0.1"} if args.skip_sf01 else set())
    unknown = skips - {n for n, _ in STEPS}
    if unknown:
        ap.error(f"unknown step(s) to skip: {sorted(unknown)}")

    notes = REPO / f"NOTES_r{args.round}.md"
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    dirty = bool(
        subprocess.run(
            ["git", "status", "--porcelain"], cwd=REPO,
            capture_output=True, text=True,
        ).stdout.strip()
    )
    lines = [
        f"Chain run by `tools/seal_round.py {args.round}` at git `{head}`"
        + (" (tree DIRTY at start)" if dirty else " (tree clean at start)"),
        "",
    ]
    _write_section(notes, lines + ["(chain in progress...)"])

    all_ok = True
    for name, cmd in STEPS:
        if name in skips:
            lines.append(f"- [ ] `{name}`: SKIPPED (--skip)")
            _write_section(notes, lines)
            continue
        t0 = time.time()
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True,
            env={**__import__("os").environ},
        )
        out = proc.stdout + "\n" + proc.stderr
        ok = _step_ok(name, out, proc.returncode)
        all_ok &= ok
        mark = "x" if ok else " "
        verdict = "PASS" if ok else f"**FAIL (rc {proc.returncode})**"
        try:
            summary = _summarize(name, out, proc.returncode)
        except Exception as e:  # a summarize bug must not lose the verdict
            summary = f"(summary error: {type(e).__name__}: {str(e)[:120]})"
        lines.append(
            f"- [{mark}] `{name}` ({time.time() - t0:.0f}s): {verdict} — "
            + summary
        )
        _write_section(notes, lines)
        print(lines[-1], flush=True)
        if not ok:
            tail = "\n".join(out.strip().splitlines()[-25:])
            print(f"--- {name} output tail ---\n{tail}", file=sys.stderr)

    lines.append("")
    if not all_ok:
        verdict = "RED"
        note = "fix and re-run; do NOT snapshot a red seal."
    elif skips:
        verdict = f"INCOMPLETE (skipped: {', '.join(sorted(skips))})"
        note = "a partial chain is a dry run, not a seal — re-run full."
    else:
        verdict = "GREEN"
        note = "commit this file with the tree above, then snapshot."
    lines.append(f"Seal verdict: **{verdict}** — {note}")
    _write_section(notes, lines)
    print(f"\nSEAL {verdict} -> {notes}")
    return 0 if all_ok and not skips else 1


if __name__ == "__main__":
    sys.exit(main())
