"""One dated sample of the baseline marginal throughput (VERDICT r3 #5 / r4 #5).

The ~226 Mrays/s uncontended-marginal claim rests on one cold sample; this
script runs the drift-proofed marginal measurement (scripts/bench_ab.py
methodology: interleaved pipelined blocks, per-side minima) for the baseline
megakernel and APPENDS a dated record to
``results/<ROUND>/marginal_sessions.jsonl``. Run it in every distinct TPU-up
window; >= 3 dated sessions either reproduce the >= 200 Mrays/s marginal or
prove the chip-sharing ceiling with data.

Parsing contract: bench_ab.py emits one JSON line per spec
(``{"spec", "ms_per_sample", "mrays_marginal", ...}``) — parsed here, with
the legacy human-line regex as fallback (tests/test_campaign_smoke.py pins
both directions so a format drift fails tests instead of silently yielding
null records).

Usage: python scripts/marginal_session.py  (on TPU)
"""

import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ROUND = os.environ.get("RAYZEN_ROUND", "r5")
OUT = os.path.join(HERE, "results", ROUND, "marginal_sessions.jsonl")


def parse_bench_ab_stdout(stdout: str, spec: str = "pallas"):
    """Extract (ms_per_sample, mrays_marginal, raw_line) for one spec.

    Prefers the JSON-line contract; falls back to the human line.
    Returns (None, None, "") when neither is present.
    """
    for ln in stdout.splitlines():
        ln = ln.strip()
        if ln.startswith("{"):
            try:
                rec = json.loads(ln)
            except ValueError:
                continue
            if rec.get("spec") == spec and "mrays_marginal" in rec:
                return rec["ms_per_sample"], rec["mrays_marginal"], ln
    line = next((ln for ln in stdout.splitlines() if "ms/sample" in ln), "")
    m = re.search(r"([\d.]+) ms/sample\s+([\d.]+) Mrays/s", line)
    if m:
        return float(m.group(1)), float(m.group(2)), line.strip()
    return None, None, ""


def _git_sha() -> str:
    try:
        return subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, timeout=10, cwd=HERE,
        ).stdout.strip() or "unknown"
    except Exception:
        return "unknown"


def main() -> int:
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts", "bench_ab.py"),
         "pallas"],
        capture_output=True, text=True, cwd=HERE, timeout=3000,
    )
    ms, mrays, raw = parse_bench_ab_stdout(r.stdout)
    rec = {
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "wall_s": round(time.time() - t0, 1),
        "ms_per_sample": ms,
        "mrays_marginal": mrays,
        "raw": raw,
        "rc": r.returncode,
        "sha": _git_sha(),
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0 if mrays is not None else 1


if __name__ == "__main__":
    sys.exit(main())
