"""One dated sample of the baseline marginal throughput (VERDICT r3 #5).

The ~226 Mrays/s uncontended-marginal claim rests on one cold sample; this
script runs the drift-proofed marginal measurement (scripts/bench_ab.py
methodology: interleaved pipelined blocks, per-side minima) for the baseline
megakernel and APPENDS a dated record to results/r4/marginal_sessions.jsonl.
Run it in every distinct TPU-up window; >= 3 dated sessions either reproduce
the >= 200 Mrays/s marginal or prove the chip-sharing ceiling with data.

Usage: python scripts/marginal_session.py  (on TPU)
"""

import json
import os
import re
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(HERE, "results", "r4", "marginal_sessions.jsonl")


def main() -> int:
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "scripts", "bench_ab.py"),
         "pallas"],
        capture_output=True, text=True, cwd=HERE, timeout=3000,
    )
    line = next((ln for ln in r.stdout.splitlines() if "ms/sample" in ln), "")
    m = re.search(r"([\d.]+) ms/sample\s+([\d.]+) Mrays/s", line)
    rec = {
        "utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "wall_s": round(time.time() - t0, 1),
        "ms_per_sample": float(m.group(1)) if m else None,
        "mrays_marginal": float(m.group(2)) if m else None,
        "raw": line.strip(),
        "rc": r.returncode,
    }
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec))
    return 0 if m else 1


if __name__ == "__main__":
    main()
