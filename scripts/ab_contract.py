"""Shared output contract between bench_ab.py (producer) and
marginal_session.py (consumer). bench_ab prints exactly what format_result
returns; the consumer's parser is tested against this function
(tests/test_campaign_smoke.py), so a format drift breaks tests instead of
silently yielding null records (VERDICT r4 weak #3)."""

import json


def format_result(spec: str, ms_per_sample: float, mrays_marginal: float,
                  mrays_per_sample: float) -> str:
    """One human line + one machine-readable JSON line, newline-joined."""
    human = (f"{spec:20s} {ms_per_sample:7.1f} ms/sample  "
             f"{mrays_marginal:6.1f} Mrays/s "
             f"(marginal, {mrays_per_sample:.2f} Mrays/sample)")
    machine = json.dumps({
        "spec": spec,
        "ms_per_sample": round(ms_per_sample, 3),
        "mrays_marginal": round(mrays_marginal, 2),
        "mrays_per_sample": round(mrays_per_sample, 4),
    })
    return human + "\n" + machine
