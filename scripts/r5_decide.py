"""Evaluate the round-5 pre-registered decision rules against results/r5/.

Pure text parsing — zero jax / zero device work, safe to run while the
campaign holds the chip. Each rule is the one written in
docs/PERFORMANCE.md (round-4 plan, executed in round 5); this script just
makes applying them mechanical and auditable.

Usage: python scripts/r5_decide.py [results_dir]
"""

import json
import os
import re
import sys

R = sys.argv[1] if len(sys.argv) > 1 else "results/r5"

# Inter-block drift observed by bench.py best-window vs mean; the A/B rule
# says "beats baseline by more than the observed drift". Use the spread of
# the baseline spec across the two ab stages when both exist, else 5%.
DRIFT_FRAC = 0.05


def read(name):
    path = os.path.join(R, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return f.read()


def ab_records(text):
    """All JSON contract lines from a bench_ab.py output."""
    out = []
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{") and '"spec"' in line:
            try:
                out.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    return out


def rule_split_bounce():
    recs = []
    for stage in ("ab_split1.txt", "ab_split2.txt"):
        t = read(stage)
        if t:
            recs += ab_records(t)
    if not recs:
        return "split-bounce: no data yet"
    by = {}
    for r in recs:
        by.setdefault(r["spec"], []).append(r["ms_per_sample"])
    if "pallas" not in by:
        return "split-bounce: baseline spec missing"
    base = min(by["pallas"])
    spread = (max(by["pallas"]) - base) / base if len(by["pallas"]) > 1 else DRIFT_FRAC
    drift = max(spread, DRIFT_FRAC)
    lines = [f"split-bounce: baseline {base:.1f} ms/sample, drift {drift * 100:.1f}%"]
    winners = []
    for spec, vals in sorted(by.items()):
        if spec == "pallas":
            continue
        v = min(vals)
        rel = (v - base) / base
        verdict = "WINNER" if rel < -drift else ("neutral" if abs(rel) <= drift else "loser")
        if verdict == "WINNER":
            winners.append(spec)
        lines.append(f"  {spec:12s} {v:7.1f} ms/sample  {rel * +100:+5.1f}%  {verdict}")
    if winners:
        lines.append(f"  -> DECISION: flip default to {min(winners)}, re-record headline")
    else:
        lines.append("  -> DECISION: all lose/neutral; split-bounce documented negative, stays off")
    return "\n".join(lines)


def rule_mxu():
    t = read("calibrate_mxu.txt")
    if not t:
        return "mxu: no data yet"
    # calibrate_mxu prints its own verdict line; surface it plus the budget math
    keep = [ln for ln in t.splitlines()
            if re.search(r"BUILD|CLOSE|budget|composite|us/visit|ns/", ln)]
    return "mxu:\n" + "\n".join("  " + ln for ln in keep[-14:])


def rule_large():
    out = ["large-scene (bar: beat 5.2 Mrays/s by > drift, else floor accepted):"]
    base = None
    for stage, label in (("large_base.txt", "base"), ("large_s1oe.txt", "+s1oe"),
                         ("large_s1o.txt", "+s1o")):
        t = read(stage)
        if not t:
            out.append(f"  {label}: no data yet")
            continue
        nums = [ln.strip() for ln in t.splitlines() if re.fullmatch(r"[0-9.]+", ln.strip())]
        v = float(nums[-1]) if nums else None
        if v is None:
            out.append(f"  {label}: no final Mrays/s line")
            continue
        if label == "base":
            base = v
        out.append(f"  {label}: {v:.2f} Mrays/s")
    if base is not None:
        out.append(f"  -> compare vs round-3 5.2 and in-round base {base:.2f}")
    return "\n".join(out)


def rule_marginal():
    t = read("marginal_sessions.jsonl")
    if not t:
        return "marginal: no sessions yet"
    recs = [json.loads(ln) for ln in t.splitlines() if ln.strip()]
    vals = [r.get("mrays_marginal") for r in recs if r.get("mrays_marginal")]
    lines = [f"marginal sessions ({len(vals)} recorded; rule: any >=200 keeps the "
             f"contention-ceiling story, all well below retires the 226 figure):"]
    for r in recs:
        lines.append(f"  {r.get('utc', '?')}  {r.get('mrays_marginal')} Mrays/s  sha={r.get('sha', '?')}")
    if vals:
        if max(vals) >= 200:
            lines.append("  -> DECISION: contention-ceiling explanation stands")
        elif len(vals) >= 3:
            lines.append("  -> DECISION: retire the round-2 226 Mrays/s figure as a one-off")
        else:
            lines.append(f"  -> pending: {3 - len(vals)} more session(s) wanted")
    return "\n".join(lines)


def rule_fuse():
    t = read("ab_fuse.txt")
    if not t:
        return "sample_fuse: no data yet (post-campaign stage, scripts/r5_post.sh)"
    by = {}
    for r in ab_records(t):
        by.setdefault(r["spec"], []).append(r["ms_per_sample"])
    if "pallas" not in by or "pallas+f2" not in by:
        return "sample_fuse: incomplete A/B (need both pallas and pallas+f2 records)"
    base, fuse = min(by["pallas"]), min(by["pallas+f2"])
    rel = (fuse - base) / base
    lines = [f"sample_fuse: baseline {base:.1f} ms/sample (n={len(by['pallas'])}), "
             f"fuse=2 {fuse:.1f} (n={len(by['pallas+f2'])}), {rel * 100:+.1f}%"]
    if rel < -DRIFT_FRAC:
        lines.append("  -> DECISION: adopt sample_fuse=2 as default, re-run bench.py")
    else:
        lines.append("  -> DECISION: inside drift; retire the round-3 44-vs-48 as drift, stays 1")
    return "\n".join(lines)


def rule_spp():
    t = read("ab_spp.txt")
    if not t:
        return "bench spp: no data yet (post-campaign stage, scripts/r5_post.sh)"
    by = {}
    for line in t.splitlines():
        line = line.strip()
        if line.startswith("{") and '"metric"' in line:
            try:
                r = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "spp" in r and "value" in r:
                by.setdefault(int(r["spp"]), []).append(float(r["value"]))
    if 64 not in by or 128 not in by:
        return "bench spp: incomplete A/B (need records at both 64 and 128 spp)"
    b64, b128 = max(by[64]), max(by[128])
    rel = (b128 - b64) / b64
    lines = [f"bench spp: 64spp best {b64:.1f} Mrays/s (n={len(by[64])}), "
             f"128spp best {b128:.1f} (n={len(by[128])}), {rel * 100:+.1f}%"]
    if rel > DRIFT_FRAC:
        lines.append("  -> DECISION: adopt RAYZEN_BENCH_SPP default 128 in bench.py")
    else:
        lines.append("  -> DECISION: inside drift or worse; per-dispatch spp stays 64")
    return "\n".join(lines)


def rule_interactive():
    t = read("interactive.txt")
    if not t:
        return "interactive: no data yet"
    keep = [ln for ln in t.splitlines() if re.search(
        r"median|ms/frame|fps|pipeline", ln, re.IGNORECASE)]
    return "interactive (target median < 250 ms/frame pipelined):\n" + \
        "\n".join("  " + ln for ln in keep[-12:])


for fn in (rule_split_bounce, rule_mxu, rule_large, rule_marginal, rule_fuse,
           rule_spp, rule_interactive):
    print(fn())
    print()
