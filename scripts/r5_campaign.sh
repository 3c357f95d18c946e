#!/bin/bash
# Round-5 on-TPU campaign (plan + decision rules: docs/PERFORMANCE.md round-4
# section; VERDICT r4 next-steps #1-#8). Ordering: capture the headline bench
# FIRST in any TPU-up window (unrecorded progress is indistinguishable from
# none), then the decision-driving A/Bs, then the long-tail artifacts.
#
# Restart-safe: every stage writes results/r5/<name>.txt, marks
# results/r5/.done_<name> on rc==0, and is SKIPPED on re-run once done — so
# scripts/r5_watch.sh can re-launch this after a mid-campaign tunnel drop
# without redoing completed stages. A stage that fails 3 times is abandoned
# (repo-side bug — don't burn the window looping on it). Every stage's output
# is committed immediately so a tunnel drop can never lose evidence.
set -u
set -o pipefail
cd /root/repo
R=results/r5
mkdir -p "$R"

stamp() { date -u +%FT%TZ; }
save() {
  git add -A "$R" docs BENCH_*.json 2>/dev/null
  git commit -q -m "r5 campaign: $1 ($(stamp))" 2>/dev/null || true
}

chip_ok() {
  timeout 90 python -c "import jax; d=jax.devices(); assert d[0].platform=='tpu', d" 2>/dev/null
}

run_stage() {  # run_stage <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  local marker="$R/.done_$name" attempts="$R/.attempts_$name"
  if [ -f "$marker" ]; then echo "=== stage $name: done, skip ==="; return 0; fi
  local n; n=$(cat "$attempts" 2>/dev/null || echo 0)
  if [ "$n" -ge 3 ]; then echo "=== stage $name: 3 failed attempts, abandoned ==="; return 0; fi
  echo $((n + 1)) > "$attempts"
  echo "=== stage $name ($(stamp)) sha=$(git rev-parse --short HEAD) attempt $((n + 1)) ==="
  if timeout "$tmo" "$@" 2>&1 | tee "$R/$name.txt"; then
    touch "$marker"
    save "$name"
    return 0
  fi
  save "$name (failed attempt)"
  # Distinguish "stage crashed" from "chip went away": if the chip is down,
  # bail out entirely so the watcher re-waits instead of burning attempts.
  if ! chip_ok; then echo "=== chip lost during $name; yielding to watcher ==="; exit 1; fi
  return 0
}

echo "=== stage 0: device check ($(stamp)) ==="
timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" || exit 1

export RAYZEN_ROUND=r5

# Headline + marginal first: the two records a dropped window must not lose.
run_stage bench_early     2400 python bench.py
run_stage marginal_1      3000 python scripts/marginal_session.py

# Decision-driving A/Bs (split-bounce rule: docs/PERFORMANCE.md r4 plan #1).
run_stage ab_split1       5400 python scripts/bench_ab.py pallas pallas+s3 pallas+s3o pallas+s2o
run_stage ab_split2       5400 python scripts/bench_ab.py pallas pallas+s3c pallas+s2 pallas+s3oe

# MXU build/close decision (rule #2) + walk-calibration regression JSON.
run_stage calibrate_mxu   2400 python scripts/calibrate_mxu.py
run_stage calibrate_walk  2400 python scripts/calibrate_walk.py 8 --json results/r5/calibration.json

# Large-scene levers (rule #3): single VMEM-resident 520-Suzanne tree.
run_stage large_base      3600 env RAYZEN_TREE_BUDGET_MB=40 python scripts/bench_large.py 520 tiered 64 ''
run_stage large_s1oe      3600 env RAYZEN_TREE_BUDGET_MB=40 python scripts/bench_large.py 520 tiered 64 +s1oe
run_stage large_s1o       3600 env RAYZEN_TREE_BUDGET_MB=40 python scripts/bench_large.py 520 tiered 64 +s1o

run_stage marginal_2      3000 python scripts/marginal_session.py

# Long-tail artifacts.
run_stage progressive     3600 python scripts/progressive_1024.py
run_stage parity_diag     2400 python scripts/parity_diag.py
run_stage interactive     3600 python scripts/interactive_1080p.py

run_stage marginal_3      3000 python scripts/marginal_session.py
run_stage bench_late      2400 python bench.py

echo "=== campaign done ($(stamp)) ==="
