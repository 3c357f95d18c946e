#!/bin/bash
# Round-4 on-TPU campaign. Ordering per VERDICT r3 #1c: capture the headline
# bench FIRST in any TPU-up window (unrecorded progress is indistinguishable
# from none), then the decision-driving A/Bs, then the long-tail artifacts.
# Every stage tees into results/r4/ (committed, never /tmp) and the script
# git-commits after each stage so a mid-campaign tunnel drop can't lose
# evidence. Stages keep going on failure. Run from /root/repo.
set -u
cd /root/repo
mkdir -p results/r4

stamp() { date -u +%FT%TZ; }
save() {  # save <name>: commit whatever the previous stage wrote
  git add -A results/r4 docs BENCH_*.json 2>/dev/null
  git commit -q -m "r4 campaign: $1 ($(stamp))" 2>/dev/null || true
}

echo "=== stage 0: device check ($(stamp)) ==="
timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" || exit 1

echo "=== stage 1: headline bench — capture FIRST ($(stamp)) ==="
timeout 2400 python bench.py 2>&1 | tee results/r4/bench_early.txt
save "early headline bench"

echo "=== stage 1b: dated marginal-session sample (VERDICT r3 #5) ($(stamp)) ==="
timeout 3000 python scripts/marginal_session.py 2>&1 | tail -2
save "marginal session sample"

echo "=== stage 2: split-bounce A/Bs (VERDICT r3 #2) ($(stamp)) ==="
timeout 5400 python scripts/bench_ab.py pallas pallas+s3 pallas+s3o pallas+s2o 2>&1 | tee results/r4/ab_split1.txt
save "split-bounce A/B wave 1"
timeout 5400 python scripts/bench_ab.py pallas pallas+s3c pallas+s2 pallas+s3oe 2>&1 | tee results/r4/ab_split2.txt
save "split-bounce A/B wave 2"

echo "=== stage 3: MXU Plucker leaf-phase probe (VERDICT r3 #3) ($(stamp)) ==="
timeout 2400 python scripts/calibrate_mxu.py 2>&1 | tee results/r4/calibrate_mxu.txt
save "MXU leaf-phase calibration probe"

echo "=== stage 4: walk-calibration regression JSON (VERDICT r3 #9) ($(stamp)) ==="
timeout 2400 python scripts/calibrate_walk.py 8 --json results/r4/calibration.json 2>&1 | tee results/r4/calibrate_walk.txt
save "walk calibration JSON"

echo "=== stage 5: large-scene levers (VERDICT r3 #4) ($(stamp)) ==="
# RAYZEN_TREE_BUDGET_MB=40 > the 37.3 MB table size -> ONE VMEM-resident tree
# (round-3's best large-scene configuration, 5.2 Mrays/s with auto dual-pop)
export RAYZEN_TREE_BUDGET_MB=40
timeout 3600 python scripts/bench_large.py 520 tiered 64 '' 2>&1 | tee results/r4/large_base.txt
timeout 3600 python scripts/bench_large.py 520 tiered 64 +s1oe 2>&1 | tee results/r4/large_s1oe.txt
timeout 3600 python scripts/bench_large.py 520 tiered 64 +s1o 2>&1 | tee results/r4/large_s1o.txt
unset RAYZEN_TREE_BUDGET_MB
save "large-scene split levers"

echo "=== stage 6: progressive 1024 spp artifact (VERDICT r3 #6) ($(stamp)) ==="
timeout 3600 python scripts/progressive_1024.py 2>&1 | tee results/r4/progressive.txt
save "progressive 1024 artifact"

echo "=== stage 7: parity divergence diagnosis (VERDICT r3 #8) ($(stamp)) ==="
timeout 2400 python scripts/parity_diag.py 2>&1 | tee results/r4/parity_diag_run.txt
save "parity divergence diagnosis"

echo "=== stage 8: 1080p interactive re-record, pipelined (VERDICT r3 #7) ($(stamp)) ==="
timeout 3600 python scripts/interactive_1080p.py 2>&1 | tee results/r4/interactive.txt
save "pipelined 1080p interactive session"

echo "=== stage 8b: second dated marginal-session sample ($(stamp)) ==="
timeout 3000 python scripts/marginal_session.py 2>&1 | tail -2
save "marginal session sample 2"

echo "=== stage 9: closing headline bench ($(stamp)) ==="
timeout 2400 python bench.py 2>&1 | tee results/r4/bench_late.txt
save "late headline bench"

echo "=== campaign done ($(stamp)) ==="
