#!/bin/bash
# Round-3 on-TPU campaign: the evidence queue + the split-bounce A/B, in one
# unattended pass for when the tunneled chip comes back (it drops for hours
# at a time — docs/PERFORMANCE.md "transport discovery"). Each stage tees to
# /tmp/r3_* and keeps going on failure so one flaky dispatch can't sink the
# queue. Run from /root/repo (the axon TPU plugin only registers from here).
set -u
cd /root/repo

echo "=== stage 0: device check ==="
timeout 180 python -c "import jax; d=jax.devices(); print(d); assert d[0].platform=='tpu'" || exit 1

echo "=== stage 1: variant image gates (VERDICT r2 #7) ==="
timeout 3600 python scripts/gate_variants.py 2>&1 | tee /tmp/r3_gates.txt

echo "=== stage 2: progressive 1024 spp (BASELINE config 4, VERDICT r2 #8) ==="
timeout 3600 python scripts/progressive_1024.py 2>&1 | tee /tmp/r3_progressive.txt

echo "=== stage 3: split-bounce A/B at 1080p (VERDICT r2 #1) ==="
timeout 5400 python scripts/bench_ab.py pallas pallas+s3 pallas+s3o pallas+s2o 2>&1 | tee /tmp/r3_ab_split.txt
timeout 5400 python scripts/bench_ab.py pallas pallas+s3c pallas+s2 pallas+s3oe 2>&1 | tee /tmp/r3_ab_split2.txt

echo "=== stage 4: large-scene split campaign (VERDICT r2 #2) ==="
timeout 3600 python scripts/bench_large.py 520 tiered 64 '' 2>&1 | tee /tmp/r3_large_base.txt
timeout 3600 python scripts/bench_large.py 520 tiered 64 +s1oe 2>&1 | tee /tmp/r3_large_s1oe.txt
timeout 3600 python scripts/bench_large.py 520 tiered 64 +s1o 2>&1 | tee /tmp/r3_large_s1o.txt

echo "=== stage 5: headline bench (800x600 gate + 1080p sustained) ==="
timeout 3600 python bench.py 2>&1 | tee /tmp/r3_bench.txt

echo "=== campaign done ==="
