#!/bin/bash
# Post-campaign chip stages (pre-registered in docs/PERFORMANCE.md round-5
# section BEFORE measuring). Run only after results/r5/CAMPAIGN_DONE exists
# so it never contends with the main campaign. Same restart-safe stage
# discipline as r5_campaign.sh.
set -u
set -o pipefail
cd /root/repo
R=results/r5
mkdir -p "$R"

if [ ! -f "$R/CAMPAIGN_DONE" ]; then
  echo "main campaign not done; refusing to contend for the chip" >&2
  exit 1
fi

stamp() { date -u +%FT%TZ; }
save() {
  git add -A "$R" docs BENCH_*.json 2>/dev/null
  git commit -q -m "r5 post: $1 ($(stamp))" 2>/dev/null || true
}

run_stage() {
  local name="$1" tmo="$2"; shift 2
  local marker="$R/.done_$name" attempts="$R/.attempts_$name"
  if [ -f "$marker" ]; then echo "=== stage $name: done, skip ==="; return 0; fi
  local n; n=$(cat "$attempts" 2>/dev/null || echo 0)
  if [ "$n" -ge 3 ]; then echo "=== stage $name: 3 failed attempts, abandoned ==="; return 0; fi
  echo $((n + 1)) > "$attempts"
  echo "=== stage $name ($(stamp)) sha=$(git rev-parse --short HEAD) attempt $((n + 1)) ==="
  if timeout "$tmo" "$@" 2>&1 | tee "$R/$name.txt"; then
    touch "$marker"
  fi
  save "$name"
  return 0
}

# Interleaved high-rep sample_fuse A/B (rule in docs/PERFORMANCE.md:
# adopt fuse=2 iff min over its records beats baseline min by >5%).
run_stage ab_fuse 5400 env RAYZEN_AB_REPS=6 python scripts/bench_ab.py pallas pallas+f2 pallas pallas+f2

# Per-dispatch spp amortization A/B (pre-registered in docs/PERFORMANCE.md
# BEFORE measuring): interleaved 64/128/64/128 full bench runs; rule applies
# to the best-window Mrays of each side's JSON records (r5_decide rule_spp).
run_stage ab_spp 5400 bash -c \
  'for s in 64 128 64 128; do RAYZEN_BENCH_SPP=$s python bench.py || exit 1; done'

echo "=== post-campaign stages done ($(stamp)); apply the rules via scripts/r5_decide.py ==="
