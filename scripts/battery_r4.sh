#!/bin/bash
# Round-4 staged full battery: each case merges into results/report.json
# incrementally (run_all_cases.py --only), ordered so the VERDICT-critical
# evidence (Wachem baseline delta, jetFlow entry, Mueller09 seed-mean)
# lands first if the round is cut short. All cases re-run at full length.
cd /root/repo
LOG=results/battery_r4.log
: > "$LOG"
for c in expWachem_PCM jetFlow xiaocase3 multiParticlesCollide xiaocase1 \
         expMueller09 expMueller06; do
  echo "### stage $c start $(date +%T)" >> "$LOG"
  python scripts/run_all_cases.py --only "$c" >> "$LOG" 2>&1
  echo "### stage $c done rc=$? $(date +%T)" >> "$LOG"
done
echo "### battery complete $(date +%T)" >> "$LOG"
