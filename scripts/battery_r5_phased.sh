#!/bin/bash
# Crash-safe phased battery for round 5, armed against the observed
# TPU-worker wedge/crash cycle (STATUS.md "Operational: chip wedge"):
#
#  0. wait for the chip to answer a trivial program (wedges block at
#     first device contact and last ~1 h);
#  1. run bench.py once — validates the BENCH_floor gate at HEAD before
#     committing hours to the battery;
#  2. phase 1: the four entries the committed report still lacks
#     (jetFlow full-length, suspended, dune, irregular) — run_all_cases
#     --only merges them into results/report.json, so the CI-gated
#     report is complete after this phase even if the chip dies later;
#  3. phase 2: refresh the remaining seven cases at HEAD.
#
# Each phase is ONE documented run_all_cases.py invocation (VERDICT r4
# weak #2); scripts/battery_r5.sh remains the single-shot equivalent.
cd /root/repo || exit 1
mkdir -p results

echo "[phased] waiting for chip..." >&2
for i in $(seq 1 90); do
  if timeout 90 python - <<'EOF' 2>/dev/null
import jax, jax.numpy as jnp
x = jnp.ones((128, 128)); assert float((x @ x)[0, 0]) == 128.0
EOF
  then
    echo "[phased] chip up after $i probes" >&2
    break
  fi
  sleep 30
done

echo "[phased] bench gate..." >&2
timeout 900 python bench.py 2>&1 | tee results/bench_r5.log
rc=${PIPESTATUS[0]}
if [ "$rc" -ne 0 ]; then
  echo "[phased] BENCH GATE FAILED (rc=$rc) — aborting battery" >&2
  exit "$rc"
fi

echo "[phased] phase 1: missing report entries" >&2
python scripts/run_all_cases.py --jobs 2 \
  --only jetFlow,transport-suspended,transport-vortex-dune,irregular \
  2>&1 | tee results/battery_r5_phase1.log
p1=${PIPESTATUS[0]}

echo "[phased] phase 2: refresh the remaining seven at HEAD" >&2
python scripts/run_all_cases.py --jobs 2 \
  --only xiaocase3,multiParticlesCollide,xiaocase1,expMueller06,expMueller09,expWachem_PCM,BL24-TH1 \
  2>&1 | tee results/battery_r5_phase2.log
p2=${PIPESTATUS[0]}

python scripts/generate_report.py
echo "[phased] done: phase1=$p1 phase2=$p2" >&2
exit $((p1 + p2))
