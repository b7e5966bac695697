#!/bin/bash
# Multi-process executor emulation: N vs 4N executors as separate JVMs
# (own heap + GC each, like real Spark executors), T threads per executor.
# Usage: exec_emulation.sh [sents_per_proc] [threads_per_exec]
# Efficiency = aggregate_throughput(4 procs) / (4 * throughput(1 proc)).
set -e
CP=$(cat /tmp/graft_cp.txt)
SENTS=${1:-400000}
T=${2:-4}
JVMF="-Xmx4g -XX:ActiveProcessorCount=$T"
run_group() {
  local n=$1; local out=$2
  rm -f "$out".*
  local pids=()
  for i in $(seq 0 $((n-1))); do
    java $JVMF -cp "$CP" graft.tools.ProfPure "$T" "$SENTS" 3 $((i*10000000)) > "$out.$i" 2>/dev/null &
    pids+=($!)
  done
  for p in "${pids[@]}"; do wait "$p"; done
}
echo "== 1 executor ($T threads)"
run_group 1 /tmp/emu1
grep -h '^{' /tmp/emu1.*
echo "== 4 executors ($T threads each, concurrent)"
run_group 4 /tmp/emu4
grep -h '^{' /tmp/emu4.*
python3 - <<'PY'
import json, glob
def agg(pat, key):
    return sum(json.loads(open(f).read().strip().splitlines()[-1])[key] for f in glob.glob(pat))
t1 = agg('/tmp/emu1.*', 'sents_per_sec'); t4 = agg('/tmp/emu4.*', 'sents_per_sec')
tr1 = agg('/tmp/emu1.*', 'triples_per_sec'); tr4 = agg('/tmp/emu4.*', 'triples_per_sec')
print(json.dumps({"exec1_sents_per_sec": round(t1,1), "exec4_sents_per_sec": round(t4,1),
                  "exec1_triples_per_sec": round(tr1,1), "exec4_triples_per_sec": round(tr4,1),
                  "scaling_efficiency": round(t4/(4*t1), 3)}))
PY
