#!/bin/bash
# Kill-and-resume orchestrator for tools/resume_bench.py (12M-edge
# pagerank).  Phase 2 is a REAL kill -9 of the whole process group
# (python driver + JVM) the moment superstep 4's metrics commit lands,
# i.e. mid-superstep-5 work — exercising the crash window the
# _SUCCESS gate exists for.
set -u
WD=${1:-/tmp/resume_bench}
cd "$(dirname "$0")/.."
rm -rf "$WD"; mkdir -p "$WD"

echo "== phase 1: uninterrupted baseline =="
python tools/resume_bench.py baseline "$WD" 2>"$WD/baseline.err" | tee "$WD/baseline.json"

echo "== phase 2: checkpointed run, kill -9 after superstep 4 commits =="
setsid python tools/resume_bench.py crashme "$WD" \
  >"$WD/crashme.out" 2>"$WD/crashme.err" &
PID=$!
while [ ! -e "$WD/ck/pr12m/metrics/superstep=4/_SUCCESS" ]; do
  if ! kill -0 "$PID" 2>/dev/null; then
    echo "crashme exited before superstep 4 — see $WD/crashme.err"
    break
  fi
  sleep 0.2
done
kill -9 -- "-$PID" 2>/dev/null
wait "$PID" 2>/dev/null
echo "killed crashme (pgid $PID); committed superstep dirs:"
ls -d "$WD"/ck/pr12m/state/superstep=* 2>/dev/null | wc -l

echo "== phase 3: fresh process resumes and must match baseline =="
python tools/resume_bench.py resume "$WD" 2>"$WD/resume.err" | tee "$WD/resume.json"
