#!/bin/bash
# Fed-throughput measurement set for the denoise/Nat ingest (VERDICT r4 #1).
# Appends driver-format JSON lines to docs/bench_e2e_r5.jsonl.
set -u
cd /root/repo
OUT=docs/bench_e2e_r5.jsonl
run() {
  echo "=== $* ===" >&2
  env "$@" /opt/venv/bin/python bench_e2e.py 2>>/tmp/r5_e2e_scenes.err | tail -1 >> "$OUT"
}
run MODE=denoise SECONDS=120
run MODE=nat SECONDS=120
# control: the reference's ship-raw-f32-tuples wire (no banks) — quantifies
# the wall the banks+int16 fixes remove
run MODE=denoise SECONDS=60 WIRE=f32 BANKS=0
run MODE=nat SECONDS=60 WIRE=f32 BANKS=0
echo done
