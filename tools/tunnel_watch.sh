#!/bin/bash
# Tunnel watcher — probes the axon TPU tunnel every 10 min; when two
# consecutive probes pass, launches tools/chip_agenda.sh and exits.
# Writes state to tools/agenda_out/watch.log (PROBE_FAIL / PROBE_OK /
# AGENDA_RUNNING / AGENDA_DONE) so the interactive session can tell
# whether the chip is claimed.  Usage: bash tools/tunnel_watch.sh
set -u
cd "$(dirname "$0")/.."
OUT=tools/agenda_out
mkdir -p "$OUT"
LOG="$OUT/watch.log"
ok=0
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
assert float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))) == 256.0**3
print('ok')" >/dev/null 2>&1; then
    ok=$((ok+1))
    echo "$(date +%H:%M:%S) PROBE_OK ($ok/2)" >> "$LOG"
  else
    ok=0
    echo "$(date +%H:%M:%S) PROBE_FAIL" >> "$LOG"
  fi
  if [ "$ok" -ge 2 ]; then
    echo "$(date +%H:%M:%S) AGENDA_RUNNING" >> "$LOG"
    bash tools/chip_agenda.sh "$OUT"
    echo "$(date +%H:%M:%S) AGENDA_DONE" >> "$LOG"
    exit 0
  fi
  sleep 600
done
