#!/bin/bash
# One-shot chip measurement agenda — run when the axon tunnel is healthy.
# Captures everything the round still needs from the real TPU, each step
# under its own timeout so one hung remote compile doesn't block the rest.
# Usage: bash tools/chip_agenda.sh [outdir]   (default tools/agenda_out)
set -u
OUT="${1:-tools/agenda_out}"
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {  # step <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name (timeout ${t}s) ===" | tee -a "$OUT/agenda.log"
  timeout "$t" "$@" >"$OUT/$name.out" 2>"$OUT/$name.err"
  echo "$name exit=$?" | tee -a "$OUT/agenda.log"
}

# 0. health probe — bail early if the tunnel is dead
step probe 180 python -c "
import jax, jax.numpy as jnp
print(jax.devices())
print(float(jax.jit(lambda a: (a@a).sum())(jnp.ones((256,256)))))"
grep -q "16777216" "$OUT/probe.out" || { echo "tunnel dead — aborting" | tee -a "$OUT/agenda.log"; exit 1; }

# 1. round-4 A/Bs FIRST (smallest regret if a later large compile
# hangs the agenda): MXU depth pass, bf16 L1 scheme ladder, SWT scheme
step depth_mm_ab 2400 python tools/depth_mm_ab.py "$OUT/depth_mm_ab.json"
step b2_err 2400 python tools/b2_sweep.py "$OUT/b2_err.json" err
step b2_speed 2400 python tools/b2_sweep.py "$OUT/b2_speed.json" speed
step swt_b2_ab 2400 python tools/swt_b2_ab.py "$OUT/swt_b2_ab.json"

# 2. feature configs (3D roundtrip/TI-denoise (+bf16), wavelet packets,
# rank-3 quads, CWT — bench_all's argv substrings)
step bench_new 2400 python bench_all.py 3D WP2D RANK-3 CWT

# 3. full bench sweep (all configs, f32 + bf16 + mixed)
step bench_all 5400 python bench_all.py

# 4. headline
step bench 1200 python bench.py

# 5. TPU-gated hardware equality sweeps (one compile per family): 2D/1D
# kernel families + the 3D family sweep added this round
step tpu_sweep 2400 env PDWT_TEST_TPU=1 python -m pytest \
  tests/test_tpu_sweep.py -q

echo "agenda complete" | tee -a "$OUT/agenda.log"
