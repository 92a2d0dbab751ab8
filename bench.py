"""Benchmark harness — north-star metric (BASELINE.json).

Measures Mpix/s/chip for the 2D db7 5-level forward+inverse DWT on a
2048x2048 float32 image (the BASELINE.json headline config), on whatever
accelerator JAX selects (the real TPU chip under the driver).

The reference publishes no numbers (BASELINE.md); ``vs_baseline`` is
reported against a documented 1000 Mpix/s reference-GPU-class estimate
for PDWT on this config (see BASELINE.md "Consequence for this project").

Prints exactly one JSON line on stdout; diagnostics go to stderr.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_GPU_ESTIMATE_MPIX_S = 1000.0

N = 2048
LEVELS = 5
WNAME = "db7"
WARMUP = 3
REPS = 5
INNER = 10


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pdwt_tpu.core import separable as sep
    from pdwt_tpu.filters import get_wavelet

    dev = jax.devices()[0]
    log(f"device: {dev.platform}:{dev.device_kind}")
    wav = get_wavelet(WNAME)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((N, N)) * 255.0, dtype=jnp.float32)

    @jax.jit
    def roundtrip(x):
        c = sep.dwt2d(x, wav, LEVELS)
        return sep.idwt2d(c, wav, (N, N))

    t0 = time.perf_counter()
    out = roundtrip(img)
    out.block_until_ready()
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")
    err = float(jnp.max(jnp.abs(out - img)))
    log(f"max recon error on [0,255]-scale data: {err:.3e}")

    for _ in range(WARMUP):
        roundtrip(img).block_until_ready()

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        for _ in range(INNER):
            out = roundtrip(img)
        out.block_until_ready()
        times.append((time.perf_counter() - t0) / INNER)
    best = min(times)
    mpix_s = (N * N) / best / 1e6
    log(f"per-iteration times (s): {['%.5f' % t for t in times]}")

    print(json.dumps({
        "metric": f"Mpix/s/chip, 2D {WNAME} {LEVELS}-level fwd+inv ({N}x{N})",
        "value": round(mpix_s, 1),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / REFERENCE_GPU_ESTIMATE_MPIX_S, 3),
        "max_recon_error": err,
        "device": f"{dev.platform}:{dev.device_kind}",
    }))


if __name__ == "__main__":
    main()
