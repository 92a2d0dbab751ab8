"""Chip sweep of the bf16-mode L1 compute schemes (round 4).

The bf16 headline error (4.0 on [0,255] worst-case noise, BENCH_r03)
splits between L1 single-pass compute and the bf16 storage floor
(~1.5-2).  Round 4 added intermediate schemes between b1/fd and b3:
``b2f`` (filter ships as exact bf16 hi+lo splits, data rounded once)
and ``b2d`` (data split in-kernel, filter rounded once).  This tool
measures the end-to-end 2048^2 db7 5-level roundtrip error and device
time per (PDWT_TPU_BF16_L1FWD, PDWT_TPU_BF16_L1INV) combo on the chip.

Usage:
  python tools/b2_sweep.py [out.json] err [fwd:inv ...]
  python tools/b2_sweep.py [out.json] speed [fwd:inv ...]

``err`` compiles ONE roundtrip per combo (cheap) and reports max recon
error; ``speed`` compiles the two slope-method loop programs per combo
and interleaves timing reps across all combos (drift-proof).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np

N, LEVELS, WNAME = 2048, 5, "db7"
K, M1, M2, REPS = 8, 1, 5, 10

ERR_COMBOS = [f"{f}:{i}" for f in ("b1", "b2f", "b3")
              for i in ("fd", "b2f", "b2d", "b3")]
SPEED_COMBOS = ["b1:fd", "b2f:fd", "b2f:b2d", "b2f:b2f", "b3:b3"]


def main(out_path="tools/b2_sweep_results.json", mode="err", *argv):
    from _cli import check_out
    out_path = check_out(out_path)
    if mode not in ("err", "speed"):
        raise SystemExit(f"mode must be 'err' or 'speed', got {mode!r}")
    combos = list(argv) or (ERR_COMBOS if mode == "err" else SPEED_COMBOS)

    import jax
    import jax.numpy as jnp
    from jax import lax

    from pdwt_tpu.core import separable as sep
    from pdwt_tpu.filters import get_wavelet

    wav = get_wavelet(WNAME)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0.0, 255.0, (N, N)), jnp.float32)
    imgb = img.astype(jnp.bfloat16)

    def make_roundtrip():
        # a FRESH function object per combo: jit's global cache is keyed
        # on the function, so reusing one closure would silently return
        # the previous combo's executable (env is read at trace time)
        def roundtrip(x):
            c = sep.dwt2d(x, wav, LEVELS)
            return sep.idwt2d(c, wav, (N, N))
        return roundtrip

    def set_env(combo):
        f, i = combo.split(":")
        os.environ["PDWT_TPU_BF16_L1FWD"] = f
        os.environ["PDWT_TPU_BF16_L1INV"] = i

    rows = {}
    if mode == "err":
        for combo in combos:
            set_env(combo)
            t0 = time.time()
            out = jax.jit(make_roundtrip())(imgb)
            e = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                      - imgb.astype(jnp.float32))))
            rows[combo] = round(e, 3)
            print(f"{combo}: err {e:.3f}  ({time.time()-t0:.0f}s)",
                  flush=True)
    else:
        def loops():
            roundtrip = make_roundtrip()

            def make(M):
                @jax.jit
                def lp(x):
                    def body(_, v):
                        for _ in range(M):
                            v = roundtrip(v)
                        return v
                    return lax.fori_loop(0, K, body, x)
                return lp
            return make(M1), make(M2)

        progs = {}
        for combo in combos:
            set_env(combo)
            lp1, lp2 = loops()
            t0 = time.time()
            float(jnp.sum(lp1(imgb).astype(jnp.float32)))
            float(jnp.sum(lp2(imgb).astype(jnp.float32)))
            print(f"compiled {combo}: {time.time()-t0:.0f}s", flush=True)
            progs[combo] = (lp1, lp2)
        t = {c: [float("inf")] * 2 for c in combos}
        for _ in range(REPS):
            for combo, (lp1, lp2) in progs.items():
                t0 = time.perf_counter()
                float(jnp.sum(lp1(imgb).astype(jnp.float32)))
                t[combo][0] = min(t[combo][0], time.perf_counter() - t0)
                t0 = time.perf_counter()
                float(jnp.sum(lp2(imgb).astype(jnp.float32)))
                t[combo][1] = min(t[combo][1], time.perf_counter() - t0)
        for combo, (t1, t2) in t.items():
            ms = (t2 - t1) / (K * (M2 - M1)) * 1e3
            rows[combo] = {"ms": round(ms, 3),
                           "gpix_s": round(N * N / ms / 1e6, 2)}
            print(f"{combo}: {ms:.3f} ms = {rows[combo]['gpix_s']} GPix/s",
                  flush=True)

    for v in ("PDWT_TPU_BF16_L1FWD", "PDWT_TPU_BF16_L1INV"):
        os.environ.pop(v, None)
    out = {"mode": mode, "rows": rows}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main(*sys.argv[1:])
