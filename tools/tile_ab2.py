"""Rep-interleaved tile A/B — the drift-proof follow-up to tile_ab.py.

tile_ab.py timed each config minutes apart and the control (a pin that
changes NO kernel: fwd:128x256 ≡ default) measured 15% from default —
chip/tunnel drift swamps the effect at that cadence.  Here the two
PROGRAMS (default inverse tiles vs inv:128x256) are traced once each,
then their timing reps are interleaved loop-by-loop so both see the
same drift phases; the slope difference is then trustworthy.
Usage: python tools/tile_ab2.py [out.json] [cfgA cfgB]
(cfg "default" = no pin; default pair: default vs inv:128x256)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pdwt_tpu.utils import enable_compile_cache  # noqa: E402
enable_compile_cache()

import numpy as np

K, M1, M2, REPS = 8, 1, 5, 12


def build(cfg):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from pdwt_tpu.core import separable as sep
    from pdwt_tpu.filters import get_wavelet

    w = get_wavelet("db7")
    if cfg is None:
        os.environ.pop("PDWT_TPU_VPU_TILES", None)
    else:
        os.environ["PDWT_TPU_VPU_TILES"] = cfg

    def rt(v):
        return sep.idwt2d(sep.dwt2d(v, w, 5), w, (2048, 2048))

    def make(M):
        @jax.jit
        def lp(x):
            def body(_, v):
                for _ in range(M):
                    v = rt(v)
                return v
            return lax.fori_loop(0, K, body, x)
        return lp
    return make(M1), make(M2)


def main(out_path="tools/tile_ab2_results.json", *argv):
    from _cli import check_out
    out_path = check_out(out_path)
    cfgs = [None if c in ("default", "none") else c for c in argv] \
        or [None, "inv:128x256"]
    if len(cfgs) != 2:  # fail BEFORE minutes of chip time, not after
        raise SystemExit(f"need exactly 2 configs (A B), got {len(cfgs)}: "
                         f"{[c or 'default' for c in cfgs]}")

    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 255, (2048, 2048)), jnp.float32)
    progs = [build(c) for c in cfgs]
    os.environ.pop("PDWT_TPU_VPU_TILES", None)
    for lp1, lp2 in progs:  # compile+warm both before any timing
        float(jnp.sum(lp1(x))); float(jnp.sum(lp2(x)))
    t = [[float("inf")] * 2 for _ in cfgs]
    for _ in range(REPS):
        for i, (lp1, lp2) in enumerate(progs):
            t0 = time.perf_counter(); float(jnp.sum(lp1(x)))
            t[i][0] = min(t[i][0], time.perf_counter() - t0)
            t0 = time.perf_counter(); float(jnp.sum(lp2(x)))
            t[i][1] = min(t[i][1], time.perf_counter() - t0)
    rows = []
    for c, (t1, t2) in zip(cfgs, t):
        ms = (t2 - t1) / (K * (M2 - M1)) * 1e3
        rows.append({"tiles": c or "default", "rt_ms": round(ms, 4)})
        print(rows[-1], flush=True)
    d, p = rows[0]["rt_ms"], rows[1]["rt_ms"]
    rows.append({"delta_pct": round((d - p) / d * 100, 2)})
    print(rows[-1], flush=True)
    with open(out_path, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main(*sys.argv[1:])
