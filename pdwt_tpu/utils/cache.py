"""Persistent XLA compilation cache for tunnel-remote backends.

Through the axon TPU tunnel a fresh compile of a fused-kernel program
costs 10-60+ s (and in degraded tunnel phases, large compiles can hang
for tens of minutes).  JAX's persistent compilation cache stores the
serialized executable keyed by the HLO hash, so every *repeat* compile
— across processes and sessions — becomes a local file load (measured
on the axon chip: tiny jit 1.7 s -> 0.3 s; a 512^2 3-level db7 pallas
roundtrip 9.2 s -> 2.0 s end-to-end).  Mosaic custom-call payloads are
part of the cached executable, so pallas programs cache like any other.

Not enabled at package import (a library should not write to disk by
default) — the chip-facing entry points (bench.py, bench_all.py,
tools/*) and the TPU test suite call :func:`enable_compile_cache`, and
users can opt in the same way or via ``JAX_COMPILATION_CACHE_DIR``.
"""
from __future__ import annotations

import os

def _default_dir() -> str:
    """``<repo>/.jax_cache`` for a checkout; for an installed copy whose
    tree is not writable (site-packages), a user cache dir instead."""
    repo = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    if os.access(repo, os.W_OK):
        return os.path.join(repo, ".jax_cache")
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "pdwt_tpu", "jax_cache")


def enable_compile_cache(path: str | None = None,
                         min_compile_secs: float = 0.5) -> str:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``<repo>/.jax_cache``, overridable via ``PDWT_TPU_COMPILE_CACHE``).
    Safe to call repeatedly and before/after backend init (but before
    the first compile to catch everything).  Returns the directory."""
    import jax

    path = (path or os.environ.get("PDWT_TPU_COMPILE_CACHE")
            or _default_dir())
    jax.config.update("jax_compilation_cache_dir", path)
    # trivial programs are faster to recompile than to hash+load;
    # everything slower than ~0.5 s (= anything remote) is cached
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
