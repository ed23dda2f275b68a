"""Persistent XLA compilation cache.

The flagship training run's wall-clock is dominated by one-time XLA
compiles (~40 s each for the bilevel step and eval programs on a
tunneled TPU; RESULTS.md). The reference implementation has no analog
(PyTorch eager pays per-op dispatch instead); for us, enabling JAX's
persistent compilation cache makes every run after the first skip
compilation entirely, which is most of the "wall-clock to reference
test accuracy" north-star metric (BASELINE.md) for short runs.

Enabled automatically by the PSVI engines, the CLI, and bench.py.
Environment overrides:

  PSVI_TPU_CACHE_DIR=<dir>        cache location
                                  (default ~/.cache/psvi_tpu_xla)
  PSVI_TPU_NO_COMPILE_CACHE=1     disable entirely
"""

from __future__ import annotations

import os

_enabled = False


def enable_persistent_compile_cache() -> None:
    """Idempotently turn on JAX's on-disk compilation cache.

    Safe to call any time before (or after) backend initialization; only
    compiles issued after the call can hit the cache. No-op when
    ``PSVI_TPU_NO_COMPILE_CACHE=1`` or when the cache dir can't be created.
    """
    global _enabled
    if _enabled or os.environ.get("PSVI_TPU_NO_COMPILE_CACHE") == "1":
        return
    cache_dir = os.environ.get(
        "PSVI_TPU_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache", "psvi_tpu_xla"),
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
    except OSError:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache everything that takes noticeable time; tiny programs recompile
    # faster than they deserialize.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled = True
