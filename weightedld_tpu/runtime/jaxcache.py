"""Persistent XLA compilation cache bootstrap.

TPU (re)compiles of the fused kernel cost minutes per process in
remote-compile environments; the persistent cache turns every repeat
invocation (CLI runs, bench passes, resumed jobs) into a ~2 s cache hit.
Enabled automatically on package import unless the user configured a cache
dir themselves or set ``WLD_NO_COMPILE_CACHE=1``.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> None:
    if os.environ.get("WLD_NO_COMPILE_CACHE") == "1":
        return
    try:
        import jax

        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return  # user already configured one (env or code)
        # TPU-only: CPU compiles are fast locally, and cached CPU AOT
        # artifacts carry machine-feature flags that can mismatch across
        # hosts (SIGILL risk warnings from cpu_aot_loader).
        platform = (getattr(jax.config, "jax_platforms", None) or "").split(",")[0]
        if platform not in ("", "tpu", "axon"):
            return
        path = os.path.join(
            os.path.expanduser("~"), ".cache", "weightedld_tpu", "jax"
        )
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # never fail import over cache setup
        pass
