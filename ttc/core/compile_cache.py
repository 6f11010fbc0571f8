"""Persistent XLA compilation cache setup.

The ARD + predictor programs cost minutes of cold XLA compilation at
production geometry; the persistent cache turns every later process's
cold start into a disk rehydration. Call enable_persistent_cache()
before the first jit execution (CLI mains and bench do).

Default location: <repo>/.jax_cache (next to the ttc package),
override with TTC_COMPILE_CACHE=<dir>, disable with
TTC_COMPILE_CACHE=off.
"""
from __future__ import annotations

import os

_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(path: str | None = None) -> str | None:
    path = path or os.environ.get("TTC_COMPILE_CACHE") or _DEFAULT
    if path.lower() == "off":
        return None
    if os.environ.get("JAX_PLATFORMS", "") == "axon" \
            and not os.environ.get("TTC_COMPILE_CACHE"):
        # tunneled backends compile server-side: the client-side disk
        # cache never hits and only adds serialization overhead
        # (measured 172 s cold vs 209 s "cached" on axon)
        return None
    import jax

    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      1.0)
    return path
