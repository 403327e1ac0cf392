"""Force jax's persistent compilation cache ON for the axon relay.

jax gates the persistent cache on `backend.platform in (tpu, gpu, cpu,
neuron)` (jax/_src/compilation_cache.py is_cache_used), so on the
`axon` relay platform every JAX_COMPILATION_CACHE_DIR setting of rounds
1-4 was a PLACEBO — each fresh environment recompiled everything, which
is where the driver's 26.8s mid-run compile (VERDICT r4 item 8) and the
relay-wedge recompile storms came from.

Forcing the flag is safe: the compiler wraps both the cache get and the
cache put in `except Exception` (jax/_src/compiler.py) — if the relay
backend cannot (de)serialize an executable the cache silently skips,
which is exactly the prior behavior.
"""
from __future__ import annotations

_done = False


def enable_relay_compile_cache() -> bool:
    """Mark the compilation cache usable regardless of platform.
    Idempotent; returns True if the override is in place."""
    global _done
    if _done:
        return True
    try:
        import os

        import jax
        from jax._src import compilation_cache as cc

        # The axon sitecustomize imports jax at interpreter start, so
        # env vars set later (bench.py, tests) never reach jax's
        # config.  Set the cache dir explicitly; repo-local so it
        # survives fresh driver environments (/tmp does not).
        if not jax.config.jax_compilation_cache_dir:
            default = os.path.join(
                os.path.dirname(os.path.dirname(
                    os.path.dirname(os.path.abspath(__file__)))),
                ".jax_cache")
            jax.config.update(
                "jax_compilation_cache_dir",
                os.environ.get("JAX_COMPILATION_CACHE_DIR") or default)

        def is_cache_used(backend) -> bool:
            # replaces the platform gate entirely; must survive
            # xla_bridge backend-cache clears, which reset the
            # module's _cache_checked/_cache_used flags
            with cc._cache_initialized_mutex:
                cc._cache_checked = True
                cc._cache_used = cc._is_cache_enabled()
                return cc._cache_used

        cc.is_cache_used = is_cache_used
        with cc._cache_initialized_mutex:
            cc._cache_checked = True
            cc._cache_used = cc._is_cache_enabled()
        _done = True
    except Exception:
        return False
    return True
