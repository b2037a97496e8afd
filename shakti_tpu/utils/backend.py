"""Backend bring-up resilience for entry scripts.

The axon TPU tunnel plugin intermittently fails to register when
JAX_PLATFORMS=axon is pinned ("Backend 'axon' is not in the list of known
backends").  jax caches backend-init failure for the process lifetime, so
the only in-process remedy is to re-exec once with auto-discovery.

Call ensure_backend() BEFORE the first jax device use (it imports jax).
"""

from __future__ import annotations

import os
import sys

_RETRY_FLAG = "_SHAKTI_BACKEND_RETRY"


def ensure_backend():
    """Probe jax backend init; on failure re-exec this script once with
    JAX_PLATFORMS auto-discovery."""
    if os.environ.get(_RETRY_FLAG) == "1":
        return
    try:
        import jax
        jax.devices()
    except RuntimeError:
        os.environ["JAX_PLATFORMS"] = ""
        os.environ[_RETRY_FLAG] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)


def honor_platforms_env():
    """Pin jax to the platform named in JAX_PLATFORMS, via jax.config.

    On this host the axon plugin registers itself regardless of the
    JAX_PLATFORMS *environment variable* (it is read before the plugin
    overrides it), so `JAX_PLATFORMS=cpu python -m shakti_tpu ...` would
    still open the TPU tunnel.  `jax.config.update("jax_platforms", ...)`
    is honored; call this before the first device use.  No-op when the
    variable is unset (auto-discovery) or jax is already initialized.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax
    try:
        jax.config.update("jax_platforms", plat)
    except RuntimeError:
        pass  # backend already initialized — too late to repin


def enable_compile_cache(path: str | None = None) -> str | None:
    """Opt into JAX's persistent compilation cache (XLA executables are
    reloaded from disk instead of recompiled across processes/runs).

    Large-mesh XLA compiles are minutes (1M dof: ~18 s on CPU, ~1,500 s
    through the tunnel TPU; 4M dof: ~1,500 s on CPU), and the reference's
    PETSc stack has no compile step at all — the cache removes the cost
    from every run after the first.  Opt-in (``SHAKTI_COMPILE_CACHE=dir``
    or the CLI's ``--compile-cache``) because on CPU the reloaded AOT
    executable warns when the recorded machine features differ from the
    host's; on TPU it is the standard production mechanism.

    Must be called before the first compilation.  Returns the resolved
    cache directory, or None when disabled.
    """
    path = path or os.environ.get("SHAKTI_COMPILE_CACHE")
    if not path:
        return None
    path = os.path.abspath(os.path.expanduser(path))
    os.makedirs(path, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program: the per-step program is the whole workload,
    # and even "fast" compiles are seconds at production mesh sizes
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
