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
