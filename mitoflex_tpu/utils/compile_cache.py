"""Persistent XLA compilation cache for CPU-backend runs.

The pipeline's wall clock on small inputs is compile-dominated (the e2e
fixture spends most of its ~35 s in one-time XLA compiles). Enabling
jax's persistent cache makes repeat runs — CI, the bench harness, and
re-entrant stage reruns — start at steady state.

ONLY enabled on the CPU backend: on the sandbox's tunneled TPU backend
(axon) executable serialization is known to wedge the remote session
(PLAN.md round-1 gotchas), and co-located TPU runtimes manage their own
cache policy. ``MITOFLEX_COMPILE_CACHE=0`` disables; a custom directory
can be passed or set via ``MITOFLEX_COMPILE_CACHE_DIR``.
"""

from __future__ import annotations

import os

_enabled = False


def enable(cache_dir: str | None = None) -> bool:
    """Idempotently enable the persistent compile cache when running on
    CPU. Returns True when active."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("MITOFLEX_COMPILE_CACHE", "1") in ("0", "false", "off"):
        return False
    import jax

    try:
        if jax.default_backend() != "cpu":
            return False
    except Exception:
        return False
    # default under the user's home, NOT tempdir: survives reboots ("pay
    # once per machine") and avoids a predictable world-writable /tmp
    # path another local user could pre-own or seed
    path = (os.environ.get("MITOFLEX_COMPILE_CACHE_DIR") or cache_dir
            or os.path.expanduser("~/.cache/mitoflex_tpu/xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # the pipeline is many mid-size programs (~0.3 s compiles), not
        # one big one — the 1 s default would cache almost nothing
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.08)
    except Exception:
        return False
    _enabled = True
    return True
