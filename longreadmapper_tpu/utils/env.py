"""Process-environment glue for platform selection.

Some TPU launch environments register the accelerator PJRT plugin from a
`sitecustomize` hook that force-selects it at interpreter boot, overriding a
`JAX_PLATFORMS=cpu` request from the environment.  Entry points call
`apply_platform_env()` before first backend use so the env var wins again
(matching tests/conftest.py, which does the same for the test mesh).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Re-assert the JAX_PLATFORMS env var as in-process jax config."""
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    try:
        import jax
        jax.config.update("jax_platforms", want)
    except Exception:
        pass
