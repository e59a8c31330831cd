"""Make JAX_PLATFORMS work in environments that force a platform config.

Some interpreter setups (e.g. a remote-TPU PJRT plugin registered from
sitecustomize) call ``jax.config.update("jax_platforms", ...)`` at startup,
which silently OVERRIDES the ``JAX_PLATFORMS`` environment variable for
every later import. A script that sets ``JAX_PLATFORMS=cpu`` then believes
it is running on host CPU while every eager op actually crosses the remote
tunnel — at full-model sizes that is minutes of hidden dispatch and it
congests the shared device for everyone else (observed live: a full-size
"CPU" drill run slowed a concurrent on-device bench ~4x).

Call :func:`respect_jax_platforms_env` once, before first backend use, in
any entry point that documents ``JAX_PLATFORMS`` as a supported knob. The
test conftest does the equivalent inline.
"""

from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    """Re-apply the JAX_PLATFORMS env var over any startup config override."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    if jax.config.jax_platforms != env:
        jax.config.update("jax_platforms", env)
