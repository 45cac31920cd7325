"""Backend-platform pinning for entry points.

The environment can pin a hardware plugin (e.g. the remote-TPU tunnel)
that WINS the JAX_PLATFORMS env race; when a caller explicitly asks for
the CPU backend via JAX_PLATFORMS=cpu, that intent must be routed
through jax.config BEFORE any backend probe — probing a hardware backend
whose tunnel is down blocks forever (same hardening as
__graft_entry__.dryrun_multichip)."""

from __future__ import annotations

import os


def pin_platform_from_env() -> None:
  spec = os.environ.get("JAX_PLATFORMS", "").strip().lower()
  if spec and "," not in spec:
    import jax
    try:
      jax.config.update("jax_platforms", spec)
    except RuntimeError:
      pass  # backends already initialized; nothing to pin
