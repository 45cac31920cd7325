"""Hot compute primitives (jnp reference implementations + Pallas kernels)."""
