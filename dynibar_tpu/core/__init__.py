"""Pure-functional geometry / sampling / compositing kernels (jnp only)."""
