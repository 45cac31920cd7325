"""Training: losses, optimizer groups, jitted train steps."""
