"""Jit-compiled volume rendering of ray batches and full images."""
