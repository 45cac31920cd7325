"""Datasets, view selection, and the host-side input pipeline."""
