"""Visualization, checkpointing, logging, and torch-weight conversion."""
