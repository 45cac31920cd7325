"""Flax network modules (feature extractor, IBR aggregators, motion field)."""
