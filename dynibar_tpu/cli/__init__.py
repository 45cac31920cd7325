"""Command-line entry points (train / eval / render / preprocess)."""
