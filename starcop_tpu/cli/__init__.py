"""Command-line entry points: train, evaluate, mag1c, infer-emit, prepare-data."""
