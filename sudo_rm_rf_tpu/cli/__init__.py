"""Command-line entry points: train, separate, bench."""
