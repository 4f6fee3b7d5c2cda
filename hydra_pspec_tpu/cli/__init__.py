"""Command-line driver (the reference's run-hydra-pspec.py equivalent)."""
