"""Command-line entry points (train / export / evaluate / export_eval)."""
