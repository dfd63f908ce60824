"""Utilities: phase timers, validation helpers, load-imbalance metrics."""
