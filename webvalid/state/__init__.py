"""Stateful streaming-mode components (named Ray actors)."""
