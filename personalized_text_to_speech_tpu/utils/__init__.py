"""Utilities: checkpointing, torch interop, logging, CLI helpers."""
