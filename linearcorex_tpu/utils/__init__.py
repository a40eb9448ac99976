"""Checkpointing and validation utilities."""
