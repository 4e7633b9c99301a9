"""Interop with the reference TF implementation (checkpoint import)."""
