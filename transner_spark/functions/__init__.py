"""Session construction and shared column helpers."""
