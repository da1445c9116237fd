"""Sources: transcript readers and the deterministic synthetic generator."""
