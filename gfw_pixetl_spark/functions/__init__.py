"""Column-level function surface: hashing, text analysis, dedup,
similarity, the safe ``calc`` compiler, and pure-python geometry."""
