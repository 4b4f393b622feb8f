"""Structured Streaming extensions (SURVEY §2.8: the reference is strictly
batch; streaming is the Spark-native upgrade path for incremental tiling)."""
