"""Logical plans: layer job -> DataFrame DAG (SURVEY §3.4)."""
