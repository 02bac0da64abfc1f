"""Composite operators Spark lacks as single primitives (as-of join,
near-dup dedup, blocked kNN, …) — each built Spark-first: DataFrame
compositions where semantics allow, Arrow-batched pandas UDFs where not.
"""
