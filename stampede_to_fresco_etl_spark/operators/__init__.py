"""Reusable Spark-first operators.

Each module re-expresses one family from SURVEY §2 as declarative
DataFrame transforms (Catalyst-optimizable), plus the training-data
operators (dedup / similarity / text / multimodal) a 100 TB pipeline
needs.
"""
