"""End-to-end pipeline stages mirroring the reference's step-1/2/3
semantics (SURVEY §3), re-expressed as single declarative Spark plans.
"""
