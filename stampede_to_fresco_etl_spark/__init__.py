"""stampede_to_fresco_etl_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the query and
data-processing capabilities of the reference ETL pipeline
(j-mckerracher/stampede-to-fresco-etl): TACC-Stats node telemetry →
FRESCO long event table → job-accounting interval join → windowed,
pivoted wide output — plus the large-scale training-data operators
(dedup, similarity search, text analysis, multimodal plumbing) a
100 TB pipeline needs.

Everything is declarative DataFrame/SQL so Catalyst + Tungsten pick
the physical plan; no RDDs, no row-at-a-time Python in hot paths.
"""

from stampede_to_fresco_etl_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
