"""didtool_spark — a PySpark-native feature-engineering engine.

Reimplements the capabilities of the reference feature-engineering
toolkit (dustless/didtool) Spark-first: fit = distributed aggregation
-> small broadcastable state; transform = generated column expressions;
plus the point-in-time temporal core (as-of join, lag/lead, rolling,
sessionization, backfill) the reference lacks.
"""
__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
