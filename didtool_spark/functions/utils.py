"""Column-level utility helpers (reference didtool/utils.py).

to_ndarray/unpack_tuple are pandas-era shims with no Spark meaning;
is_categorical becomes an explicit ``categorical_cols`` declaration
(Spark has no category dtype); handle_categorical_value lives in
operators.metrics.handle_categorical_expr.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, functions as F

from .exprs import is_missing


def fillna(df: DataFrame, cols: Iterable[str], value) -> DataFrame:
    """utils.py:70-88: replace NULL/NaN with `value` (new columns, no
    mutation)."""
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.when(is_missing(F.col(c)), F.lit(value)).otherwise(F.col(c))
        )
    return out


def bounded_sample_pandas(proj: DataFrame, sample_limit: int, seed: int = 0):
    """Driver-bounded toPandas: exact fraction sample when the projected
    table exceeds ``sample_limit`` rows — the shared core behind every
    driver-side model/selector fit (model state is driver-sized by
    nature; everything else stays distributed)."""
    n = proj.count()
    if n > sample_limit:
        proj = proj.sample(fraction=sample_limit / n, seed=seed)
    return proj.toPandas()


class Logger:
    """Reference didtool/logger.py:12-26: tee stdout writes to a log
    file, flushing per write (assign to sys.stdout like the reference's
    usage). Driver-side convenience only — executors log via Spark."""

    def __init__(self, file_name: str = "Default.log"):
        import sys

        self.terminal = sys.stdout
        self.log = open(file_name, "w", encoding="utf-8")

    def write(self, message: str) -> None:
        self.terminal.write(message)
        self.log.write(message)
        self.flush()

    def flush(self) -> None:
        self.log.flush()
