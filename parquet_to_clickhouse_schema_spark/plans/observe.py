"""Data-quality instrumentation with Observation metrics.

`df.observe()` attaches aggregate metrics to a DataFrame that are collected
AS A SIDE EFFECT of whatever action runs — one pass, zero extra jobs. This
is how a 100 TB pipeline counts nulls/violations without a second scan:
the quality counters ride along with the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_quality_metrics(
    df: DataFrame, not_null_cols: list[str], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach row-count + per-column null-count metrics. Returns the
    instrumented DataFrame and the Observation handle; read
    ``observation.get`` after ANY action on the returned DataFrame."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"n_null_{c}")
        for c in not_null_cols
    ]
    return df.observe(obs, *metrics), obs
