"""Event-time windowing keyed by url-host (the north rule's first-class ops).

The reference's only windowing construct is the batch policy
(/root/reference/lib/message/batch/policy.go:86-251 — count/bytes/period
triggers); tumbling/sliding/session event-time windows with watermarks are
the Spark-native generalization the north rule requires. All aggregations
here are built-in Catalyst aggregates (map-side partial aggregation, no
Python), and every function works identically on batch and streaming
DataFrames — the streaming variant only adds the watermark.

Skew: hot hosts are handled by two-phase salted aggregation
(``salted_host_window_agg``) — partial agg on (salt, host, window) then
final agg on (host, window) — plus AQE skew handling at shuffle time.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

def has_watermark(df: DataFrame) -> bool:
    """True if an event-time watermark is already defined upstream (Spark
    disallows redefining one below another stateful operator)."""
    try:
        return "EventTimeWatermark" in df._jdf.queryExecution().analyzed().toString()
    except Exception:
        return False


def _with_watermark(df: DataFrame, watermark):
    if watermark and df.isStreaming and not has_watermark(df):
        return df.withWatermark("warc_ts", watermark)
    return df


def url_host_col():
    """url -> host, pure Catalyst expression (no UDF)."""
    return F.split(F.col("url"), "/")[2]


def with_host(df: DataFrame) -> DataFrame:
    """Derive url_host with a pure Catalyst expression (no UDF)."""
    if "url_host" in df.columns:
        return df
    return df.withColumn("url_host", url_host_col())


_DEFAULT_AGGS = lambda: [  # noqa: E731
    F.count(F.lit(1)).alias("n_pages"),
    F.approx_count_distinct("url").alias("approx_urls"),
    F.sum(F.length("text")).alias("total_chars"),
    F.max("warc_ts").alias("max_ts"),
]


def tumbling_host_agg(
    df: DataFrame,
    size: str = "10 minutes",
    watermark: Optional[str] = "30 minutes",
    aggs: Optional[Sequence] = None,
) -> DataFrame:
    """Tumbling window per host: groupBy(window(warc_ts, size), url_host)."""
    df = _with_watermark(with_host(df), watermark)
    out = df.groupBy(F.window("warc_ts", size).alias("win"), "url_host").agg(
        *(aggs or _DEFAULT_AGGS())
    )
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "url_host",
        *[c for c in out.columns if c not in ("win", "url_host")],
    )


def sliding_host_agg(
    df: DataFrame,
    size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: Optional[str] = "30 minutes",
    aggs: Optional[Sequence] = None,
) -> DataFrame:
    df = _with_watermark(with_host(df), watermark)
    out = df.groupBy(F.window("warc_ts", size, slide).alias("win"), "url_host").agg(
        *(aggs or _DEFAULT_AGGS())
    )
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "url_host",
        *[c for c in out.columns if c not in ("win", "url_host")],
    )


def session_host_agg(
    df: DataFrame,
    gap: str = "5 minutes",
    watermark: Optional[str] = "30 minutes",
    aggs: Optional[Sequence] = None,
) -> DataFrame:
    """Session window per host (gap-based); streaming requires a watermark."""
    df = with_host(df)
    if df.isStreaming and not has_watermark(df):
        df = df.withWatermark("warc_ts", watermark or "30 minutes")
    out = df.groupBy(F.session_window("warc_ts", gap).alias("win"), "url_host").agg(
        *(aggs or _DEFAULT_AGGS())
    )
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "url_host",
        *[c for c in out.columns if c not in ("win", "url_host")],
    )


def keep_first_of_window(
    df: DataFrame,
    size: str = "10 minutes",
    watermark: Optional[str] = "30 minutes",
) -> DataFrame:
    """First page per (window, host) — the reference's
    ``batch_index() > 0 => deleted()`` idiom (config/test/bloblang_windowed.yaml)
    generalized to event-time windows. Uses ``min_by`` (works in streaming agg
    where row_number does not)."""
    df = _with_watermark(with_host(df), watermark)
    first = F.min_by(F.struct("url", "warc_ts", "text", "lang"), F.struct("warc_ts", "url")).alias("first_row")
    out = df.groupBy(F.window("warc_ts", size).alias("win"), "url_host").agg(first)
    return out.select(
        F.col("win.start").alias("win_start"),
        "url_host",
        F.col("first_row.url").alias("url"),
        F.col("first_row.warc_ts").alias("warc_ts"),
        F.col("first_row.text").alias("text"),
        F.col("first_row.lang").alias("lang"),
    )


def salted_host_window_agg(
    df: DataFrame,
    size: str = "10 minutes",
    watermark: Optional[str] = "30 minutes",
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase aggregation for hot-host skew (SURVEY.md §4 item 3):
    phase 1 aggregates on (window, host, salt = xxhash64(url) % n_salt) so a
    hot host's rows spread over n_salt reducers; phase 2 combines the
    partials per (window, host). Only algebraic aggregates participate.

    At 100 TB the phase-1 shuffle is the dominant cost; salting bounds the
    largest reducer at ~1/n_salt of the hottest host instead of 100% of it.
    """
    df = _with_watermark(with_host(df), watermark)
    salt = F.pmod(F.xxhash64("url"), F.lit(n_salt)).alias("salt")
    partial = df.groupBy(
        F.window("warc_ts", size).alias("win"), "url_host", salt
    ).agg(
        F.count(F.lit(1)).alias("n_pages"),
        F.sum(F.length("text")).alias("total_chars"),
        F.max("warc_ts").alias("max_ts"),
    )
    out = partial.groupBy("win", "url_host").agg(
        F.sum("n_pages").alias("n_pages"),
        F.sum("total_chars").alias("total_chars"),
        F.max("max_ts").alias("max_ts"),
    )
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        "url_host",
        "n_pages",
        "total_chars",
        "max_ts",
    )
