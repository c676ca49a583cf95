"""Event-time windowing (the north rule's first-class ops).

The reference's only windowing construct is the batch policy
(/root/reference/lib/message/batch/policy.go:86-251 — count/bytes/period
triggers); tumbling/sliding/session event-time windows with watermarks are
the Spark-native generalization the north rule requires. All aggregations
here are built-in Catalyst aggregates (map-side partial aggregation, no
Python), and every function works identically on batch and streaming
DataFrames — the streaming variant only adds the watermark.

Generic functions take explicit ``keys``/``ts_col``/``aggs``; the
``*_host_agg`` wrappers keep the Common-Crawl pages defaults
(url_host / warc_ts).

Watermark policy: a watermark is added iff the DataFrame is streaming AND
``watermark`` is not None. Callers chaining stateful operators (dedupe →
window) must pass ``watermark=None`` downstream of the operator that already
defined one — the spec compiler (engine/spark_exec.py NativePipeline) tracks
this statically, so no runtime introspection of the analyzed plan is needed.

Skew: hot hosts are handled by two-phase salted aggregation
(``salted_host_window_agg``) — partial agg on (salt, host, window) then
final agg on (host, window) — plus AQE skew handling at shuffle time.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, functions as F


def _with_watermark(df: DataFrame, ts_col: str, watermark: Optional[str]) -> DataFrame:
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
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


def _select_window(out: DataFrame, keys: Sequence[str]) -> DataFrame:
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *keys,
        *[c for c in out.columns if c != "win" and c not in keys],
    )


def tumbling_agg(
    df: DataFrame,
    size: str,
    keys: Sequence[str],
    ts_col: str,
    aggs: Sequence,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Tumbling window: groupBy(window(ts_col, size), *keys).agg(*aggs)."""
    df = _with_watermark(df, ts_col, watermark)
    out = df.groupBy(F.window(ts_col, size).alias("win"), *keys).agg(*aggs)
    return _select_window(out, keys)


def sliding_agg(
    df: DataFrame,
    size: str,
    slide: str,
    keys: Sequence[str],
    ts_col: str,
    aggs: Sequence,
    watermark: Optional[str] = None,
) -> DataFrame:
    df = _with_watermark(df, ts_col, watermark)
    out = df.groupBy(F.window(ts_col, size, slide).alias("win"), *keys).agg(*aggs)
    return _select_window(out, keys)


def session_agg(
    df: DataFrame,
    gap: str,
    keys: Sequence[str],
    ts_col: str,
    aggs: Sequence,
    watermark: Optional[str] = None,
) -> DataFrame:
    """Session window (gap-based); streaming requires a watermark upstream or
    via the ``watermark`` arg."""
    df = _with_watermark(df, ts_col, watermark)
    out = df.groupBy(F.session_window(ts_col, gap).alias("win"), *keys).agg(*aggs)
    return _select_window(out, keys)


def keep_first_agg(
    df: DataFrame,
    size: str,
    keys: Sequence[str],
    ts_col: str,
    tiebreak: Optional[Sequence[str]] = None,
    payload: Optional[Sequence[str]] = None,
    watermark: Optional[str] = None,
) -> DataFrame:
    """First row per (window, keys) by (ts_col, *tiebreak) — the reference's
    ``batch_index() > 0 => deleted()`` idiom (config/test/bloblang_windowed.yaml)
    generalized to event-time windows.

    Plan shape: in BATCH mode with at most one fixed-width tiebreak column
    this runs as a pure-hash cascade — min(ts) per (window, keys), join to
    the tied rows, optionally min(tiebreak) + join again. No SortAggregate
    (min_by's struct buffer is not hash-aggregatable — at 100 TB that is a
    full sort of the table), no row_number window. Streaming mode (join
    after aggregation is another stateful op) and var-length tiebreaks keep
    the ``min_by`` form, whose per-micro-batch sort is bounded by batch
    size. The (ts, tiebreak) pair should be unique per (window, keys);
    tied winners would each survive the join."""
    df = _with_watermark(df, ts_col, watermark)
    payload = list(payload or [c for c in df.columns if c not in keys])
    fixed = (
        "tinyint", "smallint", "int", "bigint", "float", "double",
        "date", "timestamp", "timestamp_ntz", "boolean",
    )
    tb = list(tiebreak or [])
    hash_ok = (
        not df.isStreaming
        and len(tb) <= 1
        and all(dict(df.dtypes).get(c) in fixed for c in tb)
    )
    if hash_ok:
        # NULL group keys form a group like the min_by path keeps them;
        # the join-backs use null-safe equality so those rows survive.
        def _min_join(src: DataFrame, agg_col, agg_name: str) -> DataFrame:
            g = src.groupBy("__ws", *keys).agg(F.min(agg_col).alias(agg_name))
            jk = ["__ws", *keys]
            w = g.select(*[F.col(k).alias(f"__j_{k}") for k in jk], agg_name)
            cond = None
            for k in jk:
                c = src[k].eqNullSafe(w[f"__j_{k}"])
                cond = c if cond is None else (cond & c)
            return (
                src.join(w, cond)
                .where(F.col(agg_col) == F.col(agg_name))
                .select(*src.columns)
            )

        base = df.withColumn("__ws", F.window(ts_col, size)["start"])
        t1 = _min_join(base, ts_col, "__mts")
        if tb:
            t1 = _min_join(t1, tb[0], "__mtb")
        return t1.select(
            F.col("__ws").alias("win_start"), *keys, *payload
        )
    order = F.struct(ts_col, *tb)
    out = df.groupBy(F.window(ts_col, size).alias("win"), *keys).agg(
        F.min_by(F.struct(*payload), order).alias("__first")
    )
    return out.select(
        F.col("win.start").alias("win_start"),
        *keys,
        *[F.col(f"__first.{c}").alias(c) for c in payload],
    )


# ---------------------------------------------------------------- pages API
def tumbling_host_agg(
    df: DataFrame,
    size: str = "10 minutes",
    watermark: Optional[str] = "30 minutes",
    aggs: Optional[Sequence] = None,
) -> DataFrame:
    """Tumbling window per host: groupBy(window(warc_ts, size), url_host)."""
    return tumbling_agg(
        with_host(df), size, ["url_host"], "warc_ts", aggs or _DEFAULT_AGGS(), watermark
    )


def sliding_host_agg(
    df: DataFrame,
    size: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: Optional[str] = "30 minutes",
    aggs: Optional[Sequence] = None,
) -> DataFrame:
    return sliding_agg(
        with_host(df), size, slide, ["url_host"], "warc_ts", aggs or _DEFAULT_AGGS(), watermark
    )


def session_host_agg(
    df: DataFrame,
    gap: str = "5 minutes",
    watermark: Optional[str] = "30 minutes",
    aggs: Optional[Sequence] = None,
) -> DataFrame:
    return session_agg(
        with_host(df), gap, ["url_host"], "warc_ts", aggs or _DEFAULT_AGGS(),
        watermark or "30 minutes",
    )


def keep_first_of_window(
    df: DataFrame,
    size: str = "10 minutes",
    watermark: Optional[str] = "30 minutes",
) -> DataFrame:
    """First page per (window, host)."""
    return keep_first_agg(
        with_host(df),
        size,
        ["url_host"],
        "warc_ts",
        tiebreak=["url"],
        payload=["url", "warc_ts", "text", "lang"],
        watermark=watermark,
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
    df = _with_watermark(with_host(df), "warc_ts", watermark)
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
