"""Deterministic synthetic fixtures (FIXTURES.md F1/F3/F5), generated
entirely with Catalyst expressions over ``spark.range`` — pure functions of
(seed, row index), no driver-side row materialization, so generation itself
scales linearly with cores and rows.

The ``pages`` table matches BASELINE.json input_hint:
(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING).
Duplicate urls carry byte-identical text (the north-rule invariant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

_VOCAB = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident sunt"
).split()

_LANGS = ["en", "en", "en", "en", "de", "de", "fr", "fr", "es", "zh"]


def _make_blob(seed: int = 42, n_words: int = 700) -> str:
    """Fixed pseudo-lorem blob; slices of it are the page texts."""
    words = []
    x = seed
    for _ in range(n_words):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        words.append(_VOCAB[x % len(_VOCAB)])
    return " ".join(words)


_BLOB = _make_blob()
# ASCII blob as a BINARY literal: substring() over a string literal walks
# UTF-8 codepoints from the start of the 4.6 KB blob on EVERY row (~750 ns
# measured at 20M rows), while the binary slice is a raw byte copy and
# cast(binary as string) wraps the bytes without a walk. Byte-identical
# output (the blob is pure ASCII; equality verified row-for-row in
# tests/test_fixture_expr_equivalence.py) at ~20x less per-row cost —
# the flagship's generation stage was the single largest line item in the
# r6 profile (guide §1.2 step 2: per-task work).
_BLOB_BYTES = _BLOB.encode()

BASE_EPOCH = 1735689600  # 2025-01-01T00:00:00Z


def _u01(col, salt: int, seed: int):
    """Deterministic uniform [0,1) from a column + salt (xxhash64-based)."""
    h = F.xxhash64(col, F.lit(salt), F.lit(seed))
    return (F.pmod(h, F.lit(1_000_000)).cast("double")) / 1_000_000.0


def pages(
    spark: SparkSession,
    n_rows: int,
    n_hosts: int = 1000,
    dup_period: int = 50,
    late_frac: float = 0.05,
    late_max_s: int = 1200,
    seed: int = 42,
    n_partitions: int | None = None,
    zipf_exponent: float = 3.0,
    rows_per_sec: int = 1,
) -> DataFrame:
    """Common-Crawl-style pages stream fixture.

    - hot-host skew: host_id = floor(n_hosts * u^zipf_exponent) concentrates
      mass on low ids (the salting/AQE tests rely on this)
    - ~1/dup_period of rows are exact-duplicate urls with identical text
    - ~late_frac of rows arrive late by up to late_max_s seconds
    """
    df = spark.range(0, n_rows, numPartitions=n_partitions)
    id_ = F.col("id")

    # duplicates: rows where u_dup trips reuse the previous multiple-of-7 id
    u_dup = _u01(id_, 1, seed)
    base_id = F.when(u_dup < (1.0 / dup_period), (id_ - F.pmod(id_, F.lit(7)))).otherwise(id_)

    u_host = _u01(base_id, 2, seed)
    host_id = F.floor(F.pow(u_host, F.lit(zipf_exponent)) * n_hosts).cast("long")

    # deterministic text: a hash-addressed slice of a fixed lorem blob —
    # constant-time per row (no per-row array allocation; higher-order
    # functions are interpreted, not codegen'd, and GC-bind at high core
    # counts), byte-identical across duplicates since offset/len derive
    # from base_id
    blob_len = len(_BLOB)
    max_len = 1950
    offset = F.pmod(F.xxhash64(base_id, F.lit(3), F.lit(seed)), F.lit(blob_len - max_len - 1)) + 1
    length = 50 + F.pmod(F.xxhash64(base_id, F.lit(8), F.lit(seed)), F.lit(max_len - 50))
    # binary slice + cast, NOT substring on the string literal — identical
    # bytes (ASCII blob), ~20x cheaper per row (see _BLOB_BYTES note)
    text_bin = F.substring(F.lit(_BLOB_BYTES), offset, length)
    text = text_bin.cast("string")

    u_late = _u01(id_, 4, seed)
    late_s = F.when(
        u_late < late_frac,
        F.pmod(F.xxhash64(id_, F.lit(5), F.lit(seed)), F.lit(late_max_s)),
    ).otherwise(F.lit(0))
    warc_ts = F.timestamp_seconds(
        F.lit(BASE_EPOCH) + F.floor(id_ / rows_per_sec) - late_s
    )

    lang_arr = F.array(*[F.lit(x) for x in _LANGS])
    lang = F.element_at(
        lang_arr, (F.pmod(F.xxhash64(base_id, F.lit(6), F.lit(seed)), F.lit(len(_LANGS))) + 1).cast("int")
    )

    url = F.concat(
        F.lit("https://host-"),
        F.lpad(host_id.cast("string"), 4, "0"),
        F.lit(".example.com/page/"),
        # hex(long) == conv(string, 10, 16) for non-negative ids (both emit
        # uppercase, no leading zeros; row-for-row equality test-pinned) and
        # skips conv's string->decimal parse
        F.hex(base_id),
    )
    # concat the BINARY pieces directly: byte-identical to
    # encode(concat(string...), 'utf-8') for the ASCII payload, without
    # re-materializing text as a string and re-encoding it
    html = F.concat(
        F.lit(b"<html><body><p>"), text_bin, F.lit(b"</p></body></html>")
    )

    # r6: materialize text_len at generation. The slice always lies fully
    # inside the blob (offset <= blob_len - max_len, length <= max_len) and
    # the blob is pure ASCII, so length(text) == the `length` expression —
    # a 2-instruction arithmetic column instead of a per-row UTF-8
    # codepoint walk over ~500 bytes (measured 4.7 s -> 0.2 s at 20M rows,
    # 60% of flagship wall time; equality is pinned row-for-row in
    # tests/test_fixture_expr_equivalence.py). Real page tables carry
    # n_chars the same way (the driver's documents table does), and the
    # flagship pipeline's precomputed-length contract consumes it.
    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
        id_.alias("seq"),
        length.cast("int").alias("text_len"),
    )


def enrich_side(spark: SparkSession, n_hosts: int = 1000, seed: int = 42) -> DataFrame:
    """F5 enrichment dimension: host -> category (broadcast-join sized)."""
    cats = F.array(F.lit("news"), F.lit("blog"), F.lit("shop"), F.lit("docs"), F.lit("forum"))
    return spark.range(0, n_hosts).select(
        F.concat(F.lit("host-"), F.lpad(F.col("id").cast("string"), 4, "0"), F.lit(".example.com")).alias("host"),
        F.element_at(cats, (F.pmod(F.xxhash64("id", F.lit(7), F.lit(seed)), F.lit(5)) + 1).cast("int")).alias("category"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + F.col("id")).alias("updated_ts"),
    )
