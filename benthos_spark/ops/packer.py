"""Sequence packing — the concat-and-chunk step that turns a curated
corpus into fixed-length training examples (GPT-style pretraining data
prep; the "packing" stage every LLM data pipeline runs after mixing).

Semantics: documents are concatenated into one token stream in a
deterministic order (``order by id_col`` — set-semantic, so reruns,
repartitions and engines agree), then the stream is cut every ``seq_len``
tokens. Each non-empty document therefore occupies the half-open token
span ``[cum - n_tokens, cum)`` and maps to one or more sequences:
``begin_seq = floor(start / L)``, ``end_seq = floor((cum - 1) / L)``,
entering sequence ``begin_seq`` at ``seq_offset = start % L``. Documents
with zero tokens occupy no span and are dropped (documented, matching the
oracle). Token counts use the shared whitespace-normalized tokenizer
(ops/textprep.tokens) so the DuckDB twin is formula-exact.

100 TB shape: the only global coordination is
:func:`ops.indexing.global_running_sum` — ONE range exchange on the order
key plus a K-row per-partition sum collect (no single-task global sort,
the trap ``tests/test_plan_hygiene.py`` sweeps for). Text never shuffles:
the running sum moves (id, n_tokens) longs only, and the per-sequence
fan-out (:func:`pack_assignments`) explodes spans, not payloads — a
narrow map over the span table. Downstream, the actual token
materialization is an embarrassingly parallel join of (seq_id, doc_id,
doc_offset, len) slices back to the tokenized text.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from .indexing import global_running_sum
from .textprep import tokens


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Per-document packing spans: (id, n_tokens, cum_tokens, begin_seq,
    end_seq, seq_offset, n_seqs). ``cum_tokens`` is the inclusive global
    running token count in ``id_col`` order; ``n_seqs`` is how many
    fixed-length sequences the document touches."""
    if seq_len < 1:
        raise ValueError("seq_len must be >= 1")
    d = docs.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    cum = global_running_sum(
        d, [id_col], "n_tokens", col_name="cum_tokens",
        num_partitions=num_partitions,
    )
    L = F.lit(int(seq_len))
    start = F.col("cum_tokens") - F.col("n_tokens")
    begin_seq = F.floor(start / L).cast("long")
    end_seq = F.floor((F.col("cum_tokens") - 1) / L).cast("long")
    return (
        cum.withColumn("begin_seq", begin_seq)
        .withColumn("end_seq", end_seq)
        .withColumn("seq_offset", (start % L).cast("long"))
        .withColumn("n_seqs", (end_seq - begin_seq + 1).cast("long"))
    )


def pack_assignments(
    spans: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
) -> DataFrame:
    """Explode packing spans (from :func:`pack_sequences`) into the
    (seq_id, document-slice) assignment table a materialization join
    consumes: one row per sequence a document contributes to, with
    ``offset_in_seq`` (where the slice starts inside the sequence),
    ``doc_offset`` (where it starts inside the document) and ``len``
    (slice length in tokens). Pure Catalyst — sequence/explode over span
    longs; per sequence, slices tile it exactly (sum(len) == seq_len
    except for the final partial sequence)."""
    L = F.lit(int(seq_len))
    start = F.col("cum_tokens") - F.col("n_tokens")
    seq_lo = F.col("seq_id") * L  # token index where this sequence begins
    piece_lo = F.greatest(start, seq_lo)
    piece_hi = F.least(F.col("cum_tokens"), seq_lo + L)
    return (
        spans.withColumn(
            "seq_id", F.explode(F.sequence(F.col("begin_seq"), F.col("end_seq")))
        )
        .select(
            "seq_id",
            F.col(id_col),
            (piece_lo - seq_lo).cast("long").alias("offset_in_seq"),
            (piece_lo - start).cast("long").alias("doc_offset"),
            (piece_hi - piece_lo).cast("long").alias("len"),
        )
    )
