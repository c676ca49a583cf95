#!/usr/bin/env python3
"""Generate driver-shaped perf data at an arbitrary scale factor (r6
measurement tooling — the driver's own sf1.0 dir is not kept between
rounds, and TESTDATA.md marks /root/testdata read-only, so local scale
measurements need an equivalent dataset elsewhere).

Distributions mirror the observed driver tables (TESTDATA.md seed-42
generator, inspected at sf0.01/sf0.1):
  documents  : 50k/sf rows; text = 8..105 words from the same 30-word
               vocab; lang en 40% / {zh,es,fr,de} 15%; source src0..19;
               ~0.16% exact-duplicate texts plus 'dup'-token near-dups
               (~5% of docs carry a 'dup' word like the originals).
  events     : 1M/sf rows; user_id 0..15000*sf; 5 uniform event types;
               ts uniform over 2024-01-01..01-30; value U(0,200) 2dp;
               props = {"k": randint(0,100)}.
  embeddings : 20k/sf rows; 64-dim N(0, 0.125); label 0..9.
  lineitem/orders/customer/part/supplier/nation/region: tiled from
               sf0.1 with key offsets (the TPC-H queries are linear and
               cheap; only row volume matters for them).

Usage: python scripts/gen_perfdata.py [sf] [outdir]
       default sf=1.0, outdir=/root/perfdata/sf<sf>
"""

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "row",
    "the", "agg", "key", "query", "a", "scan", "batch",
]


def gen_documents(rng, n):
    n_words = rng.integers(8, 106, size=n)
    texts = []
    vocab = np.array(VOCAB)
    for i in range(n):
        words = vocab[rng.integers(0, len(vocab), size=n_words[i])]
        if i % 20 == 0:  # ~5% docs carry the 'dup' marker token
            words = np.concatenate([words, ["dup"]])
        texts.append(" ".join(words))
    # exact duplicates: ~0.16% of docs copy an earlier doc's text
    for _ in range(max(1, n // 625)):
        j = int(rng.integers(1, n))
        texts[j] = texts[int(rng.integers(0, j))]
    lang_p = ["en"] * 8 + ["zh"] * 3 + ["es"] * 3 + ["fr"] * 3 + ["de"] * 3
    langs = [lang_p[i] for i in rng.integers(0, len(lang_p), size=n)]
    sources = [f"src{i}" for i in rng.integers(0, 20, size=n)]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": texts,
            "lang": langs,
            "source": sources,
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


def gen_events(rng, n, n_users):
    base = np.datetime64("2024-01-01T00:00:00", "us")
    span = 30 * 86400 * 1_000_000
    ts = base + rng.integers(0, span, size=n).astype("timedelta64[us]")
    types = np.array(["signup", "click", "error", "view", "purchase"])
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
            "event_type": types[rng.integers(0, 5, size=n)],
            "value": np.round(rng.uniform(0, 200, size=n), 2),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)],
        }
    )


def gen_embeddings(rng, n):
    vecs = (rng.standard_normal((n, 64)) * 0.125).astype(np.float32)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(rng.integers(0, 10, size=n), pa.int64()),
        }
    )


def tile_table(src_path, reps, key_offsets):
    """Tile a parquet table `reps` times, offsetting the named int columns
    by rep * (max+1) so keys stay unique and joins keep their selectivity."""
    t = pq.read_table(src_path)
    maxes = {c: t.column(c).to_numpy().max() + 1 for c in key_offsets}
    parts = []
    for r in range(reps):
        cols = {}
        for name in t.column_names:
            col = t.column(name)
            if name in key_offsets and r > 0:
                cols[name] = pa.array(col.to_numpy() + r * maxes[name], col.type)
            else:
                cols[name] = col
        parts.append(pa.table(cols))
    return pa.concat_tables(parts)


def main():
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"/root/perfdata/sf{sf}"
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(42)
    n_docs = int(50_000 * sf)
    n_events = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_emb = int(20_000 * sf)

    pq.write_table(gen_documents(rng, n_docs), f"{out}/documents.parquet")
    pq.write_table(gen_events(rng, n_events, n_users), f"{out}/events.parquet")
    pq.write_table(gen_embeddings(rng, n_emb), f"{out}/embeddings.parquet")

    reps = max(1, int(round(sf / 0.1)))
    base = "/root/testdata/sf0.1"
    tiled = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "part": ["p_partkey"],
        "supplier": ["s_suppkey"],
    }
    for name, keys in tiled.items():
        pq.write_table(
            tile_table(f"{base}/{name}.parquet", reps, keys),
            f"{out}/{name}.parquet",
        )
    for name in ("nation", "region"):
        shutil.copy(f"{base}/{name}.parquet", f"{out}/{name}.parquet")
    print(f"wrote {out}: docs={n_docs} events={n_events} emb={n_emb} "
          f"lineitem x{reps}")


if __name__ == "__main__":
    main()
