"""sql processor (lib/processor/sql.go) + ops.foreign.foreign_table.

The DBAPI backend under test is stdlib sqlite (the reference links mysql/
postgres drivers; those are import-gated here). Codec semantics — batch
replacement, part-0 metadata retention, key-sorted Go-formatted JSON,
flag-all-parts on error — follow sql.go:194-231,266,286-292.
"""

import sqlite3

import pytest

from benthos_spark.bloblang.interp import FAIL_META_KEY, Part
from benthos_spark.engine.processors import Env, build_processor, execute_all


@pytest.fixture()
def db(tmp_path):
    path = str(tmp_path / "dim.db")
    conn = sqlite3.connect(path)
    conn.execute("CREATE TABLE footable (id INTEGER, name TEXT, score REAL)")
    conn.executemany(
        "INSERT INTO footable VALUES (?, ?, ?)",
        [(1, "a", 2.5), (2, "b", None), (3, "c", 4.0)],
    )
    conn.commit()
    conn.close()
    return path


def run(conf, batch):
    proc = build_processor({"sql": conf})
    return execute_all([proc], batch, Env())


class TestSQLProc:
    def test_json_array_replaces_batch(self, db):
        batch = [
            Part(b"first", {"k": "v"}),
            Part(b"second", {"other": "meta"}),
        ]
        out = run(
            {
                "driver": "sqlite",
                "dsn": db,
                "query": "SELECT id, name, score FROM footable ORDER BY id",
                "result_codec": "json_array",
            },
            batch,
        )
        assert len(out) == 1 and len(out[0]) == 1
        got = out[0][0]
        # Go json.Marshal: map keys sorted, float64 4 prints as 4, null for NULL
        assert got.content == (
            b'[{"id":1,"name":"a","score":2.5},'
            b'{"id":2,"name":"b","score":null},'
            b'{"id":3,"name":"c","score":4}]'
        )
        # part 0's metadata is retained on the replacement part
        assert got.meta.get("k") == "v"

    def test_args_interpolated_from_part_zero(self, db):
        batch = [Part(b'{"want":2}', {}), Part(b'{"want":3}', {})]
        out = run(
            {
                "driver": "sqlite",
                "dsn": db,
                "query": "SELECT name FROM footable WHERE id = ?",
                "args": ['${! json("want") }'],
                "result_codec": "json_array",
            },
            batch,
        )
        assert out[0][0].content == b'[{"name":"b"}]'

    def test_codec_none_executes_and_passes_through(self, db):
        batch = [Part(b"x", {}), Part(b"y", {})]
        out = run(
            {
                "driver": "sqlite",
                "dsn": db,
                "query": "INSERT INTO footable VALUES (9, 'ins', 0.5)",
                "result_codec": "none",
            },
            batch,
        )
        assert [p.content for p in out[0]] == [b"x", b"y"]
        assert all(FAIL_META_KEY not in p.meta for p in out[0])
        conn = sqlite3.connect(db)
        assert conn.execute(
            "SELECT count(*) FROM footable WHERE id = 9"
        ).fetchone()[0] == 1
        conn.close()

    def test_error_flags_every_part(self, db):
        batch = [Part(b"x", {}), Part(b"y", {})]
        out = run(
            {
                "driver": "sqlite",
                "dsn": db,
                "query": "SELECT * FROM missing_table",
                "result_codec": "json_array",
            },
            batch,
        )
        assert len(out[0]) == 2  # codec never ran; original parts flagged
        assert all(FAIL_META_KEY in p.meta for p in out[0])

    def test_unknown_codec_rejected(self, db):
        with pytest.raises(ValueError):
            build_processor(
                {"sql": {"driver": "sqlite", "dsn": db, "query": "SELECT 1",
                         "result_codec": "bogus"}}
            )


@pytest.mark.spark
class TestForeignTable:
    def test_loads_and_broadcast_joins(self, spark, db):
        from pyspark.sql import functions as F

        from benthos_spark.ops.foreign import foreign_table

        dim = foreign_table(
            spark, "sqlite", db,
            "SELECT id, name FROM footable",
            schema="id long, name string",
        )
        facts = spark.range(100).select((F.col("id") % 3 + 1).alias("id"))
        joined = facts.join(F.broadcast(dim), "id")
        assert joined.count() == 100
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan

    def test_row_budget_guard(self, spark, db):
        from benthos_spark.ops.foreign import foreign_table

        with pytest.raises(ValueError, match="max_rows"):
            foreign_table(
                spark, "sqlite", db, "SELECT * FROM footable", max_rows=2
            )

    def test_empty_result_needs_schema(self, spark, db):
        from benthos_spark.ops.foreign import foreign_table

        out = foreign_table(
            spark, "sqlite", db,
            "SELECT id FROM footable WHERE id > 100",
            schema="id long",
        )
        assert out.count() == 0 and out.schema.simpleString() == "struct<id:bigint>"

        with pytest.raises(ValueError, match="schema"):
            foreign_table(
                spark, "sqlite", db, "SELECT id FROM footable WHERE id > 100"
            )
