"""Table-driven kernel tests mirroring the reference's per-processor Go test
tables (SURVEY.md §5.1) — behavior re-derived from the cited *_test.go files,
no code reuse."""

import json

from benthos_spark.bloblang.interp import FAIL_META_KEY
from benthos_spark.engine import Env, build_processor, execute_all
from benthos_spark.engine.processors import Part


def run_batch(procs_conf, contents, metas=None, env=None):
    procs = [build_processor(p) for p in procs_conf]
    metas = metas or [{} for _ in contents]
    batch = [Part(c, dict(m)) for c, m in zip(contents, metas)]
    return execute_all(procs, batch, env or Env())


class TestDedupeTable:
    """lib/processor/dedupe_test.go behavior: same key -> batch dropped;
    different key -> passes; TTL expiry -> passes again."""

    def test_dedupe_drops_repeat_key(self):
        env = Env()
        conf = [{"dedupe": {"key": '${! json("id") }', "cache": "c1"}}]
        assert run_batch(conf, [b'{"id":1}'], env=env)
        assert not run_batch(conf, [b'{"id":1}'], env=env)
        assert run_batch(conf, [b'{"id":2}'], env=env)

    def test_dedupe_raw_parts_key(self):
        env = Env()
        conf = [{"dedupe": {"parts": [0], "cache": "c2"}}]
        assert run_batch(conf, [b"hello world"], env=env)
        assert not run_batch(conf, [b"hello world"], env=env)

    def test_dedupe_xxhash_mode(self):
        env = Env()
        conf = [{"dedupe": {"key": '${! content() }', "hash": "xxhash", "cache": "c3"}}]
        assert run_batch(conf, [b"payload-a"], env=env)
        assert not run_batch(conf, [b"payload-a"], env=env)

    def test_cache_ttl_expiry_readmits(self):
        from benthos_spark.engine.processors import MemoryCache

        clock = [0.0]
        cache = MemoryCache(ttl=10.0, clock=lambda: clock[0])
        assert cache.add("k", b"1")
        assert not cache.add("k", b"1")  # within TTL
        clock[0] = 5.0
        assert not cache.add("k", b"1")  # still within; failed add no refresh
        clock[0] = 10.5
        assert cache.add("k", b"1")  # expired (memory.go:42-68 semantics)


class TestFileCache:
    """lib/cache/file.go semantics: one file per key; add is atomic
    create-exclusive; state shared by anything pointing at the directory."""

    def test_set_get_add_delete(self, tmp_path):
        from benthos_spark.engine.processors import FileCache

        c = FileCache(str(tmp_path / "c"))
        assert c.get("k") is None
        c.set("k", b"v1")
        assert c.get("k") == b"v1"
        assert not c.add("k", b"v2")  # ErrKeyAlreadyExists
        c.set("k", b"v3")  # set overwrites
        assert c.get("k") == b"v3"
        c.delete("k")
        assert c.get("k") is None and c.add("k", b"v4")
        c.set("weird/key:é", b"x")  # keys hex-encode: any string is safe
        assert c.get("weird/key:é") == b"x"

    def test_ttl_expiry_via_mtime(self, tmp_path):
        import os

        from benthos_spark.engine.processors import FileCache

        c = FileCache(str(tmp_path / "c"), ttl=60.0)
        assert c.add("k", b"1")
        # age the file beyond the TTL
        p = c._path("k")
        old = os.stat(p).st_mtime - 120
        os.utime(p, (old, old))
        assert c.get("k") is None
        assert c.add("k", b"2")  # expired entry re-admits

    def test_cross_job_dedupe_through_file_backend(self, tmp_path):
        """Two independent Env/Resources (two 'jobs') share dedupe state via
        the same cache directory — what MemoryCache cannot do."""
        backend = {"type": "file", "directory": str(tmp_path / "shared")}
        conf = [{"dedupe": {"key": '${! json("id") }', "cache": "x",
                            "backend": backend}}]
        job1, job2 = Env(), Env()
        assert run_batch(conf, [b'{"id":7}'], env=job1)
        # second job (fresh Env/Resources) sees the first job's key
        assert not run_batch(conf, [b'{"id":7}'], env=job2)
        assert run_batch(conf, [b'{"id":8}'], env=job2)

    def test_build_cache_rejects_unknown_backend(self):
        import pytest

        from benthos_spark.engine.processors import build_cache

        with pytest.raises(ValueError, match="memory|file"):
            build_cache({"type": "redis"})


class TestSplitTable:
    """lib/processor/split_test.go shapes: size chunks with remainder,
    byte_size bucketing."""

    def test_size_chunks_with_remainder(self):
        out = run_batch([{"split": {"size": 3}}], [b"%d" % i for i in range(8)])
        assert [len(b) for b in out] == [3, 3, 2]

    def test_byte_size_buckets(self):
        out = run_batch(
            [{"split": {"byte_size": 6}}],
            [b"aaa", b"bbb", b"cc", b"dddddd", b"e"],
        )
        assert [[p.content for p in b] for b in out] == [
            [b"aaa", b"bbb"],
            [b"cc"],
            [b"dddddd"],
            [b"e"],
        ]


class TestSelectPartsTable:
    """lib/processor/select_parts_test.go: positive and negative indices."""

    def test_positive_and_negative(self):
        contents = [b"0", b"1", b"2", b"3"]
        out = run_batch([{"select_parts": {"parts": [0, -1]}}], contents)
        assert [p.content for p in out[0]] == [b"0", b"3"]

    def test_out_of_bounds_ignored(self):
        out = run_batch([{"select_parts": {"parts": [9]}}], [b"0"])
        assert out == []


class TestBoundsCheckTable:
    """lib/processor/bounds_check_test.go: part count and size bounds."""

    def test_part_count_bounds(self):
        conf = [{"bounds_check": {"min_parts": 2, "max_parts": 3}}]
        assert not run_batch(conf, [b"a"])
        assert run_batch(conf, [b"a", b"b"])
        assert not run_batch(conf, [b"a", b"b", b"c", b"d"])

    def test_part_size_bounds(self):
        conf = [{"bounds_check": {"min_part_size": 2, "max_part_size": 4}}]
        assert not run_batch(conf, [b"a"])
        assert run_batch(conf, [b"ab", b"abcd"])
        assert not run_batch(conf, [b"ab", b"abcde"])


class TestGroupByTable:
    """lib/processor/group_by_test.go: first matching condition wins,
    default group collects the rest, per-group processors apply."""

    def test_groups_and_default(self):
        conf = [
            {
                "group_by": [
                    {
                        "condition": {"text": {"operator": "contains_cs", "arg": "foo"}},
                        "processors": [{"text": {"operator": "to_upper"}}],
                    },
                    {"condition": {"text": {"operator": "contains_cs", "arg": "bar"}}},
                ]
            }
        ]
        out = run_batch(conf, [b"a foo", b"a bar", b"plain", b"foo bar"])
        assert [p.content for p in out[0]] == [b"A FOO", b"FOO BAR"]  # first match
        assert [p.content for p in out[1]] == [b"a bar"]
        assert [p.content for p in out[2]] == [b"plain"]


class TestGroupByValueTable:
    """lib/processor/group_by_value_test.go: first-seen group order."""

    def test_first_seen_order(self):
        conf = [{"group_by_value": {"value": '${! json("k") }'}}]
        docs = [b'{"k":"z"}', b'{"k":"a"}', b'{"k":"z"}', b'{"k":"m"}']
        out = run_batch(conf, docs)
        keys = [json.loads(b[0].content)["k"] for b in out]
        assert keys == ["z", "a", "m"]
        assert len(out[0]) == 2


class TestTryCatchTable:
    """lib/processor/try_test.go / catch_test.go: failed parts skip children;
    catch runs only on failed parts and clears the flag."""

    def test_try_skips_failed(self):
        conf = [
            {
                "try": [
                    {"json": {"operator": "select", "path": "a"}},  # fails on bad json
                    {"text": {"operator": "append", "value": "!"}},
                ]
            }
        ]
        out = run_batch(conf, [b'{"a":"ok"}', b"not json"])
        parts = out[0]
        assert parts[0].content == b'"ok"!' or parts[0].content == b"ok!"
        assert FAIL_META_KEY in parts[1].meta
        assert parts[1].content == b"not json"  # untouched after failure

    def test_catch_recovers_and_clears(self):
        conf = [
            {"json": {"operator": "select", "path": "a"}},
            {"catch": [{"text": {"operator": "set", "value": "fallback"}}]},
        ]
        out = run_batch(conf, [b'{"a":1}', b"broken"])
        parts = out[0]
        assert all(FAIL_META_KEY not in p.meta for p in parts)
        assert parts[1].content == b"fallback"


class TestArchiveRoundTrips:
    """lib/processor/archive_test.go / unarchive_test.go round trips."""

    def test_all_formats_roundtrip(self):
        docs = [b'{"a":1}', b'{"b":2}', b'{"c":3}']
        for fmt in ("lines", "json_array", "binary", "tar", "zip"):
            arch = run_batch([{"archive": {"format": fmt}}], docs)
            assert len(arch) == 1 and len(arch[0]) == 1
            back = run_batch([{"unarchive": {"format": fmt}}], [arch[0][0].content])
            assert [p.content for p in back[0]] == docs, fmt

    def test_json_map_unarchive_sets_key_meta(self):
        out = run_batch(
            [{"unarchive": {"format": "json_map"}}], [b'{"k1":{"v":1},"k2":{"v":2}}']
        )
        parts = out[0]
        assert [p.meta["archive_key"] for p in parts] == ["k1", "k2"]


class TestCompressionRoundTrips:
    def test_gzip_zlib_flate(self):
        payload = b"x" * 1000 + b"variation"
        for alg in ("gzip", "zlib", "flate"):
            comp = run_batch([{"compress": {"algorithm": alg}}], [payload])
            assert len(comp[0][0].content) < len(payload)
            back = run_batch([{"decompress": {"algorithm": alg}}], [comp[0][0].content])
            assert back[0][0].content == payload


class TestProcessFieldTable:
    """lib/processor/process_field_test.go: extract -> child -> set back,
    result_type casting."""

    def test_int_result_type(self):
        conf = [
            {
                "process_field": {
                    "path": "doc.n",
                    "result_type": "int",
                    "processors": [{"number": {"operator": "add", "value": "5"}}],
                }
            }
        ]
        out = run_batch(conf, [b'{"doc":{"n":37}}'])
        assert json.loads(out[0][0].content)["doc"]["n"] == 42

    def test_string_result_default(self):
        conf = [
            {
                "process_field": {
                    "path": "name",
                    "processors": [{"text": {"operator": "to_upper"}}],
                }
            }
        ]
        out = run_batch(conf, [b'{"name":"ash"}'])
        assert json.loads(out[0][0].content)["name"] == "ASH"
