"""C4 boilerplate-removal op (benthos_spark/ops/boilerplate.py): crafted-page
semantics plus the plan invariant (single projection, no exchange, no UDF)."""

import pytest

from benthos_spark.ops.boilerplate import boilerplate_stats

PAGE = "\n".join([
    "This is a real sentence with plenty of words in it.",   # kept
    "Home | About | Contact",                                 # no terminal punct
    "Please enable JavaScript to view this site properly.",   # javascript
    "if (x) { return; }",                                      # brace
    "Buy now!",                                                # < 5 words
    'She said "stop" and everyone listened to her words."',   # kept (quote end)
    "Is this a question with enough words in it?",             # kept
])

CASES = [
    (0, PAGE),
    (1, "Lorem Ipsum dolor sit amet placeholder sentence here."),
    (2, "no terminal punctuation and no filter hits either"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(CASES, "doc_id long, text string")


@pytest.mark.spark
class TestBoilerplate:
    def test_line_filtering(self, spark, docs):
        rows = {r["id"]: r for r in boilerplate_stats(docs).collect()}
        r = rows[0]
        assert (r["n_lines"], r["n_kept"]) == (7, 3)
        kept = r["cleaned"].split("\n")
        assert kept[0].startswith("This is a real sentence")
        assert kept[1].startswith('She said')
        assert kept[2].startswith("Is this a question")
        assert abs(r["kept_ratio"] - 3 / 7) < 1e-12

    def test_lorem_flag_case_insensitive(self, spark, docs):
        rows = {r["id"]: r for r in boilerplate_stats(docs).collect()}
        assert rows[1]["has_lorem"] is True
        assert rows[0]["has_lorem"] is False
        # the lorem page's single line still passes the LINE filter
        assert rows[1]["n_kept"] == 1

    def test_all_dropped_gives_empty_cleaned(self, spark, docs):
        rows = {r["id"]: r for r in boilerplate_stats(docs).collect()}
        assert rows[2]["n_kept"] == 0
        assert rows[2]["cleaned"] == ""

    def test_min_words_knob(self, spark, docs):
        out = {
            r["id"]: r["n_kept"]
            for r in boilerplate_stats(docs, min_words=2).collect()
        }
        # 'Buy now!' (2 words) now survives on page 0
        assert out[0] == 4

    def test_plan_is_single_stage(self, spark, docs):
        plan = boilerplate_stats(docs)._jdf.queryExecution().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
