"""C4 line-level cleaning (operators/lines.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.lines import clean_lines


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


GOOD = (
    "This is a perfectly reasonable sentence one.\n"
    "Here is another sentence with enough words.\n"
    "And a third line that also ends properly?"
)


def test_good_doc_passes_unchanged(spark):
    out = clean_lines(_df(spark, [(1, GOOD)])).collect()
    assert len(out) == 1 and out[0]["text"] == GOOD


def test_line_rules(spark):
    text = (
        "Home | About | Contact\n"  # no terminal punct -> dropped
        "Menu.\n"  # < 5 words -> dropped
        "Please enable JavaScript to view this site.\n"  # phrase
        "This good sentence has the required word count.\n"
        "Another good sentence survives the cleaning pass!\n"
        'A third keeps the doc above the line minimum."'
    )
    out = clean_lines(_df(spark, [(1, text)])).collect()
    assert len(out) == 1
    lines = out[0]["text"].split("\n")
    assert len(lines) == 3
    assert all("JavaScript" not in ln and "|" not in ln for ln in lines)


def test_doc_dropped_below_min_lines(spark):
    text = "Only one surviving sentence lives in this page."
    assert clean_lines(_df(spark, [(1, text)])).count() == 0
    assert (
        clean_lines(_df(spark, [(1, text)]), min_lines=1).count() == 1
    )


@pytest.mark.parametrize("bad", ["some Lorem Ipsum filler", "code { leak"])
def test_doc_phrases_drop_whole_doc(spark, bad):
    text = GOOD + "\nExtra line mentioning " + bad + " right here."
    assert clean_lines(_df(spark, [(1, text)])).count() == 0


def test_relaxed_rules(spark):
    text = "short line\nanother short\nthird one here"
    out = clean_lines(
        _df(spark, [(1, text)]),
        min_words=2,
        terminal_punct=False,
        min_lines=3,
        drop_doc_phrases=(),
    ).collect()
    assert len(out) == 1 and out[0]["text"] == text


def test_map_only_plan(spark):
    plan = (
        clean_lines(_df(spark, [(1, GOOD)]))
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert "Exchange" not in plan and "EvalPython" not in plan


class TestGlobalLineDedup:
    def _df(self, spark):
        from pyspark.sql import SparkSession  # noqa: F401

        banner = "Accept our cookies to continue browsing."
        return spark.createDataFrame(
            [
                (1, f"{banner}\nUnique content of the first page."),
                (2, f"{banner}\nSecond page says something else."),
                (3, f"{banner}\nThird page has its own words."),
                (4, "A page with no boilerplate at all."),
                (5, banner),  # nothing but the banner
            ],
            "doc_id long, text string",
        )

    def test_keep_first(self, spark):
        from data_governance_spark.operators.lines import dedup_lines_global

        out = {
            r["doc_id"]: r["text"]
            for r in dedup_lines_global(self._df(spark)).collect()
        }
        banner = "Accept our cookies to continue browsing."
        # first occurrence (doc 1, pos 0) survives; later ones removed
        assert out[1].split("\n") == [
            banner, "Unique content of the first page.",
        ]
        assert out[2] == "Second page says something else."
        assert out[3] == "Third page has its own words."
        assert out[4] == "A page with no boilerplate at all."
        assert 5 not in out  # banner-only doc emptied -> dropped

    def test_keep_none(self, spark):
        from data_governance_spark.operators.lines import dedup_lines_global

        out = {
            r["doc_id"]: r["text"]
            for r in dedup_lines_global(self._df(spark), keep="none").collect()
        }
        assert out[1] == "Unique content of the first page."
        assert 5 not in out

    def test_min_dup_threshold(self, spark):
        from data_governance_spark.operators.lines import dedup_lines_global

        # banner appears 4x; with min_dup=5 nothing is boilerplate
        out = dedup_lines_global(self._df(spark), min_dup=5)
        assert out.count() == 5

    def test_payload_columns_survive(self, spark):
        from data_governance_spark.operators.lines import dedup_lines_global

        docs = self._df(spark).withColumn(
            "lang", F.lit("en")
        )
        out = dedup_lines_global(docs).select("doc_id", "lang", "text")
        assert all(r["lang"] == "en" for r in out.collect())

    def test_differential_vs_python(self, spark):
        """Seeded random corpora vs a pure-Python recomputation."""
        import random

        from data_governance_spark.operators.lines import dedup_lines_global

        rng = random.Random(7)
        # pool includes trailing-whitespace variants: dedup identity is
        # the TRIMMED line, rebuild keeps raw bytes
        pool = [f"line {i} of shared text." for i in range(12)] + [
            "line 0 of shared text.  ",
            " line 3 of shared text.",
        ]
        rows = [
            (
                i,
                "\n".join(
                    rng.choice(pool) for _ in range(rng.randrange(1, 6))
                ),
            )
            for i in range(40)
        ]
        min_dup = 3

        # python reference: strip for identity, raw for the rebuild
        def lines_of(t):
            return [x for x in t.split("\n") if x.strip()]

        from collections import Counter

        cnt = Counter(
            ln.strip() for _, t in rows for ln in lines_of(t)
        )
        first = {}
        for i, t in sorted(rows):
            for p, ln in enumerate(lines_of(t)):
                first.setdefault(ln.strip(), (i, p))
        want = {}
        for i, t in rows:
            kept = [
                ln
                for p, ln in enumerate(lines_of(t))
                if cnt[ln.strip()] < min_dup or first[ln.strip()] == (i, p)
            ]
            if kept:
                want[i] = "\n".join(kept)

        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: r["text"]
            for r in dedup_lines_global(docs, min_dup=min_dup).collect()
        }
        assert got == want
        # the skew tier must reproduce the window tier bit-for-bit
        got_b = {
            r["doc_id"]: r["text"]
            for r in dedup_lines_global(
                docs, min_dup=min_dup, strategy="broadcast"
            ).collect()
        }
        assert got_b == want

    @pytest.mark.parametrize("keep", ["first", "none"])
    def test_broadcast_strategy_every_doc_shares_a_line(self, spark, keep):
        """Adversarial skew fixture: ONE line occurs in every document
        (the mega-key that makes the window tier's hot partition). The
        broadcast tier must agree with the window tier exactly."""
        from data_governance_spark.operators.lines import dedup_lines_global

        banner = "The same banner is on every single page."
        rows = [
            (i, f"{banner}\nDocument {i} body line {i % 7}.")
            for i in range(200)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        win = {
            r["doc_id"]: r["text"]
            for r in dedup_lines_global(docs, keep=keep).collect()
        }
        bc = {
            r["doc_id"]: r["text"]
            for r in dedup_lines_global(
                docs, keep=keep, strategy="broadcast"
            ).collect()
        }
        assert bc == win
        if keep == "first":
            assert win[0].split("\n")[0] == banner
            assert all(banner not in win[i] for i in range(1, 200) if i in win)

    def test_broadcast_strategy_plan_has_no_window(self, spark):
        from data_governance_spark.operators.lines import dedup_lines_global

        docs = spark.createDataFrame(
            [(1, "a line here\nanother line")], "doc_id long, text string"
        )
        plan = (
            dedup_lines_global(docs, strategy="broadcast")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert "broadcast" in plan.lower()
        with pytest.raises(ValueError):
            dedup_lines_global(docs, strategy="salted")
