"""HTML -> text extraction (functions/html.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.functions.html import html_to_text


def _extract(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_to_text("html").alias("t")).first()["t"]


class TestHtmlToText:
    def test_basic_page(self, spark):
        html = (
            "<html><head><title>T</title><style>p{color:red}</style></head>"
            "<body><h1>Header</h1><p>First para with <b>bold</b> text.</p>"
            "<p>Second &amp; last.</p>"
            "<script>var x = '<p>not text</p>';</script></body></html>"
        )
        assert _extract(spark, html) == (
            "Header\nFirst para with bold text.\nSecond & last."
        )

    def test_entities(self, spark):
        assert (
            _extract(spark, "a &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end")
            == 'a <tag> "q" \'s\' end'
        )

    def test_comments_and_numeric_entities(self, spark):
        # &#8212; is in the typographic decode set (em dash -> '-') and
        # so is its hex twin &#x2014; (ADVICE r5: hex entities must not
        # fall to the word-splitting space fallback)
        assert (
            _extract(spark, "keep<!-- drop\nme -->this &#8212; and&#x2014;that")
            == "keep this - and-that"
        )

    def test_hex_typographic_entities(self, spark):
        # the ADVICE r5 case: hex apostrophes must not split words,
        # any hex case accepted, &#x26; normalizes like &#38;
        assert (
            _extract(
                spark,
                "don&#x2019;t don&#X2019;t &#x201C;q&#x201d; "
                "AT&#x26;T e&#x2026; un&#x2013;related &#x1F600; end",
            )
            == "don't don't \"q\" AT&T e... un-related end"
        )

    def test_typographic_entities_preserve_words(self, spark):
        got = _extract(
            spark, "don&#8217;t split &mdash; words&hellip; AT&#38;T"
        )
        assert got == "don't split - words... AT&T"

    def test_commented_script_opener_cannot_eat_content(self, spark):
        html = (
            '<!-- ad: <script data-src="x"> here -->'
            "<p>Real article text</p><script>analytics()</script>"
        )
        assert _extract(spark, html) == "Real article text"

    def test_lists_become_lines(self, spark):
        got = _extract(spark, "<ul><li>one</li><li>two</li></ul>")
        assert got == "one\ntwo"

    def test_plain_text_passthrough(self, spark):
        assert _extract(spark, "no markup here") == "no markup here"

    def test_case_insensitive_blocks(self, spark):
        assert _extract(spark, "<SCRIPT>x</SCRIPT>visible") == "visible"

    def test_no_python_no_shuffle(self, spark):
        df = spark.range(3).select(
            F.concat(F.lit("<p>x</p>"), F.col("id").cast("string")).alias("h")
        )
        plan = (
            df.select(html_to_text("h"))
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        assert "Exchange" not in plan
        assert "EvalPython" not in plan


def test_entity_form_consistency_named_decimal_hex(spark):
    """Every typographic entity decodes identically in its named,
    decimal and hex forms (ADVICE r5: the hex twins used to fall to
    the word-splitting space fallback)."""
    triples = [
        ("&rsquo;", "&#8217;", "&#x2019;"),
        ("&lsquo;", "&#8216;", "&#x2018;"),
        ("&ldquo;", "&#8220;", "&#x201C;"),
        ("&rdquo;", "&#8221;", "&#x201D;"),
        ("&ndash;", "&#8211;", "&#x2013;"),
        ("&mdash;", "&#8212;", "&#x2014;"),
        ("&hellip;", "&#8230;", "&#x2026;"),
        ("&#39;", "&apos;", "&#x27;"),
        ("&quot;", "&#34;", "&#x22;"),
        ("&amp;", "&#38;", "&#x26;"),
    ]
    rows = [
        (f"{i}:{j}", f"word{e}word")
        for i, t in enumerate(triples)
        for j, e in enumerate(t)
    ]
    df = spark.createDataFrame(rows, "id string, html string")
    got = {
        r["id"]: r["t"]
        for r in df.select("id", html_to_text("html").alias("t")).collect()
    }
    for i, t in enumerate(triples):
        outs = {got[f"{i}:{j}"] for j in range(3)}
        assert len(outs) == 1, (t, outs)
        out = outs.pop()
        # decodes to a joined word (no space split), never stays raw
        assert " " not in out and "&" not in out or t[0] == "&amp;", (t, out)
