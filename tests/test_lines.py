"""C4 line-level cleaning (operators/lines.py)."""

from __future__ import annotations

import pytest

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
