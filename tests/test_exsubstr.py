"""Exact substring dedup (operators/exsubstr.py, Lee et al. 2022
ExactSubstr tier): hand-built span cases + a pure-Python reference
differential on a randomized small-vocab corpus (small vocab forces
genuine cross-document window collisions)."""

from __future__ import annotations

import random
import re

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.exsubstr import (
    dedup_substrings,
    duplicated_window_starts,
)


# ------------------------------------------------------------------ #
# pure-Python reference (independent restatement of the semantics)
# ------------------------------------------------------------------ #
def ref_dedup(docs: dict, width: int, min_count: int = 2, keep: str = "first"):
    # re.ASCII mirrors the operator (Java/RE2 \s parity)
    toks = {i: re.findall(r"\S+", t, re.ASCII) for i, t in docs.items()}
    occ: dict = {}
    for i in sorted(toks):
        ts = toks[i]
        for p in range(len(ts) - width + 1):
            occ.setdefault(tuple(ts[p : p + width]), []).append((i, p))
    rem: dict = {}
    for lst in occ.values():
        if len(lst) >= min_count:
            keeper = min(lst) if keep == "first" else None
            for o in lst:
                if o != keeper:
                    rem.setdefault(o[0], set()).add(o[1])
    out = {}
    for i, t in docs.items():
        spans = [m.span() for m in re.finditer(r"\S+", t, re.ASCII)]
        n = len(spans)
        covered = set()
        for s in rem.get(i, ()):
            covered.update(range(s, min(s + width, n)))
        runs, j = [], 0
        while j < n:
            if j in covered:
                j += 1
                continue
            k = j
            while k + 1 < n and (k + 1) not in covered:
                k += 1
            runs.append(t[spans[j][0] : spans[k][1]])
            j = k + 1
        out[i] = " ".join(runs)
    return out


def _df(spark, docs: dict):
    return spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    )


def _run(spark, docs: dict, **kw) -> dict:
    rows = dedup_substrings(_df(spark, docs), **kw).collect()
    assert len(rows) == len(docs)  # row count preserved
    return {r["doc_id"]: r["text"] for r in rows}


BOILER = "the quick brown fox jumps"  # 5 tokens


def test_shared_prefix_removed_from_all_but_first(spark):
    docs = {
        1: BOILER + " alpha one",
        2: BOILER + " beta two",
        3: BOILER + " gamma three",
    }
    out = _run(spark, docs, width=5)
    assert out[1] == docs[1]  # canonical (min doc_id) keeps the span
    assert out[2] == "beta two"
    assert out[3] == "gamma three"


def test_keep_none_removes_canonical_too(spark):
    docs = {1: BOILER + " alpha", 2: BOILER + " beta"}
    out = _run(spark, docs, width=5, keep="none")
    assert out == {1: "alpha", 2: "beta"}


def test_long_shared_span_fully_covered(spark):
    # shared span of 8 tokens > width=5: all 4 of its windows are
    # duplicated, so the union covers the whole span
    span = "a b c d e f g h"
    docs = {1: span + " unique1 x", 2: "pre2 " + span + " unique2"}
    out = _run(spark, docs, width=5)
    assert out[1] == docs[1]
    assert out[2] == "pre2 unique2"


def test_within_document_repeat(spark):
    # the same 5-token window twice in ONE doc: first occurrence kept
    docs = {7: BOILER + " mid " + BOILER + " tail"}
    out = _run(spark, docs, width=5)
    assert out[7] == BOILER + " mid tail"


def test_original_bytes_preserved_in_kept_runs(spark):
    # kept runs keep their raw bytes (double space, tab); the cut
    # joins surviving runs with a single space
    docs = {
        1: BOILER + " alpha  beta\tgamma",
        2: BOILER + " delta",
    }
    out = _run(spark, docs, width=5)
    assert out[1] == docs[1]
    assert out[2] == "delta"
    docs2 = {1: "x  y " + BOILER, 2: "z " + BOILER}
    out2 = _run(spark, docs2, width=5)
    assert out2[1] == docs2[1]
    assert out2[2] == "z"


def test_fully_duplicated_doc_survives_empty(spark):
    docs = {1: BOILER, 2: BOILER}
    out = _run(spark, docs, width=5)
    assert out[1] == BOILER
    assert out[2] == ""


def test_short_docs_untouched(spark):
    docs = {1: "a b c", 2: "a b c", 3: ""}
    out = _run(spark, docs, width=5)  # all shorter than width
    assert out == docs


def test_min_count_threshold(spark):
    docs = {1: BOILER + " a", 2: BOILER + " b", 3: BOILER + " c"}
    out = _run(spark, docs, width=5, min_count=4)  # 3 occurrences < 4
    assert out == docs


def test_marking_relation(spark):
    docs = {1: BOILER + " alpha one", 2: BOILER + " beta two"}
    marks = {
        (r["doc_id"], r["pos"])
        for r in duplicated_window_starts(_df(spark, docs), width=5).collect()
    }
    assert marks == {(2, 0)}


@pytest.mark.parametrize("strategy", ["shuffle", "broadcast"])
@pytest.mark.parametrize("width,keep", [(3, "first"), (5, "first"), (3, "none")])
def test_reference_differential(spark, width, keep, strategy):
    rng = random.Random(width * 100 + (keep == "none"))
    vocab = ["aa", "bb", "cc", "dd"]  # tiny vocab -> real collisions
    docs = {
        i: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 20)))
        for i in range(40)
    }
    out = _run(
        spark, docs, width=width, keep=keep, strategy=strategy
    )
    assert out == ref_dedup(docs, width, keep=keep)


def test_unicode_whitespace_token_parity(spark):
    # U+00A0 is NOT whitespace to Spark's Java-ASCII \s+ split, so
    # 'foo bar' is ONE token in both the marker and the cutter
    # (re.ASCII) — without the ASCII flag the cutter would see two
    # tokens and shift every removal index (code-review r8 finding)
    docs = {
        1: "foo bar " + BOILER + " tail1",
        2: "foo bar " + BOILER + " tail2",
    }
    # tokens: NBSP-joined 'foo bar'(1) + BOILER(5) + tail(1) = 7;
    # the shared 6-token prefix is exactly one width-6 window at pos 0
    out = _run(spark, docs, width=6)
    assert out[1] == docs[1]
    assert out[2] == "tail2"
    assert out == ref_dedup(docs, 6)


def test_plan_no_cartesian(spark):
    docs = {1: BOILER + " a", 2: BOILER + " b"}
    plan = dedup_substrings(_df(spark, docs), width=5)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_validation(spark):
    df = _df(spark, {1: "a"})
    with pytest.raises(ValueError):
        dedup_substrings(df, width=0)
    with pytest.raises(ValueError):
        dedup_substrings(df, min_count=1)
    with pytest.raises(ValueError):
        dedup_substrings(df, keep="last")
    with pytest.raises(ValueError):
        dedup_substrings(df, strategy="magic")


def test_delimiter_embedded_tokens_do_not_alias(spark):
    """Tokens may contain any non-whitespace byte. These two DIFFERENT
    2-token windows — ('a\\x01b','c') vs ('a','b\\x01c') — collide under
    any single-char joined-string identity, so they pin the window hash
    covering the token ARRAY itself (ADVICE r8 finding)."""
    docs = {1: "a\x01b c", 2: "a b\x01c"}
    marks = duplicated_window_starts(
        _df(spark, docs), width=2, keep="none"
    )
    assert marks.count() == 0
    out = {
        r["doc_id"]: r["text"]
        for r in dedup_substrings(_df(spark, docs), width=2).collect()
    }
    assert out == docs
