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


# ------------------------------------------------------------------ #
# state-backed incremental tier (r11)
# ------------------------------------------------------------------ #
from data_governance_spark.operators.exsubstr import (  # noqa: E402
    append_substr_state,
    build_substr_state,
    compact_substr_state,
    dedup_substrings_incremental,
    load_substr_state,
    save_substr_state,
    substr_state_file_report,
)

W = 5
HEADER = "alpha beta gamma delta epsilon"  # exactly W tokens
CORPUS_I = {
    1: HEADER + " corpus body one has its own unique tail here",
    2: HEADER + " corpus body two with different unique words",
    3: "independent corpus document three with no shared span",
}
# batch ids append-only (> corpus ids)
BATCH_I = {
    11: HEADER + " batch body eleven fresh unique continuation text",
    12: "batch twelve repeated chunk zz yy xx ww vv and more",
    13: "prefix words then repeated chunk zz yy xx ww vv tail",
    14: "short doc",  # < W tokens: never touched
}


def _inc_run(spark, corpus, batch, **kw) -> dict:
    state = build_substr_state(_df(spark, corpus), width=W)
    res = dedup_substrings_incremental(_df(spark, batch), state, **kw)
    rows = res.kept.collect()
    assert len(rows) == len(batch)  # row count preserved
    return {r["doc_id"]: r["text"] for r in rows}


def _oneshot_batch_rows(spark, corpus, batch, **kw) -> dict:
    union = dict(corpus)
    union.update(batch)
    out = _run(spark, union, width=W, **kw)
    return {i: t for i, t in out.items() if i in batch}


@pytest.mark.parametrize("keep", ["first", "none"])
@pytest.mark.parametrize("min_count", [2, 3])
def test_incremental_differential_vs_oneshot(spark, keep, min_count):
    got = _inc_run(
        spark, CORPUS_I, BATCH_I, min_count=min_count, keep=keep
    )
    want = _oneshot_batch_rows(
        spark, CORPUS_I, BATCH_I, min_count=min_count, keep=keep
    )
    assert got == want
    # and the one-shot itself agrees with the pure-Python reference
    union = dict(CORPUS_I)
    union.update(BATCH_I)
    ref = ref_dedup(union, W, min_count=min_count, keep=keep)
    assert want == {i: t for i, t in ref.items() if i in BATCH_I}


def test_incremental_semantics_pinned(spark):
    got = _inc_run(spark, CORPUS_I, BATCH_I)
    # header: 2 corpus occurrences -> every batch occurrence cut
    assert got[11] == "batch body eleven fresh unique continuation text"
    # 'repeated chunk zz yy xx ww vv' spans: state-unseen, first batch
    # occurrence (doc 12, earlier position) keeps it; doc 13 loses it
    assert "repeated chunk" in got[12]
    assert "repeated chunk" not in got[13]
    assert got[13].startswith("prefix words then")
    assert got[14] == "short doc"  # below width: untouched


def test_min_count3_needs_counts(spark):
    """A window seen ONCE in the corpus + once in the batch totals 2 —
    below min_count=3 it must survive (presence-only state would cut
    it); the 2-corpus-occurrence header totals 3 and is cut."""
    corpus = {
        1: HEADER + " first corpus tail words here",
        2: HEADER + " second corpus tail words here",
        3: "once only zeta eta theta iota kappa single corpus hit",
    }
    batch = {
        11: "once only zeta eta theta iota kappa batch continuation",
        12: HEADER + " batch tail after header",
    }
    got = _inc_run(spark, corpus, batch, min_count=3)
    assert got == _oneshot_batch_rows(spark, corpus, batch, min_count=3)
    assert got[11].startswith("once only zeta")  # total 2 < 3: kept
    assert HEADER not in got[12]  # total 3: cut


def test_substr_state_roundtrip_append_heal_compact(spark, tmp_path):
    path = str(tmp_path / "sst")
    state = build_substr_state(_df(spark, CORPUS_I), width=W)
    save_substr_state(state, path, buckets=4)
    st = load_substr_state(spark, path)
    assert st.width == W  # width rides the state

    def totals(s):
        return {
            (r["h1"], r["h2"]): r["n"]
            for r in s.windows.groupBy("h1", "h2")
            .agg(F.sum("n").alias("n"))
            .collect()
        }

    base_totals = totals(st)
    res = dedup_substrings_incremental(_df(spark, BATCH_I), st)
    kept1 = {r["doc_id"]: r["text"] for r in res.kept.collect()}
    st = append_substr_state(res, path, batch_id="b1")
    after_once = totals(st)
    assert sum(after_once.values()) > sum(base_totals.values())
    # heal re-append: no double counts
    st = append_substr_state(res, path, batch_id="b1", heal=True)
    assert totals(st) == after_once
    # second increment vs union-of-three one-shot (batch rows)
    batch3 = {21: HEADER + " third wave doc", 22: kept1[12] + " again"}
    res2 = dedup_substrings_incremental(_df(spark, batch3), st)
    got2 = {r["doc_id"]: r["text"] for r in res2.kept.collect()}
    union12 = dict(CORPUS_I)
    union12.update(BATCH_I)
    want2 = _oneshot_batch_rows(spark, union12, batch3)
    assert got2 == want2
    st = append_substr_state(res2, path, batch_id="b2")
    # files grew past one per bucket; compaction is sum-preserving
    rep = substr_state_file_report(spark, path)
    assert rep["windows"]["files"] > 4
    pre = totals(st)
    out = compact_substr_state(spark, path)
    assert out["windows"]["compacted"]
    assert substr_state_file_report(spark, path)["windows"]["files"] <= 4
    assert totals(load_substr_state(spark, path)) == pre


def test_substr_state_plan_exchange_free(spark, tmp_path):
    path = str(tmp_path / "sst")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    save_substr_state(
        build_substr_state(_df(spark, CORPUS_I), width=W),
        path,
        buckets=n_shuffle,
    )
    st = load_substr_state(spark, path)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from data_governance_spark.operators.exsubstr import (
            _window_relation,
        )

        batch_agg = (
            _window_relation(_df(spark, BATCH_I), "doc_id", "text", W)
            .groupBy(
                F.col("_es_h1").alias("h1"), F.col("_es_h2").alias("h2")
            )
            .agg(F.count(F.lit(1)).alias("nb"))
        )
        sc = st.windows.groupBy("h1", "h2").agg(F.sum("n").alias("ns"))
        plan = (
            batch_agg.join(sc, ["h1", "h2"], "left")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1  # batch side only
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_substr_state_guards(spark, tmp_path):
    st = build_substr_state(_df(spark, CORPUS_I), width=W)
    with pytest.raises(ValueError, match="min_count"):
        dedup_substrings_incremental(
            _df(spark, BATCH_I), st, min_count=1
        )
    with pytest.raises(ValueError, match="keep"):
        dedup_substrings_incremental(_df(spark, BATCH_I), st, keep="all")
    with pytest.raises(ValueError, match="width"):
        build_substr_state(_df(spark, CORPUS_I), width=0)
    # a line-dedup state path is refused loudly
    from data_governance_spark.operators.lines import (
        build_line_state,
        save_line_state,
    )

    lpath = str(tmp_path / "lines_state")
    save_line_state(
        build_line_state(
            _df(spark, {1: "some corpus line\nanother corpus line"})
        ),
        lpath,
        buckets=2,
    )
    with pytest.raises(ValueError, match="not an exact-substring"):
        load_substr_state(spark, lpath)
