"""State-backed incremental line dedup (operators/lines.py, r11).

The load-bearing property is the DIFFERENTIAL: for batch rows, the
incremental path equals one-shot ``dedup_lines_global`` over the union
under append-only ids — including ``min_dup > 2``, where the stored
seen-counts (not mere key presence) carry the semantics. Persistence
gets the document-tier treatment: bucketed save/load, append ∝
increment with heal idempotency, plan-asserted Exchange-free state
side, sum-preserving compaction.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.lines import (
    LineState,
    append_line_state,
    build_line_state,
    compact_line_state,
    dedup_lines_incremental,
    dedup_lines_global,
    line_state_file_report,
    load_line_state,
    save_line_state,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BANNER = "Copyright Example Site all rights reserved"
COOKIE = "We use cookies to improve your experience"

# corpus: banner twice, cookie once, unique bodies
CORPUS = [
    (1, f"{BANNER}\nfirst document body one"),
    (2, f"{BANNER}\nsecond document body two\n{COOKIE}"),
    (3, "third document body three"),
]
# batch (append-only ids): banner (state >= 2), cookie (state == 1),
# a batch-internal dup pair, fresh lines, and one all-dup doc
BATCH = [
    (11, f"{BANNER}\nfresh line eleven\nshared batch line"),
    (12, f"shared batch line\n{COOKIE}\nfresh line twelve"),
    (13, f"{BANNER}"),  # every line dropped -> doc dropped
    (14, "  shared batch line  \nfresh line fourteen"),  # trim identity
]


def _texts(df):
    return {r["doc_id"]: r["text"] for r in df.collect()}


def _batch_rows_of_oneshot(spark, corpus, batch, **kw):
    union = _df(spark, corpus + batch)
    out = dedup_lines_global(union, **kw)
    batch_ids = {i for i, _ in batch}
    return {
        k: v for k, v in _texts(out).items() if k in batch_ids
    }


@pytest.mark.parametrize("keep", ["first", "none"])
@pytest.mark.parametrize("min_dup", [2, 3])
def test_differential_vs_oneshot(spark, keep, min_dup):
    state = build_line_state(_df(spark, CORPUS))
    res = dedup_lines_incremental(
        _df(spark, BATCH), state, min_dup=min_dup, keep=keep
    )
    expected = _batch_rows_of_oneshot(
        spark, CORPUS, BATCH, min_dup=min_dup, keep=keep
    )
    assert _texts(res.kept) == expected


def test_semantics_pinned(spark):
    """The min_dup=2 keep-first answer, stated explicitly."""
    state = build_line_state(_df(spark, CORPUS))
    res = dedup_lines_incremental(_df(spark, BATCH), state)
    texts = _texts(res.kept)
    # banner: in state -> dropped everywhere in the batch
    # cookie: state n=1, batch makes 2 -> dropped (first already shipped)
    # shared batch line: state-unseen, 3 batch occurrences -> first (11)
    assert texts == {
        11: "fresh line eleven\nshared batch line",
        12: "fresh line twelve",
        14: "fresh line fourteen",
        # 13 dropped: no surviving line
    }
    # delta counts SEEN occurrences incl. dropped ones, trimmed keys
    delta = {r["key"]: r["n"] for r in res.delta.collect()}
    assert delta[BANNER] == 2
    assert delta["shared batch line"] == 3
    assert delta[COOKIE] == 1


def test_min_dup3_needs_counts_not_presence(spark):
    """cookie is in the state ONCE; with min_dup=3 a single batch
    occurrence totals 2 < 3 and must SURVIVE — a presence-only state
    would wrongly drop it."""
    state = build_line_state(_df(spark, CORPUS))
    res = dedup_lines_incremental(
        _df(spark, [(21, f"{COOKIE}\nfresh line")]), state, min_dup=3
    )
    assert _texts(res.kept) == {21: f"{COOKIE}\nfresh line"}
    # but banner (state n=2) + 1 batch = 3 -> dropped
    res2 = dedup_lines_incremental(
        _df(spark, [(22, f"{BANNER}\nfresh line two")]), state, min_dup=3
    )
    assert _texts(res2.kept) == {22: "fresh line two"}


def test_chained_increments_equal_oneshot(spark, tmp_path):
    path = str(tmp_path / "lst")
    save_line_state(build_line_state(_df(spark, CORPUS)), path, buckets=4)
    st = load_line_state(spark, path)
    res1 = dedup_lines_incremental(_df(spark, BATCH), st)
    kept1 = _texts(res1.kept)  # evaluate BEFORE append (lazy lineage)
    st = append_line_state(res1, path, batch_id="b1")
    batch3 = [
        (31, f"{BANNER}\nshared batch line\nbrand new line"),
        (32, "fresh line fourteen\nbrand new other"),
    ]
    res2 = dedup_lines_incremental(_df(spark, batch3), st)
    kept2 = _texts(res2.kept)
    assert kept1 == _batch_rows_of_oneshot(spark, CORPUS, BATCH)
    # batch-3 rows vs one-shot over all three sections
    assert kept2 == _batch_rows_of_oneshot(
        spark, CORPUS + BATCH, batch3
    )
    # 'shared batch line' now has 3 prior occurrences; 'fresh line
    # fourteen' 1 prior -> both dropped at min_dup=2
    assert kept2 == {
        31: "brand new line",
        32: "brand new other",
    }


def test_save_load_roundtrip_and_kind_guard(spark, tmp_path):
    path = str(tmp_path / "lst")
    save_line_state(build_line_state(_df(spark, CORPUS)), path, buckets=4)
    st = load_line_state(spark, path)
    counts = {
        r["key"]: r["n"]
        for r in st.lines.groupBy("key")
        .agg(F.sum("n").alias("n"))
        .collect()
    }
    assert counts[BANNER] == 2 and counts[COOKIE] == 1
    # a document-tier state path is refused loudly
    from data_governance_spark.operators.incremental import (
        build_dedup_state,
        save_dedup_state,
    )

    dpath = str(tmp_path / "docstate")
    save_dedup_state(
        build_dedup_state(_df(spark, CORPUS)), dpath, buckets=4
    )
    with pytest.raises(ValueError, match="not a line-dedup state"):
        load_line_state(spark, dpath)


def test_state_side_shuffle_free(spark, tmp_path):
    """The corpus-sized side of the count join: bucketed scan, no
    Exchange; the batch side shuffles. The groupBy(key).sum(n) that
    folds append rows rides the bucketed distribution."""
    path = str(tmp_path / "lst")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    save_line_state(
        build_line_state(_df(spark, CORPUS)), path, buckets=n_shuffle
    )
    st = load_line_state(spark, path)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        from data_governance_spark.operators.lines import _line_rows

        batch_agg = (
            _line_rows(_df(spark, BATCH), "doc_id", "text")
            .groupBy(F.col("_dl_key").alias("key"))
            .agg(F.count(F.lit(1)).alias("nb"))
        )
        state_counts = st.lines.groupBy("key").agg(F.sum("n").alias("ns"))
        j = batch_agg.join(state_counts, "key", "left")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1  # batch side only
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_append_heal_idempotent(spark, tmp_path):
    path = str(tmp_path / "lst")
    save_line_state(build_line_state(_df(spark, CORPUS)), path, buckets=4)
    st = load_line_state(spark, path)
    res = dedup_lines_incremental(_df(spark, BATCH), st)

    def total(state):
        return {
            r["key"]: r["n"]
            for r in state.lines.groupBy("key")
            .agg(F.sum("n").alias("n"))
            .collect()
        }

    st = append_line_state(res, path, batch_id="b1")
    after_once = total(st)
    assert after_once[BANNER] == 4  # 2 corpus + 2 batch
    # plain re-append double-counts (that is why batch_id + heal exist)
    st = append_line_state(res, path, batch_id="b1", heal=True)
    assert total(st) == after_once  # heal: no-op re-append
    # a NEW batch_id with the same delta is a legitimate second batch
    st = append_line_state(res, path, batch_id="b2")
    assert total(st)[BANNER] == 6


def test_append_requires_unique_batch_id(spark, tmp_path):
    path = str(tmp_path / "lst")
    save_line_state(build_line_state(_df(spark, CORPUS)), path, buckets=4)
    res = dedup_lines_incremental(
        _df(spark, BATCH), load_line_state(spark, path)
    )
    for bad in ("", "base"):
        with pytest.raises(ValueError, match="batch_id"):
            append_line_state(res, path, batch_id=bad)


def test_compaction_files_rows_and_semantics(spark, tmp_path):
    path = str(tmp_path / "lst")
    buckets = 4
    save_line_state(
        build_line_state(_df(spark, CORPUS)), path, buckets=buckets
    )
    st = load_line_state(spark, path)
    for i in range(3):
        res = dedup_lines_incremental(
            _df(spark, [(100 + i, f"{BANNER}\nunique body {i} here")]), st
        )
        st = append_line_state(res, path, batch_id=f"b{i}")
    rep = line_state_file_report(spark, path)
    assert rep["lines"]["files"] > buckets
    before = {
        r["key"]: r["n"]
        for r in st.lines.groupBy("key").agg(F.sum("n").alias("n")).collect()
    }
    out = compact_line_state(spark, path)
    assert out["lines"]["compacted"]
    assert line_state_file_report(spark, path)["lines"]["files"] <= buckets
    st2 = load_line_state(spark, path)
    after = {
        r["key"]: r["n"]
        for r in st2.lines.groupBy("key").agg(F.sum("n").alias("n")).collect()
    }
    assert after == before  # sum-preserving
    # no-op re-compact
    assert not compact_line_state(spark, path)["lines"]["compacted"]
    # post-compact increment still correct and state-side Exchange-free
    res = dedup_lines_incremental(
        _df(spark, [(200, f"{BANNER}\nbrand new after compaction")]), st2
    )
    assert _texts(res.kept) == {200: "brand new after compaction"}


def test_adversarial_every_doc_shares_a_line(spark):
    """Every batch doc carries the same state-known banner — the hot
    key shape; semantics must hold (the banner vanishes everywhere)."""
    corpus = [(1, f"{BANNER}\ncorpus body")]
    batch = [
        (10 + i, f"{BANNER}\nbody number {i}") for i in range(20)
    ]
    res = dedup_lines_incremental(
        _df(spark, batch), build_line_state(_df(spark, corpus))
    )
    texts = _texts(res.kept)
    assert texts == {10 + i: f"body number {i}" for i in range(20)}


def test_param_guards(spark):
    st = build_line_state(_df(spark, CORPUS))
    with pytest.raises(ValueError, match="keep"):
        dedup_lines_incremental(_df(spark, BATCH), st, keep="last")
    with pytest.raises(ValueError, match="min_dup"):
        dedup_lines_incremental(_df(spark, BATCH), st, min_dup=1)
    with pytest.raises(ValueError, match="buckets"):
        save_line_state(st, "/tmp/never-written", buckets=0)


def test_null_and_whitespace_text(spark):
    """NULL/whitespace-only texts have no lines: their docs drop at
    rebuild (no surviving line), and the state build ignores them."""
    state = build_line_state(
        _df(spark, [(1, None), (2, "   \n  "), (3, "real corpus line")])
    )
    assert {r["key"] for r in state.lines.collect()} == {"real corpus line"}
    res = dedup_lines_incremental(
        _df(spark, [(11, None), (12, "fresh body line")]), state
    )
    assert _texts(res.kept) == {12: "fresh body line"}


def test_pre_layout_params_state_still_loads(spark, tmp_path):
    """r11 pre-refactor line states recorded only (kind, buckets) in
    params — the caller tier's constants must fill in keys/part so an
    on-disk production state survives the upgrade; a contradicting
    stored layout raises."""
    path = str(tmp_path / "lst")
    save_line_state(build_line_state(_df(spark, CORPUS)), path, buckets=4)
    # rewrite params to the OLD schema
    spark.createDataFrame(
        [("lines", 4)], "kind string, buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")
    st = load_line_state(spark, path)
    res = dedup_lines_incremental(_df(spark, BATCH), st)
    assert _texts(res.kept) == _batch_rows_of_oneshot(spark, CORPUS, BATCH)
    st = append_line_state(res, path, batch_id="mig1")
    assert line_state_file_report(spark, path)["lines"]["files"] > 4
    assert compact_line_state(spark, path)["lines"]["compacted"]
    # a stored layout contradicting the tier constants is a hard error
    spark.createDataFrame(
        [("lines", 4, "wrongkey", "lines")],
        "kind string, buckets int, keys string, part string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")
    with pytest.raises(ValueError, match="does not match"):
        load_line_state(spark, path)
