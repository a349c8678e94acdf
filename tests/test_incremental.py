"""Incremental corpus dedup (operators/incremental.py) — the core
property is the batch-vs-incremental DIFFERENTIAL: processing batch 1,
persisting state, then processing batch 2 must keep exactly the same
documents as one-shot dedup over the union (keep-first = min id, ids
append-only), except for the documented bridging divergence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.functions.text import tokens, word_shingles
from data_governance_spark.operators.components import (
    connected_components,
    keep_canonical,
)
from data_governance_spark.operators.dedup import (
    exact_precluster,
    minhash_dedup_pairs,
)
from data_governance_spark.operators.incremental import (
    build_dedup_state,
    incremental_dedup,
    load_dedup_state,
    save_dedup_state,
)

SHINGLE_N = 2  # short docs in tests: 2-token shingles


def one_shot_dedup(docs, threshold=0.5):
    """The established one-shot pipeline shape (d03's composition),
    assembled independently of incremental_dedup's internals."""
    canonical, _ = exact_precluster(docs, F.md5("text"))
    sh = canonical.select(
        "doc_id", word_shingles(tokens(F.col("text")), SHINGLE_N).alias("sh")
    )
    pairs = minhash_dedup_pairs(sh, F.col("sh"), threshold=threshold)
    labels = connected_components(pairs, "doc_a", "doc_b")
    return keep_canonical(canonical, labels)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BATCH1 = [
    (1, "alpha beta gamma delta epsilon zeta"),
    (2, "one two three four five six seven"),
    (3, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
    (4, "totally different content lives here now"),
]
BATCH2 = [
    (11, "alpha beta gamma delta epsilon zeta"),  # exact dup of 1
    (12, "one two three four five six eight"),  # near-dup of 2
    (13, "fresh unseen material for the second batch"),
    (14, "fresh unseen material for the second batches"),  # near of 13
    (15, "one two three four five six eight"),  # exact dup of 12
]


def test_incremental_equals_one_shot(spark, tmp_path):
    b1 = _docs(spark, BATCH1)
    b2 = _docs(spark, BATCH2)

    # batch 1: one-shot dedup, then persist its state
    kept1 = one_shot_dedup(b1)
    state = build_dedup_state(kept1, shingle_n=SHINGLE_N)
    save_dedup_state(state, str(tmp_path / "state"))
    state = load_dedup_state(spark, str(tmp_path / "state"))

    res = incremental_dedup(b2, state)
    got = {r["doc_id"] for r in kept1.collect()} | {
        r["doc_id"] for r in res.kept.collect()
    }
    want = {r["doc_id"] for r in one_shot_dedup(_docs(spark, BATCH1 + BATCH2)).collect()}
    assert got == want

    reasons = {r["doc_id"]: r["reason"] for r in res.dropped.collect()}
    assert reasons[11] == "exact"  # exact match against the state
    assert reasons[12] == "near"  # near-dup of state doc 2
    assert reasons[15] == "exact"  # within-batch exact dup of 12
    assert 14 in reasons  # within-batch near-dup of 13


def test_updated_state_carries_survivors(spark):
    b1 = _docs(spark, BATCH1)
    kept1 = one_shot_dedup(b1)
    state = build_dedup_state(kept1, shingle_n=SHINGLE_N)
    res = incremental_dedup(_docs(spark, BATCH2), state)
    # a THIRD batch duplicating a batch-2 survivor must now drop
    b3 = _docs(spark, [(21, "fresh unseen material for the second batch")])
    res3 = incremental_dedup(b3, res.state)
    assert res3.kept.count() == 0
    assert {r["reason"] for r in res3.dropped.collect()} == {"exact"}


def test_bridging_keeps_both_existing_docs(spark):
    """The documented divergence: a new doc near-dupping TWO existing
    canonicals drops itself but cannot retro-merge the shipped docs.
    bands=num_hashes (one row per band) makes candidate generation
    near-certain at moderate Jaccard, so the test pins semantics, not
    the LSH S-curve."""
    old = _docs(
        spark,
        [
            (1, "red green blue yellow purple orange pink"),
            (2, "seven eight nine ten eleven twelve thirteen"),
        ],
    )
    state = build_dedup_state(
        one_shot_dedup(old), shingle_n=SHINGLE_N, num_hashes=64, bands=64
    )
    # the bridge shares half its shingles with each existing doc
    bridge = _docs(
        spark,
        [(10, "red green blue yellow eleven twelve thirteen")],
    )
    res = incremental_dedup(bridge, state, threshold=0.2)
    assert res.kept.count() == 0
    assert {r["reason"] for r in res.dropped.collect()} == {"near"}
    # the state still carries both originals, untouched
    assert res.state.exact.count() == 2


def test_empty_and_no_overlap_batches(spark):
    b1 = _docs(spark, BATCH1)
    state = build_dedup_state(one_shot_dedup(b1), shingle_n=SHINGLE_N)
    fresh = _docs(
        spark,
        [(31, "completely novel words appear in this document"),
         (32, "and a second novel document with other words")],
    )
    res = incremental_dedup(fresh, state)
    assert res.kept.count() == 2 and res.dropped.count() == 0
    empty = _docs(spark, []).filter(F.lit(False))
    res2 = incremental_dedup(empty, state)
    assert res2.kept.count() == 0 and res2.dropped.count() == 0


def test_null_text_rows_survive(spark):
    b1 = _docs(spark, BATCH1)
    state = build_dedup_state(one_shot_dedup(b1), shingle_n=SHINGLE_N)
    nulls = spark.createDataFrame(
        [(41, None), (42, None)], "doc_id long, text string"
    )
    res = incremental_dedup(nulls, state)
    # null text is unknown content, never a duplicate of other nulls
    assert {r["doc_id"] for r in res.kept.collect()} == {41, 42}


def test_bucketed_state_round_trip_equals_plain(spark, tmp_path):
    """buckets=N storage must change ONLY the plan, never the answer:
    same kept set, same dropped reasons, same behavior after a resave
    of the UPDATED state (whose band_rel is invalidated)."""
    kept1 = one_shot_dedup(_docs(spark, BATCH1))
    state = build_dedup_state(kept1, shingle_n=SHINGLE_N)
    save_dedup_state(state, str(tmp_path / "plain"))
    save_dedup_state(state, str(tmp_path / "buck"), buckets=4)
    sp = load_dedup_state(spark, str(tmp_path / "plain"))
    sb = load_dedup_state(spark, str(tmp_path / "buck"))
    assert sp.band_rel is None and sb.band_rel is not None
    assert sb.shingle_n == SHINGLE_N  # params survive the bucketed path
    b2 = _docs(spark, BATCH2)
    rp = incremental_dedup(b2, sp)
    rb = incremental_dedup(b2, sb)
    assert {r["doc_id"] for r in rp.kept.collect()} == {
        r["doc_id"] for r in rb.kept.collect()
    }
    assert {(r["doc_id"], r["reason"]) for r in rp.dropped.collect()} == {
        (r["doc_id"], r["reason"]) for r in rb.dropped.collect()
    }
    # updated state resaves bucketed and keeps working
    save_dedup_state(rb.state, str(tmp_path / "buck2"), buckets=4)
    s2 = load_dedup_state(spark, str(tmp_path / "buck2"))
    res3 = incremental_dedup(
        _docs(spark, [(21, "fresh unseen material for the second batch")]), s2
    )
    assert res3.kept.count() == 0


def test_bucketed_state_joins_are_state_side_shuffle_free(spark, tmp_path):
    """The r8 point of buckets=N: the corpus-sized state side of the
    exact-tier join reads WITHOUT an Exchange (one shuffle total — the
    batch side), and the stored band relation scans bucketed."""
    from data_governance_spark.operators.incremental import _fingerprints

    state = build_dedup_state(_docs(spark, BATCH1), shingle_n=SHINGLE_N)
    # buckets == shuffle partitions: the batch side's aggregation
    # exchange already co-partitions with the bucketed scan
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    save_dedup_state(state, str(tmp_path / "st"), buckets=n_shuffle)
    st = load_dedup_state(spark, str(tmp_path / "st"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fp = (
            _fingerprints(_docs(spark, BATCH2), "doc_id", "text")
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        j = fp.join(
            st.exact.select("fp", F.col("doc_id").alias("m")), "fp"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1  # batch side only
        # the band relation's bucketing is consumed by (band, key)
        # equi-joins: a self-join co-locates with ZERO exchanges
        # (a bare scan legitimately drops unused bucketing metadata —
        # autoBucketedScan — so the join IS the assertion)
        a = st.band_rel.alias("a")
        b = st.band_rel.select(
            F.col("band"), F.col("key"), F.col("doc_id").alias("other")
        ).alias("b")
        band_plan = (
            a.join(b, ["band", "key"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in band_plan
        assert "Exchange" not in band_plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_state_shingle_n_survives_updates(spark):
    state = build_dedup_state(
        one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
    )
    res = incremental_dedup(_docs(spark, BATCH2), state)
    assert res.state.shingle_n == SHINGLE_N
    res_exact_only = incremental_dedup(
        _docs(spark, [(51, "only the exact tier runs here")]),
        state,
        threshold=1.01,
    )
    assert res_exact_only.state.shingle_n == SHINGLE_N


def test_bucketed_resave_to_same_path(spark, tmp_path):
    """load -> incremental -> save back to the SAME path: the staged
    write must not destroy the state it is still reading (code-review
    r8 finding: delete-before-write would lose the only copy)."""
    path = str(tmp_path / "st")
    state = build_dedup_state(
        one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
    )
    save_dedup_state(state, path, buckets=4)
    st = load_dedup_state(spark, path)
    res = incremental_dedup(_docs(spark, BATCH2), st)
    save_dedup_state(res.state, path, buckets=4)  # reads path while writing
    st2 = load_dedup_state(spark, path)
    res3 = incremental_dedup(
        _docs(spark, [(21, "fresh unseen material for the second batch")]),
        st2,
    )
    assert res3.kept.count() == 0
    assert {r["reason"] for r in res3.dropped.collect()} == {"exact"}


def test_bucketed_registration_refreshes_on_bucket_change(spark, tmp_path):
    """A stale catalog registration (files re-saved with a different
    bucket count by another process) must be detected and re-issued —
    a wrong bucket modulus would silently mis-co-partition the
    'shuffle-free' joins (code-review r8 finding)."""
    from data_governance_spark.operators.incremental import (
        _state_table_name,
    )

    path = str(tmp_path / "st")
    state = build_dedup_state(
        one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
    )
    save_dedup_state(state, path, buckets=8)
    # simulate another session's stale registration: 4 buckets over
    # the 8-bucket files
    name = _state_table_name(path, "exact")
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"CREATE TABLE {name} (fp STRING, doc_id BIGINT) USING PARQUET "
        f"CLUSTERED BY (fp) SORTED BY (fp) INTO 4 BUCKETS "
        f"LOCATION '{path}/exact'"
    )
    st = load_dedup_state(spark, path)
    desc = {
        r["col_name"]: r["data_type"]
        for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
    }
    assert desc.get("Num Buckets") == "8"
    assert st.exact.count() == state.exact.count()


def test_plain_resave_to_same_path(spark, tmp_path):
    """Plain (unbucketed) twin of the bucketed same-path resave: the
    updated state's lineage reads the files it replaces (sigs reads
    the old exact through the survivor computation), so the plain path
    must also stage-then-swap (ADVICE r8: a direct overwrite deletes
    the only copy of the old state mid-write)."""
    path = str(tmp_path / "st")
    state = build_dedup_state(
        one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
    )
    save_dedup_state(state, path)
    st = load_dedup_state(spark, path)
    res = incremental_dedup(_docs(spark, BATCH2), st)
    save_dedup_state(res.state, path)  # reads path while writing
    st2 = load_dedup_state(spark, path)
    res3 = incremental_dedup(
        _docs(spark, [(21, "fresh unseen material for the second batch")]),
        st2,
    )
    assert res3.kept.count() == 0
    assert {r["reason"] for r in res3.dropped.collect()} == {"exact"}


def test_exact_only_increment_preserves_band_rel(spark, tmp_path):
    """threshold>1 (exact-tier-only) leaves sigs untouched, so a
    bucketed state's stored band relation — derived from sigs — stays
    valid and must survive the increment (ADVICE r8: dropping it cost
    the next near-dedup increment a needless re-derivation)."""
    path = str(tmp_path / "st")
    state = build_dedup_state(
        one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
    )
    save_dedup_state(state, path, buckets=4)
    st = load_dedup_state(spark, path)
    assert st.band_rel is not None
    res = incremental_dedup(_docs(spark, BATCH2), st, threshold=1.01)
    assert res.state.band_rel is st.band_rel


def rowbag(df):
    """Sorted row MULTISET — a set would collapse accidental duplicate
    rows and mask a double-append (the exact bug class the stale
    post-append result.state exhibits, pinned below)."""
    return sorted(
        tuple(tuple(v) if isinstance(v, list) else v for v in r)
        for r in df.collect()
    )


def test_append_dedup_state_equals_full_resave(spark, tmp_path):
    """append_dedup_state writes only the increment's delta rows, and
    the appended tables must equal a full resave of the updated state
    (row-MULTISET equality on every table) while still joining
    state-side shuffle-free (bucketing survives per-bucket file
    appends). The resave runs BEFORE the append: whether result.state's
    catalog scans see the pre- or post-append file listing is an
    analysis-snapshotting internal (documented as unspecified), so the
    only defined post-append handle is append_dedup_state's return
    value — which is what the equality below checks."""
    from data_governance_spark.operators.incremental import (
        append_dedup_state,
    )

    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    path = str(tmp_path / "st")
    state = build_dedup_state(
        one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
    )
    save_dedup_state(state, path, buckets=n_shuffle)
    st = load_dedup_state(spark, path)
    res = incremental_dedup(_docs(spark, BATCH2), st)
    full = str(tmp_path / "full")
    save_dedup_state(res.state, full, buckets=n_shuffle)
    n_delta = res.delta_exact.count()
    got = append_dedup_state(res, path)
    want = load_dedup_state(spark, full)

    for part in ("exact", "sigs"):
        assert rowbag(getattr(got, part)) == rowbag(getattr(want, part)), part
    assert rowbag(got.band_rel) == rowbag(want.band_rel)
    assert n_delta > 0  # the increment genuinely appended rows

    # appended exact table still scans bucketed and joins with ONE
    # Exchange (the batch side only)
    from data_governance_spark.operators.incremental import _fingerprints

    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        fp = (
            _fingerprints(
                _docs(spark, [(31, "post append probe")]), "doc_id", "text"
            )
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        j = fp.join(got.exact.select("fp", F.col("doc_id").alias("m")), "fp")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    # semantics: a third batch duplicating a batch-2 survivor drops
    res3 = incremental_dedup(
        _docs(spark, [(21, "fresh unseen material for the second batch")]),
        got,
    )
    assert res3.kept.count() == 0


def test_append_dedup_state_exact_only_increment(spark, tmp_path):
    """threshold>1 increments carry delta_sigs=None — only the exact
    table grows; sigs and bands stay byte-identical."""
    from data_governance_spark.operators.incremental import (
        append_dedup_state,
    )

    path = str(tmp_path / "st")
    state = build_dedup_state(
        one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
    )
    save_dedup_state(state, path, buckets=4)
    st = load_dedup_state(spark, path)
    sigs_before = {(r["doc_id"], tuple(r["sig"])) for r in st.sigs.collect()}
    res = incremental_dedup(_docs(spark, BATCH2), st, threshold=1.01)
    # materialize BEFORE appending: res.kept's lazy lineage reads the
    # state tables, and the appended fps would re-drop the survivors
    # on a post-append evaluation (documented in append_dedup_state)
    n_kept = res.kept.count()
    assert n_kept == 3  # 12, 13, 14 (11 exact-vs-state, 15 in-batch)
    append_dedup_state(res, path)
    got = load_dedup_state(spark, path)
    assert {(r["doc_id"], tuple(r["sig"])) for r in got.sigs.collect()} == sigs_before
    assert got.exact.count() == state.exact.count() + n_kept


def test_append_dedup_state_guards(spark, tmp_path):
    from data_governance_spark.operators.incremental import (
        append_dedup_state,
    )

    state = build_dedup_state(
        one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
    )
    res = incremental_dedup(_docs(spark, BATCH2), state)
    plain = str(tmp_path / "plain")
    save_dedup_state(state, plain)  # unbucketed
    with pytest.raises(ValueError, match="bucketed"):
        append_dedup_state(res, plain)
    other = str(tmp_path / "other")
    save_dedup_state(
        build_dedup_state(
            one_shot_dedup(_docs(spark, BATCH1)), shingle_n=3
        ),
        other,
        buckets=4,
    )
    with pytest.raises(ValueError, match="mismatch"):
        append_dedup_state(res, other)


def test_append_dedup_state_heal_repairs_torn_append(spark, tmp_path):
    """The documented recovery: after a tear (only the sigs INSERT
    landed), re-running the same append with heal=True anti-joins the
    deltas against the stored tables, so the healed state equals a
    clean one-shot append — and a second heal-append writes nothing
    (idempotent). A plain re-append, by contrast, duplicates rows —
    pinned last, because it is the reason heal exists."""
    from data_governance_spark.operators.incremental import (
        IncrementalResult,
        _ensure_bucketed_table,
        _state_table_name,
        append_dedup_state,
    )

    buckets = 4

    def fresh_state(sub):
        p = str(tmp_path / sub)
        save_dedup_state(
            build_dedup_state(
                one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
            ),
            p,
            buckets=buckets,
        )
        return p

    torn_path, clean_path = fresh_state("torn"), fresh_state("clean")
    res = incremental_dedup(
        _docs(spark, BATCH2), load_dedup_state(spark, torn_path)
    )
    # literal (collected) deltas: this test deliberately appends the
    # same rows twice, so the deltas must not be lazy reads of the
    # tables being appended to
    de = spark.createDataFrame(
        res.delta_exact.collect(), res.delta_exact.schema
    )
    ds = spark.createDataFrame(res.delta_sigs.collect(), res.delta_sigs.schema)
    assert ds.count() > 0

    def lit_result(path):
        return IncrementalResult(
            kept=res.kept,
            dropped=res.dropped,
            state=load_dedup_state(spark, path),
            delta_exact=de,
            delta_sigs=ds,
        )

    # simulate the tear: ONLY the sigs append landed
    name = _state_table_name(torn_path, "sigs")
    _ensure_bucketed_table(
        spark, name, f"{torn_path}/sigs", ["doc_id"], buckets
    )
    (
        ds.repartition(buckets, F.col("doc_id"))
        .write.mode("append")
        .option("path", f"{torn_path}/sigs")
        .bucketBy(buckets, "doc_id")
        .sortBy("doc_id")
        .format("parquet")
        .saveAsTable(name)
    )

    healed = append_dedup_state(lit_result(torn_path), torn_path, heal=True)
    want = append_dedup_state(lit_result(clean_path), clean_path)
    assert rowbag(healed.exact) == rowbag(want.exact)
    assert rowbag(healed.sigs) == rowbag(want.sigs)
    assert rowbag(healed.band_rel) == rowbag(want.band_rel)

    # heal is idempotent outright: a second heal-append writes nothing
    again = append_dedup_state(lit_result(torn_path), torn_path, heal=True)
    assert rowbag(again.exact) == rowbag(want.exact)
    assert rowbag(again.sigs) == rowbag(want.sigs)
    assert rowbag(again.band_rel) == rowbag(want.band_rel)

    # a PLAIN re-append duplicates every delta row (why heal exists)
    dup = append_dedup_state(lit_result(clean_path), clean_path)
    assert len(rowbag(dup.sigs)) == len(rowbag(want.sigs)) + ds.count()


BATCH3 = [
    (21, "entirely novel third batch content here"),
    (22, "entirely novel third batch content there"),  # near of 21
    (23, "one more unique document for compaction"),
]


def test_compact_dedup_state(spark, tmp_path):
    """N appends -> compact -> (a) the state's row multisets are
    unchanged, (b) every table is down to exactly one file per bucket,
    (c) the post-compact increment join still runs with exactly ONE
    Exchange (batch side) — the small-files maintenance pass must not
    cost the bucketed layout its shuffle-free scan."""
    from data_governance_spark.operators.incremental import (
        append_dedup_state,
        compact_dedup_state,
        state_file_report,
    )

    buckets = 4
    path = str(tmp_path / "st")
    state = build_dedup_state(
        one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
    )
    save_dedup_state(state, path, buckets=buckets)
    st = load_dedup_state(spark, path)
    st = append_dedup_state(incremental_dedup(_docs(spark, BATCH2), st), path)
    st = append_dedup_state(incremental_dedup(_docs(spark, BATCH3), st), path)

    before = state_file_report(spark, path)
    assert all(v["files"] > buckets for v in before.values()), before
    pre = load_dedup_state(spark, path)
    bags = {
        "exact": rowbag(pre.exact),
        "sigs": rowbag(pre.sigs),
        "bands": rowbag(pre.band_rel),
    }

    report = compact_dedup_state(spark, path)
    assert all(v["compacted"] for v in report.values()), report
    assert {p: v["files"] for p, v in report.items()} == {
        p: v["files"] for p, v in before.items()
    }

    got = load_dedup_state(spark, path)
    assert rowbag(got.exact) == bags["exact"]
    assert rowbag(got.sigs) == bags["sigs"]
    assert rowbag(got.band_rel) == bags["bands"]
    # at most one file per NON-EMPTY bucket (an empty bucket writes no
    # file), and strictly fewer files than before on every table
    after = state_file_report(spark, path)
    assert all(v["files"] <= buckets for v in after.values()), after
    assert all(
        after[p]["files"] < before[p]["files"] for p in after
    ), (before, after)

    # a second compact is a no-op: already at one file per bucket
    report2 = compact_dedup_state(spark, path)
    assert not any(v["compacted"] for v in report2.values()), report2
    assert {p: v["files"] for p, v in report2.items()} == {
        p: v["files"] for p, v in after.items()
    }

    # post-compact increment join: bucketed scan, ONE Exchange. The
    # planner only uses the bucketed distribution when the other
    # side's shuffle lands on the same partition count, so pin
    # shuffle.partitions to the bucket count for the probe (the
    # production sizing rule: save with buckets matched to the
    # cluster's shuffle parallelism).
    from data_governance_spark.operators.incremental import _fingerprints

    n_shuffle_orig = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", str(buckets))
    try:
        fp = (
            _fingerprints(
                _docs(spark, [(41, "post compact probe")]), "doc_id", "text"
            )
            .groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        j = fp.join(got.exact.select("fp", F.col("doc_id").alias("m")), "fp")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.shuffle.partitions", n_shuffle_orig)

    # semantics survive compaction: a duplicate of a batch-2 survivor
    # still drops against the compacted state
    res = incremental_dedup(
        _docs(spark, [(51, "fresh unseen material for the second batch")]),
        got,
    )
    assert res.kept.count() == 0


def test_compact_dedup_state_guards(spark, tmp_path):
    from data_governance_spark.operators.incremental import (
        compact_dedup_state,
        state_file_report,
    )

    state = build_dedup_state(
        one_shot_dedup(_docs(spark, BATCH1)), shingle_n=SHINGLE_N
    )
    plain = str(tmp_path / "plain")
    save_dedup_state(state, plain)  # unbucketed
    with pytest.raises(ValueError, match="bucketed"):
        compact_dedup_state(spark, plain)
    with pytest.raises(ValueError, match="bucketed"):
        state_file_report(spark, plain)
    bucketed = str(tmp_path / "bk")
    save_dedup_state(state, bucketed, buckets=4)
    with pytest.raises(ValueError, match="max_files_per_bucket"):
        compact_dedup_state(spark, bucketed, max_files_per_bucket=0)
