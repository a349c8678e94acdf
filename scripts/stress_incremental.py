#!/usr/bin/env python
"""Bucketed vs plain dedup-state storage under corpus-scale state
(DEPLOY.md evidence, r8).

Builds a state from the sf documents table duplicated x``FACTOR``
(distinct ids, so the state is genuinely state-sized), saves it plain
AND bucketed, then runs the same new batch against both and reports:

1. result equality (kept ids, dropped reasons),
2. wall time per variant,
3. the plan property that matters at 100 TB: Exchange count over the
   exact-tier join (plain shuffles the corpus-sized state side every
   increment; bucketed shuffles only the batch),
4. the append loop (r10): per-increment wall + files-per-bucket after
   each append_dedup_state, then compact_dedup_state timing and the
   post-compact file counts + increment wall (small-files evidence).
   r11: SPARK_GRAFT_COMPACT_EVERY=K interleaves a compaction every K
   appends — the long-run evidence (APPENDS=40, K=10) that the
   per-increment wall stays flat while files/bucket sawtooths,
5. the LINE-dedup state tier (r11, "lines" phase): save/increment/
   append/compact over operators/lines.py's LineState — per-increment
   wall, Exchange count of the count join (state side bucketed), file
   curve, sum-preserving compaction,
6. the SUBSTRING state tier (r11, "substr" phase): the same loop over
   operators/exsubstr.py's window-hash SubstrState.

Usage: python scripts/stress_incremental.py [factor]   (default 32)
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_STATE_DIR (default /tmp/stress_incremental_state),
     SPARK_GRAFT_APPENDS (default 5),
     SPARK_GRAFT_COMPACT_EVERY (default 0 = final compact only),
     SPARK_GRAFT_PHASES (default "base,append" — run "base" for the
     plain-vs-bucketed comparison only, "append" for the append-loop +
     compaction evidence only, "lines" for the line-tier state loop;
     each phase fits a ~10 min budget alone at x32, together they may
     not)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from data_governance_spark.operators.incremental import (  # noqa: E402
    _fingerprints,
    build_dedup_state,
    incremental_dedup,
    load_dedup_state,
    save_dedup_state,
)
from data_governance_spark.session import get_spark  # noqa: E402
from data_governance_spark.tables import table  # noqa: E402


def main():
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.environ.get(
        "SPARK_GRAFT_STATE_DIR", "/tmp/stress_incremental_state"
    )
    shutil.rmtree(root, ignore_errors=True)
    spark = get_spark("stress_incremental")
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))

    phases = {
        t.strip()
        for t in os.environ.get("SPARK_GRAFT_PHASES", "base,append").split(",")
        if t.strip()
    }
    if not phases or not phases <= {"base", "append", "lines", "substr"}:
        raise SystemExit(
            f"SPARK_GRAFT_PHASES must name phases from "
            f"{{base, append, lines, substr}}, got {sorted(phases)!r} — "
            "a typo here would silently save state and measure nothing"
        )
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    # corpus = docs x factor with disjoint ids and per-copy unique text
    # (suffix token), so the state carries factor * n_docs rows
    copies = spark.range(factor).select(F.col("id").alias("c"))
    # repartition: the local one-split parquet crossJoin would land the
    # whole x-factor corpus on ONE task and serialize the interpreted
    # shingle/sig HOFs onto one core (clusters get this spread from
    # their input splits; the gates' repartition(32) lesson)
    corpus = docs.crossJoin(copies).select(
        (F.col("doc_id") + F.col("c") * n_docs * 10).alias("doc_id"),
        F.concat_ws(
            " ", "text", F.concat(F.lit("copy"), F.col("c"))
        ).alias("text"),
    ).repartition(n_shuffle)
    base = n_docs * factor * 100
    if "base" in phases or "append" in phases:
        state = build_dedup_state(corpus)
    if "base" in phases:
        t0 = time.time()
        save_dedup_state(state, f"{root}/plain")
        t_save_plain = time.time() - t0
        t0 = time.time()
        save_dedup_state(state, f"{root}/buck", buckets=n_shuffle)
        t_save_buck = time.time() - t0
        print(
            f"state: {n_docs * factor} docs; save plain "
            f"{t_save_plain:.1f}s, bucketed {t_save_buck:.1f}s"
        )
    elif "append" in phases:
        t0 = time.time()
        save_dedup_state(state, f"{root}/buck", buckets=n_shuffle)
        print(
            f"state: {n_docs * factor} docs; bucketed save "
            f"{time.time() - t0:.1f}s (append-only run)"
        )

    if "base" in phases:
        # new batch: half exact dups of copy 0, half fresh — built and
        # materialized only for this phase (the append phase salts its
        # own increments)
        batch = docs.limit(n_docs // 2).select(
            (F.col("doc_id") + base).alias("doc_id"),
            F.concat_ws(" ", "text", F.lit("copy0")).alias("text"),
        ).unionByName(
            docs.limit(n_docs // 2).select(
                (F.col("doc_id") + base + n_docs).alias("doc_id"),
                F.concat_ws(
                    " ", "text", F.lit("genuinely new tail")
                ).alias("text"),
            )
        ).cache()
        batch.count()

        results = {}
        for variant in ("plain", "buck"):
            st = load_dedup_state(spark, f"{root}/{variant}")
            t0 = time.time()
            res = incremental_dedup(batch, st)
            kept = sorted(
                r["doc_id"] for r in res.kept.select("doc_id").collect()
            )
            dropped = sorted(
                (r["doc_id"], r["reason"]) for r in res.dropped.collect()
            )
            wall = time.time() - t0
            results[variant] = (kept, dropped)
            print(f"{variant}: kept {len(kept)} dropped {len(dropped)} "
                  f"in {wall:.1f}s")
        assert results["plain"] == results["buck"], "variant results diverged"

        # the plan property: exact-tier join Exchange count per variant
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        for variant in ("plain", "buck"):
            st = load_dedup_state(spark, f"{root}/{variant}")
            fp = _fingerprints(batch, "doc_id", "text").groupBy("fp").agg(
                F.min("doc_id").alias("doc_id")
            )
            plan = (
                fp.join(
                    st.exact.select("fp", F.col("doc_id").alias("m")), "fp"
                )
                ._jdf.queryExecution().executedPlan().toString()
            )
            print(
                f"{variant}: exact-join Exchanges={plan.count('Exchange')} "
                f"bucketed_scan={'Bucketed: true' in plan}"
            )
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    if "lines" in phases:
        _lines_phase(spark, docs, corpus, root, n_docs, base, n_shuffle)
    if "substr" in phases:
        _substr_phase(spark, docs, corpus, root, n_docs, base, n_shuffle)
    if "append" not in phases:
        return

    # --- append loop + compaction: the small-files story (r10) -------
    # Each append adds files per table; the per-increment wall should
    # stay flat (work ∝ increment) while files/bucket climbs, and
    # compaction should bring every table back to <=1 file per bucket
    # with the increment time unchanged after.
    from data_governance_spark.operators.incremental import (  # noqa: E402
        append_dedup_state,
        compact_dedup_state,
        state_file_report,
    )

    n_appends = int(os.environ.get("SPARK_GRAFT_APPENDS", "5"))
    st = load_dedup_state(spark, f"{root}/buck")

    from data_governance_spark.functions.text import tokens  # noqa: E402

    def one_increment(i: int) -> float:
        """Increment i: n_docs/10 docs of realistic length whose every
        token is salted with the increment id — genuinely fresh vs the
        state and vs prior increments (a mere suffix tail would
        near-dup the state at Jaccard ~1 and keep nothing), so each
        append writes real deltas."""
        nonlocal st
        inc = docs.limit(n_docs // 10).select(
            (F.col("doc_id") + base + n_docs * (10 + i)).alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    tokens("text"),
                    lambda t: F.concat(t, F.lit(f"i{i}")),
                ),
            ).alias("text"),
        )
        t0 = time.time()
        res = incremental_dedup(inc, st)
        n_kept = res.kept.count()  # evaluate BEFORE append (documented)
        st = append_dedup_state(res, f"{root}/buck")
        wall = time.time() - t0
        fpb = {
            p: round(v["files_per_bucket"], 2)
            for p, v in state_file_report(spark, f"{root}/buck").items()
        }
        print(f"append {i}: kept {n_kept}, {wall:.1f}s, files/bucket {fpb}")
        return wall

    compact_every = int(os.environ.get("SPARK_GRAFT_COMPACT_EVERY", "0"))
    walls = []
    for i in range(n_appends):
        walls.append(one_increment(i))
        if compact_every and (i + 1) % compact_every == 0:
            t0 = time.time()
            compact_dedup_state(spark, f"{root}/buck")
            print(
                f"  periodic compact after append {i}: "
                f"{time.time() - t0:.1f}s"
            )
            st = load_dedup_state(spark, f"{root}/buck")
    if len(walls) >= 10:
        # the long-run claim: flat wall ∝ increment (first increments
        # pay session warmup — compare the middle third to the last)
        third = len(walls) // 3
        mid = sum(walls[third : 2 * third]) / third
        last = sum(walls[-third:]) / third
        print(
            f"append walls: mid-third avg {mid:.1f}s, "
            f"last-third avg {last:.1f}s (flat ⇔ ratio ~1)"
        )

    t0 = time.time()
    report = compact_dedup_state(spark, f"{root}/buck")
    t_compact = time.time() - t0
    after = state_file_report(spark, f"{root}/buck")
    print(
        f"compact: {t_compact:.1f}s; "
        f"files {({p: v['files'] for p, v in report.items()})} -> "
        f"{({p: v['files'] for p, v in after.items()})}"
    )
    assert all(
        v["files"] <= v["buckets"] for v in after.values()
    ), f"compaction left multi-file buckets: {after}"
    st = load_dedup_state(spark, f"{root}/buck")
    w = one_increment(n_appends)
    print(f"post-compact increment: {w:.1f}s (same shape as pre-compact)")


def _count_state_phase(
    spark, docs, corpus, root, n_docs, base, n_shuffle, tier: dict
):
    """Shared count-state tier loop (r11): save the x-factor corpus's
    state bucketed, run N increments (dedup vs state + delta append,
    reporting wall + files/bucket), assert the count join's plan
    property (state side bucketed, exactly ONE Exchange — the batch
    side), compact, and run a post-compact increment. ``tier`` supplies
    the per-tier callables: build/save/load/dedup/append/report/compact
    plus the increment text builder and the plan-check frames."""
    name = tier["name"]
    path = f"{root}/{name}"
    t0 = time.time()
    tier["save"](tier["build"](corpus), path, buckets=n_shuffle)
    print(f"{name}: state saved (bucketed) in {time.time() - t0:.1f}s")
    st = tier["load"](spark, path)

    n_appends = int(os.environ.get("SPARK_GRAFT_APPENDS", "5"))

    def one_increment(i: int) -> float:
        nonlocal st
        inc = docs.limit(n_docs // 10).select(
            (F.col("doc_id") + base + n_docs * (10 + i)).alias("doc_id"),
            tier["inc_text"](i).alias("text"),
        )
        t0 = time.time()
        res = tier["dedup"](inc, st)
        n_kept = res.kept.count()  # evaluate BEFORE append
        st = tier["append"](res, path, batch_id=f"i{i}")
        wall = time.time() - t0
        rep = tier["report"](spark, path)
        fpb = round(next(iter(rep.values()))["files_per_bucket"], 2)
        print(f"{name} append {i}: kept {n_kept}, {wall:.1f}s, "
              f"files/bucket {fpb}")
        return wall

    for i in range(n_appends):
        one_increment(i)

    # plan property: ONE Exchange (the batch side's own aggregation; no
    # .limit() in the check — GlobalLimit would add a SinglePartition
    # exchange and muddy the count)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = (
            tier["plan_join"](docs, st)
            ._jdf.queryExecution().executedPlan().toString()
        )
        n_ex = plan.count("Exchange")
        print(
            f"{name}: count-join Exchanges={n_ex} "
            f"bucketed_scan={'Bucketed: true' in plan}"
        )
        assert n_ex == 1 and "Bucketed: true" in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

    t0 = time.time()
    report = tier["compact"](spark, path)
    t_compact = time.time() - t0
    after = tier["report"](spark, path)
    before_n = next(iter(report.values()))["files"]
    after_n = next(iter(after.values()))["files"]
    print(f"{name} compact: {t_compact:.1f}s; files {before_n} -> {after_n}")
    assert after_n <= n_shuffle
    st = tier["load"](spark, path)
    w = one_increment(n_appends)
    print(f"{name} post-compact increment: {w:.1f}s")


def _lines_phase(spark, docs, corpus, root, n_docs, base, n_shuffle):
    """Line-tier state loop: each increment doc carries the PREVIOUS
    increment's banner (a state hit after the first append — dropped
    everywhere), its own banner (first batch doc keeps it), and a
    unique salted body line (kept)."""
    from data_governance_spark.operators.lines import (  # noqa: E402
        _line_rows,
        append_line_state,
        build_line_state,
        compact_line_state,
        dedup_lines_incremental,
        line_state_file_report,
        load_line_state,
        save_line_state,
    )

    def inc_text(i):
        return F.concat(
            F.lit(f"shared banner of increment {i - 1}\n"),
            F.lit(f"shared banner of increment {i}\n"),
            F.col("text"),
            F.lit(f" inc{i} salt "),
            F.col("doc_id").cast("string"),
        )

    def plan_join(docs, st):
        batch_agg = (
            _line_rows(docs, "doc_id", "text")
            .groupBy(F.col("_dl_key").alias("key"))
            .agg(F.count(F.lit(1)).alias("nb"))
        )
        sc = st.lines.groupBy("key").agg(F.sum("n").alias("ns"))
        return batch_agg.join(sc, "key", "left")

    _count_state_phase(
        spark, docs, corpus, root, n_docs, base, n_shuffle,
        {
            "name": "lines",
            "build": build_line_state,
            "save": save_line_state,
            "load": load_line_state,
            "dedup": dedup_lines_incremental,
            "append": append_line_state,
            "report": line_state_file_report,
            "compact": compact_line_state,
            "inc_text": inc_text,
            "plan_join": plan_join,
        },
    )


def _substr_phase(spark, docs, corpus, root, n_docs, base, n_shuffle):
    """Substring-tier state loop: each increment doc opens with the
    previous increment's width-token license header (a state hit after
    the first append) plus its own, then a salted unique body."""
    from data_governance_spark.operators.exsubstr import (  # noqa: E402
        _window_relation,
        append_substr_state,
        build_substr_state,
        compact_substr_state,
        dedup_substrings_incremental,
        load_substr_state,
        save_substr_state,
        substr_state_file_report,
    )

    width = 15
    header = " ".join(f"licensetok{j}" for j in range(width))

    def inc_text(i):
        return F.concat(
            F.lit(header + f" endhdr{i - 1} "),
            F.lit(header + f" endhdr{i} "),
            F.col("text"),
            F.lit(f" inc{i} salt "),
            F.col("doc_id").cast("string"),
        )

    def plan_join(docs, st):
        batch_agg = (
            _window_relation(docs, "doc_id", "text", width)
            .groupBy(
                F.col("_es_h1").alias("h1"), F.col("_es_h2").alias("h2")
            )
            .agg(F.count(F.lit(1)).alias("nb"))
        )
        sc = st.windows.groupBy("h1", "h2").agg(F.sum("n").alias("ns"))
        return batch_agg.join(sc, ["h1", "h2"], "left")

    _count_state_phase(
        spark, docs, corpus, root, n_docs, base, n_shuffle,
        {
            "name": "substr",
            "build": lambda c: build_substr_state(c, width=width),
            "save": save_substr_state,
            "load": load_substr_state,
            "dedup": dedup_substrings_incremental,
            "append": append_substr_state,
            "report": substr_state_file_report,
            "compact": compact_substr_state,
            "inc_text": inc_text,
            "plan_join": plan_join,
        },
    )


if __name__ == "__main__":
    main()
