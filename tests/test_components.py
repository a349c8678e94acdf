"""Unit tests for operators/components.py (d10's engine)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_governance_spark.operators.components import connected_components


def _run(spark, edges, nodes=None, **kw):
    e = spark.createDataFrame(edges or [(None, None)], "s long, d long")
    if not edges:
        e = e.filter(F.lit(False))
    n = (
        spark.createDataFrame([(x,) for x in nodes], "id long")
        if nodes is not None
        else None
    )
    out = connected_components(e, "s", "d", nodes=n, node_col="id", **kw)
    return {r["id"]: r["comp"] for r in out.collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain: diameter 4, still one component labeled 1
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1}


def test_disjoint_components_and_singletons(spark):
    got = _run(spark, [(10, 11), (20, 21), (21, 22)], nodes=[10, 11, 20, 21, 22, 99])
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 99: 99}


def test_transitivity_without_shared_key(spark):
    # A~B, B~C but never A~C in the edge list — the d09-can't-do case
    got = _run(spark, [(2, 7), (7, 1)])
    assert got == {1: 1, 2: 1, 7: 1}


def test_self_loops_and_duplicate_edges(spark):
    got = _run(spark, [(3, 3), (3, 4), (4, 3), (3, 4)])
    assert got == {3: 3, 4: 3}


def test_null_endpoints_ignored(spark):
    e = spark.createDataFrame([(1, 2), (None, 5), (6, None)], "s long, d long")
    out = connected_components(e, "s", "d")
    got = {r["id"]: r["comp"] for r in out.collect()}
    assert got == {1: 1, 2: 1}


def test_no_edges_all_singletons(spark):
    got = _run(spark, [], nodes=[5, 6, 7])
    assert got == {5: 5, 6: 6, 7: 7}


def test_string_ids(spark):
    e = spark.createDataFrame([("doc_b", "doc_a"), ("doc_c", "doc_b")], "s string, d string")
    out = connected_components(e, "s", "d")
    got = {r["id"]: r["comp"] for r in out.collect()}
    assert got == {"doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a"}


def test_max_iter_guard_label_mode(spark):
    e = spark.createDataFrame([(i, i + 1) for i in range(1, 12)], "s long, d long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            e, "s", "d", max_iter=2, algorithm="label",
            small_graph_threshold=0,
        )


def test_auto_falls_back_to_star_on_high_diameter(spark):
    # path graph with diameter >> max_iter: min-label can't finish in 2
    # rounds; auto must hand off to large-star/small-star and still
    # produce the right labels (VERDICT r5 #2: no RuntimeError path for
    # legal inputs)
    got = _run(
        spark,
        [(i, i + 1) for i in range(1, 40)],
        nodes=[50],
        max_iter=2,
        small_graph_threshold=0,
    )
    assert got == {**{i: 1 for i in range(1, 41)}, 50: 50}


def test_star_algorithm_direct(spark):
    # same fixtures as the label tests, straight through the star path
    got = _run(
        spark,
        [(10, 11), (20, 21), (21, 22), (3, 3)],
        nodes=[10, 11, 20, 21, 22, 3, 99],
        algorithm="star",
        small_graph_threshold=0,
    )
    assert got == {10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 3: 3, 99: 99}


def test_star_long_chain_and_reversed_ids(spark):
    # descending chain (worst case for min-propagation direction) and a
    # star converging to the middle id
    chain = [(i + 1, i) for i in range(1, 30)]
    got = _run(spark, chain, algorithm="star", small_graph_threshold=0)
    assert got == {i: 1 for i in range(1, 31)}


def test_unknown_algorithm_raises(spark):
    e = spark.createDataFrame([(1, 2)], "s long, d long")
    with pytest.raises(ValueError, match="unknown algorithm"):
        connected_components(e, "s", "d", algorithm="bogus")


@pytest.mark.parametrize(
    "seed,algorithm,thresh",
    [
        # thresh=0 forces the DISTRIBUTED paths (label / star);
        # the default threshold exercises the driver union-find path
        (7, "auto", 0),
        (23, "auto", 0),
        (99, "auto", 0),
        (7, "star", 0),
        (99, "star", 0),
        (7, "auto", 100_000),
        (23, "auto", 100_000),
        (99, "auto", 100_000),
    ],
)
def test_randomized_differential_vs_duckdb(spark, seed, algorithm, thresh):
    """Random sparse graphs: Spark min-label propagation, the
    large-star/small-star fallback AND the small-graph driver
    union-find must agree with DuckDB's recursive-CTE closure (the
    same oracle shape d10 uses) node for node."""
    import random

    import duckdb

    rng = random.Random(seed)
    n = 60
    edges = sorted(
        {
            (rng.randrange(n), rng.randrange(n))
            for _ in range(rng.randrange(20, 70))
        }
    )
    nodes = list(range(n))
    got = _run(
        spark,
        edges or [(0, 0)],
        nodes=nodes,
        algorithm=algorithm,
        small_graph_threshold=thresh,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE nodes(id BIGINT)")
    con.executemany("INSERT INTO nodes VALUES (?)", [(x,) for x in nodes])
    con.execute("CREATE TABLE pairs(s BIGINT, d BIGINT)")
    con.executemany("INSERT INTO pairs VALUES (?, ?)", edges or [(0, 0)])
    want = dict(
        con.execute(
            """
            WITH RECURSIVE edges AS (
              SELECT s, d FROM pairs UNION ALL SELECT d, s FROM pairs
            ),
            reach AS (
              SELECT id, id AS r FROM nodes
              UNION
              SELECT e.d AS id, reach.r FROM reach JOIN edges e ON e.s = reach.id
            )
            SELECT id, MIN(r) FROM reach GROUP BY id
            """
        ).fetchall()
    )
    assert got == want


def test_full_dedup_pipeline_composition(spark):
    """The complete LLM-corpus dedup story end-to-end on an inflated
    synthetic corpus: exact_precluster collapses exact copies BEFORE
    sketching (the quadratic-bucket killer), MinHash+LSH finds the
    near-dups among canonicals, connected_components closes the
    combined exact+near pair graph, keep_canonical emits one survivor
    per true cluster. 40 disjoint-vocabulary base docs x (self + 4
    exact copies + 2 near-dups) = 280 rows -> exactly 40 survivors,
    each the min id of its cluster."""
    from pyspark.sql import Row

    from data_governance_spark.functions.text import tokens, word_shingles
    from data_governance_spark.operators.components import (
        connected_components,
        keep_canonical,
    )
    from data_governance_spark.operators.dedup import (
        exact_precluster,
        minhash_dedup_pairs,
    )

    rows = []
    for i in range(40):
        words = [f"w{i}_{j}" for j in range(60)]
        rows.append(Row(doc_id=i, text=" ".join(words)))
        for c in range(4):  # exact copies
            rows.append(Row(doc_id=1000 + i * 10 + c, text=" ".join(words)))
        for c in range(2):  # near-dups: one token swapped
            w = list(words)
            w[30 + c] = f"x{i}_{c}"
            rows.append(Row(doc_id=2000 + i * 10 + c, text=" ".join(w)))
    docs = spark.createDataFrame(rows)

    canonical, mapping = exact_precluster(docs, F.md5("text"))
    assert canonical.count() == 40 * 3  # 1 canonical + 2 near-dups per base
    toks = canonical.select("doc_id", tokens("text").alias("toks"))
    near = minhash_dedup_pairs(
        toks, F.array_distinct(word_shingles(F.col("toks"), 3)), threshold=0.5
    ).select("doc_a", "doc_b")
    exact = mapping.filter(F.col("doc_id") != F.col("canon_id")).select(
        F.col("doc_id").alias("doc_a"), F.col("canon_id").alias("doc_b")
    )
    comp = connected_components(
        near.unionByName(exact), "doc_a", "doc_b", nodes=docs, node_col="doc_id"
    )
    assert comp.select("comp").distinct().count() == 40
    survivors = keep_canonical(docs, comp)
    got = sorted(r["doc_id"] for r in survivors.select("doc_id").collect())
    assert got == list(range(40))  # min id of every cluster is the base doc


def test_keep_canonical_default_and_ordered(spark):
    from data_governance_spark.operators.components import keep_canonical

    docs = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 20.0), (9, 5.0)], "doc_id long, quality double"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, comp long"
    )
    # default: min id per component; unlabeled doc 9 survives as itself
    got = sorted(r["doc_id"] for r in keep_canonical(docs, labels).collect())
    assert got == [1, 9]
    # quality policy: doc 2 wins its cluster
    got = sorted(
        r["doc_id"]
        for r in keep_canonical(
            docs, labels, order_by=[F.desc("quality"), F.col("doc_id")]
        ).collect()
    )
    assert got == [2, 9]
    # schema passes through unchanged
    assert keep_canonical(docs, labels).columns == ["doc_id", "quality"]
