"""Incremental corpus dedup: curate a NEW batch against the persisted
dedup state of an EXISTING corpus — the daily-crawl-increment shape
every production pipeline ends up needing (CommonCrawl snapshots,
nightly harvests).

State is two plain, parquet-round-trippable DataFrames:

- ``exact``: ``(fp, doc_id)`` — one canonical doc per exact text
  fingerprint already in the corpus.
- ``sigs``:  ``(doc_id, sig array<bigint>)`` — MinHash signatures of
  the corpus's canonical docs. Band keys are DERIVED from sigs at use
  time (a map-only explode) rather than stored, so the state schema
  stays parameter-portable across band/row re-tuning.

Semantics — keep-first, corpus-immutable:

- A new doc exactly matching the state is dropped (the shipped corpus
  wins; you cannot retro-delete data already trained on).
- Near-dup components are closed over the union of batch-internal
  pairs and batch-vs-state pairs; any component touching an existing
  doc keeps ONLY the existing doc(s), otherwise min-id-in-batch wins.

Where incremental output can DIFFER from re-running one-shot dedup on
the union (all three pinned by tests, none silently unstated):

1. Bridging: a new doc near-dupping TWO existing canonicals drops
   itself but cannot retro-merge the shipped docs — both stay.
2. Transitivity through previously-dropped docs: if the state carries
   only the KEPT docs, a new doc similar to a doc the corpus dropped
   earlier (but not to that doc's canonical) survives. Mitigation,
   recommended for production: build the state from ALL seen docs
   (kept + dropped) — any state match poisons the component, so
   including dropped docs' signatures restores transitive recall at
   the cost of a larger sigs table.
3. NULL text: treated as MISSING content — null-text docs never merge
   with each other (the naive one-shot shingle path would give every
   null text the same [''] shingle set and collapse them all).

Scale shape: per-increment work is proportional to the BATCH plus one
equi-join against the state tables on pre-hashed keys (fp; band key).
Nothing is recomputed for the existing corpus — that is the point of
persisting state. ``save_dedup_state(..., buckets=N)`` writes every
state table BUCKETED by its join key (exact by ``fp``, sigs by
``doc_id``, and a pre-derived band relation by ``(band, key)``), so
each increment join reads the corpus-sized state side WITHOUT an
Exchange — only the batch side shuffles (plan-asserted in
tests/test_incremental.py; timed in scripts/stress_incremental.py).
Bucketed storage trades the plain layout's parameter portability for
that shuffle-free scan: the stored band relation is bound to the
saved (bands, num_hashes), which the params table carries anyway.
``append_dedup_state(result, path)`` writes only each increment's
delta rows to the bucketed tables (Spark adds per-bucket files, so
the appended state still joins shuffle-free — both plan-asserted and
equality-tested against a full resave in tests/test_incremental.py),
and ``compact_dedup_state(spark, path)`` periodically rewrites the
accumulated per-bucket files back to one file per bucket (the append
loop's small-files maintenance; row-multiset-preserving, same staging
swap as save).
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.cache import tracked_persist
from data_governance_spark.functions.text import tokens, word_shingles
from data_governance_spark.operators.dedup import (
    _cap_buckets,
    minhash_bands,
    minhash_signatures,
)


@dataclass
class DedupState:
    """Persisted dedup state of an existing corpus (see module doc).
    The sketch parameters are PART OF the state — signatures computed
    with one (shingle_n, num_hashes) are meaningless under another, so
    ``save_dedup_state`` persists them and ``load_dedup_state`` reads
    them back (never trusts caller-side defaults)."""

    exact: DataFrame  # (fp, doc_id)
    sigs: DataFrame  # (doc_id, sig)
    num_hashes: int = 64
    bands: int = 16
    shingle_n: int = 3
    # optional pre-derived (doc_id, band, key) relation — set by
    # load_dedup_state for bucketed states, where it scans the stored
    # bucketed band table instead of re-deriving from sigs (keeping
    # the bucketed output partitioning the cross join consumes).
    # Invalidated (None) on state updates; save re-derives from sigs.
    band_rel: DataFrame | None = None

    def __post_init__(self):
        if self.bands < 1 or self.num_hashes % self.bands != 0:
            raise ValueError(
                f"bands ({self.bands}) must divide num_hashes "
                f"({self.num_hashes}) — a non-divisor silently drops "
                "the trailing hashes and shifts the LSH S-curve"
            )


def _fingerprints(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(
            F.md5(F.col(text_col)),
            F.concat(F.lit("\0null-fp:"), F.col(id_col).cast("string")),
        ).alias("fp"),
    )


def _shingles(docs: DataFrame, id_col: str, text_col: str, n: int):
    # NULL text is MISSING content, not empty content: word_shingles
    # would map it to [''] and make every null-text doc "identical" in
    # sketch space. Excluding them here means they pass the near tier
    # as singletons — consistent with the exact tier's per-row
    # null fingerprints.
    return docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        word_shingles(tokens(F.col(text_col)), n).alias("sh"),
    )


def build_dedup_state(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DedupState:
    """Build state from an already-deduped corpus (its canonical
    docs). One fingerprint scan + one signature aggregation."""
    fp = _fingerprints(docs, id_col, text_col).groupBy("fp").agg(
        F.min("doc_id").alias("doc_id")
    )
    sh = _shingles(docs, id_col, text_col, shingle_n)
    sigs = minhash_signatures(sh, F.col("sh"), "doc_id", num_hashes)
    return DedupState(
        exact=fp,
        sigs=sigs,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
    )


def _state_table_name(path: str, part: str) -> str:
    """Deterministic catalog name for a bucketed state table — derived
    from the storage path so two states never collide and reloads find
    the same registration."""
    h = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:10]
    return f"dgs_state_{h}_{part}"


def _delete_dir(spark: SparkSession, path: str) -> None:
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.delete(p, True)


def _rename_dir(spark: SparkSession, src: str, dst: str) -> None:
    jvm = spark._jvm
    s = jvm.org.apache.hadoop.fs.Path(src)
    d = jvm.org.apache.hadoop.fs.Path(dst)
    fs = s.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.rename(s, d):
        raise IOError(f"rename {src} -> {dst} failed")


def _write_plain_set(
    writes: list[tuple[DataFrame, str]], root: str
) -> None:
    """Plain-parquet twin of :func:`_write_bucketed_set`, same two
    phases for the same reason: the load-modify-save loop
    (``save_dedup_state(res.state, same_path)``) READS the files it is
    replacing — the updated sigs' lineage reads the OLD exact files
    through the survivor computation — so a direct ``mode("overwrite")``
    to the same path would delete the only copy of the old state while
    a sibling table's write still needs it. All stagings complete
    against the intact old state; only then do the swaps run."""
    assert writes, "empty write set"
    spark = writes[0][0].sparkSession
    staged = []
    for df, part in writes:
        path = f"{root}/{part}"
        staging = f"{path}__staging__"
        _delete_dir(spark, staging)
        df.write.mode("overwrite").parquet(staging)
        staged.append((path, staging))
    for path, staging in staged:
        _delete_dir(spark, path)
        _rename_dir(spark, staging, path)


def _write_bucketed_set(
    writes: list[tuple[DataFrame, str, list[str]]],
    root: str,
    buckets: int,
) -> None:
    """External bucketed+sorted parquet tables under ``root``, written
    in TWO PHASES: stage every table under ``<part>__staging__`` first,
    then swap them all in. Bucketing metadata lives in the catalog, so
    each table is (re)registered under a path-derived name.

    Two phases because the load-modify-save loop
    (``save_dedup_state(res.state, same_path)``) READS the files it is
    replacing — and not just table-by-table: the updated sigs' lineage
    reads the OLD exact files through the survivor computation, so
    swapping exact before staging sigs would delete files sigs still
    needs (measured: FILE_NOT_EXIST mid-save). All stagings complete
    against the intact old state; only then do the swaps run. A crash
    between a delete and its rename leaves the complete staging
    directory next to the missing final one — recoverable by hand.

    Every table is repartitioned BY ITS BUCKET KEYS into ``buckets``
    partitions before the write: Spark's bucketed writer emits one
    file per (task, bucket) pair, so an unaligned input writes up to
    tasks x buckets files per table (measured: a 32-partition band
    table saved into 32 buckets wrote 1,024 files) — at production
    scan widths that is a file explosion at save time. The repartition
    hash is the same Murmur3 the bucket writer uses, so each output
    task holds exactly one bucket's rows and writes exactly one file
    (and the advertised per-bucket SORT is real, not per-file). One
    shuffle per table is the honest price; the writes here are already
    corpus-sized operations."""
    assert writes, "empty write set"
    spark = writes[0][0].sparkSession
    staged = []
    for df, part, keys in writes:
        df = df.repartition(buckets, *[F.col(k) for k in keys])
        path = f"{root}/{part}"
        name = _state_table_name(root, part)
        staging = f"{path}__staging__"
        tmp_name = f"{name}_staging"
        spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
        _delete_dir(spark, staging)
        (
            df.write.mode("overwrite")
            .option("path", staging)
            .bucketBy(buckets, *keys)
            .sortBy(*keys)
            .format("parquet")
            .saveAsTable(tmp_name)
        )
        staged.append((path, name, keys, staging, tmp_name))
    # every table safely on disk at staging; swap files + registrations
    for path, name, keys, staging, tmp_name in staged:
        spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")  # external: files stay
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        _delete_dir(spark, path)
        _rename_dir(spark, staging, path)
        _ensure_bucketed_table(spark, name, path, keys, buckets)


def _ensure_bucketed_table(
    spark: SparkSession, name: str, path: str, keys: list[str], buckets: int
) -> DataFrame:
    """Register (if this session hasn't yet) an external bucketed table
    over the files at ``path`` and return its scan. The in-memory
    catalog does not survive sessions, but the bucketed FILES do — the
    writer names them by bucket id — so a fresh session only needs the
    DDL re-issued to get shuffle-free scans back.

    An existing registration is verified against the requested bucket
    count (the files may have been re-saved with different buckets by
    another process since this session registered the name); a
    mismatch drops and re-issues the DDL — a stale bucket spec would
    make Spark treat the data as hash-distributed by the wrong modulus
    and silently mis-co-partition the 'shuffle-free' joins."""
    if spark.catalog.tableExists(name):
        desc = {
            r["col_name"]: r["data_type"]
            for r in spark.sql(f"DESCRIBE TABLE EXTENDED {name}").collect()
        }
        if desc.get("Num Buckets") == str(buckets):
            return spark.table(name)
        spark.sql(f"DROP TABLE IF EXISTS {name}")
    if not spark.catalog.tableExists(name):
        schema = spark.read.parquet(path).schema
        cols_ddl = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
        )
        keys_ddl = ", ".join(f"`{k}`" for k in keys)
        spark.sql(
            f"CREATE TABLE {name} ({cols_ddl}) USING PARQUET "
            f"CLUSTERED BY ({keys_ddl}) SORTED BY ({keys_ddl}) "
            f"INTO {buckets} BUCKETS LOCATION '{path}'"
        )
    return spark.table(name)


def _read_state_params(spark: SparkSession, path: str):
    """The stored params row + bucket count (0 = plain layout)."""
    pdf = spark.read.parquet(f"{path}/params")
    p = pdf.collect()[0]
    buckets = p["buckets"] if "buckets" in pdf.columns else 0
    return p, buckets


def _require_bucketed(spark: SparkSession, path: str, caller: str):
    p, buckets = _read_state_params(spark, path)
    if not buckets:
        raise ValueError(
            f"{caller} requires a bucketed state "
            "(save_dedup_state(..., buckets=N)); this path is plain"
        )
    return p, buckets


def save_dedup_state(
    state: DedupState, path: str, buckets: int | None = None
) -> None:
    """Persist the state tables AND the sketch parameters under
    ``path`` (exact/ sigs/ params/, plus bands/ when bucketed).

    ``buckets=None`` writes plain parquet (parameter-portable, every
    increment join shuffles the state side). ``buckets=N`` writes each
    table bucketed by its increment-join key — exact by ``fp``, sigs
    by ``doc_id``, and the derived band relation by ``(band, key)`` —
    so ``incremental_dedup`` reads the corpus-sized side of every join
    without an Exchange. Size N so each bucket file lands near the
    storage block size at the target corpus scale."""
    spark = state.exact.sparkSession
    if buckets is None:
        # two-phase like the bucketed path: a same-path resave's sigs
        # lineage reads the old exact files (and vice versa)
        _write_plain_set(
            [(state.exact, "exact"), (state.sigs, "sigs")], path
        )
    else:
        if buckets < 1:
            raise ValueError(f"buckets must be >= 1, got {buckets}")
        # band relation re-derived from sigs (map-only explode) so an
        # updated state (whose band_rel is invalidated) saves correctly
        _write_bucketed_set(
            [
                (state.exact, "exact", ["fp"]),
                (state.sigs, "sigs", ["doc_id"]),
                (
                    _band_table(state.sigs, state.bands, state.num_hashes),
                    "bands",
                    ["band", "key"],
                ),
            ],
            path,
            buckets,
        )
    spark.createDataFrame(
        [(state.num_hashes, state.bands, state.shingle_n, buckets or 0)],
        "num_hashes int, bands int, shingle_n int, buckets int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/params")


def load_dedup_state(spark: SparkSession, path: str) -> DedupState:
    """Load a saved state; the sketch parameters come from the state
    itself — a caller-supplied mismatch would silently zero the
    near-dup recall (wrong band arithmetic, wrong shingle width).
    Bucketed states (``save_dedup_state(..., buckets=N)``) come back
    as bucketed-table scans whose increment joins skip the state-side
    Exchange."""
    p, buckets = _read_state_params(spark, path)
    if buckets:
        exact = _ensure_bucketed_table(
            spark, _state_table_name(path, "exact"),
            f"{path}/exact", ["fp"], buckets,
        )
        sigs = _ensure_bucketed_table(
            spark, _state_table_name(path, "sigs"),
            f"{path}/sigs", ["doc_id"], buckets,
        )
        band_rel = _ensure_bucketed_table(
            spark, _state_table_name(path, "bands"),
            f"{path}/bands", ["band", "key"], buckets,
        )
    else:
        exact = spark.read.parquet(f"{path}/exact")
        sigs = spark.read.parquet(f"{path}/sigs")
        band_rel = None
    return DedupState(
        exact=exact,
        sigs=sigs,
        num_hashes=p["num_hashes"],
        bands=p["bands"],
        shingle_n=p["shingle_n"],
        band_rel=band_rel,
    )


def append_dedup_state(
    result: "IncrementalResult", path: str, heal: bool = False
) -> DedupState:
    """Append ONLY an increment's delta rows to a BUCKETED state at
    ``path`` — the production loop's cheap alternative to rewriting
    the corpus-sized state per increment. Spark adds per-bucket files
    (the writer names them by bucket id), so the appended tables keep
    their hash distribution and the next increment's joins stay
    state-side shuffle-free (plan-asserted in tests); with multiple
    files per bucket the per-bucket SORT guarantee is gone, which the
    increment joins never relied on. Run
    :func:`compact_dedup_state` periodically — each append adds files,
    and a state scanned through thousands of appends degrades on file
    count alone (the classic small-files failure).

    Returns the freshly LOADED post-append state — chain the next
    increment off the return value. ``result.state`` must NOT be
    reused or saved after this call: its lazy lineage unions the
    catalog-table scan with the delta, and whether that scan sees the
    pre- or post-append file listing is an analysis-time snapshotting
    internal (a re-resolved scan — fresh session, refreshed table —
    lists the appended files and double-counts every delta row).
    Unspecified either way; the return value is the defined handle.

    The deltas are materialized (lineage truncated via
    ``localCheckpoint``) BEFORE any write: their lineage reads the very
    tables being appended to — ``delta_sigs`` reaches the stored exact
    table through the survivor computation — and a task re-listing the
    target directory mid-append must not see its own partial output.
    Nothing is deleted, so no staging swap is needed.

    Crash story: the three table appends cannot be made atomic as a
    group (each ``INSERT`` commits independently); they run
    sigs -> bands -> exact, exact LAST so that no tear can ever cause
    a WRONG drop — every state row a tear leaves behind describes a
    real shipped document, so anything it drops later really is a
    duplicate. What a tear CAN do is lose part of the increment's
    protection: docs whose sigs AND bands landed but exact did not are
    still fully caught (an identical future doc estimates Jaccard 1.0
    and drops as 'near'); docs whose bands (or both near tables) did
    not land are unprotected, exactly as if the append had never run
    for those tables — a near match needs bands for candidate
    generation AND sigs for verification. Torn-append semantics are
    therefore at-least-once-lost-tail, never corruption.

    Recovery from a tear: re-run the SAME append with ``heal=True`` —
    each delta is first anti-joined against its stored table (exact on
    fp, sigs on doc_id, bands on the full row key), so rows a previous
    partial append already landed are not written twice (idempotent
    re-append, pinned in tests). If the original ``result`` did not
    survive the crash, re-run ``incremental_dedup`` on the SAME batch
    against the reloaded state and heal-append that: against a
    sigs-only tear it reproduces the full deltas; against a
    sigs+bands tear the re-run drops the batch as near-dups of itself
    and the exact rows stay missing — harmless, since the near tier
    permanently covers exact identity for those docs. ``heal`` costs
    one scan of each state table, so it is the recovery path, not the
    steady-state loop; ``save_dedup_state(state, path, buckets=N)``
    remains the full-rewrite fallback.

    Requires a bucketed save (``save_dedup_state(..., buckets=N)``);
    the sketch parameters stored at ``path`` must match the state the
    increment ran against (guarded — a mismatch would append
    signatures the stored band arithmetic cannot read).

    Evaluate anything you need from ``result`` (kept/dropped counts,
    writes of the kept rows) BEFORE calling this: those DataFrames are
    lazy and their lineage reads the state tables, so a post-append
    evaluation would see the survivors' own fingerprints in the state
    and re-drop them (pinned in tests)."""
    st = result.state
    spark = st.exact.sparkSession
    p, buckets = _require_bucketed(spark, path, "append_dedup_state")
    if (p["num_hashes"], p["bands"], p["shingle_n"]) != (
        st.num_hashes,
        st.bands,
        st.shingle_n,
    ):
        raise ValueError(
            f"sketch parameter mismatch: stored "
            f"(num_hashes={p['num_hashes']}, bands={p['bands']}, "
            f"shingle_n={p['shingle_n']}) vs increment "
            f"(num_hashes={st.num_hashes}, bands={st.bands}, "
            f"shingle_n={st.shingle_n})"
        )
    if result.delta_exact is None:
        raise ValueError(
            "result carries no deltas — it was not produced by "
            "incremental_dedup"
        )
    de = result.delta_exact.localCheckpoint(eager=True)
    writes = []
    if result.delta_sigs is not None:
        ds = result.delta_sigs.localCheckpoint(eager=True)
        # heal anti-join keys: the natural unique row key of each
        # table — bands uses the full row so the (band, key) bucketing
        # keeps the stored side Exchange-free under the anti-join
        writes.append((ds, "sigs", ["doc_id"], ["doc_id"]))
        writes.append(
            (
                _band_table(ds, st.bands, st.num_hashes).localCheckpoint(
                    eager=True
                ),
                "bands",
                ["band", "key"],
                ["doc_id", "band", "key"],
            )
        )
    # exact LAST (see docstring: a tear can only lose protection,
    # never cause a wrong drop)
    writes.append((de, "exact", ["fp"], ["fp"]))
    for df, part, keys, row_key in writes:
        name = _state_table_name(path, part)
        stored = _ensure_bucketed_table(
            spark, name, f"{path}/{part}", keys, buckets
        )
        if heal:
            # drop delta rows a previous (torn) append already landed,
            # then re-truncate lineage: the healed delta now READS the
            # table it is about to append to
            df = df.join(stored, row_key, "left_anti").localCheckpoint(
                eager=True
            )
        (
            # bucket-aligned repartition: without it the writer emits
            # one file per (task, bucket) pair, multiplying the append's
            # file growth by its partition count (same reasoning as
            # _write_bucketed_set); deltas are increment-sized, so this
            # shuffle is small
            df.repartition(buckets, *[F.col(k) for k in keys])
            .write.mode("append")
            .option("path", f"{path}/{part}")
            .bucketBy(buckets, *keys)
            .sortBy(*keys)
            .format("parquet")
            .saveAsTable(name)
        )
    return load_dedup_state(spark, path)


def _list_data_files(spark: SparkSession, path: str) -> list[str]:
    """Data-file names under ``path`` (one directory level — bucketed
    state tables are unpartitioned), skipping _SUCCESS/.crc markers."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(p):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isFile()
        and not st.getPath().getName().startswith(("_", "."))
    ]


_STATE_PARTS: tuple[tuple[str, list[str]], ...] = (
    ("exact", ["fp"]),
    ("sigs", ["doc_id"]),
    ("bands", ["band", "key"]),
)


def state_file_report(spark: SparkSession, path: str) -> dict:
    """Per-table file counts of a bucketed state — the append loop's
    small-files health check. ``{part: {"files": n, "buckets": b,
    "files_per_bucket": n/b}}``; feed it to the
    :func:`compact_dedup_state` decision (reported by
    scripts/stress_incremental.py)."""
    _, buckets = _require_bucketed(spark, path, "state_file_report")
    return _file_counts(spark, path, buckets)


def _file_counts(spark: SparkSession, path: str, buckets: int) -> dict:
    out = {}
    for part, _keys in _STATE_PARTS:
        n = len(_list_data_files(spark, f"{path}/{part}"))
        out[part] = {
            "files": n,
            "buckets": buckets,
            "files_per_bucket": n / buckets,
        }
    return out


def compact_dedup_state(
    spark: SparkSession, path: str, max_files_per_bucket: int = 1
) -> dict:
    """Rewrite each bucketed state table at ``path`` whose file count
    exceeds ``buckets * max_files_per_bucket`` down to exactly ONE
    file per bucket — the maintenance pass the append loop needs:
    every :func:`append_dedup_state` adds files (at least one per
    non-empty bucket per table), and after thousands of increments the
    state scan degrades on file count alone (listing, open/seek
    overhead, tiny reads — the classic small-files failure at exactly
    the corpus scale this state targets).

    Row-preserving layout-only rewrite: each flagged table is read as
    PLAIN parquet (deliberately NOT through its bucketed catalog scan:
    the bucketed scan advertises ``HashPartitioning(keys, buckets)``,
    so the planner deletes the writer's bucket-aligning repartition as
    redundant and then disables bucketed reading anyway — leaving one
    writer task per file split, which re-emits the small files this
    pass exists to remove; measured, and pinned by the file-count
    assert in tests/test_incremental.py) and rewritten through the
    same two-phase staging swap as ``save_dedup_state`` (which
    bucket-aligns the shuffle so each output task writes exactly one
    file) — the rewrite reads the files it replaces, so every staging
    completes against the intact old table before any swap runs.
    Compaction also restores the per-bucket SORT guarantee that
    multi-file appends relax. Cost: one shuffle of each flagged table
    — amortize by compacting every K appends, not every append.

    Returns ``{part: {"files": n_before, "buckets": b,
    "compacted": bool}}``."""
    if max_files_per_bucket < 1:
        raise ValueError(
            f"max_files_per_bucket must be >= 1, got {max_files_per_bucket}"
        )
    _, buckets = _require_bucketed(spark, path, "compact_dedup_state")
    keys_by_part = dict(_STATE_PARTS)
    report = {}
    rewrites = []
    for part, counts in _file_counts(spark, path, buckets).items():
        need = counts["files"] > buckets * max_files_per_bucket
        report[part] = {
            "files": counts["files"],
            "buckets": buckets,
            "compacted": need,
        }
        if need:
            rewrites.append(
                (spark.read.parquet(f"{path}/{part}"), part, keys_by_part[part])
            )
    if rewrites:
        _write_bucketed_set(rewrites, path, buckets)
    return report


@dataclass
class IncrementalResult:
    """Outputs of ``incremental_dedup``. ``delta_exact``/``delta_sigs``
    are ONLY the rows this increment added to the state (the survivors'
    fingerprints and signatures) — what :func:`append_dedup_state`
    writes; ``delta_sigs`` is None when the near tier was skipped
    (``threshold > 1``), where the state's signatures are unchanged."""

    kept: DataFrame  # surviving new-batch rows (full columns)
    dropped: DataFrame  # (doc_id, reason: 'exact'|'near', matched_id)
    state: DedupState  # input state + the survivors' fps/sigs
    delta_exact: DataFrame | None = None  # (fp, doc_id) added rows
    delta_sigs: DataFrame | None = None  # (doc_id, sig) added rows


def _band_table(sigs: DataFrame, bands: int, num_hashes: int) -> DataFrame:
    rows = num_hashes // bands
    return sigs.select(
        "doc_id",
        F.explode(minhash_bands(F.col("sig"), bands, rows)).alias("bk"),
    ).select("doc_id", "bk.band", "bk.key")


def incremental_dedup(
    new_docs: DataFrame,
    state: DedupState,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    max_bucket_size: int | None = None,
) -> IncrementalResult:
    """Dedup ``new_docs`` within itself and against ``state``.

    New ids must be distinct from the state's ids (append-only id
    space — a timestamped or batch-prefixed id satisfies this). The
    sketch parameters (num_hashes/bands/shingle_n) always come from
    the STATE — batch signatures must be computed identically to the
    stored ones or the comparison is meaningless.
    ``max_bucket_size`` caps both sides of the band joins
    (dedup._cap_buckets) against the quadratic duplicated-boilerplate
    blow-up, same contract as minhash_dedup_pairs."""
    from data_governance_spark.operators.components import (
        connected_components,
        keep_canonical,
    )

    nh, nb = state.num_hashes, state.bands

    # --- exact tier: within-batch (min id wins), then vs state -------
    fp = _fingerprints(new_docs, id_col, text_col)
    batch_canon = fp.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
    exact_hits = batch_canon.join(
        state.exact.select("fp", F.col("doc_id").alias("matched_id")),
        "fp",
    )
    exact_alive = batch_canon.join(
        exact_hits.select("fp"), "fp", "left_anti"
    ).select("doc_id")
    # every batch doc that is not its fp-class canonical, or whose
    # canonical matched the state, drops with reason 'exact'
    dropped_exact = (
        fp.join(batch_canon.withColumnRenamed("doc_id", "canon"), "fp")
        .join(
            exact_hits.select(
                "fp", F.col("matched_id").alias("state_match")
            ),
            "fp",
            "left",
        )
        .filter(
            (F.col("doc_id") != F.col("canon"))
            | F.col("state_match").isNotNull()
        )
        .select(
            "doc_id",
            F.lit("exact").alias("reason"),
            F.coalesce("state_match", "canon").alias("matched_id"),
        )
    )

    # --- near tier over the exact survivors --------------------------
    alive_docs = new_docs.join(
        exact_alive.withColumnRenamed("doc_id", id_col), id_col, "left_semi"
    )
    if threshold > 1.0:
        # same contract as minhash_dedup_pairs: estimated Jaccard
        # cannot exceed 1, so the near tier is provably empty — skip
        # signatures/banding entirely (exact-tier-only mode, used by
        # exact-oracle gates and by corpora where near-dedup is done
        # elsewhere)
        surv_fp = _fingerprints(alive_docs, id_col, text_col)
        new_state = DedupState(
            exact=state.exact.unionByName(surv_fp.select("fp", "doc_id")),
            sigs=state.sigs,
            num_hashes=nh,
            bands=nb,
            shingle_n=state.shingle_n,
            # sigs are unchanged here, so the stored band relation (its
            # derivation) stays valid — dropping it would cost the NEXT
            # near-dedup increment a needless re-derivation from sigs
            band_rel=state.band_rel,
        )
        return IncrementalResult(
            kept=alive_docs,
            dropped=dropped_exact,
            state=new_state,
            delta_exact=surv_fp.select("fp", "doc_id"),
            delta_sigs=None,  # near tier skipped: sigs unchanged
        )
    sh = _shingles(alive_docs, id_col, text_col, state.shingle_n)
    # sigs feed the band tables AND two estimate joins AND the updated
    # state — persist so the explode + nh-hash aggregation runs once
    # (the same measured lesson as minhash_dedup_pairs' sig persist)
    new_sigs = tracked_persist(
        minhash_signatures(sh, F.col("sh"), "doc_id", nh)
    )
    new_bandt = _cap_buckets(
        _band_table(new_sigs, nb, nh), ["band", "key"], max_bucket_size
    )
    # bucketed states carry a pre-derived band relation whose stored
    # (band, key) bucketing makes this side of the cross join
    # shuffle-free; plain states derive it from sigs (map-only)
    state_bandt = _cap_buckets(
        state.band_rel
        if state.band_rel is not None
        else _band_table(state.sigs, nb, nh),
        ["band", "key"],
        max_bucket_size,
    )

    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        )
        / F.lit(float(nh))
    )

    def verified_pairs(cand: DataFrame, sigs_b: DataFrame) -> DataFrame:
        sa = new_sigs.select(
            F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")
        )
        sb = sigs_b.select(
            F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")
        )
        return (
            cand.join(sa, "doc_a")
            .join(sb, "doc_b")
            # round(.,4) mirrors minhash_dedup_pairs exactly, so the
            # incremental and one-shot paths agree at threshold edges
            .select("doc_a", "doc_b", F.round(est, 4).alias("est_jaccard"))
            .filter(F.col("est_jaccard") >= threshold)
        )

    a, b = new_bandt.alias("a"), new_bandt.alias("b")
    internal = verified_pairs(
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct(),
        new_sigs,
    )
    s = state_bandt.alias("s")
    cross = verified_pairs(
        a.join(
            s,
            (F.col("a.band") == F.col("s.band"))
            & (F.col("a.key") == F.col("s.key")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("s.doc_id").alias("doc_b")
        )
        .distinct(),
        state.sigs,
    )

    # close over both edge sets; mark which nodes are state nodes
    edges = internal.select("doc_a", "doc_b").unionByName(
        cross.select("doc_a", "doc_b")
    )
    labels = connected_components(edges, "doc_a", "doc_b")
    state_nodes = cross.select(F.col("doc_b").alias("id")).distinct()
    # a component that touches ANY state node drops all its new docs
    poisoned = labels.join(
        state_nodes.withColumnRenamed("id", "id_"),
        labels["id"] == F.col("id_"),
    ).select(F.col("comp").alias("pc")).distinct()
    batch_labels = labels.join(state_nodes, "id", "left_anti")
    near_dropped_poison = batch_labels.join(
        poisoned, batch_labels["comp"] == F.col("pc")
    ).select(
        F.col("id").alias("doc_id"),
        F.lit("near").alias("reason"),
        F.col("comp").alias("matched_id"),
    )
    clean_labels = batch_labels.join(
        poisoned, batch_labels["comp"] == F.col("pc"), "left_anti"
    )
    survivors = keep_canonical(
        alive_docs.join(
            near_dropped_poison.withColumnRenamed("doc_id", id_col),
            id_col,
            "left_anti",
        ),
        clean_labels.select("id", "comp"),
        id_col=id_col,
    )
    near_dropped_canon = (
        clean_labels.filter(F.col("id") != F.col("comp"))
        .select(
            F.col("id").alias("doc_id"),
            F.lit("near").alias("reason"),
            F.col("comp").alias("matched_id"),
        )
    )
    dropped = dropped_exact.unionByName(near_dropped_poison).unionByName(
        near_dropped_canon
    )

    surv_fp = _fingerprints(survivors, id_col, text_col)
    surv_sigs = new_sigs.join(
        survivors.select(F.col(id_col).alias("doc_id")), "doc_id", "left_semi"
    )
    new_state = DedupState(
        exact=state.exact.unionByName(surv_fp.select("fp", "doc_id")),
        sigs=state.sigs.unionByName(surv_sigs),
        num_hashes=nh,
        bands=nb,
        shingle_n=state.shingle_n,
    )
    return IncrementalResult(
        kept=survivors,
        dropped=dropped,
        state=new_state,
        delta_exact=surv_fp.select("fp", "doc_id"),
        delta_sigs=surv_sigs,
    )
