"""q36: the end-to-end golden gate (SURVEY §5.2) — run_pipeline's full
standardize -> x01 -> enrich chain through the driver's oracle.

The landing zone is synthesized column-wise from `customer` (every
FIADMIN field present, most NULL; the populated ones vary
arithmetically), dims from `nation`, so the DuckDB oracle can state the
expected COMPOSED output analytically. Projected columns are the ones
whose values cross stage boundaries — doc-id synthesis, status decode,
type/weight/date builders (02), author+country join then x01
title-casing (02->x01), the ai rename (02->x01), and the J6+J7
instance/db/dyn merges (x01->03) — certifying the chain wiring;
individual operators carry their own gates (q22-q35).

Reference chain: 02_create_iahx_xml_collection.py ->
02_x01_create_iahx_xml_collection.py -> 03_xml_enriched.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.queries.base import QueryDef, qdef
from data_governance_spark.queries.enrich_gates import _dyn_s
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}

def _s(c: Column) -> Column:
    return c.cast("string")


@qdef(
    QUERIES,
    "q36_pipeline_golden",
    oracle="""
    WITH f AS (
      SELECT c_custkey AS ck, CAST(c_custkey AS VARCHAR) AS cs,
             c_custkey % 25 AS m, CAST(c_custkey % 25 AS VARCHAR) AS ms
      FROM customer
      WHERE c_custkey % 5 <> 4 AND c_custkey % 17 <> 0
    )
    SELECT
      CASE WHEN ck % 3 = 0 THEN 'lil-L' || cs ELSE 'biblio-' || cs END AS id,
      CASE ck % 5 WHEN 0 THEN 'LILACS-Express' WHEN 1 THEN 'Publicado'
                  WHEN 2 THEN 'Coletado' ELSE 'Migrado' END AS status_s,
      CASE ck % 4 WHEN 0 THEN 'article' WHEN 1 THEN 'thesis'
                  WHEN 2 THEN 'monography' ELSE 'non-conventional' END AS type_s,
      GREATEST(
        CASE ck % 4 WHEN 0 THEN 15 WHEN 1 THEN 10 WHEN 2 THEN 5 ELSE 2 END
        + (ck % 20) - 5
        + CASE WHEN ck % 2 = 0 THEN 5 ELSE 0 END
        + CASE WHEN ck % 3 = 0 THEN 5 ELSE 0 END, 0) AS weight,
      '20' || lpad(CAST(ck % 20 AS VARCHAR), 2, '0') || '01' AS da,
      CASE WHEN ck % 2 = 0 THEN '20240115' ELSE '20230203' END AS entry_date,
      '20250607' AS update_date,
      CASE WHEN m % 2 = 0 THEN 'RN' ELSE 'CA' END || ms AS ai_s,
      'Au' || cs AS au_s,
      'W' || cs AS auid_s,
      '^iLand' || ms || '^eEs Land' || ms || '^pTerra de ' || ms || '^f'
        || CASE WHEN m % 3 <> 0 THEN 'Fr Land' || ms ELSE 'None' END AS pais_af_s,
      '^iLand' || ms || '^eEs Land' || ms || '^pTerra de ' || ms || '^f'
        || CASE WHEN m % 3 <> 0 THEN 'Fr Land' || ms ELSE 'None' END AS pp_s,
      'Z' || ms || '|es land' || ms
        || CASE WHEN m % 3 <> 0 THEN '|fr land' || ms ELSE '' END
        || '|land' || ms || '|terra de ' || ms AS cp_s,
      'ie' || CAST(m % 4 AS VARCHAR) || '|ji' || CAST(m % 3 AS VARCHAR)
        AS instance_s,
      'dbx' || ms || '|jd' || ms AS db_s,
      'ci' || CAST(m % 2 AS VARCHAR) || ':dbx' || ms
        || '|ck' || CAST(m % 2 AS VARCHAR) || ':cv' || ms AS dyn_s
    FROM f
    """,
    doc="end-to-end golden: standardize -> x01 -> enrich composed chain "
    "(P1 filter, F13/F15/F16/F17/A18 builders, J1/J2 country joins + "
    "x01 title-casing, J9 rename, J6+J7 merges)",
)
def q36_pipeline_golden(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.fixtures import FIADMIN_LANDING_SCHEMA
    from data_governance_spark.pipeline import Dims, run_pipeline

    # The sf parquet is a single row group, so every downstream stage —
    # the eager 02 cut and the composed-chain action — would otherwise
    # run as one task (guide §2: derive partitioning from the runtime,
    # not the file layout). One cheap 8-column shuffle here fans the
    # heavy standardize expressions across all cores; the author/DECS
    # reassembly is position-ordered (sort_array over struct(pos,..)),
    # so results are partitioning-invariant (oracle-verified).
    cust = table(spark, sf_dir, "customer").repartition(
        spark.sparkContext.defaultParallelism
    )
    k = F.col("c_custkey")
    cs = _s(k)
    m = k % 25
    ms = _s(m)

    def author(text, _1, _p, _w):
        nul = F.lit(None).cast("string")
        vals = {"text": text, "_1": _1, "_p": _p, "_w": _w}
        return F.struct(
            *[
                vals.get(f, nul).alias(f)
                for f in ("text", "_1", "_2", "_3", "_p", "_c", "_k", "_w", "_e")
            ]
        )

    ea_entry = F.struct(
        F.concat(F.lit("http://x/"), cs, F.lit(".pdf")).alias("_u"),
        *[F.lit(None).cast("string").alias(f) for f in ("_y", "_z", "_x", "_q")],
    )
    overrides = {
        "id": k.cast("long"),
        "status": F.when(k % 5 == 0, 0)
        .when(k % 5 == 1, 1)
        .when(k % 5 == 2, -2)
        .when(k % 5 == 3, -3)
        .otherwise(2),  # 2 = Recusado: dropped by the P1 stage filter
        "treatment_level": F.when(k % 17 == 0, F.lit("")).otherwise(F.lit("as")),
        "literature_type": F.when(k % 4 == 0, F.lit("S"))
        .when(k % 4 == 1, F.lit("T"))
        .when(k % 4 == 2, F.lit("M"))
        .otherwise(F.lit("N")),
        "LILACS_original_id": F.when(k % 3 == 0, F.concat(F.lit("L"), cs)),
        "title": F.array(
            F.struct(
                F.concat(F.lit("Ti"), cs).alias("text"), F.lit("pt").alias("_i")
            )
        ),
        "abstract": F.when(
            k % 2 == 0,
            F.array(
                F.struct(
                    F.concat(F.lit("Ab"), cs).alias("text"), F.lit("en").alias("_i")
                )
            ),
        ),
        "electronic_address": F.when(k % 3 == 0, F.array(ea_entry)),
        "individual_author": F.array(
            author(
                F.concat(F.lit("Au"), cs),
                F.concat(F.lit("In"), _s(k % 3)),
                F.concat(F.lit("LAND"), ms),  # uppercase: tests key norm
                F.concat(F.lit("W"), cs),
            )
        ),
        "corporate_author": F.array(
            author(F.concat(F.lit("CA"), ms), F.lit(None), F.lit(None), F.lit(None))
        ),
        "publication_country": F.concat(F.lit("LAND"), ms),
        "publication_date_normalized": F.concat(
            F.lit("20"), F.lpad(_s(k % 20), 2, "0"), F.lit("0102")
        ),
        "indexed_database": F.array(F.concat(F.lit("dbx"), ms)),
        "database": F.array(F.concat(F.lit("DáTá"), ms)),  # diacritics key
        "created_time": F.when(k % 2 == 0, F.lit("2024-01-15T10:00:00")),
        "updated_time": F.lit("2025-06-07T01:02:03"),
        "transfer_date_to_database": F.lit("2023-02-03"),
    }
    # null columns via one server-side-parsed expr each (1 py4j round
    # trip) instead of lit(None).cast(DataType) (several) — the landing
    # synthesis was ~3s of pure py4j chatter for the ~60 all-null fields
    def _landing() -> DataFrame:
        return cust.select(
            *[
                (
                    overrides[f.name].alias(f.name)
                    if f.name in overrides
                    else F.expr(
                        f"CAST(NULL AS {f.dataType.simpleString()}) AS `{f.name}`"
                    )
                )
                for f in FIADMIN_LANDING_SCHEMA
            ]
        )

    # the landing synthesis (~60-column select) and the six dim
    # constructions below are independent plan builds — overlap the
    # heavy one with the rest (guide §2.6, the d01/d03/q37 pattern)
    from concurrent.futures import ThreadPoolExecutor

    _pool = ThreadPoolExecutor(max_workers=1)
    _landing_fut = _pool.submit(_landing)

    nation = table(spark, sf_dir, "nation")
    nk = F.col("n_nationkey")
    ns = _s(nk)
    tabpais = nation.select(
        F.concat(F.lit("terra de "), ns).alias("pt"),
        F.concat(F.lit("land"), ns).alias("en"),
        F.concat(F.lit("es land"), ns).alias("es"),
        F.when(nk % 3 != 0, F.concat(F.lit("fr land"), ns)).alias("fr"),
        F.concat(F.lit("Z"), ns).alias("pais_2"),
        F.array().cast("array<string>").alias("sinonimo"),
    )
    # deliberately unmatched: ta_var/J4/J5 fallbacks stay inert here
    title_current = nation.select(
        F.lit("9999-9999").alias("issn"),
        F.concat(F.lit("ZZREV"), ns).alias("shortened_title"),
        F.lit("ZZ Title").alias("title"),
        F.lit(None).cast("string").alias("medline_shortened_title"),
        *[
            F.lit(None).cast("array<string>").alias(c)
            for c in ("parallel_titles", "shortened_parallel_titles", "other_titles")
        ],
        F.array(F.lit("land0")).alias("country"),
    )
    decs = nation.select(
        F.concat(F.lit("9"), ns).alias("mfn"),
        F.concat(F.lit("Unused"), ns).alias("descritor_ingles"),
        *[
            F.lit(None).cast("string").alias(c)
            for c in (
                "descritor_portugues", "descritor_espanhol", "descritor_frances",
                "descritor_espanhol_espanha", "versao_alternativa_ingles",
                "versao_alternativa_espanhol", "versao_alternativa_portugues",
            )
        ],
        *[
            F.lit(None).cast("array<string>").alias(c)
            for c in (
                "sinonimos_ingles", "sinonimos_espanhol", "sinonimos_portugues",
                "sinonimos_espanha", "sinonimos_frances",
            )
        ],
    )
    instance_ecollection = nation.select(
        F.concat(F.lit("dbx"), ns).alias("db"),
        F.array(F.concat(F.lit("ie"), _s(nk % 4))).alias("instance"),
        F.lit("c").alias("collection"),
        F.array(F.concat(F.lit("ci"), _s(nk % 2)), F.lit("")).alias(
            "collection_instance"
        ),
    )
    db_instance_ecollection = nation.select(
        F.concat(F.lit("data"), ns).alias("database_campo4"),
        F.array(F.concat(F.lit("jd"), ns)).alias("db"),
        F.array(F.concat(F.lit("ji"), _s(nk % 3))).alias("instance"),
        F.array(
            F.concat(F.lit("ck"), _s(nk % 2), F.lit(":cv"), ns), F.lit("plain")
        ).alias("collection_instance"),
    )
    brisa_ai = nation.select(
        F.array(F.concat(F.lit("CA"), ns)).alias("ai1"),
        F.when(nk % 2 == 0, F.concat(F.lit("RN"), ns)).otherwise(F.lit("")).alias(
            "ai2"
        ),
    )
    dims = Dims(
        tabpais=tabpais,
        title_current=title_current,
        decs=decs,
        instance_ecollection=instance_ecollection,
        db_instance_ecollection=db_instance_ecollection,
        temas=None,
        brisa_ai=brisa_ai,
    )
    # One lineage cut after standardize (the medallion 02 boundary):
    # truncating the big expression tree there keeps Catalyst analysis
    # memory bounded (a 1g-heap vanilla driver session OOMs on the
    # un-truncated composed lineage; measured r14: the uncut lineage is
    # also ~3x slower end-to-end from planning cost alone). The cut is
    # localCheckpoint, not a parquet checkpoint: same truncation, no
    # parquet encode/decode or fs round-trip (measured r14: 7.7-8.3s ->
    # 6.8-7.4s interleaved A/B); this gate needs no restartability.
    # truncate_keep prunes the eager cut to the columns this gate's
    # downstream chain actually reads (x01: id/ai/pais_*; enrich:
    # id/db/database; final select below): the localCheckpoint barrier
    # otherwise materializes all ~70 wide-select columns — fo/lo are
    # the heaviest expression trees in the stage and nothing after the
    # cut reads them here (they carry their own gates, q23/q33).
    # Results are unchanged (oracle-verified; equivalence test pins all
    # modes); a missing column would fail analysis loudly.
    landing = _landing_fut.result()
    _pool.shutdown()
    out = run_pipeline(
        landing,
        dims,
        current_year=2025,
        truncate_stages=("02_iahx_xml",),
        truncate_keep={
            "02_iahx_xml": (
                "id", "status_fiadmin", "type", "weight", "da",
                "entry_date", "update_date", "ai", "au", "auid",
                "pais_afiliacao", "pais_publicacao", "cp", "db",
                "database",
            )
        },
    )
    j = lambda c: F.array_join(F.col(c), "|")  # noqa: E731
    return out.select(
        "id",
        F.col("status_fiadmin").alias("status_s"),
        j("type").alias("type_s"),
        F.col("weight").cast("int").alias("weight"),
        "da",
        "entry_date",
        "update_date",
        j("ai").alias("ai_s"),
        j("au").alias("au_s"),
        j("auid").alias("auid_s"),
        j("pais_afiliacao").alias("pais_af_s"),
        F.col("pais_publicacao").alias("pp_s"),
        j("cp").alias("cp_s"),
        j("instance").alias("instance_s"),
        j("db").alias("db_s"),
        _dyn_s(F.col("dyn")).alias("dyn_s"),
    )
