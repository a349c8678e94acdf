"""Oracle gates (merged, r5 driver-budget) for the engine's source/sink
boundaries: q41 = Solr-XML source round-trip (S8-S11, F21) + XML
document sink serialization (S12/P8/F6-extended); q43 = paginated REST
harvester (S1-S6) + date-range/id-list extract params (S2-S4) + the
chart-JSON pivot (S14/S15 served layer, O1 year sort).

q41 materializes real XML files (content derived from `customer`) once
per process (staged dir reused across invocations and removed at exit —
repeated bench/sweep runs must not accumulate /tmp, ADVICE r4) and
reads them back through the real source; the sink half gates the
`doc_xml` serialization column directly. q43 drives harvest_pages with
deterministic injected fetches — all with analytically-stated DuckDB
oracles, like q25-q40.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_governance_spark.queries.base import QueryDef, melt_metrics, qdef
from data_governance_spark.queries.staging import staged_tmpdir
from data_governance_spark.tables import table

QUERIES: dict[str, QueryDef] = {}


def _s(c: Column) -> Column:
    return c.cast("string")


# --------------------------------------------------------------------------
# Sub-gate 'src' (ex-q41): the Solr-XML source round-trip. Two files are
# generated from the first 200 customers (a.xml: ck<=100, b.xml: the
# rest): repeated <field name="la"> values become a list (F21/S8), docs
# with instance='other' (ck%3==0) are dropped by the S9 filter, and each
# file re-emits every ck%10==0 doc with a poisoned note — S10's
# first-in-file-wins dedup must keep the original. The files are read
# back via the glob path (S11).
# Reference: dags/tmgl_metrics/dag_01_full_update.py:83-211.
def _staged_xml_dir(spark: SparkSession, sf_dir: str) -> str:
    """Generate the q41 XML fixture files once per (process, sf_dir);
    reused across repeated gate/bench invocations, removed atexit."""

    def build(out_dir: str) -> None:
        rows = (
            table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") <= 200)
            .select("c_custkey")
            .orderBy("c_custkey")
            .collect()
        )

        def doc(ck: int, note: str) -> str:
            inst = "tmgl" if ck % 3 != 0 else "other"
            return (
                f'<doc><field name="id">d{ck}</field>'
                f'<field name="instance">{inst}</field>'
                f'<field name="la">en</field><field name="la">pt</field>'
                f'<field name="note">{note}</field></doc>'
            )

        for fname, lo, hi in (("a.xml", 1, 100), ("b.xml", 101, 10**9)):
            cks = [r["c_custkey"] for r in rows if lo <= r["c_custkey"] <= hi]
            body = [doc(ck, f"N{ck}") for ck in cks]
            # dup docs after the originals: S10 keeps the first occurrence
            body += [doc(ck, "DUP") for ck in cks if ck % 10 == 0]
            with open(os.path.join(out_dir, fname), "w") as f:
                f.write("<add>" + "".join(body) + "</add>")

    return staged_tmpdir(("q41xml", sf_dir), build, prefix="dg_q41_")


def q41_solr_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.sources.solr_xml import read_solr_xml

    out_dir = _staged_xml_dir(spark, sf_dir)
    parsed = read_solr_xml(
        spark, os.path.join(out_dir, "*.xml"), instance_filter="tmgl"
    )
    return parsed.select(
        "id",
        F.col("_file").alias("file"),
        F.array_join(F.col("fields")["la"], "|").alias("la_s"),
        F.get(F.col("fields")["note"], 0).alias("note"),
    )


# --------------------------------------------------------------------------
# Sub-gate 'ser' (ex-q42): the XML sink's per-document serialization
# (S12). Exercises: sorted field order; array fields repeated with
# ''/NULL values pruned (P8); &<> escaped in text and " additionally in
# data-derived dyn-map attribute names; NULL/'' scalars pruned; ti-style
# prefixed map keys ('' -> bare name); the dyn map appended after the
# named fields; the F6-extended invalid-char strip (\\x01 removed); and
# the boost attribute from weight.
# Reference: 04_export_xml.py:82-128 (sink), :39-57 (sanitizer).
def q42_xml_sink_serialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.sinks.xml_sink import doc_xml

    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cs = _s(k)
    facts = cust.select(
        F.concat(F.lit("D"), cs).alias("id"),
        F.array(
            F.concat(F.lit("v1-"), cs),
            F.lit(""),  # pruned
            F.lit(None).cast("string"),  # pruned
            F.concat(F.lit("v<2>&"), cs),  # text-escaped
        ).alias("aa_arr"),
        F.create_map(
            F.lit(""), F.array(F.concat(F.lit("base"), cs)),  # bare 'mm'
            F.lit("en"),
            F.when(k % 2 == 0, F.array(F.lit("e1"), F.lit("e2"))).otherwise(
                F.array(F.lit("e1"))
            ),
        ).alias("mm"),
        F.when(k % 5 != 0, F.concat(F.lit('S"x"'), cs)).alias("sc"),  # NULL pruned
        F.lit("").alias("zz"),  # always pruned
        (k % 7).cast("int").alias("weight"),
        F.create_map(
            F.concat(F.lit('k"'), _s(k % 2)),  # quote in attr name
            F.array(F.concat(F.lit("dv"), cs), F.lit("")),  # '' pruned
            F.lit("kc"),
            F.array(F.concat(F.lit("c\x01v"), cs)),  # \x01 stripped
        ).alias("dyn"),
    )
    return doc_xml(facts).select("id", "xml")


# --------------------------------------------------------------------------
# Sub-gate 'warc' (new in r6): WARC source (sources/warc.py) composed
# with html_to_text (functions/html.py) — the Common Crawl ingest path.
# One synthetic WARC file is generated from `customer`: a warcinfo
# header record (dropped by the type filter), one HTTP `response`
# record per ck<=150 whose HTML body exercises comment/script/head
# drops, block-tag newlines, named + hex entity decode and whitespace
# collapse (ck%9==0 gets a 204 empty-body response — the envelope-
# consumed-by-trailing-strip case http_body documents), a `request`
# record for ck%4==0 (must be dropped), and a WET `conversion` record
# with bare text for ck%2==0 (html_to_text pass-through). The oracle
# states the extracted text analytically.
# Reference twin: none — training-data extension per SURVEY §6.
def _warc_record(wtype: str, uri: str, rid: str, payload: str) -> str:
    hdrs = [f"WARC-Type: {wtype}"]
    if uri:
        hdrs.append(f"WARC-Target-URI: {uri}")
    hdrs += [f"WARC-Record-ID: {rid}", f"Content-Length: {len(payload.encode())}"]
    return "WARC/1.0\r\n" + "\r\n".join(hdrs) + "\r\n\r\n" + payload + "\r\n\r\n"


def _staged_warc_dir(spark: SparkSession, sf_dir: str) -> str:
    def build(out_dir: str) -> None:
        rows = (
            table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") <= 150)
            .select("c_custkey")
            .orderBy("c_custkey")
            .collect()
        )
        recs = [_warc_record("warcinfo", "", "<urn:t:info>", "software: synth")]
        for r in rows:
            ck = r["c_custkey"]
            if ck % 9 == 0:
                payload = "HTTP/1.1 204 No Content\r\nX-Empty: y\r\n\r\n"
            else:
                body = (
                    "<html><head><title>t</title></head><body><!--c-->"
                    f"<script>var z=1;</script><p>Hello &amp; d&#x2019;accord {ck}</p>"
                    "<div>Tail&#8230;</div></body></html>"
                )
                payload = (
                    "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
                )
            recs.append(
                _warc_record("response", f"http://ex.com/r{ck}", f"<urn:t:r{ck}>", payload)
            )
            if ck % 4 == 0:
                recs.append(
                    _warc_record(
                        "request", f"http://ex.com/r{ck}", f"<urn:t:q{ck}>",
                        "GET / HTTP/1.1\r\nHost: ex.com",
                    )
                )
            if ck % 2 == 0:
                recs.append(
                    _warc_record(
                        "conversion", f"http://ex.com/w{ck}", f"<urn:t:w{ck}>",
                        f"wet text {ck}",
                    )
                )
        # newline='' so \r\n survives on any platform
        with open(os.path.join(out_dir, "a.warc"), "w", newline="") as f:
            f.write("".join(recs))

    return staged_tmpdir(("q41warc", sf_dir), build, prefix="dg_q41w_")


# Sub-gate 'ufil' (new in r6): URL/domain filtering
# (operators/urlfilter.py) — block mode with subdomain + case/port
# normalization (spam.com catches Track.Spam.COM:8080 and
# x.sub.bad.net via bad.net), the regex pattern tier (.zip), and the
# NULL-url keep semantics, over URLs synthesized from customer keys.
# The oracle restates the keep-set and surviving URLs arithmetically.
def q41_url_filtering(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.operators.urlfilter import (
        filter_domains,
        filter_url_patterns,
    )

    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cs = _s(k)
    url = (
        F.when(k % 17 == 0, F.lit(None).cast("string"))
        .when(k % 11 == 0, F.concat(F.lit("https://x.sub.bad.net/p"), cs))
        .when(
            k % 7 == 0,
            F.concat(F.lit("http://Track.Spam.COM:8080/p"), cs, F.lit("?g=1")),
        )
        .when(
            k % 13 == 0,
            F.concat(F.lit("http://files.example.org/a"), cs, F.lit(".zip")),
        )
        .otherwise(
            F.concat(
                F.lit("http://ok"), _s(k % 4), F.lit(".example.org/p"), cs
            )
        )
    )
    docs = cust.select(k.alias("doc_id"), url.alias("url"))
    out = filter_url_patterns(
        filter_domains(docs, ["spam.com", "bad.net"]), [r"\.zip$"]
    )
    return out.select(
        F.concat(F.lit("u"), F.col("doc_id").cast("string")).alias("k"),
        F.coalesce("url", F.lit("")).alias("v_s"),
    )


# Sub-gate 'dom' (new in r10): DOM-tier main-content extraction
# (operators/htmldom.py — Boilerpipe length+link-density rule with the
# jusText neighbor glue, stdlib html.parser). Planted page shape per
# customer: nav + footer (structural chrome, dropped wholesale), two
# long content paragraphs (kept), and between them EITHER a short
# plain aside (ck % 3 == 0 — kept only via the glue rule) or a short
# all-link "Read more" row (dropped by link density even though both
# neighbors are content). The oracle restates the extraction string
# analytically.
def q41_dom_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.operators.htmldom import extract_main_text

    cust = table(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    cs = _s(k)
    p1 = F.concat(
        F.lit("Main article content paragraph number "), cs,
        F.lit(" has plenty of characters to pass the length rule easily."),
    )
    p2 = F.concat(
        F.lit("Second substantial paragraph for document "), cs,
        F.lit(" also comfortably exceeds the minimum block length."),
    )
    mid = (
        F.when(k % 3 == 0, F.concat(F.lit("<p>Aside "), cs, F.lit(".</p>")))
        .otherwise(F.lit("<p><a href='/more'>Read more</a></p>"))
    )
    html = F.concat(
        F.lit(
            "<nav><a href='/'>Home</a><a href='/about'>About us</a></nav><p>"
        ),
        p1,
        F.lit("</p>"),
        mid,
        F.lit("<p>"),
        p2,
        F.lit(
            "</p><footer>Copyright 2026 Example Corp all rights "
            "reserved.</footer>"
        ),
    )
    docs = cust.select(k.alias("doc_id"), html.alias("text"))
    return extract_main_text(docs).select(
        F.concat(F.lit("h"), F.col("doc_id").cast("string")).alias("k"),
        F.col("text").alias("v_s"),
    )


# Sub-gate 'pdf' (new in r11): PDF text extraction (operators/pdf.py).
# Two tiers in one gate:
#  - per-customer rows ('f'||ck): a complete uncompressed PDF is
#    ASSEMBLED IN SPARK SQL per customer (PDF's object syntax is ASCII,
#    so F.concat builds a real file; /Length is computed with F.length
#    — all-ASCII, chars == bytes) and extracted through the real
#    parser: object scan, page tree, Tj, the Td line break, and the
#    TJ kerning-vs-word-gap rule (-250 → space, -10 → nothing) are all
#    analytic in the oracle.
#  - one planted row ('flate'): a 1,318-byte spec-writer payload
#    (regenerated + pinned by tests/test_pdf.py::test_gate_payload_pin)
#    covering what SQL concat cannot: FlateDecode streams, a WinAnsi
#    curly-quote/eacute page, and an Identity-H page decoded through a
#    ToUnicode CMap (bfchar + bfrange) from hex show-strings.
_PDF_LZW_TEXT = "Legacy LZW stream decoded\nkerned gap"
_PDF_LZW_HEX = (
    "255044462d312e350a25e2e3cfd30a312030206f626a0a3c3c202f54797065202f43"
    "6174616c6f67202f5061676573203220302052203e3e0a656e646f626a0a32203020"
    "6f626a0a3c3c202f54797065202f5061676573202f4b696473205b33203020525d20"
    "2f436f756e742031203e3e0a656e646f626a0a332030206f626a0a3c3c202f547970"
    "65202f50616765202f506172656e74203220302052202f5265736f7572636573203c"
    "3c202f466f6e74203c3c202f4631203520302052203e3e203e3e202f436f6e74656e"
    "7473203420302052203e3e0a656e646f626a0a342030206f626a0a3c3c202f46696c"
    "746572202f4c5a574465636f6465202f4c656e677468203935203e3e0a7374726561"
    "6d0a80108a820179186220188c84054330806f0a878c21664100a0986533984c6791"
    "0130b457101cce87232984da2032194c66f94990530b35082242d188d226202d8a0d"
    "665391ba5f34850a0cb2e100b46438890a2327014976164a10114a90100a656e6473"
    "747265616d0a656e646f626a0a352030206f626a0a3c3c202f54797065202f466f6e"
    "74202f53756274797065202f5479706531202f42617365466f6e74202f48656c7665"
    "74696361203e3e0a656e646f626a0a787265660a3020360a30303030303030303030"
    "2036353533352066200a30303030303030303135203030303030206e200a30303030"
    "303030303634203030303030206e200a30303030303030313231203030303030206e"
    "200a30303030303030323233203030303030206e200a303030303030303338372030"
    "30303030206e200a747261696c65720a3c3c202f53697a652036202f526f6f742031"
    "20302052203e3e0a7374617274787265660a3435370a2525454f460a"
)
# third planted payload (r12): rev-3 RC4 ENCRYPTED with the empty user
# password (Flate inside the encryption — decrypt must run before
# inflate), generated by the test suite's independent spec encryptor
# and pinned by tests/test_pdf.py::test_gate_payload_pin
_PDF_ENC_TEXT = "RC4 empty-password decrypt\npermission bits only"
_PDF_ENC_HEX = (
    "255044462d312e350a25e2e3cfd30a312030206f626a0a3c3c202f54797065202f43"
    "6174616c6f67202f5061676573203220302052203e3e0a656e646f626a0a32203020"
    "6f626a0a3c3c202f54797065202f5061676573202f4b696473205b33203020525d20"
    "2f436f756e742031203e3e0a656e646f626a0a332030206f626a0a3c3c202f547970"
    "65202f50616765202f506172656e74203220302052202f5265736f7572636573203c"
    "3c202f466f6e74203c3c202f4631203520302052203e3e203e3e202f436f6e74656e"
    "7473203420302052203e3e0a656e646f626a0a342030206f626a0a3c3c202f46696c"
    "746572202f466c6174654465636f6465202f4c656e67746820313039203e3e0a7374"
    "7265616d0a898a8ab252bca3f471d11ee7e478ae32e653482f712a3aba6d7c3602d4"
    "4afd53f9308a5dbcff472a418c91151d423833b214660a99808aea34f6f94e47c518"
    "78960ef3f535d215571290d9ce201b1409d14660c4c9fe80f01b7ed38bbed259d5ab"
    "6453de84037affd5e108d2f80a656e6473747265616d0a656e646f626a0a35203020"
    "6f626a0a3c3c202f54797065202f466f6e74202f53756274797065202f5479706531"
    "202f42617365466f6e74202f48656c766574696361203e3e0a656e646f626a0a3620"
    "30206f626a0a3c3c202f46696c746572202f5374616e64617264202f562032202f52"
    "2033202f4c656e67746820313238202f50202d3434202f4f203c3931336230373366"
    "35623635393534633862366461323231363939373161313737623765366439346131"
    "303666663735633063313632393662633135343132653e202f55203c343134343436"
    "33656161343763646266366566623932646135363730383431613030303030303030"
    "3030303030303030303030303030303030303030303030303e203e3e0a656e646f62"
    "6a0a787265660a3020370a303030303030303030302036353533352066200a303030"
    "30303030303135203030303030206e200a3030303030303030363420303030303020"
    "6e200a30303030303030313231203030303030206e200a3030303030303032323320"
    "3030303030206e200a30303030303030343034203030303030206e200a3030303030"
    "3030343734203030303030206e200a747261696c65720a3c3c202f53697a65203920"
    "2f526f6f74203120302052202f456e6372797074203620302052202f4944205b3c61"
    "626364313233346162636431323334616263643132333461626364313233343e203c"
    "61626364313233346162636431323334616263643132333461626364313233343e5d"
    "203e3e0a7374617274787265660a3638320a2525454f460a"
)
_PDF_FLATE_TEXT = "Planted “café” payload\nkerned-pair gap\nCMaptu"
_PDF_FLATE_HEX = (
    "255044462d312e350a25e2e3cfd30a312030206f626a0a3c3c202f54797065202f43"
    "6174616c6f67202f5061676573203220302052203e3e0a656e646f626a0a32203020"
    "6f626a0a3c3c202f54797065202f5061676573202f4b696473205b33203020522036"
    "203020525d202f436f756e742032203e3e0a656e646f626a0a332030206f626a0a3c"
    "3c202f54797065202f50616765202f506172656e74203220302052202f5265736f75"
    "72636573203c3c202f466f6e74203c3c202f4631203520302052203e3e203e3e202f"
    "436f6e74656e7473203420302052203e3e0a656e646f626a0a342030206f626a0a3c"
    "3c202f46696c746572202f466c6174654465636f6465202f4c656e67746820313031"
    "203e3e0a73747265616d0a789c730a51d07733543034520849533037022203859014"
    "058d809cc4bc92d41485c9c989692fa728142456e6e427a6682a8464291828e81a9a"
    "8014456b64a716e5a50245758d4c1434740b12338b806c630303058df4c402cd5885"
    "102f05d7100073571bc80a656e6473747265616d0a656e646f626a0a352030206f62"
    "6a0a3c3c202f54797065202f466f6e74202f53756274797065202f5479706531202f"
    "42617365466f6e74202f48656c766574696361202f456e636f64696e67202f57696e"
    "416e7369456e636f64696e67203e3e0a656e646f626a0a362030206f626a0a3c3c20"
    "2f54797065202f50616765202f506172656e74203220302052202f5265736f757263"
    "6573203c3c202f466f6e74203c3c202f4632203820302052203e3e203e3e202f436f"
    "6e74656e7473203720302052203e3e0a656e646f626a0a372030206f626a0a3c3c20"
    "2f46696c746572202f466c6174654465636f6465202f4c656e677468203533203e3e"
    "0a73747265616d0a789c730a51d07733523034540849533037022203859014051b03"
    "03034320360262633b85902c900848c0d010cc730d01005dc60c460a656e64737472"
    "65616d0a656e646f626a0a382030206f626a0a3c3c202f54797065202f466f6e7420"
    "2f53756274797065202f5479706530202f42617365466f6e74202f58202f456e636f"
    "64696e67202f4964656e746974792d48202f546f556e69636f646520392030205220"
    "3e3e0a656e646f626a0a392030206f626a0a3c3c202f46696c746572202f466c6174"
    "654465636f6465202f4c656e67746820313534203e3e0a73747265616d0a789c554e"
    "3b0ec3200cdd39856f109c44ed12b134aa94ad524f40c049190a11a1f72f603ad412"
    "c8cfefa3d7dd9679f12e41f788c13c29c1e6bc8d74864f34042bedce0becc13a9318"
    "f16fdefa10d8f660e93cb4a1a8fd4e30c93c0aa67b1e05e4ed3f2f0676ad9b79e928"
    "8a1a55318d83aaa867344b7941be0cf572954ae4b4e6c35f0a87661e659561538f4d"
    "cd7ca9912b973ae57d0101564b570a656e6473747265616d0a656e646f626a0a7872"
    "65660a302031300a303030303030303030302036353533352066200a303030303030"
    "30303135203030303030206e200a30303030303030303634203030303030206e200a"
    "30303030303030313237203030303030206e200a3030303030303032323920303030"
    "3030206e200a30303030303030343032203030303030206e200a3030303030303034"
    "3939203030303030206e200a30303030303030363031203030303030206e200a3030"
    "3030303030373235203030303030206e200a30303030303030383236203030303030"
    "206e200a747261696c65720a3c3c202f53697a65203130202f526f6f742031203020"
    "52203e3e0a7374617274787265660a313035320a2525454f460a"
)


# Sub-gate 'office' (new in r12): office-document text extraction
# (operators/office.py). Same two-tier shape as 'pdf':
#  - per-customer rows ('r'||ck): a complete RTF file is ASSEMBLED IN
#    SPARK SQL per customer (RTF is an ASCII control-word format, so
#    F.concat builds a real file) and extracted through the real
#    tokenizer: groups, \par/\tab, the \u233 unicode escape with
#    \uc fallback skipping, formatting words dropped, and an
#    ignorable destination ({\*\hidden …}) skipped — all analytic in
#    the oracle.
#  - five planted payloads (docx/xlsx/pptx/odt/epub): STORED-zip
#    containers the test suite's writers regenerate byte-for-byte
#    (tests/test_office.py::test_gate_payload_pin), covering what SQL
#    concat cannot: zip structure, workbook/presentation/spine
#    ordering through rels, shared strings, ODF run-length spaces,
#    and the XHTML chapter tier.
_OFFICE_DOCX_TEXT = "Planted docx body\ncell\taligned"
_OFFICE_DOCX_HEX = (
    "504b0304140000000000000021007d8fc3394d0000004d000000130000005b436f6e"
    "74656e745f54797065735d2e786d6c3c547970657320786d6c6e733d22687474703a"
    "2f2f736368656d61732e6f70656e786d6c666f726d6174732e6f72672f7061636b61"
    "67652f323030362f636f6e74656e742d7479706573222f3e504b0304140000000000"
    "000021003cf2cb48e2000000e200000011000000776f72642f646f63756d656e742e"
    "786d6c3c773a646f63756d656e7420786d6c6e733a773d22687474703a2f2f736368"
    "656d61732e6f70656e786d6c666f726d6174732e6f72672f776f726470726f636573"
    "73696e676d6c2f323030362f6d61696e223e3c773a626f64793e3c773a703e3c773a"
    "723e3c773a743e506c616e74656420646f637820626f64793c2f773a743e3c2f773a"
    "723e3c2f773a703e3c773a703e3c773a723e3c773a743e63656c6c3c2f773a743e3c"
    "773a7461622f3e3c773a743e616c69676e65643c2f773a743e3c2f773a723e3c2f77"
    "3a703e3c2f773a626f64793e3c2f773a646f63756d656e743e504b01021403140000"
    "000000000021007d8fc3394d0000004d000000130000000000000000000000800100"
    "0000005b436f6e74656e745f54797065735d2e786d6c504b01021403140000000000"
    "000021003cf2cb48e2000000e200000011000000000000000000000080017e000000"
    "776f72642f646f63756d656e742e786d6c504b05060000000002000200800000008f"
    "0100000000"
)
_OFFICE_XLSX_TEXT = "planted sheet\t314"
_OFFICE_XLSX_HEX = (
    "504b03041400000000000000210061a5bca51200000012000000130000005b436f6e"
    "74656e745f54797065735d2e786d6c3c547970657320786d6c6e733d2278222f3e50"
    "4b0304140000000000000021003e00b0eee0000000e00000000f000000786c2f776f"
    "726b626f6f6b2e786d6c3c776f726b626f6f6b20786d6c6e733d22687474703a2f2f"
    "736368656d61732e6f70656e786d6c666f726d6174732e6f72672f73707265616473"
    "686565746d6c2f323030362f6d61696e2220786d6c6e733a723d22687474703a2f2f"
    "736368656d61732e6f70656e786d6c666f726d6174732e6f72672f6f666669636544"
    "6f63756d656e742f323030362f72656c6174696f6e7368697073223e3c7368656574"
    "733e3c7368656574206e616d653d2273312220736865657449643d22312220723a69"
    "643d2272496431222f3e3c2f7368656574733e3c2f776f726b626f6f6b3e504b0304"
    "14000000000000002100e47fae90a5000000a50000001a000000786c2f5f72656c73"
    "2f776f726b626f6f6b2e786d6c2e72656c733c52656c6174696f6e73686970732078"
    "6d6c6e733d22687474703a2f2f736368656d61732e6f70656e786d6c666f726d6174"
    "732e6f72672f7061636b6167652f323030362f72656c6174696f6e7368697073223e"
    "3c52656c6174696f6e736869702049643d22724964312220547970653d2274222054"
    "61726765743d22776f726b7368656574732f7368656574312e786d6c222f3e3c2f52"
    "656c6174696f6e73686970733e504b03041400000000000000210019191b996a0000"
    "006a00000014000000786c2f736861726564537472696e67732e786d6c3c73737420"
    "786d6c6e733d22687474703a2f2f736368656d61732e6f70656e786d6c666f726d61"
    "74732e6f72672f73707265616473686565746d6c2f323030362f6d61696e223e3c73"
    "693e3c743e706c616e7465642073686565743c2f743e3c2f73693e3c2f7373743e50"
    "4b03041400000000000000210035a7e6e5a1000000a100000018000000786c2f776f"
    "726b7368656574732f7368656574312e786d6c3c776f726b736865657420786d6c6e"
    "733d22687474703a2f2f736368656d61732e6f70656e786d6c666f726d6174732e6f"
    "72672f73707265616473686565746d6c2f323030362f6d61696e223e3c7368656574"
    "446174613e3c726f773e3c6320743d2273223e3c763e303c2f763e3c2f633e3c633e"
    "3c763e3331343c2f763e3c2f633e3c2f726f773e3c2f7368656574446174613e3c2f"
    "776f726b73686565743e504b010214031400000000000000210061a5bca512000000"
    "120000001300000000000000000000008001000000005b436f6e74656e745f547970"
    "65735d2e786d6c504b01021403140000000000000021003e00b0eee0000000e00000"
    "000f0000000000000000000000800143000000786c2f776f726b626f6f6b2e786d6c"
    "504b0102140314000000000000002100e47fae90a5000000a50000001a0000000000"
    "000000000000800150010000786c2f5f72656c732f776f726b626f6f6b2e786d6c2e"
    "72656c73504b010214031400000000000000210019191b996a0000006a0000001400"
    "0000000000000000000080012d020000786c2f736861726564537472696e67732e78"
    "6d6c504b010214031400000000000000210035a7e6e5a1000000a100000018000000"
    "00000000000000008001c9020000786c2f776f726b7368656574732f736865657431"
    "2e786d6c504b050600000000050005004e010000a00300000000"
)
_OFFICE_PPTX_TEXT = "slide one\nslide two"
_OFFICE_PPTX_HEX = (
    "504b03041400000000000000210061a5bca51200000012000000130000005b436f6e"
    "74656e745f54797065735d2e786d6c3c547970657320786d6c6e733d2278222f3e50"
    "4b030414000000000000002100895df6620b0100000b010000140000007070742f70"
    "726573656e746174696f6e2e786d6c3c703a70726573656e746174696f6e20786d6c"
    "6e733a703d22687474703a2f2f736368656d61732e6f70656e786d6c666f726d6174"
    "732e6f72672f70726573656e746174696f6e6d6c2f323030362f6d61696e2220786d"
    "6c6e733a723d22687474703a2f2f736368656d61732e6f70656e786d6c666f726d61"
    "74732e6f72672f6f6666696365446f63756d656e742f323030362f72656c6174696f"
    "6e7368697073223e3c703a736c6449644c73743e3c703a736c6449642069643d2232"
    "35372220723a69643d2272496432222f3e3c703a736c6449642069643d2232353622"
    "20723a69643d2272496431222f3e3c2f703a736c6449644c73743e3c2f703a707265"
    "73656e746174696f6e3e504b030414000000000000002100917a3014de000000de00"
    "00001f0000007070742f5f72656c732f70726573656e746174696f6e2e786d6c2e72"
    "656c733c52656c6174696f6e736869707320786d6c6e733d22687474703a2f2f7363"
    "68656d61732e6f70656e786d6c666f726d6174732e6f72672f7061636b6167652f32"
    "3030362f72656c6174696f6e7368697073223e3c52656c6174696f6e736869702049"
    "643d22724964312220547970653d227422205461726765743d22736c696465732f73"
    "6c696465312e786d6c222f3e3c52656c6174696f6e736869702049643d2272496432"
    "2220547970653d227422205461726765743d22736c696465732f736c696465322e78"
    "6d6c222f3e3c2f52656c6174696f6e73686970733e504b0304140000000000000021"
    "00c20a9eaebe000000be000000150000007070742f736c696465732f736c69646531"
    "2e786d6c3c703a736c6420786d6c6e733a703d22687474703a2f2f736368656d6173"
    "2e6f70656e786d6c666f726d6174732e6f72672f70726573656e746174696f6e6d6c"
    "2f323030362f6d61696e2220786d6c6e733a613d22687474703a2f2f736368656d61"
    "732e6f70656e786d6c666f726d6174732e6f72672f64726177696e676d6c2f323030"
    "362f6d61696e223e3c613a703e3c613a723e3c613a743e736c6964652074776f3c2f"
    "613a743e3c2f613a723e3c2f613a703e3c2f703a736c643e504b0304140000000000"
    "00002100240d5d2bbe000000be000000150000007070742f736c696465732f736c69"
    "6465322e786d6c3c703a736c6420786d6c6e733a703d22687474703a2f2f73636865"
    "6d61732e6f70656e786d6c666f726d6174732e6f72672f70726573656e746174696f"
    "6e6d6c2f323030362f6d61696e2220786d6c6e733a613d22687474703a2f2f736368"
    "656d61732e6f70656e786d6c666f726d6174732e6f72672f64726177696e676d6c2f"
    "323030362f6d61696e223e3c613a703e3c613a723e3c613a743e736c696465206f6e"
    "653c2f613a743e3c2f613a723e3c2f613a703e3c2f703a736c643e504b0102140314"
    "00000000000000210061a5bca5120000001200000013000000000000000000000080"
    "01000000005b436f6e74656e745f54797065735d2e786d6c504b0102140314000000"
    "000000002100895df6620b0100000b01000014000000000000000000000080014300"
    "00007070742f70726573656e746174696f6e2e786d6c504b01021403140000000000"
    "00002100917a3014de000000de0000001f0000000000000000000000800180010000"
    "7070742f5f72656c732f70726573656e746174696f6e2e786d6c2e72656c73504b01"
    "02140314000000000000002100c20a9eaebe000000be000000150000000000000000"
    "00000080019b0200007070742f736c696465732f736c696465312e786d6c504b0102"
    "140314000000000000002100240d5d2bbe000000be00000015000000000000000000"
    "000080018c0300007070742f736c696465732f736c696465322e786d6c504b050600"
    "00000005000500560100007d0400000000"
)
_OFFICE_ODT_TEXT = "Planted ODT\nalpha  beta"
_OFFICE_ODT_HEX = (
    "504b0304140000000000000021005ec6320c2700000027000000080000006d696d65"
    "747970656170706c69636174696f6e2f766e642e6f617369732e6f70656e646f6375"
    "6d656e742e74657874504b030414000000000000002100f496c4902f0100002f0100"
    "000b000000636f6e74656e742e786d6c3c6f66666963653a646f63756d656e742d63"
    "6f6e74656e7420786d6c6e733a6f66666963653d2275726e3a6f617369733a6e616d"
    "65733a74633a6f70656e646f63756d656e743a786d6c6e733a6f66666963653a312e"
    "302220786d6c6e733a746578743d2275726e3a6f617369733a6e616d65733a74633a"
    "6f70656e646f63756d656e743a786d6c6e733a746578743a312e30223e3c6f666669"
    "63653a626f64793e3c6f66666963653a746578743e3c746578743a683e506c616e74"
    "6564204f44543c2f746578743a683e3c746578743a703e616c7068613c746578743a"
    "7320746578743a633d2232222f3e626574613c2f746578743a703e3c2f6f66666963"
    "653a746578743e3c2f6f66666963653a626f64793e3c2f6f66666963653a646f6375"
    "6d656e742d636f6e74656e743e504b01021403140000000000000021005ec6320c27"
    "000000270000000800000000000000000000008001000000006d696d657479706550"
    "4b0102140314000000000000002100f496c4902f0100002f0100000b000000000000"
    "000000000080014d000000636f6e74656e742e786d6c504b05060000000002000200"
    "6f000000a50100000000"
)
_OFFICE_EPUB_TEXT = "Spine first.\n\nSpine second."
_OFFICE_EPUB_HEX = (
    "504b0304140000000000000021006f61ab2c1400000014000000080000006d696d65"
    "747970656170706c69636174696f6e2f657075622b7a6970504b0304140000000000"
    "0000210017950c69ba000000ba000000160000004d4554412d494e462f636f6e7461"
    "696e65722e786d6c3c636f6e7461696e657220786d6c6e733d2275726e3a6f617369"
    "733a6e616d65733a74633a6f70656e646f63756d656e743a786d6c6e733a636f6e74"
    "61696e6572223e3c726f6f7466696c65733e3c726f6f7466696c652066756c6c2d70"
    "6174683d224f454250532f636f6e74656e742e6f706622206d656469612d74797065"
    "3d226170706c69636174696f6e2f6f656270732d7061636b6167652b786d6c222f3e"
    "3c2f726f6f7466696c65733e3c2f636f6e7461696e65723e504b0304140000000000"
    "000021004b54d6ac0c0100000c010000110000004f454250532f636f6e74656e742e"
    "6f70663c7061636b61676520786d6c6e733d22687474703a2f2f7777772e69647066"
    "2e6f72672f323030372f6f7066223e3c6d616e69666573743e3c6974656d2069643d"
    "2263302220687265663d226f6e652e7868746d6c22206d656469612d747970653d22"
    "6170706c69636174696f6e2f7868746d6c2b786d6c222f3e3c6974656d2069643d22"
    "63312220687265663d2274776f2e7868746d6c22206d656469612d747970653d2261"
    "70706c69636174696f6e2f7868746d6c2b786d6c222f3e3c2f6d616e69666573743e"
    "3c7370696e653e3c6974656d7265662069647265663d226330222f3e3c6974656d72"
    "65662069647265663d226331222f3e3c2f7370696e653e3c2f7061636b6167653e50"
    "4b0304140000000000000021007c94faf252000000520000000f0000004f45425053"
    "2f6f6e652e7868746d6c3c68746d6c20786d6c6e733d22687474703a2f2f7777772e"
    "77332e6f72672f313939392f7868746d6c223e3c626f64793e3c703e5370696e6520"
    "66697273742e3c2f703e3c2f626f64793e3c2f68746d6c3e504b0304140000000000"
    "0000210007a7407253000000530000000f0000004f454250532f74776f2e7868746d"
    "6c3c68746d6c20786d6c6e733d22687474703a2f2f7777772e77332e6f72672f3139"
    "39392f7868746d6c223e3c626f64793e3c703e5370696e65207365636f6e642e3c2f"
    "703e3c2f626f64793e3c2f68746d6c3e504b01021403140000000000000021006f61"
    "ab2c14000000140000000800000000000000000000008001000000006d696d657479"
    "7065504b010214031400000000000000210017950c69ba000000ba00000016000000"
    "000000000000000080013a0000004d4554412d494e462f636f6e7461696e65722e78"
    "6d6c504b01021403140000000000000021004b54d6ac0c0100000c01000011000000"
    "00000000000000008001280100004f454250532f636f6e74656e742e6f7066504b01"
    "021403140000000000000021007c94faf252000000520000000f0000000000000000"
    "0000008001630200004f454250532f6f6e652e7868746d6c504b0102140314000000"
    "00000000210007a7407253000000530000000f00000000000000000000008001e202"
    "00004f454250532f74776f2e7868746d6c504b050600000000050005003301000062"
    "0300000000"
)


def q41_office_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.operators.office import extract_office_text

    # ck <= 3000: same scaling cap as the 'pdf' sub-gate — each row is
    # a full Python RTF tokenization and sf0.1 would otherwise pay 5x
    # the bench cost for zero added coverage
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 3000
    )
    cs = _s(F.col("c_custkey"))
    rtf_str = F.concat(
        F.lit("{\\rtf1\\ansi Office report for customer "),
        cs,
        F.lit("\\par Caf\\u233 ?-line{\\b  two} "),
        cs,
        F.lit("\\tab end{\\*\\hidden secret "),
        cs,
        F.lit("}}"),
    )
    per_cust = cust.select(
        F.concat(F.lit("r"), cs).alias("k"),
        F.encode(rtf_str, "UTF-8").alias("content"),
    )
    planted = None
    for key, hexs in (
        ("docx", _OFFICE_DOCX_HEX),
        ("xlsx", _OFFICE_XLSX_HEX),
        ("pptx", _OFFICE_PPTX_HEX),
        ("odt", _OFFICE_ODT_HEX),
        ("epub", _OFFICE_EPUB_HEX),
    ):
        row = spark.range(1).select(
            F.lit(key).alias("k"),
            F.unhex(F.lit(hexs)).alias("content"),
        )
        planted = row if planted is None else planted.unionByName(row)
    docs = per_cust.unionByName(planted)
    return extract_office_text(docs, errors="raise").select(
        "k", F.col("text").alias("v_s")
    )


# Sub-gate 'chs' (new in r12): charset detection + transcoding
# (operators/charset.py). Entirely SQL-assembled — Spark's encode()
# emits real ISO-8859-1 / UTF-16LE / UTF-16BE byte streams per
# customer, plus a BOM spliced on with unhex||concat — so every rung
# of the detection ladder (strict-UTF-8 probe, 8-bit fallback,
# NUL-pattern UTF-16 sniff, BOM override) runs against bytes whose
# expected decode is analytic in the oracle.
def q41_charset_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.operators.charset import decode_text

    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 3000
    )
    cs = _s(F.col("c_custkey"))
    s = F.concat(F.lit("Résumé Nº "), cs)

    def enc(prefix: str, content):
        return cust.select(
            F.concat(F.lit(prefix), cs).alias("k"),
            content.alias("content"),
        )

    docs = (
        enc("c8", F.encode(s, "UTF-8"))
        .unionByName(enc("cl", F.encode(s, "ISO-8859-1")))
        .unionByName(enc("cw", F.encode(s, "UTF-16LE")))  # BOM-less
        .unionByName(
            enc(
                "cb",
                F.concat(
                    F.unhex(F.lit("FEFF")), F.encode(s, "UTF-16BE")
                ),
            )
        )
    )
    return decode_text(docs).select(
        "k", F.concat_ws("|", "text", "encoding").alias("v_s")
    )


def q41_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.operators.pdf import extract_pdf_text

    # ck <= 3000: the gate scales with sf up to the cap (sf0.001: 150
    # rows, sf0.01 — the driver's correctness scale — 1500, all below
    # it); beyond that each row is a full Python PDF parse and the
    # bench would pay linearly for no added coverage
    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 3000
    )
    k = F.col("c_custkey")
    cs = _s(k)
    content = F.concat(
        F.lit("BT /F1 12 Tf 72 720 Td (Report for customer "),
        cs,
        F.lit(") Tj 0 -14 Td [(Second) -250 (line) -10 ( for ) ("),
        cs,
        F.lit(")] TJ ET"),
    )
    pdf_str = F.concat(
        F.lit(
            "%PDF-1.4\n"
            "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            "2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            "3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
            "<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
            "4 0 obj\n<< /Length "
        ),
        F.length(content).cast("string"),  # all-ASCII: chars == bytes
        F.lit(" >>\nstream\n"),
        content,
        F.lit(
            "\nendstream\nendobj\n"
            "5 0 obj\n<< /Type /Font /Subtype /Type1 "
            "/BaseFont /Helvetica >>\nendobj\n"
            "trailer\n<< /Root 1 0 R >>\n"
        ),
    )
    per_cust = cust.select(
        F.concat(F.lit("f"), cs).alias("k"),
        F.encode(pdf_str, "UTF-8").alias("content"),
    )
    planted = spark.range(1).select(
        F.lit("flate").alias("k"),
        F.unhex(F.lit(_PDF_FLATE_HEX)).alias("content"),
    )
    # second planted payload (r11): an LZWDecode content stream — the
    # legacy-PDF compressor, generated by the test suite's spec encoder
    # and pinned alongside the Flate one
    planted_lzw = spark.range(1).select(
        F.lit("lzw").alias("k"),
        F.unhex(F.lit(_PDF_LZW_HEX)).alias("content"),
    )
    # third planted payload (r12): rev-3 RC4 + Flate — exercises the
    # standard security handler's empty-user-password decrypt in-gate
    planted_enc = spark.range(1).select(
        F.lit("enc").alias("k"),
        F.unhex(F.lit(_PDF_ENC_HEX)).alias("content"),
    )
    docs = (
        per_cust.unionByName(planted)
        .unionByName(planted_lzw)
        .unionByName(planted_enc)
    )
    return extract_pdf_text(docs, errors="raise").select(
        "k", F.col("text").alias("v_s")
    )


def q41_warc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.functions.html import html_to_text
    from data_governance_spark.sources.warc import warc_documents

    out_dir = _staged_warc_dir(spark, sf_dir)
    docs = warc_documents(spark, os.path.join(out_dir, "a.warc"))
    return docs.select(
        F.col("url").alias("k"), html_to_text("text").alias("v_s")
    )


# --------------------------------------------------------------------------
@qdef(
    QUERIES,
    "q41_xml_source_sink",
    oracle="""
    SELECT 'src' AS gate, 'd' || CAST(c_custkey AS VARCHAR) AS k,
           (CASE WHEN c_custkey <= 100 THEN 'a.xml' ELSE 'b.xml' END)
             || '|en|pt|N' || CAST(c_custkey AS VARCHAR) AS v_s,
           CAST(NULL AS DOUBLE) AS v_d
    FROM customer
    WHERE c_custkey <= 200 AND c_custkey % 3 <> 0
    UNION ALL
    SELECT 'warc', 'http://ex.com/r' || CAST(c_custkey AS VARCHAR),
           CASE WHEN c_custkey % 9 = 0 THEN ''
                ELSE 'Hello & d''accord ' || CAST(c_custkey AS VARCHAR)
                     || chr(10) || 'Tail...' END,
           CAST(NULL AS DOUBLE)
    FROM customer WHERE c_custkey <= 150
    UNION ALL
    SELECT 'warc', 'http://ex.com/w' || CAST(c_custkey AS VARCHAR),
           'wet text ' || CAST(c_custkey AS VARCHAR), CAST(NULL AS DOUBLE)
    FROM customer WHERE c_custkey <= 150 AND c_custkey % 2 = 0
    UNION ALL
    SELECT 'ufil', 'u' || CAST(c_custkey AS VARCHAR),
           CASE WHEN c_custkey % 17 = 0 THEN ''
                ELSE 'http://ok' || CAST(c_custkey % 4 AS VARCHAR)
                     || '.example.org/p' || CAST(c_custkey AS VARCHAR) END,
           CAST(NULL AS DOUBLE)
    FROM customer
    WHERE c_custkey % 17 = 0
       OR (c_custkey % 11 <> 0 AND c_custkey % 7 <> 0
           AND c_custkey % 13 <> 0)
    UNION ALL
    SELECT 'dom', 'h' || CAST(c_custkey AS VARCHAR),
           'Main article content paragraph number '
           || CAST(c_custkey AS VARCHAR)
           || ' has plenty of characters to pass the length rule easily.'
           || CASE WHEN c_custkey % 3 = 0
                   THEN chr(10) || 'Aside ' || CAST(c_custkey AS VARCHAR)
                        || '.'
                   ELSE '' END
           || chr(10) || 'Second substantial paragraph for document '
           || CAST(c_custkey AS VARCHAR)
           || ' also comfortably exceeds the minimum block length.',
           CAST(NULL AS DOUBLE)
    FROM customer
    UNION ALL
    SELECT 'pdf', 'f' || CAST(c_custkey AS VARCHAR),
           'Report for customer ' || CAST(c_custkey AS VARCHAR)
           || chr(10) || 'Second line for ' || CAST(c_custkey AS VARCHAR),
           CAST(NULL AS DOUBLE)
    FROM customer WHERE c_custkey <= 3000
    UNION ALL
    SELECT 'pdf', 'flate',
           'Planted “café” payload' || chr(10) || 'kerned-pair gap'
           || chr(10) || 'CMaptu',
           CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'pdf', 'lzw',
           'Legacy LZW stream decoded' || chr(10) || 'kerned gap',
           CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'pdf', 'enc',
           'RC4 empty-password decrypt' || chr(10) || 'permission bits only',
           CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'office', 'r' || CAST(c_custkey AS VARCHAR),
           'Office report for customer ' || CAST(c_custkey AS VARCHAR)
           || chr(10) || 'Café-line two ' || CAST(c_custkey AS VARCHAR)
           || chr(9) || 'end',
           CAST(NULL AS DOUBLE)
    FROM customer WHERE c_custkey <= 3000
    UNION ALL
    SELECT 'office', 'docx',
           'Planted docx body' || chr(10) || 'cell' || chr(9) || 'aligned',
           CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'office', 'xlsx', 'planted sheet' || chr(9) || '314',
           CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'office', 'pptx', 'slide one' || chr(10) || 'slide two',
           CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'office', 'odt', 'Planted ODT' || chr(10) || 'alpha  beta',
           CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'office', 'epub',
           'Spine first.' || chr(10) || chr(10) || 'Spine second.',
           CAST(NULL AS DOUBLE)
    UNION ALL
    SELECT 'chs', pre || CAST(c_custkey AS VARCHAR),
           'Résumé Nº ' || CAST(c_custkey AS VARCHAR) || '|' || enc,
           CAST(NULL AS DOUBLE)
    FROM customer,
         (SELECT * FROM (VALUES ('c8', 'utf-8'), ('cl', 'cp1252'),
                                ('cw', 'utf-16-le'), ('cb', 'utf-16-be'))
          AS t(pre, enc))
    WHERE c_custkey <= 3000
    UNION ALL
    SELECT 'ser', 'D' || cs,
      '<doc boost="' || CAST(ck % 7 AS VARCHAR) || '">' || chr(10)
      || '  <field name="aa_arr">v1-' || cs || '</field>' || chr(10)
      || '  <field name="aa_arr">v&lt;2&gt;&amp;' || cs || '</field>' || chr(10)
      || '  <field name="id">D' || cs || '</field>' || chr(10)
      || '  <field name="mm">base' || cs || '</field>' || chr(10)
      || '  <field name="mm_en">e1</field>' || chr(10)
      || CASE WHEN ck % 2 = 0
              THEN '  <field name="mm_en">e2</field>' || chr(10) ELSE '' END
      || CASE WHEN ck % 5 <> 0
              THEN '  <field name="sc">S"x"' || cs || '</field>' || chr(10)
              ELSE '' END
      || '  <field name="k&quot;' || CAST(ck % 2 AS VARCHAR) || '">dv' || cs
      || '</field>' || chr(10)
      || '  <field name="kc">cv' || cs || '</field>' || chr(10)
      || '</doc>',
      CAST(NULL AS DOUBLE)
    FROM (SELECT c_custkey AS ck, CAST(c_custkey AS VARCHAR) AS cs
          FROM customer)
    """,
    doc="merged gate (r5/r6 driver-budget): S8-S11 Solr-XML source "
    "(streaming parse, repeated-field lists, instance filter, first-in-"
    "file dedup, glob listing; ex-q41) + S12 XML sink serialization "
    "(sorted fields, P8 pruning, text/attr escaping, prefixed + dynamic "
    "maps, invalid-char strip, boost; ex-q42) + WARC source composed "
    "with html_to_text (record split, type filter, http_body envelope "
    "strip incl. the 204 empty-body case, tag/entity/whitespace "
    "extraction; new in r6) + URL/domain filtering (suffix-aware "
    "blocklist, pattern tier, NULL-url semantics; new in r6) + "
    "DOM-tier main-content extraction (operators/htmldom.py, "
    "Kohlschuetter 2010 length+link-density with the jusText glue "
    "rule: chrome subtrees dropped, link rows dropped, sandwiched "
    "short asides glued; new in r10) + PDF text extraction "
    "(operators/pdf.py: per-customer PDFs assembled in SQL through "
    "the real object-scan/page-tree/Tj/TJ path, plus a planted "
    "Flate + WinAnsi + ToUnicode-CMap payload pinned by "
    "tests/test_pdf.py; new in r11; plus a planted rev-3 RC4 "
    "ENCRYPTED payload decrypted with the empty user password "
    "through the standard security handler; new in r12) + "
    "office-document extraction (operators/office.py: per-customer "
    "RTF files assembled in SQL through the real control-word "
    "tokenizer — groups, unicode escapes with fallback skipping, "
    "ignorable destinations — plus five planted zip-container "
    "payloads, docx/xlsx/pptx/odt/epub, covering workbook/"
    "presentation/spine ordering through rels, shared strings, ODF "
    "run-length spaces and the XHTML chapter tier; payload bytes "
    "pinned by tests/test_office.py::test_gate_payload_pin; new in "
    "r12) + charset detection (operators/charset.py: the "
    "BOM > NUL-pattern-UTF-16 > strict-UTF-8 > 8-bit detection "
    "ladder over per-customer byte streams ASSEMBLED IN SQL with "
    "encode()/unhex — all four encoding classes analytic in the "
    "oracle; new in r12)",
)
def q41_xml_source_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    nul_d = F.lit(None).cast("double")
    src = q41_solr_xml_roundtrip(spark, sf_dir).select(
        F.lit("src").alias("gate"),
        F.col("id").alias("k"),
        F.concat_ws("|", "file", "la_s", "note").alias("v_s"),
        nul_d.alias("v_d"),
    )
    ser = q42_xml_sink_serialization(spark, sf_dir).select(
        F.lit("ser").alias("gate"),
        F.col("id").alias("k"),
        F.col("xml").alias("v_s"),
        nul_d.alias("v_d"),
    )
    warc = q41_warc_extract(spark, sf_dir).select(
        F.lit("warc").alias("gate"), "k", "v_s", nul_d.alias("v_d")
    )
    ufil = q41_url_filtering(spark, sf_dir).select(
        F.lit("ufil").alias("gate"), "k", "v_s", nul_d.alias("v_d")
    )
    dom = q41_dom_extract(spark, sf_dir).select(
        F.lit("dom").alias("gate"), "k", "v_s", nul_d.alias("v_d")
    )
    pdf = q41_pdf_extract(spark, sf_dir).select(
        F.lit("pdf").alias("gate"), "k", "v_s", nul_d.alias("v_d")
    )
    office = q41_office_extract(spark, sf_dir).select(
        F.lit("office").alias("gate"), "k", "v_s", nul_d.alias("v_d")
    )
    chs = q41_charset_detect(spark, sf_dir).select(
        F.lit("chs").alias("gate"), "k", "v_s", nul_d.alias("v_d")
    )
    return (
        src.unionByName(ser)
        .unionByName(warc)
        .unionByName(ufil)
        .unionByName(dom)
        .unionByName(pdf)
        .unionByName(office)
        .unionByName(chs)
    )


# --------------------------------------------------------------------------
# Sub-gate 'h' (ex-q43): the REST harvester (S1 page fan-out, S2
# watermark params, S5 partitioned fetch, page-level error capture)
# composed with S6's upsert merge. The injected fetch is deterministic:
# every third page (offset//50 % 3 == 1) raises (those records must be
# ABSENT, not fail the job); records carry the watermark param to prove
# params plumb through; ids divisible by 4 arrive in two versions and
# the upsert must keep the newer. total_count derives from `customer`
# so the gate scales with sf. Reference: tasks_for_01.py:96-191.
def q43_rest_harvest_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from datetime import date

    from pyspark.sql import types as T

    from data_governance_spark.sources.rest_source import (
        harvest_pages,
        incremental_params,
        records_df,
        upsert_latest,
    )

    total = min(table(spark, sf_dir, "customer").count(), 500)

    def fetch(offset: int, limit: int, params: dict) -> list[dict]:
        if (offset // 50) % 3 == 1:
            raise RuntimeError(f"boom at {offset}")
        wm = params["updated_time__gte"]
        out = []
        for i in range(offset, min(offset + limit, total)):
            out.append({"id": i, "updated_time": "2025-01-01", "v": wm})
            if i % 4 == 0:  # a newer version the upsert must prefer
                out.append({"id": i, "updated_time": "2025-02-02", "v": wm})
        return out

    pages = harvest_pages(
        spark,
        fetch,
        total_count=total,
        limit=50,
        params=incremental_params(date(2025, 8, 1)),
    )
    recs = records_df(
        pages,
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("updated_time", T.StringType()),
                T.StructField("v", T.StringType()),
            ]
        ),
    )
    return upsert_latest(recs)


# --------------------------------------------------------------------------
# Sub-gate 'pivot' (ex-q44): the served-layer chart pivot (S14 JSON
# artifact body, also the engine side of the S15 HTML report): long
# metrics (type, region, name, year, count) -> wide per-year rows with
# one column per entity, sorted by year (O1). Absent (year, entity)
# pairs stay NULL (the reference emits only present entities per year).
# Reference: tmgl_regions/tasks_for_export/journal.py:148-190.
def q44_chart_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.metrics.runner import MetricSpec, run_metric
    from data_governance_spark.sinks.json_sink import pivot_metric

    ev = table(spark, sf_dir, "events").withColumn(
        "dp", F.date_format("ts", "yyyy")
    )
    metrics = run_metric(ev, MetricSpec(name="event", entity_col="event_type"))
    return pivot_metric(metrics, "event")


# --------------------------------------------------------------------------
# Sub-gates 'range' (S3) and 'ids' (S4), new in r5: the two remaining
# extract modes driven through the same harvest_pages machinery with
# deterministic fetches that echo the mode's params back into the
# records — proving date_range_params / id_list_params plumb through
# the partitioned fan-out. Reference: 01_*.py extract modes.
def s3_s4_param_harvests(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from data_governance_spark.sources.rest_source import (
        date_range_params,
        harvest_pages,
        id_list_params,
        records_df,
    )

    total = min(table(spark, sf_dir, "customer").count(), 120)

    def fetch_range(offset: int, limit: int, params: dict) -> list[dict]:
        span = params["updated_time__gte"] + ".." + params["updated_time__lte"]
        return [
            {"id": f"r{i}", "v": span}
            for i in range(offset, min(offset + limit, total))
        ]

    schema = T.StructType(
        [T.StructField("id", T.StringType()), T.StructField("v", T.StringType())]
    )
    rng = records_df(
        harvest_pages(
            spark,
            fetch_range,
            total_count=total,
            limit=40,
            params=date_range_params("2025-03-01", "2025-03-31"),
        ),
        schema,
    )
    wanted = ["alpha", "beta", "gamma"]

    def fetch_ids(offset: int, limit: int, params: dict) -> list[dict]:
        ids = params["ids"]
        return [{"id": f"i:{x}", "v": "ok"} for x in ids[offset : offset + limit]]

    by_id = records_df(
        harvest_pages(
            spark,
            fetch_ids,
            total_count=len(wanted),
            limit=2,
            params=id_list_params(wanted),
        ),
        schema,
    )
    return rng.unionByName(by_id)


# --------------------------------------------------------------------------
# Sub-gate 'jsonl' (new in r6): the JSONL source round-trip
# (sources/jsonl.py) — write_jsonl shards a customer-derived corpus,
# jsonl_documents reads it back after a corrupt line and a
# type-mismatched line are appended to the directory; well-formed rows
# and the quarantine count are matched analytically.
def q43_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.queries.staging import staged_tmpdir
    from data_governance_spark.sources.jsonl import (
        jsonl_documents,
        write_jsonl,
    )

    def build(out_dir: str) -> None:
        cust = (
            table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") <= 120)
            .select(
                F.col("c_custkey").alias("doc_id"),
                F.concat(F.lit("http://j/"), _s(F.col("c_custkey"))).alias(
                    "url"
                ),
                F.lit("en").alias("lang"),
                F.lit("jgate").alias("source"),
                F.concat(F.lit("body "), _s(F.col("c_custkey"))).alias(
                    "text"
                ),
            )
        )
        data = os.path.join(out_dir, "data")
        write_jsonl(cust, data, num_files=2)
        with open(os.path.join(data, "zz_bad.jsonl"), "w") as f:
            f.write('{"doc_id": 7777, "text": "trunc...\n')
            f.write('{"doc_id": "NaN", "text": "bad type"}\n')

    work = staged_tmpdir(("q43jsonl", sf_dir), build, prefix="dg_q43j_")
    corpus = jsonl_documents(spark, os.path.join(work, "data"))
    rows = corpus.docs.select(
        F.concat(F.lit("j"), F.col("doc_id").cast("string")).alias("k"),
        F.concat_ws("|", "url", "lang", "source", "text").alias("v_s"),
        F.lit(None).cast("double").alias("v_d"),
    )
    badn = corpus.bad.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("quarantine").alias("k"),
        F.lit(None).cast("string").alias("v_s"),
        F.col("n").cast("double").alias("v_d"),
    )
    return rows.unionByName(badn)


# --------------------------------------------------------------------------
# Sub-gate 'csv' (new in r7): the CSV source round-trip
# (sources/csvq.py) — write_csv shards, csv_documents reads back after
# an un-castable row, a short row and an extra-column row are appended;
# well-formed rows and the quarantine count matched analytically.
def q43_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from data_governance_spark.queries.staging import staged_tmpdir
    from data_governance_spark.sources.csvq import csv_documents, write_csv

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("lang", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )

    def build(out_dir: str) -> None:
        cust = (
            table(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") <= 100)
            .select(
                F.col("c_custkey").alias("doc_id"),
                F.lit("en").alias("lang"),
                F.concat(F.lit("row "), _s(F.col("c_custkey"))).alias(
                    "text"
                ),
            )
        )
        data = os.path.join(out_dir, "data")
        write_csv(cust, data, num_files=2, header=False)
        with open(os.path.join(data, "zz_bad.csv"), "w") as f:
            f.write("notanumber,en,broken id\n")
            f.write("8888,en\n")          # short row
            f.write("9999,en,x,extra\n")  # long row

    work = staged_tmpdir(("q43csv", sf_dir), build, prefix="dg_q43c_")
    corpus = csv_documents(
        spark, os.path.join(work, "data"), schema, header=False
    )
    rows = corpus.docs.select(
        F.concat(F.lit("c"), F.col("doc_id").cast("string")).alias("k"),
        F.concat_ws("|", "lang", "text").alias("v_s"),
        F.lit(None).cast("double").alias("v_d"),
    )
    badn = corpus.bad.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit("quarantine").alias("k"),
        F.lit(None).cast("string").alias("v_s"),
        F.col("n").cast("double").alias("v_d"),
    )
    return rows.unionByName(badn)


# Sub-gate 'orc' (new in r7): the second columnar format — write an
# orders slice as ORC through Spark's native writer, read it back, and
# aggregate; the oracle recomputes from the parquet ground truth, so a
# value changed anywhere in the ORC write/read path fails the hash.
def q43_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.queries.staging import staged_tmpdir

    def build(out_dir: str) -> None:
        table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") <= 2000
        ).write.mode("overwrite").orc(os.path.join(out_dir, "data"))

    work = staged_tmpdir(("q43orc", sf_dir), build, prefix="dg_q43o_")
    back = spark.read.orc(os.path.join(work, "data"))
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        (
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast(
                    "double"
                ),
                2,
            )
            + F.lit(0.0)
        ).alias("s"),
    )


# Sub-gate 'zo' (new in r7): the Z-order layout key
# (operators/zorder.py) with FIXED bucket boundaries, so the Morton
# interleave is stated bit-for-bit by the oracle: bucket = count of
# boundaries <= value (both engines compare the same double), key =
# sum of disjoint bit shifts. Column order is zorder_key's sorted()
# contract: o_custkey lane 0, o_totalprice lane 1.
_ZO_BITS = 4
_ZO_BOUNDS = {
    "o_custkey": [float(100 * (i + 1)) for i in range(15)],
    "o_totalprice": [float(30000 * (i + 1)) for i in range(15)],
}


def _zo_bucket_sql(col: str) -> str:
    arr = ", ".join(str(b) for b in _ZO_BOUNDS[col])
    return (
        f"len(list_filter([{arr}], b -> b <= CAST({col} AS DOUBLE)))"
    )


def _zo_key_sql() -> str:
    terms = []
    stride = len(_ZO_BOUNDS)  # lane stride derived, same as zorder_key
    for j, col in enumerate(sorted(_ZO_BOUNDS)):
        b = _zo_bucket_sql(col)
        for i in range(_ZO_BITS):
            terms.append(f"((({b} >> {i}) & 1) << {i * stride + j})")
    return " + ".join(terms)


# --------------------------------------------------------------------------
# Sub-gate 'arc' (new in r12): archive explosion
# (operators/archives.py). The per-customer tier is the showpiece: a
# complete STORED ZIP is ASSEMBLED IN SPARK SQL — zip's only
# non-analytic header fields are CRC-32 and byte lengths, and Spark
# has crc32()/length(), so the little-endian fields are built by
# hex-pair reversal and the REAL zipfile-backed reader must accept
# every archive (CRC verified by construction). Two planted payloads
# cover what SQL cannot: a deterministic tar.gz (two regular files
# plus a dir and a symlink that must NOT emit rows) and a
# traditional-PKZIP-encrypted member whose row must be the typed
# PER-MEMBER error while its sibling member extracts fine. Pinned by
# tests/test_archives.py::test_gate_payload_pin.
_ARC_TGZ_HEX = (
    "1f8b0800000000000203edd6c10ac2300c80e13eca9e606b67379fc7b90a43d7415b"
    "b18f6fd94598074fadcafeef92100a398490c666b1a60e31887c64d26bbdc6641ba5"
    "54fa95aff5637750a292a280bb0f27975a8a7dba4cce876a36f3609cc0eec4267f8f"
    "8ffbff96f7ad4afbdfb1ffd9dd267bfdb9f92ba9a516551b0b1ca79dcf3f3c967a98"
    "ec77e7afbaedfd6fd373ee7f01de9c173bf20100000000000000000000807ff70431"
    "febb8a00280000"
)
_ARC_ENCZIP_HEX = (
    "504b030414000000000000002100cda328a40a0000000a00000009000000706c6169"
    "6e2e747874706c61696e20626f6479504b0304140001000000000021007747df8e0a"
    "0000000a0000000a0000007365637265742e74787478787878787878787878504b01"
    "02140314000000000000002100cda328a40a0000000a000000090000000000000000"
    "000000800100000000706c61696e2e747874504b0102140314000100000000002100"
    "7747df8e0a0000000a0000000a000000000000000000000080013100000073656372"
    "65742e747874504b050600000000020002006f000000630000000000"
)


def _le_hex(col, n: int):
    """n-byte little-endian hex of an integer column (zip headers)."""
    h = F.lpad(F.lower(F.hex(col)), 2 * n, "0")
    return F.concat(
        *[F.substring(h, 2 * i + 1, 2) for i in reversed(range(n))]
    )


def q43_archive_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from data_governance_spark.operators.archives import explode_archives

    cust = table(spark, sf_dir, "customer").filter(
        F.col("c_custkey") <= 3000
    )
    cs = _s(F.col("c_custkey"))
    data_bin = F.encode(
        F.concat(F.lit("member for customer "), cs), "UTF-8"
    )
    size = F.length(data_bin)
    crc = F.crc32(data_bin)
    name_hex = "6d2e747874"  # "m.txt"
    # STORED zip: local header + data + central directory + EOCD.
    # Fixed fields: version 20, no flags, method 0, zeroed date/time;
    # name length 5; central-directory size is the constant 46+5=51.
    zip_hex = F.concat(
        F.lit("504b0304" + "1400" + "0000" + "0000" + "0000" + "0000"),
        _le_hex(crc, 4), _le_hex(size, 4), _le_hex(size, 4),
        F.lit("0500" + "0000" + name_hex),
        F.lower(F.hex(data_bin)),
        F.lit(
            "504b0102" + "1403" + "1400" + "0000" + "0000" + "0000"
            + "0000"
        ),
        _le_hex(crc, 4), _le_hex(size, 4), _le_hex(size, 4),
        F.lit(
            "0500" + "0000" + "0000" + "0000" + "0000" + "00000000"
            + "00000000" + name_hex
        ),
        F.lit("504b0506" + "0000" + "0000" + "0100" + "0100"),
        _le_hex(F.lit(51), 4),
        _le_hex(size + 35, 4),  # LFH(30) + name(5) + data
        F.lit("0000"),
    )
    per_cust = cust.select(
        F.concat(F.lit("a"), cs).alias("doc_id"),
        F.unhex(zip_hex).alias("content"),
    )
    tgz = spark.range(1).select(
        F.lit("tgz").alias("doc_id"),
        F.unhex(F.lit(_ARC_TGZ_HEX)).alias("content"),
    )
    encz = spark.range(1).select(
        F.lit("enc").alias("doc_id"),
        F.unhex(F.lit(_ARC_ENCZIP_HEX)).alias("content"),
    )
    ex = explode_archives(per_cust.unionByName(tgz).unionByName(encz))
    return ex.select(
        F.concat_ws(":", "doc_id", "member").alias("k"),
        F.concat_ws(
            "|",
            "member",
            F.coalesce(F.col("size").cast("string"), F.lit("ERR")),
            F.coalesce(F.decode(F.col("content"), "UTF-8"), F.col("err")),
        ).alias("v_s"),
    )


@qdef(
    QUERIES,
    "q43_harvest_serving",
    oracle=f"""
    WITH t AS (SELECT CAST(LEAST(count(*), 500) AS BIGINT) AS n FROM customer),
    ids AS (SELECT unnest(range(0, (SELECT n FROM t))) AS id),
    t2 AS (SELECT CAST(LEAST(count(*), 120) AS BIGINT) AS n FROM customer),
    ids2 AS (SELECT unnest(range(0, (SELECT n FROM t2))) AS id)
    SELECT 'h' AS gate, CAST(id AS VARCHAR) AS k,
           (CASE WHEN id % 4 = 0 THEN '2025-02-02' ELSE '2025-01-01' END)
             || '|2025-07-22' AS v_s,
           CAST(NULL AS DOUBLE) AS v_d
    FROM ids WHERE (id // 50) % 3 <> 1
    UNION ALL
    SELECT 'pivot', CAST(ano AS VARCHAR),
           COALESCE(CAST(click AS VARCHAR), 'None') || '|'
             || COALESCE(CAST(error AS VARCHAR), 'None') || '|'
             || COALESCE(CAST(purchase AS VARCHAR), 'None') || '|'
             || COALESCE(CAST(signup AS VARCHAR), 'None') || '|'
             || COALESCE(CAST(view AS VARCHAR), 'None'),
           CAST(NULL AS DOUBLE)
    FROM (
      SELECT CAST(strftime(ts, '%Y') AS INT) AS ano,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
        CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error,
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
          AS purchase,
        CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view
      FROM events GROUP BY 1
    )
    UNION ALL
    SELECT 'range', 'r' || CAST(id AS VARCHAR), '2025-03-01..2025-03-31',
           CAST(NULL AS DOUBLE)
    FROM ids2
    UNION ALL
    SELECT 'ids', 'i:' || x, 'ok', CAST(NULL AS DOUBLE)
    FROM (SELECT unnest(['alpha', 'beta', 'gamma']) AS x)
    UNION ALL
    SELECT 'jsonl', 'j' || CAST(c_custkey AS VARCHAR),
           'http://j/' || CAST(c_custkey AS VARCHAR) || '|en|jgate|body '
             || CAST(c_custkey AS VARCHAR),
           CAST(NULL AS DOUBLE)
    FROM customer WHERE c_custkey <= 120
    UNION ALL
    SELECT 'jsonl', 'quarantine', CAST(NULL AS VARCHAR), 2.0
    UNION ALL
    SELECT 'csv', 'c' || CAST(c_custkey AS VARCHAR),
           'en|row ' || CAST(c_custkey AS VARCHAR), CAST(NULL AS DOUBLE)
    FROM customer WHERE c_custkey <= 100
    UNION ALL
    SELECT 'csv', 'quarantine', CAST(NULL AS VARCHAR), 3.0
    UNION ALL
    SELECT 'orc', o_orderpriority || ':n', CAST(NULL AS VARCHAR),
           CAST(count(*) AS DOUBLE)
    FROM orders WHERE o_orderkey <= 2000 GROUP BY o_orderpriority
    UNION ALL
    SELECT 'orc', o_orderpriority || ':s', CAST(NULL AS VARCHAR),
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
             + 0.0
    FROM orders WHERE o_orderkey <= 2000 GROUP BY o_orderpriority
    UNION ALL
    SELECT 'zo', 'z' || CAST(o_orderkey AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST({_zo_key_sql()} AS DOUBLE)
    FROM orders WHERE o_orderkey <= 1000
    UNION ALL
    SELECT 'arc', 'a' || CAST(c_custkey AS VARCHAR) || ':m.txt',
           'm.txt|'
           || CAST(20 + length(CAST(c_custkey AS VARCHAR)) AS VARCHAR)
           || '|member for customer ' || CAST(c_custkey AS VARCHAR),
           CAST(NULL AS DOUBLE)
    FROM customer WHERE c_custkey <= 3000
    UNION ALL
    SELECT 'arc', k, v, CAST(NULL AS DOUBLE)
    FROM (VALUES ('tgz:x/one.txt', 'x/one.txt|12|first member'),
                 ('tgz:two.bin', 'two.bin|13|second member'),
                 ('enc:plain.txt', 'plain.txt|10|plain body'),
                 ('enc:secret.txt', 'secret.txt|ERR|ArchiveEncryptedError'))
         AS t(k, v)
    """,
    doc="merged gate (r5 driver-budget): S1-S5 paginated REST harvest "
    "(error pages captured, watermark params) + S6 upsert merge "
    "(ex-q43) + S14/S15 served-layer pivot (long metrics -> wide year "
    "rows, NULL for absent entities, year-sorted O1; ex-q44) + S3 "
    "date-range and S4 id-list extract params + JSONL source/sink "
    "round-trip with corrupt-line quarantine (sources/jsonl.py; new "
    "in r6) + CSV source/sink round-trip with corrupt-row quarantine "
    "(sources/csvq.py; new in r7) + ORC columnar round-trip via "
    "Spark's native writer/reader (new in r7) + the Z-order (Morton) "
    "layout key with fixed bucket boundaries, bit-for-bit vs the "
    "oracle (operators/zorder.py; new in r7) + archive explosion "
    "(operators/archives.py: per-customer STORED ZIPs assembled IN "
    "SQL via crc32()/length() and read back through the real "
    "zipfile-backed member enumerator, plus a planted tar.gz whose "
    "dir/symlink entries must not emit rows and an encrypted-member "
    "zip whose failure must be typed per member; new in r12)",
)
def q43_harvest_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    nul_d = F.lit(None).cast("double")
    h = q43_rest_harvest_upsert(spark, sf_dir).select(
        F.lit("h").alias("gate"),
        F.col("id").cast("string").alias("k"),
        F.concat_ws("|", "updated_time", "v").alias("v_s"),
        nul_d.alias("v_d"),
    )
    piv = q44_chart_pivot(spark, sf_dir)
    cnt = lambda c: F.coalesce(F.col(c).cast("string"), F.lit("None"))  # noqa: E731
    piv_rows = piv.select(
        F.lit("pivot").alias("gate"),
        F.col("ano").cast("string").alias("k"),
        F.concat_ws(
            "|", cnt("click"), cnt("error"), cnt("purchase"), cnt("signup"),
            cnt("view"),
        ).alias("v_s"),
        nul_d.alias("v_d"),
    )
    params = s3_s4_param_harvests(spark, sf_dir).select(
        F.when(F.col("id").startswith("i:"), F.lit("ids"))
        .otherwise(F.lit("range"))
        .alias("gate"),
        F.col("id").alias("k"),
        F.col("v").alias("v_s"),
        nul_d.alias("v_d"),
    )
    jsonl = q43_jsonl_roundtrip(spark, sf_dir).select(
        F.lit("jsonl").alias("gate"), "k", "v_s", "v_d"
    )
    csvr = q43_csv_roundtrip(spark, sf_dir).select(
        F.lit("csv").alias("gate"), "k", "v_s", "v_d"
    )
    orc = melt_metrics(
        q43_orc_roundtrip(spark, sf_dir),
        F.col("o_orderpriority"),
        ("n", "s"),
        "orc",
    )
    # zo sub-gate: the Morton layout key with fixed boundaries
    from data_governance_spark.operators.zorder import zorder_key

    zo = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 1000)
        .select(
            F.lit("zo").alias("gate"),
            F.concat(F.lit("z"), F.col("o_orderkey").cast("string")).alias(
                "k"
            ),
            F.lit(None).cast("string").alias("v_s"),
            zorder_key(_ZO_BOUNDS, _ZO_BITS).cast("double").alias("v_d"),
        )
    )
    nul_d2 = F.lit(None).cast("double")
    arc = q43_archive_explode(spark, sf_dir).select(
        F.lit("arc").alias("gate"), "k", "v_s", nul_d2.alias("v_d")
    )
    return (
        h.unionByName(piv_rows)
        .unionByName(params)
        .unionByName(jsonl)
        .unionByName(csvr)
        .unionByName(orc)
        .unionByName(zo)
        .unionByName(arc)
    )
