"""URL / domain filtering for web corpora.

Every published web pipeline (C4, RefinedWeb, Dolma) drops documents by
source URL before content-level filtering: domain blocklists (spam,
adult, SEO farms), allowed-domain curation, and bad-extension /
bad-pattern URL rules. Spark-first shapes:

- ``extract_domain``: pure regexp projection (scheme/userinfo/port/path
  stripped, lowercased) — codegen, no UDF.
- ``filter_domains``: SUFFIX-aware domain matching. A blocklist entry
  ``spam.com`` must also match ``a.b.spam.com``, so each document's
  domain expands to its dot-suffix chain
  (``a.b.spam.com -> [a.b.c..., b.spam.com, spam.com]``; bounded — a
  hostname has a handful of labels) and is tested against the list.
  Two execution tiers, chosen by list size (the same trade
  metrics/runner makes with ``_INLINE_DIM_MAX``):
    * ``<= _INLINE_MAX`` entries: the list becomes a literal array and
      the test is ``arrays_overlap`` — a pure codegen row-local
      predicate, ZERO shuffle, the right plan for every real blocklist
      (they are curated lists, not corpora).
    * larger: explode the suffix chain, broadcast-semi-join the list,
      and anti/semi-join the matched ids back on ``id_col`` — one
      id-keyed shuffle, but no size limit.
- ``filter_url_patterns``: one combined regex alternation for the
  pattern tier (bad extensions, tracking paths) — a single codegen
  ``rlike`` per row regardless of pattern count.

Reference twin: none — training-data extension per SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://[user@]host[:port]/... -> host ; bare hosts pass through
_DOMAIN_RE = r"^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+).*$"

_INLINE_MAX = 10_000


def extract_domain(url_col) -> Column:
    """Lowercased host of a URL (scheme, userinfo, port, path, query
    stripped); empty string when the URL has no host."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(c, _DOMAIN_RE, 1))


def domain_suffixes(domain_col) -> Column:
    """``a.b.c`` -> ``[a.b.c, b.c, c]`` — every dot-suffix, so a parent
    domain in a list matches all its subdomains via plain equality."""
    c = F.col(domain_col) if isinstance(domain_col, str) else domain_col
    parts = F.split(c, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(0), n - 1),
        lambda i: F.array_join(F.slice(parts, i + 1, n), "."),
    )


def filter_domains(
    docs: DataFrame,
    domains: DataFrame | list[str],
    url_col: str = "url",
    mode: str = "block",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop (``mode="block"``) or keep only (``mode="allow"``) documents
    whose URL domain equals, or is a subdomain of, an entry in
    ``domains`` (a list of domain strings, or a one-column DataFrame
    for the large-list tier). Documents with no parsable host never
    match — block mode keeps them, allow mode drops them. ``id_col`` is
    only consulted on the large-list path."""
    if mode not in ("block", "allow"):
        raise ValueError(f"mode must be 'block' or 'allow', got {mode!r}")
    sfx = domain_suffixes(extract_domain(url_col))

    if isinstance(domains, list) and len(domains) <= _INLINE_MAX:
        # ONE array literal (a single py4j call), not F.array over
        # per-entry F.lit columns — at _INLINE_MAX entries the
        # column-at-a-time tree costs seconds of driver time (the same
        # py4j-forest cost standardize/citation.py measured and
        # memoized)
        lst = F.lit(sorted({d.lower() for d in domains}))
        # null-safe: a NULL url yields a NULL suffix array and
        # arrays_overlap returns NULL — that row "never matches"
        hit = F.coalesce(F.arrays_overlap(sfx, lst), F.lit(False))
        return docs.filter(~hit if mode == "block" else hit)

    spark = docs.sparkSession
    if not isinstance(domains, DataFrame):
        domains = spark.createDataFrame(
            [(d,) for d in domains], "domain string"
        )
    dlist = F.broadcast(
        domains.select(
            F.lower(F.col(domains.columns[0])).alias("_ufd")
        ).distinct()
    )
    hit_ids = (
        docs.select(id_col, F.explode(sfx).alias("_ufd"))
        .join(dlist, "_ufd", "left_semi")
        .select(id_col)
        .distinct()
    )
    how = "left_anti" if mode == "block" else "left_semi"
    return docs.join(hit_ids, id_col, how)


def filter_url_patterns(
    docs: DataFrame,
    patterns: list[str],
    url_col: str = "url",
) -> DataFrame:
    """Drop documents whose URL matches ANY of ``patterns`` (Java
    regexes), compiled into one alternation — a single codegen rlike
    per row however long the list. URL-less (NULL) documents are
    kept (nothing to match).

    Limitations (stated — both stem from combining user regexes into
    ONE alternation, which Java regex cannot isolate per-branch):

    - NUMBERED BACKREFERENCES (``(x)\\1``) break when combined (the
      alternation renumbers capture groups) — use named groups with
      named backreferences (``(?<a>x)\\k<a>``) or call this once per
      such pattern.
    - INLINE FLAGS such as ``(?i)`` apply from that point to the END
      of the combined expression in Java regex, silently changing the
      matching of every pattern listed AFTER the one that set the
      flag.  Scope flags explicitly (``(?i:...)``) or put flag-setting
      patterns in their own call (r12 ADVICE)."""
    if not patterns:
        return docs
    alternation = "(?:" + ")|(?:".join(patterns) + ")"
    c = F.col(url_col)
    return docs.filter(c.isNull() | ~c.rlike(alternation))


# -- URL canonicalization (r12) ---------------------------------------
# the dedup-prep normalizer: two URLs that differ only in case of the
# scheme/host, a default port, a fragment, tracking parameters, or
# query-parameter ORDER are the same resource, and URL-level exact
# dedup wants one canonical spelling. Entirely Catalyst (try_parse_url
# + array ops inside codegen) — zero UDF, zero shuffle, scan speed.
#
# Rules (stated; each is analytic in the q41 'ucn' oracle):
#   1. scheme and host lowercased (path/query case is SIGNIFICANT)
#   2. fragment dropped
#   3. default port dropped (http:80, https:443); other ports kept
#   4. empty path -> "/"
#   5. tracking params dropped (utm_* prefix family + the ad-click ids)
#   6. remaining query params SORTED bytewise; empty query dropped
#   7. not-a-URL (try_parse_url NULL) passes through unchanged —
#      canonicalization must never destroy keys it cannot parse
#   8. userinfo survives verbatim (case-significant — it is part of
#      the resource identity, not a hostname)
# NOT done (stated): percent-encoding case normalization and path
# dot-segment resolution — both need char-level rewriting that is
# regex-hostile; documents differing only there stay distinct.
_TRACKING_RX = (
    r"^(utm_[^=]*|gclid|fbclid|msclkid|yclid|igshid|mc_cid|mc_eid|"
    r"_hsenc|_hsmi|s_kwcid|vero_id|wickedid|ref_src)(=|$)"
)


def canonical_url(url_col, tracking_rx: str = _TRACKING_RX) -> Column:
    """Canonical spelling of a URL column per the rules above."""
    u = F.col(url_col) if isinstance(url_col, str) else url_col

    def part(p):
        return F.try_parse_url(u, F.lit(p))

    proto = F.lower(part("PROTOCOL"))
    host = F.lower(part("HOST"))
    auth = F.lower(part("AUTHORITY"))
    path = part("PATH")
    q = part("QUERY")
    # userinfo is part of the resource identity and must survive
    # (case-SIGNIFICANT — user names are not hostnames)
    ui = part("USERINFO")
    ui_part = F.when(
        ui.isNull() | (ui == ""), F.lit("")
    ).otherwise(F.concat(ui, F.lit("@")))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    default_port = (
        F.when(proto == "http", F.lit("80"))
        .when(proto == "https", F.lit("443"))
        .otherwise(F.lit(""))
    )
    port_part = F.when(
        (port == "") | (port == default_port), F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    path_part = F.when(
        path.isNull() | (path == ""), F.lit("/")
    ).otherwise(path)
    params = F.array_sort(
        F.filter(
            F.split(F.coalesce(q, F.lit("")), "&"),
            lambda x: (x != "") & ~x.rlike(tracking_rx),
        )
    )
    q_part = F.when(
        F.size(params) == 0, F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(params, "&")))
    rebuilt = F.concat(proto, F.lit("://"), ui_part, host, port_part,
                       path_part, q_part)
    return F.when(proto.isNull() | host.isNull(), u).otherwise(rebuilt)
