"""HTML -> text extraction as a pure Catalyst expression chain.

The step between a WARC ``response`` record and the quality filter:
drop non-content blocks (script/style/head/comments), strip tags,
decode the common entities, collapse whitespace. Block-level tags
become newlines so C4-style line-dedup (operators/repetition) still
sees line structure.

Scope (stated): this is the regex tier of HTML cleaning — the same
trade the published pipelines make when they bulk-clean petabytes
before a heavier DOM-based extractor touches the survivors. It does
not execute scripts, resolve CSS visibility, or handle pathologically
malformed markup. The DOM tier EXISTS as of r10 —
``operators/htmldom.extract_main_text`` (stdlib html.parser,
Boilerpipe/jusText shallow-feature block classification, Arrow-batched
— the opt-in ``prepare_corpus(html_tier="dom")`` stage); this module
stays the zero-Python scan-speed default.

Everything here is regexp_replace inside codegen — no UDFs, no
shuffle; at 100 TB it runs at scan speed like the PII scrub.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (?is): dot matches newlines, case-insensitive
_DROP_BLOCKS = (
    r"(?is)<(script|style|head|noscript|template|svg)[^>]*>.*?</\1\s*>"
)
_COMMENTS = r"(?s)<!--.*?-->"
# block-level closers/openers that imply a line break
_BLOCK_TAGS = (
    r"(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|"
    r"footer|blockquote|pre|hr)[^>]*>"
)
_ANY_TAG = r"(?s)<[^>]+>"

# ORDER MATTERS: '&amp;' must decode LAST (after the named + numeric
# entity passes), otherwise doubly-escaped entities double-decode —
# '&amp;lt;' renders as '&lt;' and must come out as the literal
# '&lt;', not '<'. The typographic set (curly quotes, dashes,
# ellipsis — the entities CMS escaping emits constantly) decodes to
# real characters so contractions survive ("don&#8217;t" must become
# "don't", not "don t"); anything else numeric falls back to a space.
_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#34;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&#8216;", "'"),
    ("&#8217;", "'"),
    ("&lsquo;", "'"),
    ("&rsquo;", "'"),
    ("&#8220;", '"'),
    ("&#8221;", '"'),
    ("&ldquo;", '"'),
    ("&rdquo;", '"'),
    ("&#8211;", "-"),
    ("&#8212;", "-"),
    ("&ndash;", "-"),
    ("&mdash;", "-"),
    ("&#8230;", "..."),
    ("&hellip;", "..."),
)

# Hex twins of the typographic set above (&#x2019; == &#8217; etc.) —
# matched case-insensitively because HTML allows &#X2019; and any hex
# case. ASCII quote/amp escapes (&#x27;/&#x22;/&#x26;) are included:
# x26 normalizes to &amp; alongside &#38; (decoded strictly last).
_HEX_ENTITIES = (
    (r"&#x2018;", "'"),
    (r"&#x2019;", "'"),
    (r"&#x201c;", '"'),
    (r"&#x201d;", '"'),
    (r"&#x2013;", "-"),
    (r"&#x2014;", "-"),
    (r"&#x2026;", "..."),
    (r"&#x27;", "'"),
    (r"&#x22;", '"'),
    (r"&#xa0;", " "),
)


def html_to_text(col: Column | str) -> Column:
    """Visible-text extraction: non-content blocks and comments out,
    block tags to newlines, remaining tags out, common entities
    decoded, spaces collapsed per line and blank lines collapsed."""
    c = F.col(col) if isinstance(col, str) else col
    # comments FIRST: a commented-out unclosed <script> opener would
    # otherwise make _DROP_BLOCKS consume visible text up to the next
    # real closing tag
    c = F.regexp_replace(c, _COMMENTS, " ")
    c = F.regexp_replace(c, _DROP_BLOCKS, " ")
    c = F.regexp_replace(c, _BLOCK_TAGS, "\n")
    c = F.regexp_replace(c, _ANY_TAG, " ")
    for ent, rep in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(rep))
    for pat, rep in _HEX_ENTITIES:
        c = F.regexp_replace(c, "(?i)" + pat, rep)
    # '&#38;' / '&#x26;' are the ampersand itself — normalize them to
    # '&amp;' BEFORE the numeric fallback eats them, so the final
    # decode-last pass resolves all forms without double-decoding
    # '&#38;amp;'
    c = F.replace(c, F.lit("&#38;"), F.lit("&amp;"))
    c = F.regexp_replace(c, r"(?i)&#x26;", "&amp;")
    # numeric entities (decimal + hex, any case like the known set),
    # then '&amp;' strictly last
    c = F.regexp_replace(c, r"&#\d{2,6};", " ")
    c = F.regexp_replace(c, r"(?i)&#x[0-9a-f]{2,6};", " ")
    c = F.replace(c, F.lit("&amp;"), F.lit("&"))
    # per-line space collapse, then blank-line collapse
    c = F.regexp_replace(c, r"[ \t\r\f]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n{2,}", "\n")
    # F.trim strips spaces only — newlines need the regex form
    return F.regexp_replace(c, r"^\s+|\s+$", "")
