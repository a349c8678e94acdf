"""DOM-tier main-content extraction — the stage the published web
pipelines run AFTER bulk regex cleaning: parse the markup, segment it
into text blocks, and classify each block as content or boilerplate
from shallow text features. The method is the published one —
Boilerpipe's finding that TEXT LENGTH and LINK DENSITY alone separate
content from chrome (Kohlschuetter et al., WSDM 2010) with jusText's
neighbor-propagation rule for short blocks (Pomikalek 2011) — built
entirely on the stdlib ``html.parser`` (no trafilatura/resiliparse;
this container has neither, and the shallow-feature tier is what they
run first anyway).

Pipeline position: ``functions/html.html_to_text`` stays the
scan-speed regex tier (pure Catalyst, zero Python) for bulk cleaning;
``extract_main_text`` is the heavier Arrow-batched Python tier for
corpora where navigation/footer boilerplate must actually leave the
text, not just lose its tags. ``prepare_corpus(html=True,
html_tier="dom")`` swaps it in.

How a document flows:

1. ``html.parser.HTMLParser`` (tolerant of malformed markup,
   ``convert_charrefs=True`` so entities arrive decoded) streams the
   document; script/style/head/noscript/template/svg/nav/header/
   footer/aside/form subtrees are dropped wholesale.
2. Text is segmented into BLOCKS at block-level tags (p, div, li,
   h1-6, tr, section, article, blockquote, pre, td, ...); characters
   inside <a> accumulate each block's link-char count.
3. A block is CONTENT when it has >= ``min_block_chars`` characters
   and link density (link chars / chars) <= ``max_link_density``.
   Shorter blocks survive only when BOTH neighbors are content
   (jusText's near-good glue — keeps the one-line paragraph between
   two long ones, drops the isolated "Read more" link row).
4. Content blocks join with newlines (line structure preserved for
   the C4 line rules downstream).

Scale shape: map-only — one Arrow-batched pandas UDF, no shuffle, no
driver state; the honest cost is Python parsing per document, which
is why it is the OPT-IN tier (the regex tier stays whole-stage
codegen). Same boundary story as the zlib-ratio quality signal.

Reference twin: none — training-data extension per SURVEY.md §6
(Kohlschuetter 2010 / Pomikalek 2011 are the published methods).
"""

from __future__ import annotations

from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# subtrees that never contain main content — dropped wholesale
# (superset of the regex tier's _DROP_BLOCKS: the DOM tier can also
# drop the STRUCTURAL chrome the regex tier cannot identify safely)
_DROP_SUBTREES = frozenset(
    "script style head noscript template svg nav header footer aside "
    "form".split()
)
# tags that end the current text block (none of the drop-subtree tags
# are void elements, so the drop counter never needs a void list)
_BLOCK_TAGS = frozenset(
    "p div br li ul ol h1 h2 h3 h4 h5 h6 tr table td th section "
    "article blockquote pre hr dd dt main figure figcaption".split()
)


class _BlockParser(HTMLParser):
    """Streams a document into [(text, n_chars, n_link_chars)] blocks.
    Malformed markup degrades gracefully (HTMLParser itself never
    raises on bad nesting), with three deliberate rules for the broken
    markup crawl HTML actually contains:

    - <a> is a BINARY flag reset at every block boundary, not a depth
      counter: nested anchors (illegal, ubiquitous; browsers
      force-close the open one) would otherwise leave a counter
      permanently positive and mark the rest of the DOCUMENT as link
      text — density 1.0 everywhere, whole pages extracted to "".
      The trade: an <a> legitimately wrapping several blocks counts
      link chars only in its first block.
    - chrome subtrees are a TAG STACK, not a shared counter: a stray
      </nav> inside an open <footer> must not end the footer drop
      (a shared counter leaked the rest of the footer as content).
      An end tag pops up to its most recent matching open; end tags
      with no open match are ignored. An unclosed chrome tag drops to
      end-of-document — fail-closed.
    - entering a chrome subtree FLUSHES the current block: otherwise
      the short boilerplate fragments on either side of a <nav> merge
      into one block long enough to pass the length rule."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []
        self._buf: list[str] = []
        self._link_chars = 0
        self._drop_stack: list[str] = []
        self._in_link = False

    def _flush(self):
        text = " ".join("".join(self._buf).split())
        if text:
            self.blocks.append((text, len(text), self._link_chars))
        self._buf = []
        self._link_chars = 0
        self._in_link = False

    def handle_starttag(self, tag, attrs):
        if tag in _DROP_SUBTREES:
            if not self._drop_stack:
                self._flush()  # pre-chrome text is its own block
            self._drop_stack.append(tag)
            return
        if self._drop_stack:
            return
        if tag == "a":
            self._in_link = True
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag):
        if tag in _DROP_SUBTREES:
            if tag in self._drop_stack:
                while self._drop_stack.pop() != tag:
                    pass
            return
        if self._drop_stack:
            return
        if tag == "a":
            self._in_link = False
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data):
        if self._drop_stack or not data:
            return
        self._buf.append(data)
        if self._in_link:
            self._link_chars += len(" ".join(data.split()))

    def close(self):
        super().close()
        self._flush()


def extract_blocks(html: str) -> list[tuple[str, int, int]]:
    """(text, chars, link_chars) per block — exposed for tests and for
    callers that want their own classification rule."""
    p = _BlockParser()
    p.feed(html)
    p.close()
    return p.blocks


def main_text(
    html: str,
    min_block_chars: int = 40,
    max_link_density: float = 0.35,
) -> str:
    """Classify blocks (length + link density, neighbor glue) and join
    the content ones with newlines. Pure function — the UDF below maps
    it; kept importable so tests differential it directly."""
    blocks = extract_blocks(html)
    good = [
        n >= min_block_chars and (lc / n if n else 1.0) <= max_link_density
        for _t, n, lc in blocks
    ]
    # jusText glue: a short low-link block between two content blocks
    # is content (the one-line paragraph case)
    glued = list(good)
    for i in range(1, len(blocks) - 1):
        if not good[i] and good[i - 1] and good[i + 1]:
            _t, n, lc = blocks[i]
            if n and lc / n <= max_link_density:
                glued[i] = True
    return "\n".join(t for (t, _n, _lc), g in zip(blocks, glued) if g)


def dom_text(
    col: Column | str,
    min_block_chars: int = 40,
    max_link_density: float = 0.35,
) -> Column:
    """Column form of the extractor (mirrors
    functions/html.html_to_text's shape) — the single validated UDF
    builder :func:`extract_main_text` wraps."""
    if min_block_chars < 1:
        raise ValueError(
            f"min_block_chars must be >= 1, got {min_block_chars}"
        )
    if not (0.0 <= max_link_density <= 1.0):
        raise ValueError(
            f"max_link_density must be in [0, 1], got {max_link_density}"
        )

    @F.pandas_udf("string")
    def dom(c: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None
                if t is None
                else main_text(t, min_block_chars, max_link_density)
                for t in c
            ],
            dtype="object",
        )

    return dom(F.col(col) if isinstance(col, str) else col)


def extract_main_text(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    min_block_chars: int = 40,
    max_link_density: float = 0.35,
) -> DataFrame:
    """``docs`` with ``text_col`` (raw HTML) rewritten (or copied to
    ``out_col``) as extracted main content. NULL stays NULL. Map-only;
    the parameters ride the closure, no broadcast needed."""
    return docs.withColumn(
        out_col or text_col,
        dom_text(F.col(text_col), min_block_chars, max_link_density),
    )
