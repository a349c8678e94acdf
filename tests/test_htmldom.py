"""DOM-tier main-content extraction (operators/htmldom.py): block
segmentation, the Boilerpipe length+link-density rule, jusText's
neighbor glue, structural-chrome subtree drops, malformed-markup
degradation, and the prepare_corpus html_tier='dom' hook."""

from __future__ import annotations

import pytest

from data_governance_spark.operators.htmldom import (
    extract_blocks,
    extract_main_text,
    main_text,
)

LONG_A = (
    "This is a long enough paragraph of real article content that "
    "clearly exceeds the minimum block length threshold."
)
LONG_B = (
    "A second substantial paragraph with plenty of characters to "
    "count as genuine content under the default parameters."
)


def test_block_segmentation_and_features():
    html = (
        f"<html><body><p>{LONG_A}</p>"
        f"<div>short bit</div>"
        f'<p>Read <a href="/x">the full story here</a> online.</p>'
        "</body></html>"
    )
    blocks = extract_blocks(html)
    assert [t for t, _n, _lc in blocks] == [
        LONG_A,
        "short bit",
        "Read the full story here online.",
    ]
    t, n, lc = blocks[2]
    assert n == len(t)
    assert lc == len("the full story here")


def test_chrome_subtrees_dropped_wholesale():
    html = (
        "<head><title>SEO Title</title></head>"
        "<nav><a href='/'>Home</a><a href='/a'>About</a></nav>"
        f"<article><p>{LONG_A}</p></article>"
        "<script>var x = 'not text';</script>"
        f"<p>{LONG_B}</p>"
        "<footer>Copyright 2026 Example Corp. All rights reserved "
        "worldwide, including this long footer sentence.</footer>"
        "<aside>Related: <a href='/b'>other story</a></aside>"
    )
    out = main_text(html)
    assert out == f"{LONG_A}\n{LONG_B}"
    # the footer was LONG enough to pass the length rule — it was
    # dropped because <footer> is structural chrome, not by length
    assert "Copyright" not in out


def test_link_density_drops_long_link_blocks():
    links = " ".join(
        f'<a href="/{i}">very long navigation label {i}</a>'
        for i in range(8)
    )
    html = f"<div>{links}</div><p>{LONG_A}</p>"
    assert main_text(html) == LONG_A


def test_justext_glue_keeps_sandwiched_short_block():
    html = (
        f"<p>{LONG_A}</p><p>A short aside.</p><p>{LONG_B}</p>"
        "<p>Lonely short line.</p>"
    )
    out = main_text(html)
    assert out == f"{LONG_A}\nA short aside.\n{LONG_B}"
    # the trailing short block has only ONE content neighbor — dropped
    assert "Lonely" not in out
    # but a short LINK row between content blocks stays dropped
    html2 = (
        f"<p>{LONG_A}</p><p><a href='/m'>Read more</a></p><p>{LONG_B}</p>"
    )
    assert main_text(html2) == f"{LONG_A}\n{LONG_B}"


def test_malformed_markup_degrades_gracefully():
    # unclosed <script>: fail-closed, the rest of the doc is chrome
    assert main_text(f"<script>boom <p>{LONG_A}</p>") == ""
    # stray end tags and bad nesting are ignored, entities decode
    html = f"</div><p>{LONG_A} &amp; more &#8212; dashes</p></section>"
    assert main_text(html) == f"{LONG_A} & more — dashes"
    # plain text with no markup at all is one block
    assert main_text(LONG_A) == LONG_A
    assert main_text("") == ""


def test_nested_anchor_does_not_poison_link_accounting():
    """Nested <a> (illegal, ubiquitous — browsers force-close the open
    one) must not leave the parser counting the rest of the DOCUMENT
    as link text; the review repro deleted whole pages this way."""
    html = (
        "<p><a href='/x'>Home<a href='/y'>About</a></p>"
        f"<p>{LONG_A}</p><p>{LONG_B}</p>"
    )
    assert main_text(html) == f"{LONG_A}\n{LONG_B}"
    # an <a> left unclosed at a block boundary resets with the block
    html2 = f"<p><a href='/x'>Home</p><p>{LONG_A}</p>"
    assert main_text(html2) == LONG_A


def test_stray_chrome_end_tag_does_not_end_other_chrome():
    """A stray </nav> inside an open <footer> must not leak the rest
    of the footer as content (the shared-counter bug)."""
    promo = (
        "Buy our premium subscription today for a very long promoted "
        "offer sentence that would pass the length rule."
    )
    html = f"<footer>Copyright</nav> {promo}</footer><p>{LONG_A}</p>"
    assert main_text(html) == LONG_A
    # properly nested chrome still closes correctly
    html2 = f"<footer><nav>x</nav>tail</footer><p>{LONG_A}</p>"
    assert main_text(html2) == LONG_A


def test_chrome_boundary_flushes_blocks():
    """Boilerplate fragments on either side of a <nav> must not merge
    into one block long enough to pass the length rule."""
    html = (
        "Sign up for our newsletter <nav><a href='/'>x</a></nav> "
        f"follow us on social media<p>{LONG_A}</p>"
    )
    assert main_text(html) == LONG_A


def test_parameters_move_the_cut():
    html = f"<p>tiny</p><p>{LONG_A}</p>"
    assert main_text(html, min_block_chars=4) == f"tiny\n{LONG_A}"
    assert main_text(html) == LONG_A


def test_extract_main_text_spark(spark):
    docs = spark.createDataFrame(
        [
            (1, f"<nav><a href='/'>Home</a></nav><p>{LONG_A}</p>"),
            (2, None),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["text"]
        for r in extract_main_text(docs).collect()
    }
    assert out == {1: LONG_A, 2: None}
    with pytest.raises(ValueError, match="min_block_chars"):
        extract_main_text(docs, min_block_chars=0)
    with pytest.raises(ValueError, match="max_link_density"):
        extract_main_text(docs, max_link_density=1.5)


def test_prepare_corpus_dom_tier(spark):
    from data_governance_spark.corpus import prepare_corpus

    docs = spark.createDataFrame(
        [
            (
                i,
                f"<nav><a href='/'>Home</a><a href='/a'>About</a></nav>"
                f"<p>{LONG_A} Document number {i} marker.</p>"
                "<footer>Copyright footer boilerplate line here.</footer>",
            )
            for i in range(6)
        ],
        "doc_id long, text string",
    )
    res = prepare_corpus(
        docs,
        html=True,
        html_tier="dom",
        quality_rules={},
        pii=False,
        minhash_threshold=1.01,
    )
    kept = {r["doc_id"]: r["text"] for r in res.kept.collect()}
    res.release()
    assert set(kept) == set(range(6))
    for i, t in kept.items():
        assert t == f"{LONG_A} Document number {i} marker."
    with pytest.raises(ValueError, match="html_tier"):
        prepare_corpus(docs, html=True, html_tier="bogus")
    # validated even when html=False: a forgotten html=True must not
    # silently skip extraction
    with pytest.raises(ValueError, match="html=True"):
        prepare_corpus(docs, html_tier="dom")
    with pytest.raises(ValueError, match="html_tier"):
        prepare_corpus(docs, html_tier="bogus")


# --------------------------------------------------------------------------
# generative tag-soup fuzz (r11 — the r10 lesson made permanent:
# malformed markup needs adversarial coverage, not just pinned bugs)
# --------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st

_TAGS = [
    "p", "div", "li", "a", "nav", "footer", "span", "b", "table",
    "tr", "td", "header", "aside", "form", "script", "style", "h1",
    "br", "hr", "custom-x",
]
_soup_piece = st.one_of(
    st.sampled_from([f"<{t}>" for t in _TAGS]),
    st.sampled_from([f"</{t}>" for t in _TAGS]),
    st.sampled_from(
        ["<a href='/x'>", "<p class='y'", "<!-- c -->", "<![CDATA[z]]>",
         "<?pi?>", "<!DOCTYPE html>", "< notatag", "&amp;", "&#65;",
         "&#x1F600;", "&bogus;", "&", "\x00", "<", ">", "</>"]
    ),
    st.text(
        alphabet=st.characters(
            blacklist_characters="<>&", blacklist_categories=("Cs",)
        ),
        max_size=30,
    ),
)
_soup = st.lists(_soup_piece, max_size=60).map("".join)


@settings(max_examples=300, deadline=None)
@given(_soup)
def test_fuzz_soup_never_raises_and_invariants(html):
    """Any tag soup: extract_blocks returns well-formed (text, n, lc)
    triples (n == len(text), 0 <= lc <= n, text non-empty and
    whitespace-normalized) and main_text returns a str whose lines are
    a subset of the block texts. Never raises."""
    blocks = extract_blocks(html)
    for text, n, lc in blocks:
        assert text and n == len(text)
        assert 0 <= lc <= n
        assert text == " ".join(text.split())  # normalized
    out = main_text(html)
    assert isinstance(out, str)
    block_texts = {t for t, _n, _lc in blocks}
    for line in out.split("\n"):
        if line:
            assert line in block_texts


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.sampled_from(
                [f"<{t}>" for t in _TAGS] + [f"</{t}>" for t in _TAGS]
            ),
            st.text(alphabet="abcdefgh XY.", min_size=1, max_size=25),
        ),
        max_size=50,
    )
)
def test_fuzz_output_text_comes_from_input(pieces):
    """With entity-free text chunks and well-formed tags, every token
    of every extracted block occurs verbatim in the input's TEXT
    CONTENT (tags stripped — inline tags legitimately join adjacent
    chunks: 'X<a>X' renders 'XX') — the parser may only segment and
    drop, never invent or transform content."""
    import re

    html = "".join(pieces)
    stripped = re.sub(r"<[^>]*>", "", html)
    for text, _n, _lc in extract_blocks(html):
        for tok in text.split():
            assert tok in stripped
