"""HTML → text extraction, pure Catalyst.

The stage between ``warc_documents`` (raw HTTP bodies — usually HTML)
and the text tiers (quality signals, LM scoring, dedup): published
crawl pipelines (C4, RefinedWeb, CCNet) all strip markup before any
text statistic is computed — quality signals over raw HTML measure the
markup, not the prose.

Everything here is a chain of ``regexp_replace``/``regexp_extract``
expressions — JVM-side, whole-stage-codegen, zero Python — so
extraction runs at scan bandwidth over 100 TB. The trade-off is
explicit: this is the published BASELINE extractor (drop
script/style/comments, break on block tags, strip tags, decode the
common entities, collapse whitespace), not a DOM-aware
boilerplate-removal model (trafilatura/jusText class) — those need an
HTML parser library and ride the usual environment boundary; the
pipeline seam (one column expression) is identical when one is
swapped in.

Format facts are public (the HTML spec's named character references,
block-level element list). No reference counterpart — north-star
ingestion tier.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["html_to_text", "html_title", "looks_like_html"]

#: elements whose CONTENT is noise, dropped wholesale (with the tags)
_DROP_CONTENT = ("script", "style", "noscript", "template", "head")

#: block-level closers/voids that imply a line break in the rendering —
#: replacing them with a newline preserves paragraph structure for the
#: passage/line-grain dedup tiers downstream
_BLOCK_BREAK = (
    r"(?i)<\s*(?:br\s*/?|/p|/div|/li|/h[1-6]|/tr|/table|/ul|/ol|"
    r"/blockquote|/section|/article|/header|/footer|/pre|p|div)\s*[^>]*>"
)

#: the named character references worth decoding without a full table
#: (the long tail is rare in prose; numeric references are handled
#: separately for the ASCII range)
_ENTITIES = [
    ("&nbsp;", " "),
    ("&amp;", "&"),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&mdash;", "—"),
    ("&ndash;", "–"),
    ("&hellip;", "…"),
    ("&rsquo;", "'"),
    ("&lsquo;", "'"),
    ("&rdquo;", "”"),
    ("&ldquo;", "“"),
]


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def looks_like_html(c: Column | str) -> Column:
    """Cheap routing predicate: does the body look like an HTML document
    (doctype or an opening html/head/body tag near the start)? Crawl
    responses are mixed (JSON APIs, plain text, binaries-as-text) and
    only HTML should pay the extraction chain."""
    head = F.lower(F.substring(_col(c), 1, 1024))
    return (
        head.contains("<!doctype html")
        | head.contains("<html")
        | head.contains("<head")
        | head.contains("<body")
    )


def html_to_text(c: Column | str) -> Column:
    """Extract readable text from an HTML column.

    Chain: drop comments and script/style/noscript/template/head
    subtrees → turn block-element boundaries into newlines → strip every
    remaining tag → decode the common character references (+ numeric
    ``&#NN;`` for ASCII) → collapse horizontal whitespace and blank-line
    runs → trim. NULL in, NULL out.
    """
    s = _col(c)
    # comments first: commented-out scripts must not survive the
    # script-drop by hiding inside <!-- -->
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    for tag in _DROP_CONTENT:
        s = F.regexp_replace(
            s, rf"(?is)<\s*{tag}\b[^>]*>.*?<\s*/\s*{tag}\s*>", " "
        )
    s = F.regexp_replace(s, _BLOCK_BREAK, "\n")
    s = F.regexp_replace(s, r"(?s)<[^>]*>", " ")
    # numeric references: exactly the markup-significant ASCII five (the
    # common case in the wild); the long tail stays verbatim rather than
    # risk a mis-decode
    for code, rep in ((34, '"'), (38, "&"), (39, "'"), (60, "<"), (62, ">")):
        s = F.replace(s, F.lit(f"&#{code};"), F.lit(rep))
    for ent, rep in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(rep))
    s = F.regexp_replace(s, r"[ \t\x0b\f\r]+", " ")
    s = F.regexp_replace(s, r" ?\n ?", "\n")
    s = F.regexp_replace(s, r"\n{2,}", "\n")
    return F.trim(s)


def html_title(c: Column | str) -> Column:
    """The document's ``<title>`` text ('' when absent) — the metadata
    column crawl pipelines keep beside the body."""
    raw = F.regexp_extract(
        _col(c), r"(?is)<\s*title[^>]*>(.*?)<\s*/\s*title\s*>", 1
    )
    return F.trim(F.regexp_replace(raw, r"\s+", " "))
