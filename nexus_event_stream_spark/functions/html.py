"""HTML → text extraction, pure Catalyst.

The stage between ``warc_documents`` (raw HTTP bodies — usually HTML)
and the text tiers (quality signals, LM scoring, dedup): published
crawl pipelines (C4, RefinedWeb, CCNet) all strip markup before any
text statistic is computed — quality signals over raw HTML measure the
markup, not the prose.

Two extraction tiers share one pipeline seam:

- ``html_to_text`` — the published BASELINE extractor: a chain of
  ``regexp_replace`` expressions (drop script/style/comments, break on
  block tags, strip tags, decode the common entities, collapse
  whitespace) — JVM-side, whole-stage-codegen, zero Python, scan
  bandwidth over 100 TB.
- ``extract_main_text`` (r11) — DOM-aware MAIN-CONTENT extraction in
  the jusText class (Pomikálek 2011: segment the DOM into text blocks,
  classify each by link density / length / semantic context, keep the
  prose): stdlib ``html.parser`` inside an Arrow kernel — no ML model,
  no external library, still a zero-shuffle projection. This is what
  the baseline cannot do: drop a cookie banner or nav sidebar on a
  SINGLE document, with no corpus-frequency evidence
  (``boilerplate_lines`` needs the line to repeat corpus-wide).

Classification rule (deterministic, pinned in tests): a block is BAD
if the majority of its characters sit inside boilerplate containers
(nav/aside/footer/header/form/menu/figure) or its link density exceeds
``max_link_density``; GOOD if it has ``min_words`` words and is not
bad; SHORT blocks (headings, list stubs) are kept iff either nearest
non-short neighbor is good — next to prose they stay, inside chrome
they sink — the jusText context-sensitive (near-good) pass.

Format facts are public (the HTML spec's named character references,
block-level element list). No reference counterpart — north-star
ingestion tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

__all__ = [
    "html_to_text",
    "html_title",
    "looks_like_html",
    "main_content_blocks",
    "main_content_text",
    "extract_main_text",
]

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


# ---------------------------------------------------------------------------
# DOM-aware main-content extraction (r11) — jusText-class block
# classification over stdlib html.parser, as an Arrow kernel
# ---------------------------------------------------------------------------

#: elements whose text is flushed into a NEW block (rendering-level
#: block boundaries — the same list _BLOCK_BREAK uses, plus containers)
_BLOCK_TAGS = frozenset(
    """p div h1 h2 h3 h4 h5 h6 li td th blockquote pre article section
    table tr ul ol dl dd dt main body figcaption br hr""".split()
)

#: containers whose text is site chrome, not content — the semantic
#: signal a single document carries about its own boilerplate
_BOILER_TAGS = frozenset(
    "nav aside footer header form menu button select option label figure".split()
)

#: subtrees with no readable text at all
_SKIP_TAGS = frozenset("script style noscript template head svg iframe".split())

#: HTML void elements never close — pushing them on the boiler/skip
#: depth counters would skew every block after them
_VOID_TAGS = frozenset(
    "br hr img input meta link area base col embed source track wbr".split()
)


class _BlockParser:
    """Segment an HTML document into text blocks carrying the evidence
    the classifier needs: total chars, chars inside <a>, chars inside
    boilerplate containers. stdlib HTMLParser (tolerant of the wild's
    unbalanced markup), entity decoding via convert_charrefs — the full
    named-reference table, not the baseline's shortlist."""

    def __init__(self) -> None:
        self.blocks: list[dict] = []
        self._parts: list[str] = []
        self._chars = 0
        self._link_chars = 0
        self._boiler_chars = 0
        self._skip = 0
        self._boiler = 0
        self._link = 0
        #: open tracked elements (skip/boiler/'a') in document order —
        #: the recovery structure: wild HTML leaves tags unclosed, and a
        #: bare depth counter poisoned every later block (one unclosed
        #: <a> in the nav made the whole article 100% link density)
        self._stack: list[str] = []

    def _flush(self) -> None:
        # each part was normalized in _data (no edge/multi spaces), so a
        # single-space join is already fully normalized
        text = " ".join(self._parts)
        if text:
            self.blocks.append(
                {
                    "text": text,
                    "chars": self._chars,
                    "link_chars": self._link_chars,
                    "boiler_chars": self._boiler_chars,
                }
            )
        self._parts, self._chars = [], 0
        self._link_chars, self._boiler_chars = 0, 0

    def _push(self, tag: str) -> None:
        self._stack.append(tag)
        if tag in _SKIP_TAGS:
            self._skip += 1
        elif tag in _BOILER_TAGS:
            self._boiler += 1
        elif tag == "a":
            self._link += 1

    def _pop_one(self) -> None:
        tag = self._stack.pop()
        if tag in _SKIP_TAGS:
            self._skip -= 1
        elif tag in _BOILER_TAGS:
            self._boiler -= 1
        elif tag == "a":
            self._link -= 1

    def _start(self, tag: str, void: bool = False) -> None:
        if tag in _SKIP_TAGS:
            if not void:
                self._push(tag)
            return
        if tag in _BLOCK_TAGS or tag in _BOILER_TAGS:
            self._flush()
            # block boundary recovery: an inline <a> cannot usefully
            # span rendered blocks — wild markup drops the </a>
            # constantly, and carrying the link context forward marks
            # every later paragraph as link text
            while "a" in self._stack:
                # close the unclosed <a> and anything opened inside it
                while self._stack[-1] != "a":
                    self._pop_one()
                self._pop_one()
        if void or tag in _VOID_TAGS:
            return
        if tag in _BOILER_TAGS or tag == "a":
            self._push(tag)

    def _end(self, tag: str) -> None:
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag in _SKIP_TAGS or tag in _BOILER_TAGS or tag == "a":
            if tag in _BOILER_TAGS:
                self._flush()
            if tag in self._stack:
                # standard recovery: close everything left open inside
                # the element being closed (<nav><a>Home</nav> must not
                # leave the <a> poisoning the rest of the document)
                while self._stack and self._stack[-1] != tag:
                    self._pop_one()
                if self._stack:
                    self._pop_one()
            # stray end tag (never opened): ignore

    def _data(self, data: str) -> None:
        if self._skip or not data:
            return
        stripped = " ".join(data.split())
        if not stripped:
            return
        self._parts.append(stripped)
        n = len(stripped)
        self._chars += n
        if self._link:
            self._link_chars += n
        if self._boiler:
            self._boiler_chars += n

    def feed(self, html: str) -> list[dict]:
        p = _HP(self)
        try:
            p.feed(html)
            p.close()
        except Exception:
            pass  # tolerant reader: keep whatever parsed
        self._flush()
        return self.blocks


from html.parser import HTMLParser as _HTMLParser  # noqa: E402


class _HP(_HTMLParser):
    """Event adapter: stdlib lexer → ``_BlockParser`` state machine
    (module-level — defining this class per document profiled at ~9% of
    the whole extraction kernel)."""

    def __init__(self, outer: _BlockParser) -> None:
        super().__init__(convert_charrefs=True)
        self._o = outer

    def handle_starttag(self, tag, attrs):
        self._o._start(tag)

    def handle_startendtag(self, tag, attrs):
        # explicit <tag/> form: a block boundary, but the depth
        # counters must NOT move (no matching end event follows)
        self._o._start(tag, void=True)

    def handle_endtag(self, tag):
        self._o._end(tag)

    def handle_data(self, data):
        self._o._data(data)


#: fast-lexer bail conditions — constructs stdlib HTMLParser lexes
#: specially (script/style switch to CDATA mode; ``<!`` introduces
#:  comments/CDATA/declarations other than the doctype; ``<`` not
#: followed by a tag-ish char is literal text to HTMLParser but would
#: confuse a naive tokenizer). Pages matching ANY of these route to the
#: HTMLParser path; everything else takes the fast path below.
import re as _re  # noqa: E402  (stdlib, used only by the fast lexer)

_FAST_BAIL = _re.compile(
    r"<(?![a-zA-Z/!])|<!(?!doctype[\s>])|<(?:script|style)\b",
    _re.IGNORECASE,
)
_FAST_TOKEN = _re.compile(r"<[^>]*>|[^<]+", _re.DOTALL)


def _fast_blocks(html: str) -> list[dict] | None:
    """Fast block segmentation (r12, the warc_corpus_e2e bill): ONE
    compiled-regex token scan driving the SAME ``_BlockParser`` state
    machine HTMLParser drives — identical classification semantics by
    construction, only the lexing differs (and anything the stdlib
    lexer treats specially bails to it via ``_FAST_BAIL`` or a None
    return here: stray ``<`` text, unterminated tags, quoted ``>``
    inside attribute values, exotic tag-name forms). Entity decoding is
    ``html.unescape`` — the exact routine HTMLParser's
    ``convert_charrefs`` applies. Equality is pinned in tests across
    chrome-bearing, entity-bearing, void/self-closing, uppercase and
    unclosed-tag pages; measured ~4× over the HTMLParser walk on the
    crawl-shaped bench page."""
    from html import unescape

    bp = _BlockParser()
    pos = 0
    for m in _FAST_TOKEN.finditer(html):
        if m.start() != pos:
            return None  # lost characters: some construct didn't lex
        pos = m.end()
        tok = m.group()
        if tok[0] != "<":
            bp._data(unescape(tok) if "&" in tok else tok)
            continue
        body = tok[1:-1]
        # a '>' inside a quoted attribute value truncates the naive tag
        # match — detectable as an unbalanced quote in the prefix
        if ('"' in body and body.count('"') % 2) or (
            "'" in body and body.count("'") % 2
        ):
            return None
        c1 = body[:1]
        if c1 == "!":
            continue  # doctype only (other <! forms bailed upstream)
        if c1 == "/":
            parts = body[1:].split(None, 1)
            if not parts:
                continue
            ename = parts[0].rstrip("/")  # '</nav/>' closes nav
            if not ename:
                continue  # '<//>' — HTMLParser emits no event either
            if "/" in ename:
                return None  # '</na/v>' — tolerant-lexer prefix rules
            bp._end(ename.lower())
            continue
        sp = body.split(None, 1)
        if not sp:
            return None  # '<>' — literal text to HTMLParser
        name = sp[0]
        void = False
        if body[-1] == "/":
            # Self-closing ONLY when HTMLParser would emit startendtag:
            # a '/' ending an UNQUOTED attribute value belongs to the
            # value (<a href=http://x.com/> is a normal start tag).
            rest = body[:-1]
            bare = name[:-1] if name[-1] == "/" else name
            if rest == bare:
                void = True  # <br/>
            elif rest[-1:] in ' \t\n\r"\'':
                void = True  # <img src=x /> or <a href="x"/>
            else:
                last = rest.rsplit(None, 1)[-1]
                if '"' in last or "'" in last:
                    return None  # quote-adjacent junk: let stdlib decide
                void = "=" not in last  # <foo bar/> yes, <a href=x/> no
        if name[-1] == "/":
            name = name[:-1]
        if not name or "/" in name:
            return None  # <a/href> class — HTMLParser's tolerant lexer
        bp._start(name.lower(), void=void)
    if pos != len(html):
        return None  # unterminated trailing construct
    bp._flush()
    return bp.blocks


def _segment_blocks(html: str) -> list[dict]:
    """Route between the fast lexer and the stdlib-HTMLParser walk —
    result-identical on every page (the fast path drives the same state
    machine and declines anything it cannot lex byte-faithfully)."""
    if not _FAST_BAIL.search(html):
        fast = _fast_blocks(html)
        if fast is not None:
            return fast
    return _BlockParser().feed(html)


def main_content_blocks(
    html: str,
    min_words: int = 8,
    max_link_density: float = 1 / 3,
) -> list[tuple[str, str]]:
    """Classify a document's text blocks: ``[(text, label), ...]`` with
    label in good/bad/short-kept/short-dropped. The executable spec of
    :func:`extract_main_text` (driver twin — tests pin equality).

    Rules (module docstring): bad = majority-boilerplate-context or
    link density > ``max_link_density``; good = ≥ ``min_words`` words
    and not bad; a short block is kept iff EITHER of its nearest
    non-short neighbors is good — a heading directly after the site
    chrome still rides with the prose that follows it, while stubs
    surrounded by chrome sink with it (the jusText near-good pass).
    """
    blocks = _segment_blocks(html)
    labels: list[str] = []
    for b in blocks:
        bad = (
            b["boiler_chars"] * 2 > b["chars"]
            or b["link_chars"] > max_link_density * b["chars"]
        )
        if bad:
            labels.append("bad")
        elif len(b["text"].split()) >= min_words:
            labels.append("good")
        else:
            labels.append("short")
    # context pass: kept iff either nearest non-short neighbor is good
    n = len(blocks)
    resolved: list[str] = []
    for i, lab in enumerate(labels):
        if lab != "short":
            resolved.append(lab)
            continue
        prev_lab = next((labels[j] for j in range(i - 1, -1, -1)
                         if labels[j] != "short"), None)
        next_lab = next((labels[j] for j in range(i + 1, n)
                         if labels[j] != "short"), None)
        kept = prev_lab == "good" or next_lab == "good"
        resolved.append("short-kept" if kept else "short-dropped")
    return [(b["text"], lab) for b, lab in zip(blocks, resolved)]


def main_content_text(
    html: str | None,
    min_words: int = 8,
    max_link_density: float = 1 / 3,
) -> str | None:
    """The kept blocks of :func:`main_content_blocks`, newline-joined
    (the ``html_to_text`` output convention). NULL in, NULL out."""
    if html is None:
        return None
    kept = [
        t
        for t, lab in main_content_blocks(html, min_words, max_link_density)
        if lab in ("good", "short-kept")
    ]
    return "\n".join(kept)


def extract_main_text(
    df: DataFrame,
    html_col: str = "text",
    out_col: str = "text",
    min_words: int = 8,
    max_link_density: float = 1 / 3,
) -> DataFrame:
    """DataFrame form: replace/append ``out_col`` with the main-content
    extraction of ``html_col`` for rows that look like HTML
    (``looks_like_html`` routing, evaluated in the PLAN so it is the
    same predicate the regexp tier routes on); non-HTML rows pass
    through verbatim. One Arrow kernel, zero shuffle — a projection,
    like the baseline chain. All other columns are preserved."""
    import pandas as pd

    others = [c for c in df.columns if c not in (html_col, out_col)]
    fields = [df.schema[c] for c in others]
    fields.append(T.StructField(out_col, T.StringType()))
    out_schema = T.StructType(fields)

    src = df.select(
        *others,
        F.col(html_col).alias("__html"),
        looks_like_html(F.col(html_col)).alias("__is_html"),
    )

    def batches(it):
        for pdf in it:
            texts = [
                main_content_text(h, min_words, max_link_density)
                if is_html
                else h
                for h, is_html in zip(pdf["__html"], pdf["__is_html"])
            ]
            out = pdf[others].copy()
            out[out_col] = pd.Series(texts, dtype="object", index=pdf.index)
            yield out

    return src.mapInPandas(batches, out_schema)
