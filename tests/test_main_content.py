"""DOM-aware main-content extraction (functions/html.py r11 tier).

The capability pin: boilerplate blocks dropped on a SINGLE document —
no corpus-frequency evidence — while the prose comes through byte-exact
(entities fully decoded via the stdlib reference table, whitespace
normalized to the block convention). Plus the pipeline seam: routed
behind the same looks_like_html predicate inside warc_corpus, with the
regexp baseline pinned unchanged.
"""

from __future__ import annotations

import pytest

from nexus_event_stream_spark.functions.html import (
    extract_main_text,
    main_content_blocks,
    main_content_text,
)

PROSE_1 = (
    "The river ran swift and cold through the valley, carrying "
    "meltwater from the high passes toward the sea & the delta beyond."
)
PROSE_2 = (
    "Fishermen knew the pools where the current slowed, and they kept "
    "their knowledge close — trading hints only for favors."
)

PAGE = f"""<!doctype html><html><head><title>Rivers</title>
<style>p {{ margin: 0 }}</style><script>var x = 1 < 2;</script></head><body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
<header><div>Site of Wonders — sign in or register now to continue</div></header>
<article>
<h2>Rivers of the north</h2>
<p>The river ran swift and cold through the valley,
carrying meltwater from the high passes toward the sea &amp; the delta beyond.</p>
<p>Fishermen knew the pools where the current slowed, and they kept their knowledge close &mdash; trading hints only for favors.</p>
<div class="related"><a href="/a">Ten best rivers</a> <a href="/b">Fishing gear deals</a> <a href="/c">Subscribe now</a></div>
</article>
<aside>Cookie notice: we use cookies to improve your experience. Accept all cookies to continue browsing this site.</aside>
<footer>© 2026 Site of Wonders. All rights reserved. Privacy. Terms.</footer>
</body></html>"""


def test_single_document_boilerplate_dropped_prose_byte_exact():
    got = main_content_text(PAGE)
    # prose byte-exact (entities decoded, block-level whitespace
    # normalization), heading kept with its section, ALL chrome gone
    assert got == "Rivers of the north\n" + PROSE_1 + "\n" + PROSE_2
    labels = dict(main_content_blocks(PAGE))
    assert labels["Home About Contact"] == "bad"  # nav container
    assert labels[PROSE_1] == "good"
    assert labels["Rivers of the north"] == "short-kept"
    # the link farm is bad by LINK DENSITY alone (plain div, no
    # semantic boilerplate container around it)
    assert (
        labels["Ten best rivers Fishing gear deals Subscribe now"] == "bad"
    )
    # aside/footer: semantic containers, long enough to be 'good' by
    # length — only the DOM context kills them
    assert [lab for t, lab in labels.items() if t.startswith("Cookie")] == [
        "bad"
    ]
    assert [lab for t, lab in labels.items() if t.startswith("©")] == ["bad"]


def test_short_stub_inside_chrome_sinks():
    html = (
        "<html><body><nav>menu</nav><div>tiny stub</div>"
        "<footer>copyright legalese of considerable length repeated "
        "here to pass any word floor easily</footer></body></html>"
    )
    labels = dict(main_content_blocks(html))
    assert labels["tiny stub"] == "short-dropped"
    assert main_content_text(html) == ""


def test_malformed_html_never_crashes_and_keeps_prose():
    # unclosed tags, stray end tags, bare ampersands, truncated comment
    html = (
        "<html><body><p>" + PROSE_1 + "<p>" + PROSE_2
        + "</div></div><a href='/x'>trailing<!-- broken"
    )
    got = main_content_text(html)
    assert PROSE_1 in got and PROSE_2 in got
    assert "trailing" not in got or got  # no crash is the pin


def test_null_and_non_html_pass_through(spark):
    df = spark.createDataFrame(
        [
            (0, PAGE),
            (1, "just a plain text line, no markup at all"),
            (2, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.text for r in extract_main_text(df).collect()}
    assert out[0] == "Rivers of the north\n" + PROSE_1 + "\n" + PROSE_2
    assert out[1] == "just a plain text line, no markup at all"
    assert out[2] is None
    # zero shuffle: the kernel is a projection
    plan = (
        extract_main_text(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_self_closing_tags_do_not_skew_counters():
    # <a/> and <nav/> in the explicit startendtag form must not push
    # depth counters (no end event follows) — prose after them is clean
    html = (
        "<html><body><p><a/>" + PROSE_1 + "</p>"
        "<nav/><p>" + PROSE_2 + "</p></body></html>"
    )
    labels = dict(main_content_blocks(html))
    assert labels[PROSE_1] == "good"
    assert labels[PROSE_2] == "good"


def test_warc_corpus_routes_main_content_and_regexp_baseline_unchanged(
    spark, tmp_path
):
    from nexus_event_stream_spark.functions.html import html_to_text
    from nexus_event_stream_spark.pipeline import CorpusRecipe, warc_corpus
    from pyspark.sql import functions as F

    # one-response WARC with the boilerplate page
    body = PAGE.encode()
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    rec = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: http://example.com/rivers\r\n"
        b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
        b"Content-Length: " + str(len(http)).encode() + b"\r\n"
        b"\r\n" + http + b"\r\n\r\n"
    )
    warc = tmp_path / "crawl.warc"
    warc.write_bytes(rec)
    recipe = CorpusRecipe(
        quality=False, redact_pii=False, exact_dedup=False, near_dedup=False
    )
    corpus, stages = warc_corpus(
        spark, str(warc), recipe=recipe, html_extract="main_content"
    )
    rows = corpus.collect()
    assert len(rows) == 1
    assert rows[0].text == "Rivers of the north\n" + PROSE_1 + "\n" + PROSE_2
    # the regexp baseline still returns its own (chrome-bearing) text —
    # pinned unchanged so the default tier cannot silently regress
    corpus_rx, _ = warc_corpus(
        spark, str(warc), recipe=recipe, html_extract=True
    )
    rx_rows = corpus_rx.collect()
    want = (
        stages["documents"]
        .select(html_to_text(F.col("text")).alias("t"))
        .collect()[0]
        .t
    )
    assert rx_rows[0].text == want
    assert "Home" in rx_rows[0].text  # baseline keeps the nav line
    with pytest.raises(ValueError, match="html_extract"):
        warc_corpus(spark, str(warc), recipe=recipe, html_extract="dom")


def test_unclosed_tags_do_not_poison_later_blocks():
    """The wild's most common markup damage: a </a> (or container
    close) that never arrives. Recovery: closing an element closes
    everything left open inside it, and a block boundary closes any
    open inline <a> — one bad nav item must not mark the whole article
    as link text."""
    # unclosed <a> inside a closed nav
    html = (
        "<html><body><nav><a href='/'>Home</nav>"
        "<p>" + PROSE_1 + "</p></body></html>"
    )
    labels = dict(main_content_blocks(html))
    assert labels[PROSE_1] == "good"
    # unclosed <a> with no container close either: the next block
    # boundary ends the inline context
    html2 = (
        "<html><body><p><a href='/x'>link text here"
        "<p>" + PROSE_2 + "</p></body></html>"
    )
    labels2 = dict(main_content_blocks(html2))
    assert labels2[PROSE_2] == "good"
    # unclosed <nav> wrapping a menu, closed implicitly by </body>…
    # never: that IS the document structure — but a CLOSED nav whose
    # inner tags dangle must still end the boiler context
    html3 = (
        "<html><body><nav><form><a href='/'>menu</nav>"
        "<p>" + PROSE_1 + "</p></body></html>"
    )
    labels3 = dict(main_content_blocks(html3))
    assert labels3[PROSE_1] == "good"
    # stray end tags are ignored, not underflowed
    html4 = (
        "</a></nav></footer><html><body><p>" + PROSE_2 + "</p>"
        "<footer>legal words repeated enough to pass any length floor"
        " for sure absolutely</footer></body></html>"
    )
    labels4 = dict(main_content_blocks(html4))
    assert labels4[PROSE_2] == "good"
    assert [v for k, v in labels4.items() if k.startswith("legal")] == ["bad"]


# ---------------------------------------------------------------------------
# r12 fast lexer: one-regex token scan driving the SAME _BlockParser
# state machine — block-identical to the stdlib-HTMLParser walk on every
# page (fast-path pages by construction, bail pages by routing).
# ---------------------------------------------------------------------------


def test_fast_lexer_block_identity_and_routing():
    import random

    from nexus_event_stream_spark.functions.html import (
        _FAST_BAIL,
        _BlockParser,
        _fast_blocks,
        _segment_blocks,
    )

    fast_pages = [
        # the crawl-shaped bench page: doctype + chrome + entities
        "<!doctype html><html><head><title>d</title></head><body>"
        "<nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        "<article><p>prose body with plenty of words to be a good block"
        " &amp; an &lt;escaped&gt; tag</p></article>"
        "<footer>All rights reserved.</footer></body></html>",
        "<body><nav><a href='/x'>Home</nav><p>unclosed nav then prose"
        " with lots of words in it</p>",  # wild-markup recovery
        "<body><p>first<br/>second with enough words to classify as"
        " good</p><hr><p>tail</p>",  # void + self-closing
        "<BODY><NAV><A HREF='/'>H</A></NAV><P>uppercase tags prose with"
        " more than eight words in total here</P></BODY>",
        "",  # empty
        "plain text no tags at all but quite a few words here",
        "<body><p>one <b>two</b> three four five six seven eight</p>"
        "</body>",  # inline splits inside one block
        "<body><p data-note='a&quot;b'>quoted entity attr prose with"
        " plenty of words to be good here</p></body>",
    ]
    for page in fast_pages:
        assert not _FAST_BAIL.search(page), page[:40]
        assert _fast_blocks(page) == _BlockParser().feed(page), page[:40]

    bail_pages = [
        "<body><script>var a='<p>';</script><p>real prose with enough"
        " words to be good here</p></body>",  # CDATA-mode lexing
        "<body><!-- c --><p>comment page prose with enough words to be"
        " good here</p></body>",
        "<body><p>5 < 6 and more words to fill this block up</p></body>",
        '<body><p data-x="a>b">quoted-gt attr prose with enough words'
        " here</p></body>",
        "<body><p>trailing <unterminated",  # lost-characters guard
        "<![CDATA[x]]><p>decl page words words words words words words"
        " words words</p>",
    ]
    for page in bail_pages:
        # whatever path runs, the result matches the stdlib walk
        assert _segment_blocks(page) == _BlockParser().feed(page), page[:40]

    # randomized composition pin: fragments stitched in random orders
    # stay block-identical between the two lexers
    rng = random.Random(12)
    frags = [
        "<p>alpha beta gamma delta epsilon zeta eta theta</p>",
        "<nav><a href='/'>Home</a></nav>",
        "plain run &amp; entity",
        "<div><h2>Head</h2><p>body words words words words words words"
        " words words</p></div>",
        "<br/>",
        "<footer>fine print</footer>",
        "<ul><li>one</li><li>two</li></ul>",
    ]
    for _ in range(50):
        page = "".join(rng.choice(frags) for _ in range(rng.randint(1, 8)))
        assert _fast_blocks(page) == _BlockParser().feed(page)


def test_fast_lexer_unquoted_attr_slash_and_sloppy_end_tags():
    """r12 self-review findings: a '/' ending an UNQUOTED attribute
    value is part of the value (normal start tag — link/boiler depth
    must move), while '<foo bar/>' (valueless attr) and quote-closed
    values self-close; '</nav/>' closes nav. All pinned block-identical
    to stdlib HTMLParser."""
    from nexus_event_stream_spark.functions.html import (
        _BlockParser,
        _fast_blocks,
    )

    pages = [
        # unquoted href ending '/': the <a> MUST open (link accounting)
        "<div><a href=http://example.com/>link text here</a> tail words"
        " making this block long enough</div>",
        "<nav id=x/>menu chrome words</nav><p>real prose with enough"
        " words to be a good block</p>",
        # valueless attr + '/': HTMLParser emits startendtag
        "<p>before</p><foo bar/><p>after block with plenty of words in"
        " it for goodness</p>",
        "<foo bar=baz/><p>unquoted value eats the slash so foo stays"
        " open in both lexers</p>",
        # sloppy end tag with trailing slash closes the element
        "<nav>menu</nav/>words here<p>para text with enough words to"
        " be good today ok</p>",
        "<body><p>a</p><//><p>empty end tag page with enough words to"
        " classify well</p></body>",
        "<img src=x /><p>space before the slash self-closes with words"
        " enough here</p>",
        "<a href='q'/>quoted value then slash self-closes the anchor"
        " words words words",
    ]
    for page in pages:
        assert _fast_blocks(page) == _BlockParser().feed(page), page[:45]
    # '</na/v>' — tolerant-prefix end tags route to the stdlib walk
    from nexus_event_stream_spark.functions.html import _segment_blocks

    weird = "<nav>x</na/v><p>words words words words words words words"
    assert _fast_blocks(weird) is None
    assert _segment_blocks(weird) == _BlockParser().feed(weird)
