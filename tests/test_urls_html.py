"""URL hygiene (operators/urls.py) + HTML→text extraction
(functions/html.py): the crawl tiers between warc_documents and the
text recipe — normalization cases, subdomain blocking, earliest-fetch
URL dedup, markup stripping against hand-written expectations, and the
full WARC→corpus composition with monotone accounting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.functions.html import (
    html_title,
    html_to_text,
    looks_like_html,
)
from nexus_event_stream_spark.operators.urls import (
    filter_blocked_domains,
    normalize_url,
    url_dedup,
    url_host,
)


def _eval(spark, col, values):
    df = spark.createDataFrame([(v,) for v in values], "u string")
    return [r.o for r in df.select(col.alias("o")).collect()]


def test_normalize_url_cases(spark):
    cases = {
        # scheme/host lowercase, path case preserved
        "HTTP://ExAmple.COM/Path/File": "http://example.com/Path/File",
        # fragment dropped
        "https://a.com/x#section-2": "https://a.com/x",
        # default ports stripped (only the scheme's own default)
        "http://a.com:80/x": "http://a.com/x",
        "https://a.com:443/x": "https://a.com/x",
        "http://a.com:8080/x": "http://a.com:8080/x",
        # tracking params stripped, the rest sorted, bare ? dropped
        "https://a.com/p?utm_source=tw&id=7&fbclid=XYZ": "https://a.com/p?id=7",
        "https://a.com/p?b=2&a=1": "https://a.com/p?a=1&b=2",
        "https://a.com/p?utm_campaign=x": "https://a.com/p",
        # lone trailing slash on a bare host
        "https://a.com/": "https://a.com",
        # not a URL: untouched
        "not a url at all": "not a url at all",
    }
    got = _eval(spark, normalize_url(F.col("u")), list(cases))
    assert got == list(cases.values())
    # NULL-safe
    assert _eval(spark, normalize_url(F.col("u")), [None]) == [None]


def test_url_host_and_blocklist_subdomains(spark):
    assert _eval(
        spark, url_host(F.col("u")),
        ["https://User:pw@Sub.Example.COM:8443/p?q=1", "nope"],
    ) == ["sub.example.com", ""]
    docs = spark.createDataFrame(
        [
            (1, "https://spam.example/x"),
            (2, "https://deep.sub.spam.example/y"),
            (3, "https://notspam.example/z"),       # sibling, NOT a subdomain
            (4, "https://clean.org/a"),
            (5, None),
            (6, "garbage-no-url"),
        ],
        "doc_id long, url string",
    )
    kept = sorted(
        r.doc_id
        for r in filter_blocked_domains(docs, ["Spam.example"]).collect()
    )
    assert kept == [3, 4, 5, 6]
    # empty blocklist: identity
    assert filter_blocked_domains(docs, []).count() == 6
    # map-side: no shuffle
    plan = (
        filter_blocked_domains(docs, ["spam.example"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan


def test_url_dedup_earliest_fetch_wins(spark):
    docs = spark.createDataFrame(
        [
            (1, "https://a.com/p?b=2&a=1", "2026-08-02T00:00:00Z", "later"),
            (2, "https://A.com/p?a=1&b=2#frag", "2026-08-01T00:00:00Z", "earliest"),
            (3, "https://a.com/p?a=1&b=2&utm_source=x", "2026-08-03T00:00:00Z", "latest"),
            (4, "https://a.com/other", "2026-08-01T00:00:00Z", "other"),
            (5, None, "2026-08-01T00:00:00Z", "null-url-a"),
            (6, None, "2026-08-02T00:00:00Z", "null-url-b"),
        ],
        "doc_id long, url string, fetched_at string, text string",
    )
    out = {r.doc_id: r.text for r in url_dedup(docs, ts_col="fetched_at").collect()}
    # 1/2/3 normalize to the SAME canonical url → earliest fetch (2) wins
    assert sorted(out) == [2, 4, 5, 6]
    # without a ts column the min doc_id wins
    out2 = sorted(r.doc_id for r in url_dedup(docs).collect())
    assert out2 == [1, 4, 5, 6]
    # partition independence
    out3 = sorted(
        r.doc_id
        for r in url_dedup(docs.repartition(7), ts_col="fetched_at").collect()
    )
    assert out3 == [2, 4, 5, 6]


def test_html_to_text_extraction(spark):
    page = (
        "<!DOCTYPE html><html><head><title> My   Page </title>"
        "<style>p { color: red }</style>"
        "<script>var secret = 'tracker';</script></head>"
        "<body><!-- <script>commented()</script> -->"
        "<h1>Heading</h1>"
        "<p>First &amp; second &lt;tag&gt; &#39;quoted&#39;.</p>"
        "<div>Block one</div><div>Block two</div>"
        "<ul><li>alpha</li><li>beta</li></ul>"
        "nbsp&nbsp;joined</body></html>"
    )
    got = _eval(spark, html_to_text(F.col("u")), [page])[0]
    assert "tracker" not in got and "color: red" not in got
    assert "commented" not in got
    assert "First & second <tag> 'quoted'." in got
    assert "Heading" in got
    # block boundaries became line boundaries
    lines = got.split("\n")
    assert "Block one" in lines and "Block two" in lines
    assert "alpha" in lines and "beta" in lines
    assert "nbsp joined" in got
    # title extraction, whitespace-normalized
    assert _eval(spark, html_title(F.col("u")), [page]) == ["My Page"]
    # routing predicate
    assert _eval(
        spark, looks_like_html(F.col("u")), [page, '{"json": 1}', "plain"]
    ) == [True, False, False]
    # NULL-safe
    assert _eval(spark, html_to_text(F.col("u")), [None]) == [None]


def test_warc_corpus_with_url_and_html_tiers(spark, tmp_path):
    """The full crawl path: domain blocking → URL dedup → HTML extract →
    hygiene recipe, with monotone accounting across ALL stages."""
    from nexus_event_stream_spark.pipeline import CorpusRecipe, warc_corpus
    from nexus_event_stream_spark.sources.warc import synthesize_warc

    prose = (
        "the quick brown fox jumps over the lazy dog while the old river "
        "bank slowly erodes under heavy spring rain and children watch"
    )
    html = (
        "<html><head><title>Fox piece</title><script>x()</script></head>"
        f"<body><p>{prose}</p></body></html>"
    )

    def resp(uri, body, date="2026-08-15T00:00:01Z"):
        return {
            "type": "response", "uri": uri, "date": date,
            "payload": b"HTTP/1.1 200 OK\r\n\r\n" + body.encode(),
        }

    recs = [
        resp("https://good.example/page", html),
        resp("https://good.example/page#other", html,
             date="2026-08-16T00:00:00Z"),          # same canonical URL, later
        resp("https://ads.bad.example/x", "spam " * 30),  # blocked subdomain
        resp("https://other.example/plain", "plain text body here " * 5),
    ]
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "c.warc.gz").write_bytes(synthesize_warc(recs))

    corpus, stages = warc_corpus(
        spark, str(d) + "/*", CorpusRecipe(),
        html_extract=True, blocked_domains=["bad.example"], dedup_urls=True,
    )
    order = ["documents", "domain_filter", "url_dedup", "html_text",
             "quality", "pii", "exact_dedup", "near_dedup"]
    assert list(stages) == order
    counts = [stages[n].count() for n in order]
    assert counts[0] == 4
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    rows = {r.url: r for r in corpus.collect()}
    assert len(rows) == 2
    page = next(r for u, r in rows.items() if "good.example" in u)
    # markup gone, title kept, earliest fetch kept
    assert page.text.strip().startswith("Fox piece") or prose in page.text
    assert "<p>" not in page.text and "x()" not in page.text
    assert page.title == "Fox piece"
    assert "2026-08-15" in page.fetched_at
    # the plain-text doc passed through unextracted
    plain = rows["https://other.example/plain"]
    assert plain.title == "" and "plain text body" in plain.text
