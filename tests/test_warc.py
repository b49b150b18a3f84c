"""WARC source (sources/warc.py): spec-shaped synthesis → distributed
parse roundtrip, both framings, tolerant of corrupt members."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nexus_event_stream_spark.sources.warc import (
    http_body,
    parse_warc_records,
    read_warc,
    synthesize_warc,
)

RECS = [
    {
        "type": "warcinfo",
        "date": "2026-08-15T00:00:00Z",
        "content_type": "application/warc-fields",
        "payload": b"software: synthetic\r\n",
    },
    {
        "type": "response",
        "uri": "https://example.com/a",
        "date": "2026-08-15T00:00:01Z",
        "content_type": "application/http; msgtype=response",
        "payload": (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
            b"<html>hello warc</html>"
        ),
    },
    {
        "type": "response",
        "uri": "https://example.com/b",
        "date": "2026-08-15T00:00:02Z",
        "content_type": "application/http; msgtype=response",
        "payload": b"HTTP/1.1 404 Not Found\r\n\r\nmissing",
    },
    {
        "type": "request",
        "uri": "https://example.com/b",
        "date": "2026-08-15T00:00:02Z",
        "payload": b"GET /b HTTP/1.1\r\nHost: example.com\r\n\r\n",
    },
]


@pytest.mark.parametrize("gz", [True, False])
def test_parse_roundtrip_both_framings(gz):
    blob = synthesize_warc(RECS, gzip_members=gz)
    records, skipped = parse_warc_records(blob)
    assert skipped == 0
    assert len(records) == 4
    assert [h["warc-type"] for h, _p in records] == [
        "warcinfo", "response", "response", "request",
    ]
    assert records[1][0]["warc-target-uri"] == "https://example.com/a"
    assert records[1][1] == RECS[1]["payload"]
    # binary-exact payloads (Content-Length framing, not delimiter)
    assert records[2][1] == RECS[2]["payload"]


def test_http_body_extraction():
    assert http_body(RECS[1]["payload"]) == b"<html>hello warc</html>"
    assert http_body(b"no http header here") == b"no http header here"


def test_corrupt_members_skipped_not_fatal():
    good = synthesize_warc(RECS[:2])
    # truncate the last gzip member mid-stream
    truncated = good[:-20]
    records, _sk = parse_warc_records(truncated)
    assert len(records) == 1  # first member intact
    # a non-WARC gzip member in the middle is skipped, the rest parse
    import gzip, io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as z:
        z.write(b"not a warc record at all")
    mixed = (
        synthesize_warc(RECS[:1]) + buf.getvalue() + synthesize_warc(RECS[1:2])
    )
    records, skipped = parse_warc_records(mixed)
    assert len(records) == 2 and skipped == 1


def test_read_warc_distributed(spark, tmp_path):
    from nexus_event_stream_spark.operators.quality import quality_signals

    d = tmp_path / "warc"
    d.mkdir()
    (d / "part-0.warc.gz").write_bytes(synthesize_warc(RECS))
    (d / "part-1.warc").write_bytes(
        synthesize_warc(
            [
                {
                    "type": "response",
                    "uri": "https://example.com/c",
                    "payload": b"HTTP/1.1 200 OK\r\n\r\nplain framing body",
                }
            ],
            gzip_members=False,
        )
    )
    df = read_warc(spark, str(d) + "/*")
    rows = df.collect()
    assert len(rows) == 5
    by_uri = {r.target_uri: r for r in rows if r.target_uri}
    assert bytes(by_uri["https://example.com/a"].payload) == RECS[1]["payload"]
    assert (
        http_body(bytes(by_uri["https://example.com/c"].payload))
        == b"plain framing body"
    )
    # the published consumption shape: responses → http body → text tier
    # (pure Catalyst: decode + locate the header/body blank line)
    from pyspark.sql import functions as F

    s = F.decode(F.col("payload"), "ISO-8859-1")
    sep = F.instr(s, "\r\n\r\n")
    body_text = F.when(
        (sep > 0) & s.startswith("HTTP/"), F.substring(s, sep + 4, 1 << 24)
    ).otherwise(s)
    texts = (
        df.filter(F.col("warc_type") == "response")
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            body_text.alias("text"),
        )
    )
    assert quality_signals(texts).count() == 3
    # zero shuffle for the read itself
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_read_warc_stream_end_to_end(spark, tmp_path):
    """Streaming twin: files arriving become record rows per micro-batch
    through a real Structured Streaming run, identical rows to the batch
    reader."""
    from nexus_event_stream_spark.sources.warc import read_warc_stream

    src = tmp_path / "crawl"
    src.mkdir()
    (src / "a.warc.gz").write_bytes(synthesize_warc(RECS[:2]))
    (src / "b.warc.gz").write_bytes(synthesize_warc(RECS[2:]))
    out = tmp_path / "out"
    stream = read_warc_stream(spark, str(src) + "/*")
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.target_uri, bytes(r.payload))
        for r in spark.read.parquet(str(out)).collect()
    }
    want = {
        (r.target_uri, bytes(r.payload))
        for r in read_warc(spark, str(src) + "/*").collect()
    }
    assert got == want and len(got) == 4


def test_mid_file_corruption_resyncs_and_whole_file_gzip_splits():
    """Regression (review r9): (a) a corrupt gzip member mid-file must
    COUNT as skipped and the walk must resync — the tail records
    survive; (b) whole-file gzip (one member, many records) yields every
    record, not just the first."""
    import gzip, io

    # (a) good + corrupt + good
    good_a = synthesize_warc(RECS[:1])
    good_b = synthesize_warc(RECS[1:2])
    corrupt = bytearray(synthesize_warc(RECS[2:3]))
    corrupt[15] ^= 0xFF  # breaks the deflate stream, keeps the magic
    records, skipped = parse_warc_records(good_a + bytes(corrupt) + good_b)
    assert len(records) == 2 and skipped == 1
    assert records[1][0]["warc-target-uri"] == "https://example.com/a"
    # (b) `gzip file.warc` framing: one member, all records inside
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as z:
        z.write(synthesize_warc(RECS, gzip_members=False))
    records, skipped = parse_warc_records(buf.getvalue())
    assert skipped == 0 and len(records) == 4
    assert records[1][1] == RECS[1]["payload"]


LONG_A = (
    "the quick brown fox jumps over the lazy dog while the old river bank "
    "slowly erodes under heavy spring rain and the village children watch "
    "from the wooden bridge every single morning before school begins"
)


def _http(body: str) -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body.encode()
    )


def test_warc_corpus_end_to_end_recipe(spark, tmp_path):
    """The Common-Crawl-to-corpus path a user actually runs: synthesized
    WARC files (both framings) → warc_documents → the full default
    hygiene recipe, with monotone row accounting at every stage and
    deterministic, replayable doc ids."""
    from nexus_event_stream_spark.pipeline import CorpusRecipe, warc_corpus
    from nexus_event_stream_spark.sources.warc import warc_documents

    near = LONG_A.replace("wooden", "stone")
    pii = (
        "reach the maintainer at crawl.owner@example.org for takedown "
        "requests about this long and perfectly reasonable document"
    )
    low_q = "a a a a a a a a a a a a a a a a a a"
    recs1 = [
        {"type": "warcinfo", "payload": b"software: synthetic\r\n"},
        {"type": "response", "uri": "https://a.example/1",
         "date": "2026-08-15T00:00:01Z", "payload": _http(LONG_A)},
        {"type": "response", "uri": "https://a.example/dup",
         "payload": _http(LONG_A)},  # exact duplicate, different uri
        {"type": "request", "uri": "https://a.example/1",
         "payload": b"GET /1 HTTP/1.1\r\n\r\n"},
    ]
    recs2 = [
        {"type": "response", "uri": "https://b.example/near",
         "payload": _http(near)},  # near-dup (one word changed)
        {"type": "response", "uri": "https://b.example/pii",
         "payload": _http(pii)},
        {"type": "response", "uri": "https://b.example/lowq",
         "payload": _http(low_q)},
    ]
    d = tmp_path / "crawl"
    d.mkdir()
    (d / "part-1.warc.gz").write_bytes(synthesize_warc(recs1, gzip_members=True))
    (d / "part-2.warc").write_bytes(synthesize_warc(recs2, gzip_members=False))

    corpus, stages = warc_corpus(spark, str(d) + "/*", CorpusRecipe())
    # row accounting: the crawl → corpus funnel is monotone
    order = ["documents", "quality", "pii", "exact_dedup", "near_dedup"]
    assert list(stages) == order
    counts = {name: stages[name].count() for name in order}
    assert counts["documents"] == 5  # responses only; warcinfo/request dropped
    vals = [counts[n] for n in order]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert counts["quality"] == 4  # low-quality doc gated
    assert counts["exact_dedup"] == 3  # exact copy collapsed
    assert counts["near_dedup"] == 2  # near-dup collapsed

    rows = corpus.collect()
    texts = {r.url: r.text for r in rows}
    assert len(rows) == 2
    # the LONG_A near-dup component keeps exactly ONE copy — WHICH copy
    # depends on the min doc_id, and ids hash the (tmp) file path, so
    # either the wooden or the stone variant is a legitimate keeper
    a_like = [t for t in texts.values() if "river bank" in t]
    assert len(a_like) == 1
    pii_text = texts["https://b.example/pii"]
    assert "<EMAIL>" in pii_text and "crawl.owner" not in pii_text
    # metadata rides through the whole funnel
    assert all(r.doc_id is not None and r.url for r in rows)

    # deterministic ids: a re-run over the same files reproduces the
    # exact same keeper decisions
    again, _ = warc_corpus(spark, str(d) + "/*", CorpusRecipe())
    assert {r.doc_id for r in again.collect()} == {r.doc_id for r in rows}

    # warc_documents alone: ids unique, header block stripped
    docs = warc_documents(read_warc(spark, str(d) + "/*"))
    ids = [r.doc_id for r in docs.collect()]
    assert len(ids) == len(set(ids)) == 5
    assert not any("HTTP/1.1" in (r.text or "") for r in docs.collect())


def test_large_body_not_truncated(spark, tmp_path):
    """Regression: the header-strip expression used a fixed 16 MiB
    substring cap — a response body beyond it was silently cut."""
    from nexus_event_stream_spark.sources.warc import warc_documents

    big = "x" * ((1 << 24) + 512)  # 16 MiB + 512 chars
    recs = [{"type": "response", "uri": "https://big.example/1",
             "payload": _http(big)}]
    d = tmp_path / "big"
    d.mkdir()
    (d / "big.warc").write_bytes(synthesize_warc(recs, gzip_members=False))
    docs = warc_documents(read_warc(spark, str(d) + "/*"))
    row = docs.select(F.length("text").alias("n")).first()
    assert int(row.n) == len(big)


# ---------------------------------------------------------------------------
# crawl governance: robots opt-out tier (r11)
# ---------------------------------------------------------------------------

def _http_hb(headers: bytes, body: bytes) -> bytes:
    return b"HTTP/1.1 200 OK\r\n" + headers + b"\r\n" + body


ROBOTS_RECS = [
    # 0: clean page — kept
    {"type": "response", "uri": "https://a.com/ok",
     "payload": _http_hb(b"Content-Type: text/html\r\n",
                      b"<html><p>normal page</p></html>")},
    # 1: X-Robots-Tag: noindex in the HEADER — dropped
    {"type": "response", "uri": "https://a.com/h1",
     "payload": _http_hb(b"X-Robots-Tag: noindex\r\n", b"<html>secret</html>")},
    # 2: bot-scoped noai header — dropped
    {"type": "response", "uri": "https://a.com/h2",
     "payload": _http_hb(b"x-robots-tag: ccbot: noai\r\n", b"<html>x</html>")},
    # 3: meta robots noindex, unquoted attrs — dropped
    {"type": "response", "uri": "https://a.com/m1",
     "payload": _http_hb(b"", b"<html><head><meta name=robots content=noindex>"
                          b"</head>body</html>")},
    # 4: meta robots with content BEFORE name — dropped
    {"type": "response", "uri": "https://a.com/m2",
     "payload": _http_hb(b"", b'<html><meta content="none" name="robots">x</html>')},
    # 5: meta robots "index, follow" — kept (no opt-out token)
    {"type": "response", "uri": "https://a.com/m3",
     "payload": _http_hb(b"", b'<meta name="robots" content="index, follow">ok')},
    # 6: name=description mentioning noindex — kept (not a robots tag)
    {"type": "response", "uri": "https://a.com/m4",
     "payload": _http_hb(b"", b'<meta name="description" content="about noindex">ok')},
    # 7: the DIRECTIVE TEXT in the body, not the header — kept
    #    (position matters: headers end at the first blank line)
    {"type": "response", "uri": "https://a.com/b1",
     "payload": _http_hb(b"", b"docs page quoting X-Robots-Tag: noindex headers")},
    # 8: "noindexable" as a longer word — kept (whole-word match only)
    {"type": "response", "uri": "https://a.com/b2",
     "payload": _http_hb(b"X-Robots-Tag: noindexable-custom\r\n", b"ok")},
    # 9: non-HTTP resource record payload — kept (no headers to carry a tag)
    {"type": "response", "uri": "https://a.com/r1",
     "payload": b"plain resource bytes, no http envelope"},
]


def test_robots_opt_out_flag_and_positions(spark, tmp_path):
    from nexus_event_stream_spark.sources.warc import warc_documents

    d = tmp_path / "warc"
    d.mkdir()
    (d / "g.warc").write_bytes(synthesize_warc(ROBOTS_RECS))
    docs = warc_documents(
        read_warc(spark, str(d) + "/*"), respect_robots=True
    )
    rows = {r.url: r.robots_opt_out for r in docs.collect()}
    dropped = {u for u, f in rows.items() if f}
    assert dropped == {
        "https://a.com/h1", "https://a.com/h2",
        "https://a.com/m1", "https://a.com/m2",
    }
    # flag column only appears when asked
    base = warc_documents(read_warc(spark, str(d) + "/*"))
    assert "robots_opt_out" not in base.columns


def test_warc_corpus_respects_robots_first(spark, tmp_path):
    from nexus_event_stream_spark.pipeline import CorpusRecipe, warc_corpus

    d = tmp_path / "warc"
    d.mkdir()
    (d / "g.warc").write_bytes(synthesize_warc(ROBOTS_RECS))
    recipe = CorpusRecipe(
        quality=False, redact_pii=False, exact_dedup=False, near_dedup=False
    )
    corpus, stages = warc_corpus(
        spark, str(d) + "/*", recipe=recipe, respect_robots=True
    )
    assert list(stages)[:2] == ["documents", "robots_opt_out"]
    n_docs = stages["documents"].count()
    n_kept = stages["robots_opt_out"].count()
    assert (n_docs, n_kept) == (10, 6)
    urls = {r.url for r in corpus.collect()}
    assert "https://a.com/h1" not in urls and "https://a.com/ok" in urls
    # the flag column does not leak into the corpus schema
    assert "robots_opt_out" not in corpus.columns
