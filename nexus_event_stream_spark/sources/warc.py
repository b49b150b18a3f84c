"""WARC source — distributed parsing of web-archive files, the format
100 TB text pipelines actually ingest (Common Crawl publishes WARC).

Format facts (public: ISO 28500 / the WARC 1.0-1.1 spec; Common Crawl's
layout docs):

- A WARC file is a sequence of records: a ``WARC/1.x\\r\\n`` version
  line, MIME-style headers (``WARC-Type``, ``WARC-Target-URI``,
  ``WARC-Date``, ``Content-Length``, ...), a blank line, then exactly
  ``Content-Length`` payload bytes, then ``\\r\\n\\r\\n``.
- Common Crawl gzips each record as its OWN gzip member and
  concatenates the members, so a reader can split on member boundaries
  without decompressing the whole file; stdlib ``zlib`` handles member
  iteration. Plain (uncompressed) WARC is split on version lines.
- ``response`` records wrap an HTTP response: status line + HTTP
  headers + body. The body is what a text pipeline wants; headers ride
  along as metadata.

Scale shape: ``spark.read.format("binaryFile")`` distributes WHOLE
files to executors (WARC's gzip-member framing is splittable in
principle, but member offsets aren't indexed — Common Crawl ships
files pre-sized at ~1 GB so file-grain parallelism is the published
consumption pattern, matching every public CC reader); an Arrow kernel
walks each file's records and emits one row per record. Payload bytes
never visit the driver. Malformed records/members are skipped with a
per-file counter (tolerant reader — the crawl is full of truncated
members), never a failed task.

No reference counterpart — north-star ingestion tier. ``synthesize_warc``
builds spec-shaped files (both plain and per-record-gzip) for tests.
"""

from __future__ import annotations

import io
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

__all__ = [
    "read_warc",
    "read_warc_stream",
    "parse_warc_records",
    "synthesize_warc",
    "http_body",
    "warc_documents",
]

WARC_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("record_idx", T.IntegerType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("skipped_in_file", T.IntegerType()),
    ]
)


def _gzip_members(blob: bytes) -> Iterator[bytes | None]:
    """Decompress a concatenation of gzip members one member at a time
    (the Common Crawl record framing). A corrupt/truncated member yields
    ``None`` (so the caller can COUNT it) and the walk RESYNCS at the
    next gzip magic — one bad member loses itself, never the file's
    tail."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(blob[pos:])
        except zlib.error:
            yield None
            nxt = blob.find(b"\x1f\x8b", pos + 2)
            if nxt < 0:
                return
            pos = nxt
            continue
        yield out + d.flush()
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            return
        pos += consumed


def _parse_record(raw: bytes):
    """One decompressed record → (headers dict, payload bytes) or None."""
    if not raw.startswith(b"WARC/"):
        return None
    head_end = raw.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    headers: dict[str, str] = {}
    lines = raw[:head_end].split(b"\r\n")[1:]  # drop the version line
    for ln in lines:
        k, sep, v = ln.partition(b":")
        if sep:
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
    try:
        length = int(headers.get("content-length", ""))
    except ValueError:
        return None
    body_start = head_end + 4
    if body_start + length > len(raw):
        return None  # truncated payload
    return headers, raw[body_start : body_start + length]


def _split_records(data: bytes) -> list[bytes]:
    """Split a decompressed byte run into record chunks: records are
    separated by ``\\r\\n\\r\\n`` after payloads, so split on version
    lines (a payload containing ``\\r\\n\\r\\nWARC/`` is pathological
    and lands in the skip counter)."""
    parts = data.split(b"\r\n\r\nWARC/")
    return [parts[0]] + [b"WARC/" + p for p in parts[1:]]


def parse_warc_records(blob: bytes):
    """All records of one WARC file, plus the count of malformed
    records/members skipped. Handles all three framings in the wild:
    per-record gzip members (Common Crawl — a corrupt member is counted
    and the walk resyncs at the next magic), whole-file gzip (one member
    holding many records — each member is re-split on record
    boundaries), and plain WARC. Pure function — the Spark kernel and
    tests share it."""
    records = []
    skipped = 0
    if blob[:2] == b"\x1f\x8b":
        pieces: list[bytes] = []
        for member in _gzip_members(blob):
            if member is None:
                skipped += 1
                continue
            pieces.extend(_split_records(member))
        chunks: Iterator[bytes] = iter(pieces)
    else:
        chunks = iter(_split_records(blob))
    for raw in chunks:
        if not raw.strip(b"\r\n"):
            continue
        parsed = _parse_record(raw)
        if parsed is None:
            skipped += 1
            continue
        records.append(parsed)
    return records, skipped


def _records_kernel(it):
    """Shared Arrow kernel: (path, content) batches → WARC record rows."""
    import pandas as pd

    for pdf in it:
        rows: dict[str, list] = {f.name: [] for f in WARC_SCHEMA.fields}
        for fname, blob in zip(pdf["path"], pdf["content"]):
            recs, skipped = parse_warc_records(bytes(blob or b""))
            for i, (hdr, payload) in enumerate(recs):
                rows["file"].append(fname)
                rows["record_idx"].append(i)
                rows["warc_type"].append(hdr.get("warc-type"))
                rows["target_uri"].append(hdr.get("warc-target-uri"))
                rows["warc_date"].append(hdr.get("warc-date"))
                rows["record_id"].append(hdr.get("warc-record-id"))
                rows["content_type"].append(hdr.get("content-type"))
                rows["payload"].append(payload)
                rows["skipped_in_file"].append(skipped)
        yield pd.DataFrame(rows)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Distributed WARC reader: one row per record — (file, record_idx,
    warc_type, target_uri, warc_date, record_id, content_type, payload,
    skipped_in_file). ``binaryFile`` hands whole files to executors; an
    Arrow kernel walks the records. Filter ``warc_type = 'response'``
    and feed ``http_body(payload)`` to the text tiers."""
    files = spark.read.format("binaryFile").load(path).select(
        "path", "content"
    )
    return files.mapInPandas(_records_kernel, WARC_SCHEMA)


def read_warc_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of ``read_warc``: new WARC files landing under
    ``path`` become record rows per micro-batch (Structured Streaming's
    file source tracks arrivals exactly-once through its checkpoint).
    The continuous-crawl ingestion front end — feed it straight into
    ``start_dedup_ingest`` / ``start_search_index``. Same kernel as the
    batch reader, so the two cannot drift."""
    # binaryFile's schema is FIXED by the source; the stream API just
    # requires it stated explicitly
    binfile_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("modificationTime", T.TimestampType()),
            T.StructField("length", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(binfile_schema)
        .load(path)
        .select("path", "content")
    )
    return files.mapInPandas(_records_kernel, WARC_SCHEMA)


#: opt-out directives honored by the governance tier: the robots-exclusion
#: tokens that mean "do not reuse this content" ("none" implies noindex per
#: the protocol) plus the published AI-reuse opt-outs.
ROBOTS_OPTOUT_TOKENS = ("noindex", "none", "noai", "noimageai")

_OPTOUT = "|".join(ROBOTS_OPTOUT_TOKENS)
#: header directive: an X-Robots-Tag line INSIDE the HTTP header block
#: (optionally bot-scoped, e.g. "X-Robots-Tag: ccbot: noai") carrying an
#: opt-out token as a whole word
_HDR_RE = rf"(?i)\n[ \t]*x-robots-tag[ \t]*:[^\r\n]*\b({_OPTOUT})\b"
#: meta directive: an actual <meta> TAG with name=robots and an opt-out
#: token in content= — both attribute orders
_META_RE = (
    rf"(?i)<meta\b[^>]*name[ \t]*=[ \t]*[\"']?robots[\"']?[^>]*"
    rf"content[ \t]*=[ \t]*[\"']?[^\"'>]*\b({_OPTOUT})\b"
    rf"|(?i)<meta\b[^>]*content[ \t]*=[ \t]*[\"']?[^\"'>]*\b({_OPTOUT})\b"
    rf"[^>]*name[ \t]*=[ \t]*[\"']?robots[\"']?"
)


def warc_documents(
    records: DataFrame, respect_robots: bool = False
) -> DataFrame:
    """Response records → the engine's document relation
    ``(doc_id, url, fetched_at, text)`` — the published
    Common-Crawl-to-corpus front half, pure Catalyst on top of
    ``read_warc``/``read_warc_stream`` rows (works on both).

    - ``doc_id`` is deterministic: ``xxhash64(file, record_idx)`` — a
      re-run over the same files mints the same ids, which is what makes
      downstream dedup keepers and forget requests replayable (record
      ids alone are NOT unique across independently-written files).
    - the HTTP header block is stripped in-expression (the
      ``http_body`` twin: locate the first blank line after an
      ``HTTP/`` status line); non-HTTP payloads pass through whole.
    - bytes decode as ISO-8859-1 — the lossless byte↔char map, so no
      payload can fail the scan; charset NORMALIZATION (meta/BOM
      sniffing) is a production kernel behind the usual environment
      boundary, same stance as codec decode.
    - ``respect_robots=True`` appends a ``robots_opt_out`` flag — the
      crawl-governance tier: true iff the HTTP HEADER block carries an
      ``X-Robots-Tag`` directive with one of ``ROBOTS_OPTOUT_TOKENS``
      (header position matters: the same text in the BODY does not
      flag), or the body carries a real ``<meta name=robots>`` tag whose
      ``content`` holds one. Computed in the SAME projection as the
      header strip — the header text is inspected before it is dropped,
      at zero extra passes.
    """
    s = F.decode(F.col("payload"), "ISO-8859-1")
    sep = F.instr(s, "\r\n\r\n")
    is_http = (sep > 0) & s.startswith("HTTP/")
    body = F.when(
        is_http,
        # length = the string's own length: an explicit constant cap
        # would silently truncate bodies beyond it
        F.substring(s, sep + 4, F.length(s)),
    ).otherwise(s)
    cols = [
        F.xxhash64("file", "record_idx").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").alias("fetched_at"),
        body.alias("text"),
    ]
    if respect_robots:
        headers = F.when(is_http, F.substring(s, 1, sep - 1)).otherwise(
            F.lit("")
        )
        cols.append(
            (
                F.regexp_like(headers, F.lit(_HDR_RE))
                | F.regexp_like(body, F.lit(_META_RE))
            ).alias("robots_opt_out")
        )
    return records.filter(F.col("warc_type") == "response").select(*cols)


def http_body(payload: bytes) -> bytes:
    """Body of an HTTP response payload (a ``response`` record's content
    after the status line + headers); the whole payload when no HTTP
    header block is present (e.g. ``resource`` records)."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0 or not payload[:5].startswith(b"HTTP/"):
        return payload
    return payload[sep + 4 :]


def synthesize_warc(
    records: list[dict],
    gzip_members: bool = True,
) -> bytes:
    """Spec-shaped WARC bytes from record dicts
    (``{"type", "uri", "date", "payload", ...}``) — per-record gzip
    members (the Common Crawl framing) or plain concatenation."""
    import gzip as _gzip

    out = bytearray()
    for i, r in enumerate(records):
        payload = r.get("payload", b"")
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + r.get("type", "response").encode(),
            b"WARC-Record-ID: <urn:uuid:%08d>" % i,
        ]
        if r.get("uri"):
            headers.append(b"WARC-Target-URI: " + r["uri"].encode())
        if r.get("date"):
            headers.append(b"WARC-Date: " + r["date"].encode())
        if r.get("content_type"):
            headers.append(b"Content-Type: " + r["content_type"].encode())
        headers.append(b"Content-Length: %d" % len(payload))
        rec = b"\r\n".join(headers) + b"\r\n\r\n" + payload + b"\r\n\r\n"
        if gzip_members:
            buf = io.BytesIO()
            with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out += buf.getvalue()
        else:
            out += rec
    return bytes(out)
