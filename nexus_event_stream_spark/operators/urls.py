"""URL hygiene for crawl corpora — normalization, domain blocking, and
URL-grain dedup, pure Catalyst.

Published crawl pipelines (C4, RefinedWeb, Gopher's MassiveWeb) run a
URL tier BEFORE any content tier: normalize the URL, drop documents
from blocked domains (adult/spam/banned lists), and keep ONE fetch per
canonical URL (crawls re-fetch pages across snapshots — URL dedup is
the cheapest dedup in the whole stack because the key is bytes you
already have). All three are column expressions + one broadcast join +
one keyed aggregation — scan-bandwidth stages at 100 TB.

Boundary note: "registered domain" matching uses the public-suffix
HEURISTIC (last two labels, e.g. ``example.com``; ``example.co.uk``
style ccTLD suffixes need the public-suffix list — ship it as a
broadcast table in production and the join below is unchanged). The
blocklist join matches a blocked domain AND every subdomain of it.

No reference counterpart — north-star ingestion tier.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "normalize_url",
    "url_host",
    "filter_blocked_domains",
    "url_dedup",
    "TRACKING_PARAMS",
]

#: query parameters that identify the CLICK, not the document — the
#: standard strip list (utm_* is a prefix match)
TRACKING_PARAMS = (
    "fbclid", "gclid", "msclkid", "dclid", "igshid", "mc_cid", "mc_eid",
    "ref", "ref_src", "spm", "yclid",
)


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(c: Column | str) -> Column:
    """Lowercased host of a URL ('' when unparseable): strip scheme,
    credentials, port, path. Pure regex — no driver parsing."""
    host = F.regexp_extract(
        _col(c), r"(?i)^[a-z][a-z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)", 1
    )
    return F.lower(host)


def normalize_url(c: Column | str) -> Column:
    """Canonical form of a URL, NULL-safe:

    - scheme and host lowercase (they are case-insensitive; paths are
      NOT touched — path case is significant);
    - fragment dropped (never sent to the server — two URLs differing
      only in ``#...`` are the same fetch);
    - default ports stripped (``:80`` for http, ``:443`` for https);
    - tracking query parameters removed (``utm_*`` + TRACKING_PARAMS),
      remaining parameters SORTED (param order is almost always
      insignificant and crawlers emit both orders), ``?`` dropped when
      nothing survives;
    - a single trailing ``/`` on a bare host normalized away.
    """
    u = _col(c)
    scheme = F.lower(F.regexp_extract(u, r"(?i)^([a-z][a-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"(?i)^[a-z][a-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")  # fragment
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]+)", 1))
    tail = F.regexp_replace(rest, r"^[^/?#]+", "")  # /path?query
    host = F.when(
        (scheme == "http") & hostport.endswith(":80"),
        F.regexp_replace(hostport, r":80$", ""),
    ).when(
        (scheme == "https") & hostport.endswith(":443"),
        F.regexp_replace(hostport, r":443$", ""),
    ).otherwise(hostport)
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    query = F.regexp_extract(tail, r"\?(.*)$", 1)
    keep = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (F.length(p) > 0)
            & ~F.lower(p).startswith("utm_")
            & ~F.lower(F.regexp_extract(p, r"^([^=]*)", 1)).isin(
                *TRACKING_PARAMS
            ),
        )
    )
    qnorm = F.when(
        F.size(keep) > 0, F.concat(F.lit("?"), F.array_join(keep, "&"))
    ).otherwise(F.lit(""))
    pathnorm = F.when(path == "/", F.lit("")).otherwise(path)
    out = F.concat(scheme, F.lit("://"), host, pathnorm, qnorm)
    # not a scheme://host URL at all → pass through untouched (a later
    # blocklist/dedup stage still keys on it consistently)
    return F.when(scheme == "", u).otherwise(out)


def filter_blocked_domains(
    docs: DataFrame,
    blocked: list[str] | DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop documents whose URL host is a blocked domain OR any
    subdomain of one.

    The blocklist is LIST-SIZED by contract (domain blocklists are
    thousands of entries, not millions) and compiles into a literal
    ``isin`` over the host's domain suffixes (``a.b.example.com``
    matches a block on ``example.com`` or ``b.example.com``) — a pure
    map-side filter, zero shuffle, pushdown-friendly. A DataFrame
    blocklist is collected once at call time (same contract).
    NULL/unparseable hosts pass through — the quality tiers own content
    judgment, this stage owns provenance."""
    if isinstance(blocked, DataFrame):
        blocked = [r[0] for r in blocked.select("domain").collect()]
    doms = sorted({d.lower().lstrip(".") for d in blocked if d})
    if not doms:
        return docs
    host = url_host(F.col(url_col))
    labels = F.split(host, r"\.")
    n = F.size(labels)
    # suffixes of length 2..n (single labels like "com" are never a
    # registrable block target)
    suffixes = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(2), n),
            lambda k: F.array_join(F.slice(labels, n - k + 1, k), "."),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hit = F.exists(suffixes, lambda d: d.isin(*doms))
    return docs.filter(~F.coalesce(hit, F.lit(False)))


def url_dedup(
    docs: DataFrame,
    url_col: str = "url",
    ts_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """One document per canonical URL: group by ``normalize_url`` and
    keep the earliest fetch (min ``ts_col``, ties and the no-timestamp
    case broken by min ``id_col`` — deterministic under any
    partitioning). Documents with a NULL url are all kept (no key, no
    dedup claim). ONE shuffle on the canonical-url key with a
    WindowGroupLimit map-side pre-drop."""
    canon = normalize_url(F.col(url_col))
    order = (
        [F.col(ts_col).asc_nulls_last(), F.col(id_col).asc()]
        if ts_col
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy(F.col("__canon")).orderBy(*order)
    keyed = docs.withColumn("__canon", canon)
    with_url = (
        keyed.filter(F.col("__canon").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__canon")
    )
    return with_url.unionByName(
        keyed.filter(F.col("__canon").isNull()).drop("__canon")
    )
