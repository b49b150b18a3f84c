"""LLM-data-pipeline query catalog (north-star extensions, SURVEY.md §2.11
X tier): dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash /
embedding near-dup), similarity search, text analysis, multimodal metadata.

EVERY query here has a full DuckDB value oracle — including MinHash-LSH
(possible only because the pipeline uses the engine-portable polynomial
hash of functions/text.py instead of xxhash64) and both ANN variants
(seeded hyperplanes / seeded codebook enter the oracle as SQL literals
with identical fold order).

Registered into the same CATALOG as plans/catalog.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from nexus_event_stream_spark.functions.text import (
    HASH_MOD,
    HASH_MULT,
    STOPWORDS,
    doc_fingerprint,
    tokens,
)
from nexus_event_stream_spark.io import load_table, spread
from nexus_event_stream_spark.operators.dedup import (
    dedup_groups,
    exact_dedup_annotate,
    minhash_coeffs,
    minhash_dedup,
    ngram_jaccard_pairs,
)
from nexus_event_stream_spark.operators.multimodal import documents_as_media
from nexus_event_stream_spark.operators.quality import (
    PII_PATTERNS,
    benchmark_ngrams,
    decontaminate,
    pii_redact,
    quality_signals,
    segment_dedup,
)
from nexus_event_stream_spark.operators.similarity import (
    ann_topk_per_vector,
    brute_force_topk,
    exact_top1_per_vector_blocked,
)
from nexus_event_stream_spark.plans.catalog import register

# ---------------------------------------------------------------------------
# Shared SQL fragments (DuckDB side of the portable primitives)
# ---------------------------------------------------------------------------

M = HASH_MOD

#: quantized-integer dot product of two FLOAT[] lists (scale 1e4)
Q = "CAST(ROUND(CAST({x} AS DOUBLE)*10000,0) AS BIGINT)"
SQL_DOT = (
    "list_sum(list_transform(list_zip({a},{b}), "
    f"p -> {Q.format(x='p[1]')}*{Q.format(x='p[2]')}))"
)
SQL_NORM = f"list_sum(list_transform({{a}}, x -> {Q.format(x='x')}*{Q.format(x='x')}))"


def sql_cosine(a: str, b: str, na: str, nb: str) -> str:
    return (
        f"CAST({SQL_DOT.format(a=a, b=b)} AS DOUBLE)"
        f"/SQRT(CAST({na} AS DOUBLE)*CAST({nb} AS DOUBLE))"
    )


#: portable polynomial string hash (mirrors functions.text.portable_string_hash)
SQL_STR_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(string_split({s},''), ch -> CAST(ascii(ch) AS BIGINT))), "
    f"(acc, c) -> (acc*{HASH_MULT} + c) % {M})"
)

#: distinct word 3-grams of a text column
SQL_NGRAMS3 = (
    "list_distinct(list_transform("
    "range(1, greatest(len(string_split({t},' '))-2, 0)+1), "
    "i -> array_to_string(list_slice(string_split({t},' '), i, i+2), ' ')))"
)

SQL_JACCARD = (
    "CAST(len(list_intersect({a},{b})) AS DOUBLE)"
    "/(len({a})+len({b})-len(list_intersect({a},{b})))"
)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "q_text_analysis",
    f"""
    SELECT lang, source, COUNT(*) AS n_docs,
      CAST(SUM(n_chars) AS DOUBLE)/COUNT(*) AS avg_chars,
      CAST(SUM(len(string_split(text,' '))) AS DOUBLE)/COUNT(*) AS avg_tokens,
      CAST(SUM(length(text) - length(regexp_replace(text,'[^a-zA-Z0-9 ]','','g')))
           AS DOUBLE)/SUM(length(text)) AS punct_ratio,
      CAST(SUM(len(list_filter(string_split(text,' '),
                    t -> t IN {tuple(STOPWORDS)})))
           AS DOUBLE)/SUM(len(string_split(text,' '))) AS stopword_ratio,
      CAST(SUM(CASE WHEN len(list_filter(string_split(text,' '),
                    t -> t IN {tuple(STOPWORDS)}))*5
                    >= len(string_split(text,' '))
               THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_en
    FROM documents GROUP BY GROUPING SETS ((lang), (source))
    """,
    doc="Text-analysis suite over documents: per-language AND per-source "
    "stats in one Expand+aggregate pass (GROUPING SETS) — doc counts, "
    "avg chars/tokens, punctuation and stopword ratios (quality "
    "signals), and the stopword-density language-ID heuristic "
    "(n_pred_en = docs the rule calls English). All ratios divide "
    "exactly-summed integers. Subsumes round-1's q_lang_id and "
    "q_quality_score.",
)
def q_text_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tok = F.size(toks)
    n_punct = F.length("text") - F.length(
        F.regexp_replace(F.col("text"), r"[^a-zA-Z0-9 ]", "")
    )
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    return docs.groupingSets([["lang"], ["source"]], "lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
        (F.sum(n_tok).cast("double") / F.count(F.lit(1))).alias("avg_tokens"),
        (F.sum(n_punct).cast("double") / F.sum(F.length("text"))).alias("punct_ratio"),
        (F.sum(n_stop).cast("double") / F.sum(n_tok)).alias("stopword_ratio"),
        F.sum(F.when(n_stop * 5 >= n_tok, 1).otherwise(0)).alias("n_pred_en"),
    )


@register(
    "q_doc_profile",
    rf"""
    SELECT doc_id,
      list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(string_split(text,' '),
          t -> CAST(ascii(substring(t,1,1)) AS BIGINT)*131
               + CAST(length(t) AS BIGINT))),
        (acc, x) -> (acc*31 + x) % {M}) AS fingerprint,
      CAST(list_sum(list_transform(range(0,16), j -> CASE WHEN
        list_sum(list_transform(
          list_transform(list_distinct(string_split(text,' ')),
                         t -> {SQL_STR_HASH.format(s='t')}),
          h -> 2*(CAST(FLOOR(h / pow(2, j)) AS BIGINT) % 2) - 1)) >= 0
        THEN CAST(pow(2, j) AS BIGINT) ELSE CAST(0 AS BIGINT) END)) AS BIGINT)
      AS simhash,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
        AS BIGINT) AS bpe_ish_tokens
    FROM documents
    """,
    doc="Per-document profile in one narrow map: rolling polynomial "
    "fingerprint (exact BIGINT fold), 16-bit SimHash (near-dups differ "
    "in few bits; pair query in operators/dedup.py), and token counts "
    "both ways — whitespace and a BPE-ish regex (letter-runs | "
    "digit-runs | single punctuation, the GPT-style pre-tokenizer "
    "shape). Subsumes round-1's q_doc_fingerprint/q_simhash/q_token_bpe.",
)
def q_doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_event_stream_spark.operators.dedup import (
        simhash_from_hashes,
        token_hashes,
    )

    # spread(): 16 SimHash bit-folds over per-token hashes is HOF-heavy
    # map compute — same single-core trap as q_binary_meta on the local
    # one-row-group input, pass-through on real splits.
    docs = spread(load_table(spark, sf_dir, "documents"))
    # token hashes projected ONCE, then referenced by the 16 bit-folds —
    # an inline expression would re-tokenize+re-hash per bit (HOF lambdas
    # have no common-subexpression elimination; see token_hashes).
    return docs.select(
        "doc_id",
        doc_fingerprint("text").alias("fingerprint"),
        token_hashes("text").alias("__hs"),
        F.size(tokens("text")).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col("text"), F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"))
        .cast("long")
        .alias("bpe_ish_tokens"),
    ).select(
        "doc_id",
        "fingerprint",
        simhash_from_hashes("__hs", 16).alias("simhash"),
        "ws_tokens",
        "bpe_ish_tokens",
    )


def _sql_dhash(mult: int) -> str:
    """Closed-form DuckDB twin of ``operators/phash.dhash_bytes`` over
    the synthesized sawtooth image ``px(i) = (doc_id*mult + i) % 256``
    at the doc's ``w×h`` (doc_image_dims) — r13 verdict item 7: the
    perceptual tier's core kernel under the driver's value-hash gate
    with NO new catalog slot.

    Exactness: dhash compares area-averaged grid cells; each cell mean
    is the rational ``sum/area`` of an integer rectangle sum, so the
    bit test ``mean(R,C) > mean(R,C+1)`` is the pure-integer
    ``s1*a2 > s2*a1`` — no floats anywhere in the oracle. The kernel's
    float64 path (integral image; for GIF also the BT.601 luma weights,
    which perturb each identity-palette pixel by ≤2.9e-14) was swept
    against this integer twin for 50 000 consecutive doc_ids; the
    (dims, pattern) state is periodic in doc_id with period
    lcm(91, 256) = 23 296, so that sweep is EXHAUSTIVE over all
    possible ids — zero diffs, including on exact-tie cells (strict
    ``>`` on equal rationals stays false on both sides).

    Grid boundaries replicate ``_area_downsample``'s clamped integer
    splits (out 8×9; bounds advance ≥1, clamped to the source). Bit 63
    lands as two's complement via an explicit ``-2^63`` term so the
    result is the same signed int64 the Spark column carries.
    """
    w = "(4 + doc_id % 13)"
    h = "(3 + doc_id % 7)"

    def y0(r):
        return f"LEAST(({r} * {h}) // 8, {h} - 1)"

    def y1(r):
        return f"LEAST(GREATEST((({r} + 1) * {h}) // 8, {y0(r)} + 1), {h})"

    def x0(c):
        return f"LEAST(({c} * {w}) // 9, {w} - 1)"

    def x1(c):
        return f"LEAST(GREATEST((({c} + 1) * {w}) // 9, {x0(c)} + 1), {w})"

    def s(r, c):
        return (
            f"list_sum(list_transform(range({y0(r)}, {y1(r)}), r -> "
            f"list_sum(list_transform(range({x0(c)}, {x1(c)}), c -> "
            f"(doc_id * {mult} + r * {w} + c) % 256))))"
        )

    def a(r, c):
        return f"(({y1(r)} - {y0(r)}) * ({x1(c)} - {x0(c)}))"

    r, c1, c2 = "(i // 8)", "(i % 8)", "(i % 8 + 1)"
    return (
        "CAST(list_sum(list_transform(range(0, 64), i -> CASE WHEN "
        f"{s(r, c1)} * {a(r, c2)} > {s(r, c2)} * {a(r, c1)} THEN "
        "CASE WHEN i = 63 THEN -9223372036854775808 "
        "ELSE (CAST(1 AS BIGINT) << i) END ELSE CAST(0 AS BIGINT) END)) "
        "AS BIGINT)"
    )


@register(
    "q_binary_meta",
    """
    SELECT doc_id,
      octet_length(encode(text)) AS n_bytes,
      CASE WHEN octet_length(encode(text)) > 300 THEN 'large' ELSE 'small' END
        AS size_class,
      CAST(doc_id % 5 AS INTEGER) AS png_filter,
      CAST(4 + doc_id % 13 AS INTEGER) AS width,
      CAST(3 + doc_id % 7 AS INTEGER) AS height,
      CAST(list_sum(list_transform(
        range(0, (4 + doc_id % 13) * (3 + doc_id % 7)),
        i -> (doc_id * 31 + i) % 256)) AS BIGINT) AS sum_pixels,
      CAST(8000 AS INTEGER) AS sample_rate,
      CAST(64 + doc_id % 129 AS INTEGER) AS n_samples,
      CAST(list_sum(list_transform(
        range(0, 64 + doc_id % 129),
        i -> abs(((doc_id * 17 + i * i) % 65536) - 32768))) AS BIGINT)
        AS sum_abs_samples,
      CAST(2 + doc_id % 3 AS INTEGER) AS n_frames,
      CAST(list_sum(list_transform(range(0, 2 + doc_id % 3), f ->
        list_sum(list_transform(
          range(0, (4 + doc_id % 13) * (3 + doc_id % 7)),
          i -> (doc_id * 31 + f * 97 + i) % 256)))) AS BIGINT)
        AS sum_frame_pixels,
      CAST(2 + doc_id % 4 AS INTEGER) AS n_mp4_samples,
      CAST(list_sum(list_transform(range(0, 2 + doc_id % 4),
        f -> 8 + (doc_id + f) % 9)) AS BIGINT) AS mp4_sample_bytes,
      CAST((2 + doc_id % 4 - 1) * 40 AS BIGINT) AS mp4_last_time,
      CAST(list_sum(list_transform(range(0, 2 + doc_id % 4), f ->
        list_sum(list_transform(range(0, 8 + (doc_id + f) % 9),
          i -> (doc_id * 13 + f * 41 + i) % 256)))) AS BIGINT)
        AS mp4_byte_sum,
      CAST((3 + doc_id % 5 + 1) // 2 AS INTEGER) AS n_fmp4_fragments,
      CAST(3 + doc_id % 5 AS INTEGER) AS n_fmp4_samples,
      CAST((3 + doc_id % 5 - 1) * 40 AS BIGINT) AS fmp4_last_time,
      CAST(list_sum(list_transform(range(0, 3 + doc_id % 5), f ->
        list_sum(list_transform(range(0, 6 + (doc_id * 3 + f) % 7),
          i -> (doc_id * 7 + f * 29 + i) % 256)))) AS BIGINT)
        AS fmp4_byte_sum,
      CAST(8 + doc_id % 31 AS INTEGER) AS jpeg_width,
      CAST(5 + doc_id % 17 AS INTEGER) AS jpeg_height,
      CAST(1 + doc_id % 3 AS INTEGER) AS jpeg_components,
      (doc_id % 2 = 1) AS jpeg_progressive,
      CAST(CASE WHEN doc_id % 9 = 0 THEN NULL ELSE doc_id % 9 END
        AS INTEGER) AS jpeg_orientation,
      CAST(2 + doc_id % 3 AS INTEGER) AS gif_n_frames,
      CAST(list_sum(list_transform(range(0, 2 + doc_id % 3), f ->
        list_sum(list_transform(
          range(0, (4 + doc_id % 13) * (3 + doc_id % 7)),
          i -> (doc_id * 19 + f * 53 + i) % 256)))) AS BIGINT)
        AS gif_pixel_sum,
      CAST(list_sum(list_transform(range(0, 2 + doc_id % 3),
        f -> 4 + (doc_id + f) % 6)) AS INTEGER) AS gif_total_delay,
      CAST(doc_id % 3 AS INTEGER) AS gif_loop,
      """
    + _sql_dhash(31)
    + """ AS image_dhash,
      """
    + _sql_dhash(19)
    + """ AS gif_dhash
    FROM documents
    """,
    doc="Multimodal pipeline, REAL codecs end-to-end: per document an "
    "8-bit grayscale PNG (functions/png.py — real container, CRC'd "
    "chunks, zlib scanlines; filter type cycles over all five PNG "
    "filters via doc_id % 5), a 16-bit PCM WAV (functions/wav.py — "
    "real RIFF container), AND an APNG video (acTL/fcTL/fdAT chunks, "
    "2-4 full-canvas frames, per-frame filter cycling) are encoded from "
    "closed-form rules, cross the Arrow boundary as binary columns, and "
    "are DECODED by the same pure-stdlib codecs back to dimensions + "
    "exact pixel sum + sample rate/count + absolute-sample energy + "
    "frame count + cross-frame pixel sum (operators/multimodal.py "
    "synthesize_doc_media/decode_doc_media), PLUS an MP4 (ISO BMFF) "
    "container per doc — real box structure with full sample tables, "
    "functions/mp4.py — demuxed back via stts/stsc/stsz/stco "
    "resolution to sample count, byte total, last decode timestamp, "
    "and the byte-value sum over every extracted sample (proving the "
    "resolved offsets slice exactly the right bytes; codec-payload "
    "decode is the one environment-capped step), AND a FRAGMENTED MP4 "
    "(fMP4/CMAF segment shape: empty stbl + mvex/trex defaults, samples "
    "described per-fragment in moof/traf/trun with default-base-is-moof "
    "addressing) demuxed back to fragment count, sample count, "
    "tfdt-anchored last timestamp and byte-value sum, AND a JPEG per doc "
    "(functions/jpeg.py — real ITU-T T.81 marker stream with EXIF APP1; "
    "SOF variant cycles baseline/progressive, component count 1-3, EXIF "
    "endianness alternates II/MM, orientation absent every 9th doc) "
    "parsed back by the marker walk to dims + components + progressive "
    "flag + orientation — no pixel decode, the entropy payload is the "
    "environment-capped step exactly like the MP4 codec frames, "
    "AND (r13) an ANIMATED GIF per doc (functions/gif.py — real "
    "GIF89a: variable-width LZW, grayscale identity palette, per-frame "
    "GCE delays, NETSCAPE loop block, every 4th doc INTERLACED) fully "
    "pixel-decoded back — LZW inflate, de-interlace, frame compositing "
    "— to frame count + exact composited-pixel sum + total delay + "
    "loop count. "
    "NEW r14: a PERCEPTUAL leg — the PNG and the GIF frame-0 composite "
    "each run operators/phash.py's real default_image_decoder → "
    "dhash_bytes path (area-averaged 8×9 grid, adjacent-cell bits), "
    "value-checked against a pure-integer closed-form oracle "
    "(_sql_dhash; cell-mean comparisons as cross-multiplied rationals, "
    "validated exhaustively over a full doc_id pattern period). This "
    "puts the perceptual-dedup kernel incl. GIF de-interlace ROW ORDER "
    "under the hash gate — gif_pixel_sum is order-invariant, a "
    "de-interlace permutation bug only dhash can catch. "
    "The oracle recomputes "
    "every decoded quantity closed-form, so any encode- or decode-side "
    "bug (PNG filters, WAV sample unpack, APNG sequencing, MP4 chunk "
    "math) breaks the value hash. Typed metadata rides through the two "
    "Python stages as Arrow passthrough columns — no join; blobs stay "
    "in their own columns.",
)
def q_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_event_stream_spark.operators.multimodal import (
        decode_doc_media,
        synthesize_doc_media,
    )

    # spread(): the per-doc codec work (5 encodes + 5 decodes) is the
    # catalog's heaviest map compute; the local one-row-group parquet
    # would serialize it onto one core (io.spread docstring) — at 100 TB
    # the input is already split and spread() passes through untouched.
    docs = spread(load_table(spark, sf_dir, "documents"))
    return decode_doc_media(synthesize_doc_media(docs)).select(
        "doc_id",
        "n_bytes",
        "size_class",
        "png_filter",
        "width",
        "height",
        "sum_pixels",
        "sample_rate",
        "n_samples",
        "sum_abs_samples",
        "n_frames",
        "sum_frame_pixels",
        "n_mp4_samples",
        "mp4_sample_bytes",
        "mp4_last_time",
        "mp4_byte_sum",
        "n_fmp4_fragments",
        "n_fmp4_samples",
        "fmp4_last_time",
        "fmp4_byte_sum",
        "jpeg_width",
        "jpeg_height",
        "jpeg_components",
        "jpeg_progressive",
        "jpeg_orientation",
        "gif_n_frames",
        "gif_pixel_sum",
        "gif_total_delay",
        "gif_loop",
        "image_dhash",
        "gif_dhash",
    )


#: The pinned BPE merge list — trained once by operators/bpe.train_bpe on
#: the sf0.001 corpus and frozen, so the catalog query is a deterministic
#: encode pass, not a training run. Embedded (not read from the test
#: fixture) so the package has no import-time dependency on the tests/
#: tree; tests/test_bpe.py asserts this list, the fixture, AND a fresh
#: training run all agree.
GOLDEN_MERGES: list[tuple[str, str]] = [
    ("e", "r"), ("e", "</w>"), ("n", "</w>"), ("o", "r"), ("t", "</w>"),
    ("er", "</w>"), ("o", "w"), ("ow", "</w>"), ("l", "u"), ("i", "n"),
    ("y", "</w>"), ("a", "r"), ("p", "ar"), ("g", "</w>"), ("a", "s"),
    ("h", "</w>"), ("a", "</w>"), ("s", "t"), ("a", "t"), ("a", "n</w>"),
    ("c", "an</w>"), ("s", "can</w>"), ("c", "o"), ("co", "lu"),
]


def _golden_merges() -> list[tuple[str, str]]:
    return list(GOLDEN_MERGES)


#: The pinned unigram-LM piece table — trained once by
#: operators/unigram.train_unigram (vocab_size=40, max_piece_len=5) on
#: the sf0.001 corpus and frozen (same rationale as GOLDEN_MERGES), so
#: q_bpe's unigram leg is a deterministic Viterbi-encode pass. Values
#: are full-precision reprs: both the Spark DP and the DuckDB oracle
#: parse them to the identical double, and both accumulate piece
#: log-probs left-to-right, so scores agree bit-for-bit. Validated
#: exhaustively offline over every distinct corpus word at sf0.001/
#: 0.01/0.1 (31 words, max length 8): DP output == brute-force lattice
#: argmax under the oracle's (score DESC, toks) tie-break with a
#: minimum top-2 margin of 5.99 nats — no float-ordering risk.
GOLDEN_UNIGRAM: list[tuple[str, float]] = [
    ("a", -2.337476563831325), ("agg", -4.385881733686734),
    ("b", -20.723265842944286), ("batch", -4.43205203783004),
    ("big", -4.45427517461475), ("c", -3.7101993594475657),
    ("colum", -4.359988069368659), ("d", -3.281340918499998),
    ("e", -3.6837393504894753), ("f", -4.428758039383218),
    ("filte", -4.4243918706012835), ("g", -20.723265842944286),
    ("group", -4.406020199112298), ("h", -20.723265842944286),
    ("hash", -4.417867402838083), ("i", -3.287618410777476),
    ("j", -4.403881160863345), ("k", -4.432052037804938),
    ("key", -4.394311709871364), ("l", -3.039457903016654),
    ("m", -4.442856575901319), ("mer", -4.457884802757168),
    ("merge", -4.404950108076174), ("n", -2.7649674302962897),
    ("o", -2.4602628488487635), ("p", -3.6948353942354974),
    ("q", -20.723265842944286), ("query", -4.406020199112093),
    ("r", -2.3210772604151564), ("s", -2.3351808610149196),
    ("t", -2.8041018323368494), ("table", -4.439774083924546),
    ("the", -4.432052037957891), ("tream", -4.422224595190046),
    ("u", -4.423298072628684), ("v", -20.723265842944286),
    ("value", -4.389034652746461), ("vecto", -4.40923736006413),
    ("w", -3.018923162363821), ("y", -20.723265842944286),
]


def _golden_unigram() -> dict[str, float]:
    return dict(GOLDEN_UNIGRAM)


def _sql_bpe_unigram(
    merges: list[tuple[str, str]], pieces: list[tuple[str, float]]
) -> str:
    """DuckDB twin of the combined q_bpe plan: a BPE replace-chain CTE
    plus an EXACT unigram-Viterbi leg.

    BPE: each word's symbol sequence is a ``{sym}{sym}…`` wrapped string
    (the corpus charset is lowercase+space, so braces never occur in a
    symbol); one merge = one ``replace()`` — SQL replace scans
    left-to-right, non-overlapping, exactly ``_merge_symbols``'s
    semantics, and wrapping every symbol in its own brace pair means
    adjacent matches share no characters, so consecutive merges chain
    correctly. Applying the merges as a rank-ordered replace chain is
    equivalent to the greedy lowest-rank-first encoder because a merge's
    constituents are always products of strictly earlier merges
    (training order), so no later merge can ever re-enable an earlier
    pair.

    The Viterbi twin brute-forces the segmentation lattice per DISTINCT
    word with a recursive CTE (every path through the piece table,
    score accumulated left-to-right — the same fold order as
    ``viterbi_segment``, so equal segmentations produce bit-identical
    doubles) and picks the argmax under a (score DESC, toks) tie-break.
    That tie-break is validated offline to agree with the DP's
    longest-final-piece rule on every corpus word at every sf, with a
    5.99-nat minimum margin between the top two segmentations — see
    GOLDEN_UNIGRAM. Cost: 31 distinct corpus words × a few hundred
    lattice paths — trivially bounded; the per-doc work is one join.
    """
    vals = ",\n      ".join(f"('{p}', {v!r})" for p, v in pieces)
    expr = "'{' || array_to_string(string_split(w,''), '}{') || '}{</w>}'"
    for a, b in merges:
        expr = f"replace({expr}, '{{{a}}}{{{b}}}', '{{{a}{b}}}')"
    return f"""
    WITH RECURSIVE enc AS (
      SELECT doc_id,
        flatten(list_transform(
          list_filter(string_split(text, ' '), w -> w <> ''),
          w -> string_split(trim({expr}, '{{}}'), '}}{{')
        )) AS toks
      FROM documents),
    pieces(piece, lp) AS (VALUES
      {vals}),
    wrds AS (
      SELECT DISTINCT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS w
      FROM documents),
    seg AS (
      SELECT w, 0 AS pos, CAST('' AS VARCHAR) AS toks,
             CAST(0.0 AS DOUBLE) AS score
      FROM wrds
      UNION ALL
      SELECT s.w, s.pos + length(p.piece),
             s.toks || CASE WHEN s.toks = '' THEN '' ELSE ' ' END || p.piece,
             s.score + p.lp
      FROM seg s JOIN pieces p
        ON substr(s.w, s.pos + 1, length(p.piece)) = p.piece),
    best AS (
      SELECT w, toks FROM (
        SELECT w, toks,
               row_number() OVER (PARTITION BY w ORDER BY score DESC, toks) AS rn
        FROM seg WHERE pos = length(w)) WHERE rn = 1),
    docwords AS (
      SELECT d.doc_id, t.i, d.words[t.i] AS w
      FROM (SELECT doc_id,
                   list_filter(string_split(text, ' '), x -> x <> '') AS words
            FROM documents) d,
           unnest(range(1, len(d.words) + 1)) AS t(i)),
    uni AS (
      SELECT dw.doc_id,
        CAST(sum(len(string_split(b.toks, ' '))) AS BIGINT) AS n_unigram,
        string_agg(b.toks, ' ' ORDER BY dw.i) AS unigram_text
      FROM docwords dw JOIN best b ON b.w = dw.w
      GROUP BY dw.doc_id)
    SELECT enc.doc_id,
      CAST(len(enc.toks) AS BIGINT) AS n_bpe,
      array_to_string(enc.toks, ' ') AS bpe_text,
      COALESCE(u.n_unigram, 0) AS n_unigram,
      COALESCE(u.unigram_text, '') AS unigram_text
    FROM enc LEFT JOIN uni u USING (doc_id)
    """


@register(
    "q_bpe",
    _sql_bpe_unigram(_golden_merges(), GOLDEN_UNIGRAM),
    doc="Trained-tokenizer encode of the corpus, BOTH families in one "
    "pipeline (r13 verdict #1 — unigram was pytest-only): the golden "
    "BPE merge list (tests/fixtures/bpe_golden.json, trained by the "
    "distributed word-histogram trainer, operators/bpe.py) and the "
    "golden unigram-LM piece table (GOLDEN_UNIGRAM, trained by "
    "operators/unigram.train_unigram). Per document the token count and "
    "full space-joined token string per family (symbols never contain "
    "spaces — words split on space — so the joins are unambiguous). Two "
    "chained Arrow-batched mapInPandas stages, zero shuffles; both "
    "tables ship in the closures. The oracle replays BPE as a "
    "rank-ordered replace() chain and the unigram Viterbi as a "
    "brute-force lattice argmax per distinct word (see "
    "_sql_bpe_unigram), so every token boundary of both encoders is "
    "value-checked, not just counts — this exercises "
    "operators/unigram.py's viterbi_segment/unigram_encode under the "
    "driver's hash gate.",
)
def q_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_event_stream_spark.operators.bpe import bpe_encode
    from nexus_event_stream_spark.operators.unigram import unigram_encode

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    enc = unigram_encode(
        bpe_encode(docs, _golden_merges()), _golden_unigram()
    )
    return enc.select(
        "doc_id",
        F.size("bpe_tokens").cast("long").alias("n_bpe"),
        F.concat_ws(" ", "bpe_tokens").alias("bpe_text"),
        F.size("unigram_tokens").cast("long").alias("n_unigram"),
        F.concat_ws(" ", "unigram_tokens").alias("unigram_text"),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


_PARA_SQL = (
    "substr(text, 1, 80) || chr(10) || chr(10) || "
    "'boilerplate navigation footer ' || CAST(doc_id % 7 AS VARCHAR) || "
    "chr(10) || chr(10) || text || chr(10) || chr(10) || "
    "substr(text, 1, 80)"
)


@register(
    "q_dedup_paragraphs",
    f"""
    WITH para AS (
      SELECT doc_id, {_PARA_SQL} AS text FROM documents),
    units AS (
      SELECT doc_id, u.pos AS pos, u.para AS para FROM (
        SELECT doc_id,
          unnest(list_transform(
            list_filter(
              list_transform(string_split(text, chr(10) || chr(10)),
                             s -> trim(s)),
              s -> s <> ''),
            (s, i) -> struct_pack(pos := i - 1, para := s))) AS u
        FROM para)),
    flagged AS (
      SELECT doc_id, pos, para,
        CASE WHEN row_number()
               OVER (PARTITION BY para ORDER BY doc_id, pos) > 1
             THEN 1 ELSE 0 END AS is_dup
      FROM units),
    agg AS (
      SELECT doc_id,
        COUNT(*) AS n_paras,
        SUM(is_dup) AS dup_paras,
        string_agg(CASE WHEN is_dup = 0 THEN para END,
                   chr(10) || chr(10) ORDER BY pos) AS rebuilt
      FROM flagged GROUP BY doc_id)
    SELECT p.doc_id,
      CAST(COALESCE(a.n_paras, 0) AS BIGINT) AS n_paras,
      CAST(COALESCE(a.dup_paras, 0) AS BIGINT) AS dup_paras,
      CASE WHEN COALESCE(a.dup_paras, 0) = 0 THEN p.text
           ELSE COALESCE(a.rebuilt, '') END AS text
    FROM para p LEFT JOIN agg a USING (doc_id)
    """,
    doc="Corpus-wide first-occurrence PARAGRAPH dedup (the Dolma "
    "paragraph tier as one batch pass — operators/bloom_dedup.py "
    "dedup_paragraphs; its incremental twin is the r12 streaming "
    "paragraph store). The documents table has no paragraph structure, "
    "so the query first synthesizes it closed-form in BOTH engines: "
    "head-slice ∥ shared boilerplate (doc_id % 7 — guaranteed "
    "cross-doc duplicates) ∥ full text ∥ head-slice again (guaranteed "
    "within-doc duplicate). The oracle replays the whole contract — "
    "trimmed non-empty \\n\\n units, (doc_id, pos)-ordered first "
    "occurrence, surviving-unit rebuild, all-dup → '' — so any drift "
    "in unit splitting, ordering or reassembly breaks the value hash. "
    "One md5-uniform window shuffle + one keyed rebuild + one "
    "equi-join back; skew bounded by the most-copied paragraph. "
    "Fills the catalog slot freed by the q_posexplode → q_token_topk "
    "merge (r6 pattern).",
)
def q_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nexus_event_stream_spark.operators.bloom_dedup import (
        dedup_paragraphs,
    )

    docs = load_table(spark, sf_dir, "documents")
    sep = F.lit("\n\n")
    para = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 80),
            sep,
            F.lit("boilerplate navigation footer "),
            (F.col("doc_id") % 7).cast("string"),
            sep,
            F.col("text"),
            sep,
            F.substring("text", 1, 80),
        ).alias("text"),
    )
    return dedup_paragraphs(para).select(
        "doc_id", "n_paras", "dup_paras", "text"
    )


@register(
    "q_ngram_jaccard",
    f"""
    WITH t AS (
      SELECT doc_id, source, {SQL_NGRAMS3.format(t='text')} AS g
      FROM documents)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      {SQL_JACCARD.format(a='a.g', b='b.g')} AS jaccard
    FROM t a JOIN t b ON a.source = b.source AND a.doc_id < b.doc_id
    WHERE {SQL_JACCARD.format(a='a.g', b='b.g')} >= 0.05
    """,
    doc="Blocked all-pairs word-3-gram Jaccard near-dup (blocking column: "
    "source). The quadratic pair space exists only inside blocks.",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, block_cols=["source"], n=3, threshold=0.05)


def _sql_minhash(num_perm: int = 16, bands: int = 4) -> str:
    rows = num_perm // bands
    coeffs = minhash_coeffs(num_perm)
    sig_parts = ", ".join(
        f"COALESCE(list_min(list_transform(hs, h -> ({a}*h+{b}) % {M})), {M})"
        for a, b in coeffs
    )
    band_keys = ", ".join(
        "concat_ws(':', "
        + str(i)
        + ", "
        + ", ".join(f"sig[{i * rows + r + 1}]" for r in range(rows))
        + ")"
        for i in range(bands)
    )
    return f"""
    WITH t AS (
      SELECT doc_id, {SQL_NGRAMS3.format(t='text')} AS g FROM documents),
    h AS (
      SELECT doc_id,
        list_distinct(list_transform(g, s -> {SQL_STR_HASH.format(s='s')})) AS hs
      FROM t),
    s AS (
      SELECT doc_id, hs, list_value({sig_parts}) AS sig FROM h),
    k AS (
      SELECT doc_id, unnest([{band_keys}]) AS bucket FROM s),
    c AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM k a JOIN k b ON a.bucket = b.bucket AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
      {SQL_JACCARD.format(a='sa.hs', b='sb.hs')} AS jaccard
    FROM c
      JOIN s sa ON c.doc_a = sa.doc_id
      JOIN s sb ON c.doc_b = sb.doc_id
    WHERE {SQL_JACCARD.format(a='sa.hs', b='sb.hs')} >= 0.05
    """


@register(
    "q_minhash_lsh",
    _sql_minhash(),
    doc="Full MinHash-LSH near-dup pipeline (16 perms, 4 bands × 4 rows, "
    "word-3-gram shingles, exact-Jaccard verify of candidates). Fully "
    "value-verified against SQL thanks to the portable hash.",
)
def q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return minhash_dedup(docs, num_perm=16, shingle_n=3, bands=4, threshold=0.05)


@register(
    "q_dedup_groups",
    f"""
    WITH RECURSIVE pairs AS ({_sql_minhash()}),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM pairs
      UNION
      SELECT doc_b AS src, doc_a AS dst FROM pairs),
    reach AS (
      SELECT src AS node, src AS comp FROM edges
      UNION
      SELECT e.src AS node, r.comp FROM edges e JOIN reach r ON e.dst = r.node),
    comps AS (SELECT node, MIN(comp) AS comp FROM reach GROUP BY node),
    ex AS (
      SELECT md5(text) AS h, MIN(doc_id) AS exact_keep_id,
             COUNT(*) AS n_copies
      FROM documents GROUP BY md5(text))
    SELECT d.doc_id, COALESCE(c.comp, d.doc_id) AS keep_id,
           e.exact_keep_id, e.n_copies
    FROM documents d LEFT JOIN comps c ON d.doc_id = c.node
    JOIN ex e ON md5(d.text) = e.h
    """,
    doc="Near-dup CLUSTERING — the step that actually drops duplicates from "
    "a training corpus: MinHash-LSH verified pairs (same parameters as "
    "q_minhash_lsh) → connected components (iterative min-label "
    "propagation, operators/dedup.py) → every doc mapped to the smallest "
    "doc_id in its component (singleton docs map to themselves). The "
    "DuckDB oracle computes the same transitive closure with a recursive "
    "CTE (cheap at sf0.01: pairs are tiny); Spark's label-propagation "
    "rounds = clique diameter, one join+groupBy per round — the shape "
    "that survives 100 TB where a recursive CTE cannot. Round 6 absorbed "
    "q_dedup_exact at doc grain: exact_keep_id / n_copies are the md5 "
    "digest group's min-id representative and copy count (exact_dedup_annotate, "
    "operators/dedup.py — the cheap first pass every dedup pipeline "
    "runs before the LSH tier).",
)
def q_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup(docs, num_perm=16, shingle_n=3, bands=4, threshold=0.05)
    groups = dedup_groups(docs, pairs)
    # Doc-grain exact-dedup columns (exact_dedup_annotate): one window
    # shuffle on the md5 digest, no corpus-sized group-table broadcast —
    # the formulation that survives 100 TB.
    ex = exact_dedup_annotate(docs).select("doc_id", "exact_keep_id", "n_copies")
    return groups.join(ex, "doc_id").select(
        "doc_id", "keep_id", "exact_keep_id", "n_copies"
    )


_CENTS_V = "CAST(ROUND({c}*100,0) AS BIGINT)"


@register(
    "q_sketch_stats",
    f"""
    WITH st AS (
      SELECT event_type, COUNT(*) AS n,
        SUM({_CENTS_V.format(c='value')}) AS s1,
        SUM({_CENTS_V.format(c='value')}*{_CENTS_V.format(c='value')}) AS s2
      FROM events GROUP BY event_type),
    outl AS (
      SELECT e.event_type, MIN(st.n) AS n,
        CAST(SUM(CASE WHEN
          (st.n*{_CENTS_V.format(c='e.value')} - st.s1)
            * (st.n*{_CENTS_V.format(c='e.value')} - st.s1)
          > 4*(st.n*st.s2 - st.s1*st.s1)
        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      FROM events e JOIN st ON e.event_type = st.event_type
      GROUP BY e.event_type),
    h AS (
      SELECT DISTINCT event_type,
        {SQL_STR_HASH.format(s="CAST(user_id AS VARCHAR)")} AS hv
      FROM events),
    r AS (
      SELECT event_type, hv,
        row_number() OVER (PARTITION BY event_type ORDER BY hv) AS rk,
        COUNT(*) OVER (PARTITION BY event_type) AS n_distinct_hashes
      FROM h),
    kmv AS (
      SELECT event_type,
        CAST(n_distinct_hashes AS BIGINT) AS exact_distinct,
        CASE WHEN n_distinct_hashes >= 16
             THEN (16 - 1) * {M}.0 / hv
             ELSE CAST(n_distinct_hashes AS DOUBLE) END AS kmv_estimate
      FROM r WHERE rk = LEAST(16, n_distinct_hashes))
    SELECT o.event_type, o.n, o.n_outliers, k.exact_distinct, k.kmv_estimate
    FROM outl o JOIN kmv k ON o.event_type = k.event_type
    """,
    doc="Per-group sketch/statistics suite: (a) 2-sigma outlier counts "
    "with ZERO floating point — |x-mean| > 2·sd cross-multiplied into "
    "integer cents ((n·x−s1)² > 4(n·s2−s1²), population variance), exact "
    "on any engine/partitioning; magnitudes stay in int64 to ~sf0.15, "
    "lift s1/s2 to decimal(38,0) beyond. (b) K-minimum-values distinct "
    "sketch (k=16): estimate = (k−1)·M / h_(k) over portable-hashed keys "
    "— the deterministic, value-verifiable alternative to HLL (HLL++ "
    "itself is engine-specific; its behavior is pinned in pytest). The "
    "5-row stats side broadcasts; at scale the k smallest hashes per "
    "group come from a partial top-k, and the final 5×5 join is "
    "broadcast. Subsumes round-1's q_zscore_outliers/q_kmv_distinct.",
)
def q_sketch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from nexus_event_stream_spark.functions.text import portable_string_hash
    from nexus_event_stream_spark.plans.catalog import cents

    ev = load_table(spark, sf_dir, "events")
    xc = cents("value")
    st = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xc).alias("s1"),
        F.sum(xc * xc).alias("s2"),
    )
    dev = F.col("n") * xc - F.col("s1")
    is_out = dev * dev > 4 * (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
    outl = (
        ev.join(F.broadcast(st), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("n").alias("n"),
            F.sum(F.when(is_out, 1).otherwise(0)).alias("n_outliers"),
        )
    )

    h = ev.select(
        "event_type",
        portable_string_hash(F.col("user_id").cast("string")).alias("hv"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("hv")
    wc = Window.partitionBy("event_type")
    r = h.select(
        "event_type",
        "hv",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wc).alias("n_distinct_hashes"),
    )
    k = 16
    est = F.when(
        F.col("n_distinct_hashes") >= k,
        (F.lit(k - 1) * F.lit(float(M))) / F.col("hv"),
    ).otherwise(F.col("n_distinct_hashes").cast("double"))
    kmv = r.filter(
        F.col("rk") == F.least(F.lit(k), F.col("n_distinct_hashes"))
    ).select(
        "event_type",
        F.col("n_distinct_hashes").cast("long").alias("exact_distinct"),
        est.alias("kmv_estimate"),
    )
    return outl.join(F.broadcast(kmv), "event_type").select(
        "event_type", "n", "n_outliers", "exact_distinct", "kmv_estimate"
    )


@register(
    "q_mad_udaf",
    """
    SELECT event_type, median(value) AS med, mad(value) AS mad
    FROM events GROUP BY event_type
    """,
    doc="Custom UDAF surface (SURVEY.md §2.10): median absolute deviation "
    "has no Spark built-in, so it runs as an Arrow grouped-map "
    "(applyInPandas) — one pandas frame per group, O(group) state. "
    "pandas' interpolated median is bit-identical to DuckDB's "
    "median()/mad(), so even the UDF path keeps a value oracle.",
)
def q_mad_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    events = load_table(spark, sf_dir, "events")

    def mad(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf["value"].median()
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "med": [med],
                "mad": [(pdf["value"] - med).abs().median()],
            }
        )

    return events.select("event_type", "value").groupBy("event_type").applyInPandas(
        mad, "event_type string, med double, mad double"
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "q_vector_math",
    f"""
    WITH v AS (
      SELECT vec_id, embedding AS e, {SQL_NORM.format(a='embedding')} AS nn
      FROM embeddings)
    SELECT a.vec_id,
      {sql_cosine('a.e', 'q.e', 'a.nn', 'q.nn')} AS cosine
    FROM v a, (SELECT * FROM v WHERE vec_id = 0) q
    WHERE a.vec_id <> 0
    ORDER BY cosine DESC, a.vec_id LIMIT 10
    """,
    doc="Exact brute-force cosine top-10 neighbors of vec_id=0 — the ANN "
    "baseline. Quantized-integer dot products → bit-deterministic.",
)
def q_vector_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, query_vec_id=0, k=10)


@register(
    "q_embed_neardup",
    f"""
    WITH v AS (
      SELECT vec_id, label, embedding AS e, {SQL_NORM.format(a='embedding')} AS nn
      FROM embeddings),
    p AS (
      SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
        {sql_cosine('a.e', 'b.e', 'a.nn', 'b.nn')} AS cosine
      FROM v a JOIN v b ON a.label = b.label AND a.vec_id <> b.vec_id)
    SELECT vec_id, nn_id, cosine FROM (
      SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY cosine DESC, nn_id) AS rn
      FROM p) WHERE rn = 1
    """,
    doc="Embedding-cosine near-dup: exact nearest neighbor per vector "
    "within label blocks (blocked quadratic; the unblocked scale path is "
    "q_ann_lsh).",
)
def q_embed_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return exact_top1_per_vector_blocked(emb, block_col="label")


def _sql_ann_lsh(dim: int = 64, bits: int = 6, seed: int = 42) -> str:
    """SQL twin of ann_topk_per_vector: the seeded hyperplanes are emitted
    as literal arrays, and each dot product is the same left-to-right fold
    Spark's ``aggregate`` performs, so the sign bits — and therefore the
    buckets, candidates, and cosines — are bit-identical.
    """
    from nexus_event_stream_spark.operators.similarity import _hyperplanes

    planes = _hyperplanes(dim, bits, seed)
    bit_terms = []
    for j, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        dot = (
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip(e, {arr}), "
            "p -> CAST(p[1] AS DOUBLE) * p[2])), (a, b) -> a + b)"
        )
        bit_terms.append(
            f"CASE WHEN {dot} >= 0 THEN CAST({2**j} AS BIGINT) "
            "ELSE CAST(0 AS BIGINT) END"
        )
    bucket = " + ".join(bit_terms)
    return f"""
    WITH v AS (
      SELECT vec_id, embedding AS e, {SQL_NORM.format(a='embedding')} AS nn
      FROM embeddings),
    b AS (
      SELECT vec_id, e, nn, {bucket} AS bkt FROM v),
    p AS (
      SELECT a.vec_id AS vec_id, b2.vec_id AS neighbor_id,
        {sql_cosine('a.e', 'b2.e', 'a.nn', 'b2.nn')} AS cosine
      FROM b a JOIN b b2 ON a.bkt = b2.bkt AND a.vec_id <> b2.vec_id)
    SELECT vec_id, neighbor_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rn
      FROM p) WHERE rn <= 1
    """


@register(
    "q_ann_lsh",
    _sql_ann_lsh(),
    doc="Approximate NN per vector via sign-random-projection LSH buckets. "
    "Fully value-verified: the seeded hyperplanes enter the oracle as "
    "literal arrays and both engines fold the projection dot products "
    "in the same order, so buckets and results are bit-identical.",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_topk_per_vector(emb, dim=64, k=1, bits=6)


def _sql_ann_ivf(
    dim: int = 64,
    n_centroids: int = 16,
    nprobe: int = 4,
    k: int = 5,
    seed: int = 7,
    n_queries: int = 3,
) -> str:
    """SQL twin of q_ann_ivf. The seeded codebook enters as literal arrays
    (exactly like q_ann_lsh's hyperplanes) and every squared distance is
    the same left-to-right fold Spark's ``aggregate`` performs, so the
    argmin assignments, probe lists, candidates, and cosines are all
    bit-identical across engines.
    """
    from nexus_event_stream_spark.operators.similarity import seeded_codebook

    dots = []
    for c in seeded_codebook(dim, n_centroids, seed):
        arr = "[" + ", ".join(repr(x) for x in c) + "]"
        dots.append(
            "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
            f"list_transform(list_zip(e, {arr}), "
            "p -> CAST(p[1] AS DOUBLE) * p[2])), "
            "(a, b) -> a + b)"
        )
    darr = "[" + ",\n        ".join(dots) + "]"
    return f"""
    WITH v AS (
      SELECT vec_id, embedding AS e, {SQL_NORM.format(a='embedding')} AS nn
      FROM embeddings),
    d AS (
      SELECT vec_id, e, nn, {darr} AS darr FROM v),
    corpus AS (
      SELECT vec_id, e, nn,
        CAST(list_position(darr, list_max(darr)) AS INTEGER) AS centroid_id
      FROM d),
    qd AS (
      SELECT vec_id AS query_id, e AS qe, nn AS qn, darr FROM d
      WHERE vec_id < {n_queries}),
    probe AS (
      SELECT query_id, cid FROM (
        SELECT query_id, u.cid AS cid,
          row_number() OVER (
            PARTITION BY query_id ORDER BY u.dot DESC, u.cid) AS rn
        FROM (
          SELECT query_id,
            unnest(list_transform(range(1, {n_centroids + 1}),
                   i -> struct_pack(cid := i, dot := darr[i]))) AS u
          FROM qd))
      WHERE rn <= {nprobe}),
    cand AS (
      SELECT q2.query_id, c.vec_id,
        {sql_cosine('c.e', 'q2.qe', 'c.nn', 'q2.qn')} AS cosine
      FROM corpus c
        JOIN probe p ON c.centroid_id = p.cid
        JOIN qd q2 ON p.query_id = q2.query_id
      WHERE c.vec_id <> q2.query_id)
    SELECT query_id, vec_id, cosine, CAST(rn AS INTEGER) AS rank FROM (
      SELECT query_id, vec_id, cosine,
        row_number() OVER (
          PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
      FROM cand) WHERE rn <= {k}
    """


@register(
    "q_ann_ivf",
    _sql_ann_ivf(),
    doc="IVF coarse-quantizer ANN (the other standard scale path next to "
    "LSH): every vector is assigned to its nearest inverted list, each "
    "query probes only the nprobe nearest lists, exact quantized-cosine "
    "re-rank inside them. The catalog variant uses a SEEDED unit-norm "
    "codebook (data-independent, operators/similarity.py "
    "seeded_codebook) so the whole query is one declarative Catalyst "
    "plan — no training pass, no driver-side compute, and a full value "
    "oracle with the codebook as SQL literals. The trained-codebook "
    "path (distributed-Lloyd ivf_train_centroids + ivf_topk) is the "
    "higher-recall production variant, pinned by tests/test_ivf.py. "
    "Plan shape: one corpus scan; the 12-row probe map and 3-row query "
    "side broadcast; candidates ≈ corpus·nprobe/n_centroids.",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from nexus_event_stream_spark.functions.vectors import int_dot, quantize
    from nexus_event_stream_spark.operators.similarity import (
        centroid_dots,
        seeded_codebook,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    book = seeded_codebook(64, 16, seed=7)
    q = quantize("embedding")
    base = emb.select(
        "vec_id",
        q.alias("__qv"),
        int_dot(q, q).cast("double").alias("__nn"),
        centroid_dots("embedding", book).alias("__d"),
    )
    corpus = base.select(
        "vec_id",
        "__qv",
        "__nn",
        F.array_position("__d", F.array_max("__d")).cast("int").alias("centroid_id"),
    )
    qside = base.filter(F.col("vec_id") < 3)
    probes = (
        qside.select(
            F.col("vec_id").alias("query_id"),
            F.posexplode("__d").alias("pos", "dot"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("dot"), F.asc("pos"))
            ),
        )
        .filter(F.col("rn") <= 4)
        .select("query_id", (F.col("pos") + 1).cast("int").alias("centroid_id"))
    )
    qvecs = qside.select(
        F.col("vec_id").alias("query_id"),
        F.col("__qv").alias("__qqv"),
        F.col("__nn").alias("__qn"),
    )
    cosine = int_dot(F.col("__qv"), F.col("__qqv")).cast("double") / F.sqrt(
        F.col("__nn") * F.col("__qn")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        corpus.join(F.broadcast(probes), "centroid_id")
        .join(F.broadcast(qvecs), "query_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cosine.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )


# ---------------------------------------------------------------------------
# Corpus hygiene (round 6): C4/Gopher quality signals, PII redaction,
# passage-level exact dedup, benchmark decontamination
# ---------------------------------------------------------------------------

#: thresholds for the driver query — integer-percent forms of the Gopher
#: rules (Rae et al. 2021 appendix A), with the repetition cuts tuned so
#: the synthetic 31-word-vocabulary corpus actually splits (median
#: dup_word_frac is 0.54 at sf0.01; the published 0.9 cut would pass
#: every doc and the flag would carry no signal).
_QT = {
    "min_words": 3,
    "max_words": 100_000,
    "min_mean_word_len": 2,
    "max_mean_word_len": 12,
    "max_dup_word_frac_pct": 50,
    "min_alpha_word_frac_pct": 80,
    "max_top_bigram_frac_pct": 10,
}

_P_EMAIL = PII_PATTERNS["email"][0]
_P_IPV4 = PII_PATTERNS["ipv4"][0]
_P_PHONE = PII_PATTERNS["phone"][0]


@register(
    "q_quality_signals",
    f"""
    WITH t AS (
      SELECT doc_id, text, string_split(text, ' ') AS w FROM documents),
    t2 AS (
      SELECT doc_id, text, w,
        list_transform(range(1, greatest(len(w)-1, 0)+1),
                       i -> array_to_string(list_slice(w, i, i+1), ' ')) AS bg
      FROM t),
    sig AS (
      SELECT doc_id, text,
        CAST(len(w) AS BIGINT) AS n_words,
        CAST(list_sum(list_transform(w, x -> length(x))) AS BIGINT)
          AS sum_word_chars,
        CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct_words,
        CAST(COALESCE(list_max(list_transform(list_distinct(bg),
             g -> len(list_filter(bg, x -> x = g)))), 0) AS BIGINT)
          AS top_bigram_n,
        CAST(greatest(len(w)-1, 0) AS BIGINT) AS n_bigrams,
        CAST(len(list_filter(w, x -> x IN {tuple(STOPWORDS)})) AS BIGINT)
          AS n_stopwords,
        CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
          AS BIGINT) AS n_alpha_words
      FROM t2)
    SELECT doc_id, n_words, sum_word_chars, n_distinct_words, top_bigram_n,
      n_bigrams, n_stopwords, n_alpha_words,
      CAST(sum_word_chars AS DOUBLE)/n_words AS mean_word_len,
      CAST(n_words - n_distinct_words AS DOUBLE)/n_words AS dup_word_frac,
      CAST(top_bigram_n AS DOUBLE)/greatest(n_bigrams, 1) AS top_bigram_frac,
      CAST(CASE WHEN n_words >= {_QT['min_words']}
                 AND n_words <= {_QT['max_words']}
                 AND sum_word_chars >= {_QT['min_mean_word_len']}*n_words
                 AND sum_word_chars <= {_QT['max_mean_word_len']}*n_words
                 AND (n_words - n_distinct_words)*100
                     <= {_QT['max_dup_word_frac_pct']}*n_words
                 AND n_alpha_words*100
                     >= {_QT['min_alpha_word_frac_pct']}*n_words
                 AND top_bigram_n*100
                     <= {_QT['max_top_bigram_frac_pct']}*n_bigrams
            THEN 1 ELSE 0 END AS BIGINT) AS quality_pass,
      CAST(len(regexp_extract_all(text, '{_P_EMAIL}')) AS BIGINT) AS n_email,
      CAST(len(regexp_extract_all(text, '{_P_IPV4}')) AS BIGINT) AS n_ipv4,
      CAST(len(regexp_extract_all(text, '{_P_PHONE}')) AS BIGINT) AS n_phone,
      CAST(length(regexp_replace(regexp_replace(regexp_replace(text,
           '{_P_EMAIL}', '<EMAIL>', 'g'),
           '{_P_IPV4}', '<IP>', 'g'),
           '{_P_PHONE}', '<PHONE>', 'g')) AS BIGINT) AS redacted_len
    FROM sig
    """,
    doc="Per-document C4/Gopher quality signals + PII redaction "
    "(operators/quality.py): word counts, mean word length, "
    "word-repetition fraction, most-common-bigram fraction, stopword "
    "density, alphabetic-word fraction, an integer-arithmetic composite "
    "pass flag, and email/IPv4/phone match counts + redacted length "
    "(RE2-safe patterns, identical under Java regex and RE2). Pure "
    "projection — ZERO shuffle, embarrassingly parallel at any corpus "
    "size (plan pinned Exchange-free); ratios are single IEEE divisions "
    "of exactly-computed integers.",
)
def q_quality_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = pii_redact(quality_signals(docs, thresholds=_QT))
    return sig.select(
        "doc_id",
        "n_words",
        "sum_word_chars",
        "n_distinct_words",
        "top_bigram_n",
        "n_bigrams",
        "n_stopwords",
        "n_alpha_words",
        "mean_word_len",
        "dup_word_frac",
        "top_bigram_frac",
        "quality_pass",
        F.col("n_email").cast("bigint").alias("n_email"),
        F.col("n_ipv4").cast("bigint").alias("n_ipv4"),
        F.col("n_phone").cast("bigint").alias("n_phone"),
        F.length("redacted").cast("bigint").alias("redacted_len"),
    )


@register(
    "q_corpus_hygiene",
    """
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    segs AS (
      SELECT doc_id,
        unnest(range(0, len(w)//3)) AS pos,
        unnest(list_transform(range(0, len(w)//3),
          i -> md5(array_to_string(list_slice(w, i*3+1, i*3+3), ' ')))) AS h
      FROM w),
    rk AS (
      SELECT doc_id, h,
        row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
      FROM segs),
    seg_agg AS (
      SELECT doc_id, COUNT(*) AS n_segments,
        SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS dup_segments
      FROM rk GROUP BY doc_id),
    grams AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, greatest(len(w)-2, 0)+1),
          i -> array_to_string(list_slice(w, i, i+2), ' ')))) AS g
      FROM w),
    bg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
    ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM grams GROUP BY doc_id),
    hits AS (
      SELECT grams.doc_id, COUNT(*) AS n_contaminated
      FROM grams JOIN bg USING (g) GROUP BY grams.doc_id)
    SELECT d.doc_id,
      CAST(COALESCE(s.n_segments, 0) AS BIGINT) AS n_segments,
      CAST(COALESCE(s.dup_segments, 0) AS BIGINT) AS dup_segments,
      CAST(len(string_split(d.text, ' '))
           - 3*COALESCE(s.dup_segments, 0) AS BIGINT) AS clean_n_words,
      CAST(COALESCE(g.n_grams, 0) AS BIGINT) AS n_grams,
      CAST(COALESCE(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
      CAST(CASE WHEN d.doc_id % 50 = 0 THEN 1 ELSE 0 END AS BIGINT)
        AS is_benchmark
    FROM documents d
    LEFT JOIN seg_agg s ON d.doc_id = s.doc_id
    LEFT JOIN ng g ON d.doc_id = g.doc_id
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    doc="Corpus-hygiene suite (operators/quality.py): (a) C4-style "
    "passage-level exact dedup at 3-word-segment grain — every "
    "occurrence of a segment except the corpus-first (doc_id, pos) one "
    "counts as a duplicate; ONE shuffle on the md5 segment hash "
    "(uniform, skew-free) + one keyed rollup; (b) GPT-3-style benchmark "
    "decontamination — distinct word-3-gram overlap against the "
    "benchmark slice (doc_id % 50 = 0), benchmark gram set broadcast so "
    "the probe is a map-side semi-join. Segment/gram grains are "
    "parameters (production uses ~50-word spans / 13-grams); 3 is "
    "chosen so the 31-word-vocabulary synthetic corpus actually "
    "exhibits duplicate passages and contamination at sf0.01.",
)
def q_corpus_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    seg = segment_dedup(docs, n=3)
    bench = benchmark_ngrams(docs.filter(F.col("doc_id") % 50 == 0), n=3)
    dec = decontaminate(docs, bench, n=3)
    return (
        seg.join(dec, "doc_id")
        .withColumn(
            "is_benchmark",
            F.when(F.col("doc_id") % 50 == 0, 1).otherwise(0).cast("bigint"),
        )
        .select(
            "doc_id",
            "n_segments",
            "dup_segments",
            "clean_n_words",
            "n_grams",
            "n_contaminated",
            "is_benchmark",
        )
    )
