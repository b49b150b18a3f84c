"""Regenerate SCALE.md's measured-throughput stress table from the
committed BENCH_DETAIL.json sidecar.

The r13 verdict found the hand-maintained table drifting from the
sidecar every round (stale ~36 s dedup_chain vs measured 12.8 s etc.);
this generator ends that class permanently: the table between the
``BEGIN/END GENERATED: stress-table`` markers in SCALE.md is emitted
verbatim from the sidecar's per-entry median, min/max spread, and
rows/s, labeled with the sidecar's sf and k so every number carries its
protocol.

Usage::

    python tools/scale_table.py                 # rewrite SCALE.md in place
    python tools/scale_table.py --check         # exit 1 if SCALE.md is stale
    python tools/scale_table.py --print         # table to stdout only
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN = "<!-- BEGIN GENERATED: stress-table (tools/scale_table.py) -->"
END = "<!-- END GENERATED: stress-table -->"

#: workload one-liners — what each entry exercises, row-unit included.
#: An entry missing here still lands in the table with a bare name.
DESCRIPTIONS = {
    "dedup_chain_25x": "minhash_lsh → verify → CC → keep, `max_bucket_size=200` (docs/s)",
    "pack_sequences_25x": "two-level prefix-sum sequence packing (docs/s)",
    "ivf_pq_search_25x": "3 queries, nprobe=4, PQ ADC + exact re-rank (vecs/s scanned)",
    "cdc_dedup_25x": "Arrow convolution CDC chunker → md5 first-occurrence (docs/s)",
    "exact_substr_25x": "winnowing anchors → candidate verify → interval union; fully-mirrored degenerate corpus (docs/s)",
    "lm_ppl_25x": "char-LM train + perplexity score (docs/s)",
    "kn_ppl_25x": "KN word-bigram perplexity: explode → 3 broadcast joins → per-doc agg (docs/s)",
    "unigram_encode_25x": "unigram-LM Viterbi encode, golden piece table (docs/s)",
    "repetition_25x": "Gopher repetition suite, Arrow kernel (docs/s)",
    "bloom_ref_dedup_25x": "Bloom reference-corpus paragraph suppression (docs/s)",
    "stream_substr_suppress": "streaming ExactSubstr suppressor micro-batches (docs/s)",
    "semantic_dedup_25x": "SemDeDup cluster-blocked GEMM → CC → farthest keeper; 24 exact twins/vector (vecs/s)",
    "bm25_search_25x": "10 queries vs a prebuilt 125 k-doc BM25 index (docs/s scanned)",
    "corpus_pipeline_25x": "all 10 hygiene stages composed end-to-end (docs/s)",
    "warc_corpus_e2e": "WARC parse → extract → quality → PII → exact + MinHash-CC dedup funnel (docs/s)",
    "phash_media_fp": "image decode (PNG/JPEG/GIF) → perceptual signature only (imgs/s)",
    "phash_audio_fp": "WAV decode → energy-envelope dHash only (clips/s)",
    "phash_video_fp": "APNG/GIF/MJPEG decode → frame dHashes only (videos/s)",
    "phash_dedup_media": "image decode → signature → banded pairs → CC (imgs/s)",
    "phash_audio_dedup": "audio fingerprint → banded pairs → CC; 0.3×-volume twins (clips/s)",
    "phash_video_dedup": "video fingerprint → frame-0 banding → aligned-max verify → CC; 2×-fps twins (videos/s)",
    "replay800k_sparse_bucketed": "800 k-key store, 32-row batches, bucketed rewrite (rows/s upserted)",
    "replay800k_sparse_full": "800 k-key store, 32-row batches, full rewrite (rows/s upserted)",
    "replay800k_dense_bucketed": "800 k-key store, 50 k-row batches, bucketed store (auto-dispatch escalates dense to full; bucket-aligned write) (rows/s upserted)",
    "replay800k_dense_full": "800 k-key store, 50 k-row batches, full rewrite (rows/s upserted)",
}


def _fmt_si(x: float) -> str:
    if x >= 1_000_000:
        return f"{x / 1e6:.1f} M"
    if x >= 1_000:
        return f"{x / 1e3:.1f} k"
    return f"{x:.0f}"


def render(detail: dict) -> str:
    rows_per_s = detail.get("throughput_rows_per_s", {})
    queries = detail.get("queries", {})
    spread = detail.get("spread", {})
    sf = detail.get("sf")
    k = detail.get("k")
    lines = [
        BEGIN,
        f"*(regenerated from `BENCH_DETAIL.json`: sf={sf}, k={k} "
        "interleaved medians on this dev box, `local[$SPARK_GRAFT_CPUS]`; "
        "per-entry pinned isolation — see bench.py)*",
        "",
        "| Stressed entry (workload) | median | spread | rows/s |",
        "|---|---|---|---|",
    ]
    for name in sorted(rows_per_s):
        desc = DESCRIPTIONS.get(name, "")
        med = queries.get(name)
        med_s = f"{med:.2f} s" if med is not None else "—"
        sp = spread.get(name) or {}
        sp_s = (
            f"[{sp['min']:.2f}, {sp['max']:.2f}]" if "min" in sp else "—"
        )
        tput = _fmt_si(float(rows_per_s[name]))
        label = f"`{name}`" + (f" — {desc}" if desc else "")
        lines.append(f"| {label} | {med_s} | {sp_s} | {tput} |")
    lines.append(END)
    return "\n".join(lines)


def main(argv: list[str]) -> int:
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    scale_path = os.path.join(REPO, "SCALE.md")
    flags = [a for a in argv if a.startswith("--")]
    pos = [a for a in argv if not a.startswith("--")]
    if pos:
        detail_path = pos[0]
    if len(pos) > 1:
        scale_path = pos[1]
    with open(detail_path) as fh:
        table = render(json.load(fh))
    if "--print" in flags:
        print(table)
        return 0
    with open(scale_path) as fh:
        text = fh.read()
    b, e = text.find(BEGIN), text.find(END)
    if b < 0 or e < 0:
        print(f"markers not found in {scale_path}", file=sys.stderr)
        return 2
    new = text[:b] + table + text[e + len(END):]
    if "--check" in flags:
        if new != text:
            print("SCALE.md stress table is STALE vs BENCH_DETAIL.json")
            return 1
        print("SCALE.md stress table is in sync")
        return 0
    if new != text:
        with open(scale_path, "w") as fh:
            fh.write(new)
        print(f"rewrote stress table in {scale_path}")
    else:
        print("already in sync")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
