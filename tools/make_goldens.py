#!/usr/bin/env python3
"""Freeze Spark-computed golden parquets for the non-SQL-expressible queries.

Usage: python3 tools/make_goldens.py <verifyOutDir> <sfLabel> [query ...]

Reads each query's result from a `graft.Verify` output dir (the SAME bytes
the driver's correctness gate would compare), appends a `__row` column
freezing the exact row order, and writes a single-file golden to
golden/<sfLabel>/<query>.parquet. The oracle SQL (operators/Golden.scala)
re-serves that order with `ORDER BY __row` and drops the column.

Honesty contract (also in Golden.scala): a golden pins run-to-run
determinism and regressions — first-principles correctness lives in each
operator's ScalaTest ground-truth spec. Only queries shown bit-identical
across independent Verify sessions are frozen (SURVEY §8 records the
evidence).

Driver-side tooling only (pyarrow is not available to the Scala engine).
"""
import glob
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

DEFAULT_QUERIES = [
    "agg_approx_distinct", "dedup_cluster_docs", "dedup_keep_best",
    "dedup_minhash_incremental",
    "dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_simhash_clusters",
    "dedup_simhash_docs", "dedup_simhash_pairs",
    "ev_hll_daily_users", "ev_hll_union_total", "ev_user_cms_topk",
    "graph_harmonic_hll", "graph_effective_diameter",
    "mm_ahash_dup_groups", "mm_binaryfile_scan", "mm_caption_align",
    "mm_decode_batched",
    "mm_frame_sample", "rag_chunk_retrieve", "rag_hybrid_rrf",
    "sim_embedding_clusters",
    "sim_ann_panel", "sim_ann_tune", "sim_ann_tune_panel",
    "sim_kmeans_profile", "sim_knn_aggregator", "sim_knn_brute",
    "sim_knn_filtered_pre",
    "sim_index_staleness",
    "sim_knn_ivf", "sim_knn_ivf_indexed", "sim_knn_ivf_tuned", "sim_knn_lsh",
    "sim_knn_lsh_indexed", "sim_knn_lsh_tuned",
    "sim_knn_pq", "sim_knn_pq_rerank", "sim_knn_sq8",
    "sim_neardup_pairs", "sim_semdedup", "sim_semdedup_incremental",
    "text_winnow_fingerprint",
]


def main() -> int:
    verify_dir, sf = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:] or DEFAULT_QUERIES
    out_root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "golden", sf)
    os.makedirs(out_root, exist_ok=True)
    for q in queries:
        # sorted part order matches how the checker's pandas read (and any
        # filename-ordered reader) sees the Spark output
        parts = sorted(glob.glob(f"{verify_dir}/{q}/part-*.parquet"))
        if not parts:
            print(f"  SKIP {q}: no output under {verify_dir}")
            return 1
        table = pa.concat_tables(pq.read_table(p) for p in parts)
        table = table.append_column(
            "__row", pa.array(range(table.num_rows), pa.int64()))
        pq.write_table(table, os.path.join(out_root, f"{q}.parquet"))
        print(f"  OK   {q} ({table.num_rows} rows) -> golden/{sf}/{q}.parquet")
    return 0


if __name__ == "__main__":
    sys.exit(main())
