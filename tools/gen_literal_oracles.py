#!/usr/bin/env python3
"""Generate DuckDB literal-VALUES oracle SQL for the deterministic
rows-only queries, from an actual graft.Verify output dir.

The emitted object (src/main/scala/graft/LiteralOracles.scala) pins the
exact expected rows at the driver's verify scale (sf0.01). Valid because
each query's output is a deterministic, partitioning-independent
function of the input (integer/ppm columns only, total ORDER BY).

Usage: python3 tools/gen_literal_oracles.py /tmp/vout > /tmp/LiteralOracles.scala
"""
import sys, glob
import duckdb

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"

# name -> (columns in VALUES order, ORDER BY clause)
QUERIES = {
    "t29_minhash_lsh": (["a_id", "b_id", "jac_ppm"], "a_id, b_id"),
    "t30_simhash": (["a_id", "b_id", "hamming"], "a_id, b_id"),
    "t31_knn_ivf": (["query_id", "n_brute", "n_hits", "recall_ppm", "floor_ok"], "query_id"),
    "t45_embed_lsh": (["a_id", "b_id", "cos_ppm"], "a_id, b_id"),
    "t46_winnowing": (["a_id", "b_id", "shared_fps"], "a_id, b_id"),
    "t120_winnowing_capped": (["a_id", "b_id", "shared_fps"], "a_id, b_id"),
    "t121_winnowing_delta": (["a_id", "b_id", "shared_fps"], "a_id, b_id"),
    "t122_containment_capped": (["a_id", "b_id", "containment_ppm"], "a_id, b_id"),
    "t123_containment_delta": (["a_id", "b_id", "containment_ppm"], "a_id, b_id"),
    "t125_phash_pairs": (["a_grp", "b_grp", "n_pairs", "max_hamming"], "a_grp, b_grp"),
    "t126_audiofp_pairs": (["a_grp", "b_grp", "n_pairs", "max_hamming"], "a_grp, b_grp"),
    "t127_phash_delta": (["a_grp", "b_grp", "n_pairs", "max_hamming"], "a_grp, b_grp"),
    "t48_multimodal": (["kind", "n", "total_bytes", "brightness_micro"], "kind"),
    "t49_knn_ivf_kmeans": (["query_id", "n_brute", "n_hits", "recall_ppm", "floor_ok"], "query_id"),
    "t50_bpe_tokens": (["doc_id", "n_bpe_tokens"], "doc_id"),
    "t62_distinct_approx": (["l_returnflag", "approx_orders", "approx_parts"], "l_returnflag"),
    "t65_incremental_minhash": (["a_id", "b_id", "jac_ppm"], "a_id, b_id"),
    "t72_semdedup": (["cell", "a_id", "b_id", "cos_ppm"], "a_id, b_id"),
    "t75_bin_packing": (["doc_id", "n_tokens", "bucket", "bin", "oversize"], "doc_id"),
    "t79_semdedup_delta": (["cell", "a_id", "b_id", "cos_ppm"], "a_id, b_id"),
    "t83_knn_pq": (["query_id", "n_brute", "n_hits", "recall_ppm", "floor_ok"], "query_id"),
    "t112_knn_ivf_incremental": (["query_id", "n_brute", "n_hits", "recall_ppm", "floor_ok"], "query_id"),
    "t129_knn_graph_nsw": (["query_id", "n_brute", "n_hits", "recall_ppm", "floor_ok"], "query_id"),
    "t151_ann_hierarchical": (["query_id", "n_brute", "n_hits", "recall_ppm", "floor_ok"], "query_id"),
    "t152_ann_ivfpq": (["query_id", "n_brute", "n_hits", "recall_ppm", "floor_ok"], "query_id"),
    "t154_semdedup_store": (["cell", "a_id", "b_id", "cos_ppm"], "a_id, b_id"),
    "t155_ann_maintenance": (["query_id", "n_brute", "n_hits", "recall_ppm", "floor_ok"], "query_id"),
    "t156_semdedup_stream": (["cell", "a_id", "b_id", "cos_ppm"], "a_id, b_id"),
    "t132_ann_drift_recluster": (["scenario", "drift_ppm", "reclustered", "version_after", "n_index", "nbr_ck", "cos_ck"], "scenario"),
    "t157_ann_hier_drift": (["scenario", "drift_ppm", "reclustered", "version_after", "n_index", "nbr_ck", "cos_ck"], "scenario"),
    "t158_semdedup_hier": (["cell", "a_id", "b_id", "cos_ppm"], "a_id, b_id"),
    "t115_ivf_drift": (["cell", "n_v1", "mean_d2_v1", "n_delta", "mean_d2_delta", "drift_ppm"], "cell"),
}

con = duckdb.connect()

def lit(v):
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return str(v)

print("package graft")
print()
print("/** Literal expected rows for deterministic queries whose logic a SQL")
print("  * oracle cannot re-derive (engine-native hashes/sketches) — generated")
print("  * by tools/gen_literal_oracles.py from an actual sf0.01 run, valid")
print("  * because each output is a partitioning-independent integer-valued")
print("  * function of the fixed test data (see each query's Scaladoc). */")
print("private[graft] object LiteralOracles {")
for name, (cols, order) in QUERIES.items():
    rel = con.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet' ORDER BY {order}")
    assert [c.lower() for c in rel.columns] == cols, (name, rel.columns)
    rows = rel.fetchall()
    if not rows:
        print(f"  // {name}: NO ROWS — not generated", file=sys.stderr)
        continue
    values = ",\n      ".join("(" + ", ".join(lit(v) for v in r) + ")" for r in rows)
    collist = ", ".join(cols)
    key = name.split("_")[0]
    print(f"""
  // {len(rows)} rows
  val {key}: String = \"\"\"SELECT {collist}
    FROM (VALUES
      {values})
      AS t({collist})
    ORDER BY {order}\"\"\"""")
print("}")
