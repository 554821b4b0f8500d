#!/usr/bin/env python3
"""SCALING.md measurement runner: times the operator families on the
ScaleGen corpora at 1x/3x/10x/30x of the bench SF and fits a wall-time-
vs-rows exponent per family (log-log least squares over best-of-reps).

Usage: python3 scripts/scaling_audit.py [--scales x1,x3,x10,x30] \
           [--base /tmp/scale] [--out /tmp/scale/results.json]

Each scale runs ONE Bench JVM over all family queries (Bench's own
interleaved best-of-reps discipline applies); pins are disabled via a
nonexistent budget path so sf0.1 pins don't trigger retry passes at 10x.
The SAX band join is user-quadratic by design (SURVEY flags it) — it is
excluded from x30 unless --sax-x30 is passed, to keep the run bounded.
"""
import argparse
import json
import math
import os
import subprocess
import sys

FAMILIES = {
    # family label -> (query name, which table scales it, rows column)
    "exact dedup (hash groupBy)": ("dedup_exact_docs", "docs"),
    "MinHash signatures": ("minhash_signatures", "docs"),
    "MinHash-LSH banded pairs (from artifact)": ("minhash_lsh_pairs", "docs"),
    "exact CC fixpoint (from artifact)": ("dedup_components_exact", "docs"),
    "semantic dedup (SemDeDup cells)": ("semantic_dedup", "vecs"),
    "embedding LSH pairs (banded hyperplanes)": ("embedding_lsh_pairs", "vecs"),
    "IVF serving (nprobe cell join)": ("ann_ivf_topk", "vecs"),
    "PQ-ADC serving": ("pq_adc_topk", "vecs"),
    "graph-ANN serving (beam walk, from artifact)": ("ann_graph_topk", "vecs"),
    "BM25 serving (from postings index)": ("bm25_from_index_topk", "docs"),
    "RRF hybrid retrieval (from indexes)": ("rrf_from_index", "docs"),
    "text curation pipeline": ("curation_pipeline", "docs"),
    "embedding curation pipeline": ("embedding_curation_pipeline", "vecs"),
    "media curation pipeline": ("media_curation_pipeline", "docs"),
    "SAX similar pairs (user-quadratic band join)": ("ts_similarity_pairs", "events"),
    # round-13 additions: the occupancy-sized quantizer tier and the
    # bounded-output / capped serving twins of the quadratic families
    "IVF serving (occupancy-sized quantizer)": ("ann_ivf_auto_topk", "vecs"),
    "IVF serving (occupancy quantizer, from index)": ("ann_ivf_auto_from_index_topk", "vecs"),
    "quantizer occupancy audit": ("quantizer_auto_report", "vecs"),
    "SAX top-k similar per user (bounded output)": ("ts_similar_topk", "events"),
    "media near-dup pairs (occupancy-capped)": ("media_neardup_pairs_capped", "docs"),
}

TABLE_FILES = {  # rows column -> parquet file whose count scales the family
    "docs": "documents.parquet",
    "vecs": "embeddings.parquet",
    "events": "events.parquet",
}


def rows_of(base, scale):
    """Actual corpus row counts read from the parquet footers — a hard-coded
    table would silently fit exponents on wrong x-values if the corpora under
    --base were generated with different ScaleGen counts."""
    import pyarrow.dataset as pds
    d = os.path.join(base, scale)
    # the corpora are Spark-written parquet DIRECTORIES; count_rows reads
    # only footer metadata
    return {tbl: pds.dataset(os.path.join(d, f), format="parquet").count_rows()
            for tbl, f in TABLE_FILES.items()}


def run_scale(base, scale, queries, repo):
    out = os.path.join(base, f"bench_{scale}.json")
    # a stale bench_<scale>.json from an earlier invocation must never be
    # parsed as this run's result: remove it first, and treat rc != 0 or a
    # missing output as a failed scale (skipped, not silently refitted)
    if os.path.exists(out):
        os.remove(out)
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=os.path.join(base, scale),
               SPARK_GRAFT_BENCH_OUT=out,
               SPARK_GRAFT_BENCH_BUDGET=os.path.join(base, "no_pins.json"))
    cmd = [os.path.join(repo, "scripts/run.sh"), "graft.Bench"] + queries
    print(f"[scaling] {scale}: {len(queries)} queries ...", flush=True)
    r = subprocess.run(cmd, env=env, cwd=repo,
                       stdout=subprocess.PIPE, stderr=subprocess.DEVNULL)
    if r.returncode != 0:
        print(f"[scaling] {scale}: bench rc={r.returncode} — scale skipped",
              file=sys.stderr)
        # fall through only if the bench still wrote its artifact (Bench
        # exits non-zero when ANY query errors but the JSON has the rest)
    if not os.path.exists(out):
        return None
    with open(out) as f:
        return json.loads(f.read())


def fit_exponent(points):
    """least-squares slope of log(t) vs log(rows); needs >= 2 points"""
    pts = [(math.log(n), math.log(t)) for n, t in points if t > 0]
    if len(pts) < 2:
        return None
    mx = sum(x for x, _ in pts) / len(pts)
    my = sum(y for _, y in pts) / len(pts)
    num = sum((x - mx) * (y - my) for x, y in pts)
    den = sum((x - mx) ** 2 for x, y in pts)
    return num / den if den else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="x1,x3,x10,x30")
    ap.add_argument("--base", default="/tmp/scale")
    ap.add_argument("--out", default="/tmp/scale/results.json")
    ap.add_argument("--sax-x30", action="store_true",
                    help="include the user-quadratic SAX join at x30")
    ap.add_argument("--repo", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()
    scales = args.scales.split(",")

    bench, rows = {}, {}
    for s in scales:
        queries = [q for q, _ in FAMILIES.values()]
        if s == "x30" and not args.sax_x30:
            queries = [q for q in queries if q != "ts_similarity_pairs"]
        rows[s] = rows_of(args.base, s)
        b = run_scale(args.base, s, queries, args.repo)
        if b is None:
            print(f"[scaling] {s}: no bench output — dropped from the fit",
                  file=sys.stderr)
            continue
        bench[s] = b

    results = {}
    for fam, (q, tbl) in FAMILIES.items():
        pts, times = [], {}
        for s in scales:
            if s not in bench:
                continue
            t = bench[s]["queries"].get(q)
            if t is None:
                continue
            times[s] = t
            pts.append((rows[s][tbl], t))
        results[fam] = {
            "query": q, "rows_table": tbl, "times": times,
            "exponent_all": fit_exponent(pts),
            # the tail slope separates fixed JVM/job overhead (flat at
            # small n) from the asymptotic growth that matters at 100 TB
            "exponent_tail": fit_exponent(pts[-2:]) if len(pts) >= 2 else None,
        }
    with open(args.out, "w") as f:
        json.dump({"rows": rows, "families": results}, f, indent=2)
    for fam, r in sorted(results.items(), key=lambda kv: -(kv[1]["exponent_tail"] or 0)):
        ts = " ".join(f"{s}={r['times'][s]:.2f}s" for s in r["times"])
        print(f"{fam:55s} tail-exp={r['exponent_tail']:.2f} all={r['exponent_all']:.2f}  {ts}"
              if r["exponent_tail"] is not None else f"{fam}: insufficient points")
    print(f"[scaling] wrote {args.out}")


if __name__ == "__main__":
    main()
