#!/usr/bin/env python
"""Regenerate RECALL.json + RECALL.md — retrieval-quality attestation
for the approximate ANN tiers (round-6 verdict task #6: grade the
approximate tiers on recall alongside hash parity, as a committed
per-round artifact the driver/judge can read).

Ground truth is exact brute-force numpy over the fixture embeddings
(float64, same self-exclusion and tiebreak as the engine queries):
cosine top-k for the cosine tiers, squared-L2 top-k for the PQ tiers.
Recall@k = |approx ∩ exact| / k, averaged over the tier's query set.

    python tools/recall_report.py [sf_dir]     # default /root/testdata/sf0.01
"""

from __future__ import annotations

import json
import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def load_vectors(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding, label FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    con.close()
    ids = np.array([r[0] for r in rows])
    vecs = np.array([r[1] for r in rows], dtype=np.float64)
    labels = np.array([r[2] for r in rows])
    return ids, vecs, labels


def exact_cosine_topk(ids, vecs, qids, k):
    nrm = np.linalg.norm(vecs, axis=1)
    truth = {}
    for q in qids:
        qi = int(np.where(ids == q)[0][0])
        cos = (vecs @ vecs[qi]) / (nrm * nrm[qi])
        cos[qi] = -np.inf
        order = np.lexsort((ids, -cos))  # cos desc, id asc — _topk tiebreak
        truth[int(q)] = set(ids[order[:k]].tolist())
    return truth


def exact_l2_topk(ids, vecs, qids, k):
    truth = {}
    for q in qids:
        qi = int(np.where(ids == q)[0][0])
        d = ((vecs - vecs[qi]) ** 2).sum(axis=1)
        d[qi] = np.inf
        order = np.lexsort((ids, d))
        truth[int(q)] = set(ids[order[:k]].tolist())
    return truth


def exact_mutual_edges(ids, vecs, k):
    """Ground-truth mutual top-k edge set over the FULL corpus (no
    cells): (src, dst) with src < dst iff each is in the other's exact
    cosine top-k — what the cell-bounded engine graph approximates."""
    nrm = np.linalg.norm(vecs, axis=1)
    topk: dict[int, set] = {}
    for qi in range(len(ids)):
        cos = (vecs @ vecs[qi]) / (nrm * nrm[qi])
        cos[qi] = -np.inf
        order = np.lexsort((ids, -cos))
        topk[int(ids[qi])] = set(ids[order[:k]].tolist())
    return {
        (q, int(c))
        for q, nbrs in topk.items()
        for c in nbrs
        if q < c and q in topk[int(c)]
    }


def knn_edge_recall(rows, exact_edges):
    got = {(int(r["src"]), int(r["dst"])) for r in rows}
    return round(len(got & exact_edges) / max(1, len(exact_edges)), 3)


def recall_of(rows, truth, k):
    got: dict[int, set] = {}
    for r in rows:
        got.setdefault(int(r["qid"]), set()).add(int(r["cid"]))
    recalls = [
        len(got.get(q, set()) & t) / min(k, len(t))
        for q, t in truth.items()
    ]
    return round(sum(recalls) / len(recalls), 3)


def main() -> None:
    from parallelutilities_jl_spark.operators import clustering as C
    from parallelutilities_jl_spark.operators import similarity as S
    from parallelutilities_jl_spark.session import get_spark

    ids, vecs, _labels = load_vectors(SF_DIR)
    spark = get_spark(app_name="pu_recall_report")

    tiers = []  # (name, rows, truth, k, n_queries, note)

    q5 = ids[ids < S.N_QUERIES]
    cos5 = exact_cosine_topk(ids, vecs, q5, S.TOP_K)
    tiers.append((
        "ann_cosine_topk", S.q_ann_cosine_topk(spark, SF_DIR).collect(),
        cos5, S.TOP_K, len(q5),
        "brute-force baseline — sanity row, must be 1.0",
    ))
    tiers.append((
        "ann_int8_topk", S.q_ann_int8_topk(spark, SF_DIR).collect(),
        cos5, S.TOP_K, len(q5),
        "int8-quantized corpus (4x memory), quantization error only",
    ))

    q20 = ids[ids < 20]
    cos20 = exact_cosine_topk(ids, vecs, q20, 3)
    tiers.append((
        "ann_ivf_topk", S.q_ann_ivf_topk(spark, SF_DIR).collect(),
        cos20, 3, len(q20),
        "single-probe IVF on the fixture's PRE-ASSIGNED label cells — "
        "deliberately the mechanism demo: the label partition does not "
        "correlate with cosine proximity, so recall collapses; compare "
        "ann_ivf_trained_topk, same probe on LEARNED cells — the "
        "measured argument for training the coarse quantizer",
    ))

    qivf = ids[ids < C.IVF_N_QUERIES]
    cos_ivf = exact_cosine_topk(ids, vecs, qivf, 3)
    tiers.append((
        "ann_ivf_trained_topk", C.q_ann_ivf_trained(spark, SF_DIR).collect(),
        cos_ivf, 3, len(qivf),
        f"single-probe IVF on learned k-means cells "
        f"({C.IVF_FIT_ITERS} Lloyd iters)",
    ))

    tiers.append((
        "ann_ivf_multiprobe_topk",
        C.q_ann_ivf_multiprobe(spark, SF_DIR).collect(),
        cos_ivf, 3, len(qivf),
        f"multi-probe trained IVF (nprobe={C.IVF_NPROBE}) — the "
        "accuracy/cost knob over the single-probe tier",
    ))

    qpq = ids[ids < C.PQ_N_QUERIES]
    l2 = exact_l2_topk(ids, vecs, qpq, C.PQ_TOP_K)
    tiers.append((
        "ann_pq_topk", C.q_ann_pq_topk(spark, SF_DIR).collect(),
        l2, C.PQ_TOP_K, len(qpq),
        "pure asymmetric-distance PQ ranking (no re-rank) — "
        "expected poor on near-random fixture vectors",
    ))
    tiers.append((
        "ann_pq_rerank_topk", C.q_ann_pq_rerank_topk(spark, SF_DIR).collect(),
        l2, C.PQ_TOP_K, len(qpq),
        "PQ shortlist + exact int-e6 L2 re-rank — the serving path",
    ))
    from parallelutilities_jl_spark.operators.similarity import (
        KNN_GRAPH_K,
    )

    exact_edges = exact_mutual_edges(ids, vecs, KNN_GRAPH_K)
    knn_rows = C.q_knn_mutual_graph(spark, SF_DIR).collect()
    spark.stop()

    out = {}
    for name, rows, truth, k, nq, note in tiers:
        out[name] = {
            "recall_at_k": recall_of(rows, truth, k),
            "k": k,
            "n_queries": nq,
            "note": note,
        }
    out["knn_mutual_graph"] = {
        "recall_at_k": knn_edge_recall(knn_rows, exact_edges),
        "k": KNN_GRAPH_K,
        "n_queries": len(exact_edges),
        "note": "EDGE recall: fraction of true corpus-wide mutual "
        "top-k edges recovered by the trained-cell graph (n_queries "
        "column = true edge count); symmetric 3-probe candidates over "
        "learned constant-size cells — label cells scored 0.111, "
        "trained 1-probe 0.349, 2-probe 0.659; floor 0.62 (under the "
        "weaker sf0.001 tier's 0.678). Round-11 re-sweep on the "
        "single-execution chain: nprobe=4 = 0.800 for 1.7x wall — "
        "0.784 @ 3-probe is the knee",
    }

    sf = os.path.basename(SF_DIR.rstrip("/"))
    with open(os.path.join(REPO, "RECALL.json"), "w") as f:
        json.dump({"metric": "ann_recall", "sf_dir": sf, "tiers": out},
                  f, indent=1, sort_keys=True)
        f.write("\n")

    lines = [
        "# RECALL — approximate-ANN retrieval quality",
        "",
        f"Generated by `python tools/recall_report.py` at `{sf}` "
        f"({len(ids)} vectors). Ground truth: exact brute-force numpy "
        "(cosine for the cosine tiers, squared-L2 for the PQ tiers), "
        "self-excluded, engine tiebreaks. Floors are pinned by "
        "tests/test_ann_recall.py; hash parity of every tier vs its "
        "DuckDB oracle is attested separately (ATTESTATION.md).",
        "",
        "| tier | recall@k | k | queries | note |",
        "|---|---|---|---|---|",
    ]
    for name, row in out.items():
        lines.append(
            f"| {name} | {row['recall_at_k']:.3f} | {row['k']} "
            f"| {row['n_queries']} | {row['note']} |"
        )
    with open(os.path.join(REPO, "RECALL.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps({"metric": "ann_recall", "tiers": {
        n: r["recall_at_k"] for n, r in out.items()}}))


if __name__ == "__main__":
    main()
