"""kmeans_assign_two_level — the hierarchical (O(√k)-per-row)
assignment that closes SCALING.md's one knowingly super-linear term
(flat nearest-centroid with k ∝ N). Pinned against a numpy replica of
the exact same quantized-distance + tie rules, plus quality floors
against the exact flat assignment."""

from __future__ import annotations

import math

import duckdb
import numpy as np


def _q_dist(v, c, scale):
    return sum(math.floor((x - y) * (x - y) * scale) for x, y in zip(v, c))


def test_two_level_matches_numpy_replica_and_flat_quality(spark, sf_dir):
    from parallelutilities_jl_spark.operators import clustering as C

    k, iters = 16, C.IVF_FIT_ITERS
    cents = C.kmeans_fit(spark, sf_dir, k=k, iters=iters)
    got = {
        r["vec_id"]: r["cluster"]
        for r in C.kmeans_assign_two_level(
            spark, sf_dir, k=k, iters=iters
        ).collect()
    }

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{sf_dir}/embeddings.parquet' "
        "ORDER BY vec_id"
    ).fetchall()
    con.close()
    vecs = {int(r[0]): [float(x) for x in r[1]] for r in rows}

    # full coverage, valid cluster ids
    assert set(got) == set(vecs)
    assert set(got.values()) <= set(cents)

    # numpy/pure-Python replica: same grouping helper, same quantized
    # distance, same lowest-id tie rule at both levels
    n_groups = max(1, int(math.isqrt(len(cents))))
    groups = C._group_centroids(cents, n_groups)
    super_c = C._super_centroids(cents, groups)
    scale = float(C.DOT_SCALE) if hasattr(C, "DOT_SCALE") else None
    if scale is None:
        from parallelutilities_jl_spark.operators.similarity import (
            DOT_SCALE,
        )

        scale = float(DOT_SCALE)
    mismatch = 0
    flat_agree = 0
    for vid, v in vecs.items():
        sg = min(
            sorted(super_c),
            key=lambda g: (_q_dist(v, super_c[g], scale), g),
        )
        want = min(
            sorted(groups[sg]),
            key=lambda c: (_q_dist(v, cents[c], scale), c),
        )
        if got[vid] != want:
            mismatch += 1
        flat = min(
            sorted(cents),
            key=lambda c: (_q_dist(v, cents[c], scale), c),
        )
        if got[vid] == flat:
            flat_agree += 1
    assert mismatch == 0, f"{mismatch}/{len(vecs)} differ from replica"
    # quality floor vs the exact flat assignment: on the random fixture
    # most vectors' nearest centroid lives in their nearest super-group
    # (measured ~0.8 at sf0.01); pin loosely so fixture regens don't flap
    assert flat_agree / len(vecs) >= 0.5, flat_agree / len(vecs)


def test_join_path_row_identical_to_expression_path(spark, sf_dir):
    """The k_eff-scalable broadcast-join formulation (round 11,
    `_two_level_join`) must be ROW-IDENTICAL to the literal-expression
    path for both the single pick and the multi-probe variant: same
    grouping, same floor-quantized integer distances, same (d, id)
    struct-min tiebreak. Forces a large model (cell_target small enough
    that k_eff >= TWO_LEVEL_JOIN_MIN_K) so the comparison runs at the
    geometry where the join path actually ships."""
    from parallelutilities_jl_spark.operators import clustering as C

    emb, centroids = C._sampled_fit(spark, sf_dir, cell_target=7)
    assert len(centroids) >= C.TWO_LEVEL_JOIN_MIN_K, (
        f"fixture too small to force the join regime "
        f"(k_eff={len(centroids)})"
    )

    old = C.TWO_LEVEL_JOIN_MIN_K
    for nprobe in (1, 3):
        join_rows = {
            (r["vec_id"], r["cluster"])
            for r in C._two_level_join(emb, centroids, nprobe).collect()
        }
        try:
            # force the expression path despite the large model
            C.TWO_LEVEL_JOIN_MIN_K = 10**9
            expr_fn = (
                C._two_level_pick
                if nprobe == 1
                else lambda e, c: C._two_level_probes(e, c, nprobe)
            )
            expr_rows = {
                (r["vec_id"], r["cluster"])
                for r in expr_fn(emb, centroids).collect()
            }
        finally:
            C.TWO_LEVEL_JOIN_MIN_K = old
        assert join_rows == expr_rows, f"paths diverge at nprobe={nprobe}"
        assert join_rows  # non-vacuous
