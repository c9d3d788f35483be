"""Independent cross-checks for the round-6 analytics ops.

The driver's oracle gate compares Spark against DuckDB SQL that uses the
SAME algorithmic formulation (running-max skyline, windowed island
numbering, integer z-test), so a shared semantic bug would pass both.
These tests re-derive each result with a brute-force / pure-Python
reference implementation coded from the DEFINITION, not the algorithm.
"""

from __future__ import annotations

import duckdb

from parallelutilities_jl_spark.operators.relational import (
    ANOMALY_Z,
    ISLAND_GAP_SECS,
    q_anomaly_daily_counts,
    q_interval_islands,
    q_skyline_parts,
)
from parallelutilities_jl_spark.operators.text import (
    FUZZY_MAX_DIST,
    q_vocab_fuzzy_pairs,
)

SF = "/root/testdata/sf0.001"


def test_skyline_matches_bruteforce_dominance(spark):
    """Window-trick skyline == NOT EXISTS dominance (the definition)."""
    got = {
        (r.p_partkey, r.price_c, r.p_size)
        for r in q_skyline_parts(spark, SF).collect()
    }
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{SF}/part.parquet'")
    want = {
        tuple(r)
        for r in con.sql(
            """
            WITH p AS (
              SELECT p_partkey, p_size,
                     CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)
                       AS price_c
              FROM part
              WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL)
            SELECT p_partkey, price_c, p_size FROM p a
            WHERE NOT EXISTS (
              SELECT 1 FROM p b
              WHERE b.price_c <= a.price_c AND b.p_size >= a.p_size
                AND (b.price_c < a.price_c OR b.p_size > a.p_size))
            """
        ).fetchall()
    }
    assert got == want and got


def _merge_islands(times: list[int]) -> list[tuple[int, int]]:
    """Definitionally merge [t, t+GAP) intervals (sorted sweep)."""
    out: list[tuple[int, int]] = []
    for t in sorted(times):
        e = t + ISLAND_GAP_SECS
        if out and t <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], e))
        else:
            out.append((t, e))
    return out


def test_interval_islands_match_python_sweep(spark):
    got = {
        r.user_id: (r.n_islands, r.covered_secs, r.longest_secs)
        for r in q_interval_islands(spark, SF).collect()
    }
    con = duckdb.connect()
    raw = con.sql(
        f"""
        SELECT user_id, list(epoch_us(ts) // 1000000)
        FROM '{SF}/events.parquet' GROUP BY user_id
        """
    ).fetchall()
    assert got
    for uid, times in raw:
        isl = _merge_islands([int(t) for t in times])
        want = (
            len(isl),
            sum(e - s for s, e in isl),
            max(e - s for s, e in isl),
        )
        assert got[uid] == want, f"user {uid}: {got[uid]} != {want}"


def test_anomaly_flags_match_integer_zscore(spark):
    rows = q_anomaly_daily_counts(spark, SF).collect()
    assert rows
    # re-derive per-type stats from the emitted daily counts themselves
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    flagged = 0
    for rs in by_type.values():
        counts = [r.n for r in rs]
        nn, s, q = len(counts), sum(counts), sum(c * c for c in counts)
        for r in rs:
            dev2 = (nn * r.n - s) ** 2
            want = dev2 > ANOMALY_Z * ANOMALY_Z * (nn * q - s * s)
            assert r.is_anomaly == want
            flagged += int(want)
    # threshold chosen so the gate is non-vacuous on the fixture
    assert flagged > 0


def test_triangle_count_matches_python_neighbor_intersection(spark):
    from parallelutilities_jl_spark.operators.dedup import (
        TRI_OUT_DEG,
        q_triangle_count,
    )

    row = q_triangle_count(spark, SF).collect()[0]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    ids = [r[0] for r in con.sql("SELECT doc_id FROM documents").fetchall()]
    n = len(ids)
    # re-synthesize the citation edges definitionally in Python
    import hashlib

    def tgt(doc_id: int, j: int) -> int:
        h = hashlib.md5(f"lnk{doc_id}:{j}".encode()).hexdigest()
        return int(h[:12], 16) % n

    und = set()
    for d in ids:
        for j in range(1, TRI_OUT_DEG + 1):
            v = tgt(d, j)
            if v != d:
                und.add((min(d, v), max(d, v)))
    nbr: dict[int, set[int]] = {}
    for a, b in und:
        nbr.setdefault(a, set()).add(b)
        nbr.setdefault(b, set()).add(a)
    tris = sum(
        1
        for a, b in und
        for c in nbr[a] & nbr[b]
        if c > b  # a < b < c counts each triangle once
    )
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in nbr.values())
    assert (row.n_nodes, row.n_edges, row.n_wedges, row.n_triangles) == (
        n,
        len(und),
        wedges,
        tris,
    )
    assert tris > 0  # the census is non-vacuous on the fixture
    assert row.closed_e6 == 3 * tris * 1_000_000 // wedges


def test_skipgram_pairs_match_python_window_count(spark):
    from collections import Counter

    from parallelutilities_jl_spark.operators.text import (
        SKIPGRAM_TOP_N,
        SKIPGRAM_W,
        q_skipgram_pairs,
    )

    got = [(r.pair, r.n) for r in q_skipgram_pairs(spark, SF).collect()]
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    texts = [r[0] for r in con.sql("SELECT text FROM documents").fetchall()]
    c: Counter = Counter()
    import re

    for t in texts:
        ws = re.sub(r"\s+", " ", (t or "").lower().strip()).split(" ")
        for i, w in enumerate(ws):
            for j in range(i + 1, min(i + SKIPGRAM_W, len(ws) - 1) + 1):
                c[f"{w} {ws[j]}"] += 1
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:SKIPGRAM_TOP_N]
    assert got == want and got


def test_hard_negative_mining_matches_numpy_bruteforce(spark):
    import numpy as np

    from parallelutilities_jl_spark.operators.similarity import (
        DOT_SCALE,
        N_QUERIES,
        TOP_K,
        q_hard_negative_mining,
    )

    got: dict[int, list] = {}
    for r in q_hard_negative_mining(spark, SF).collect():
        got.setdefault(r.qid, []).append((r.rnk, r.cid, r.score_e6))
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    vecs = {vid: (lab, np.array(e, dtype=np.float64)) for vid, lab, e in rows}

    def qcos(a, b):
        # replicate the engine's quantized-int64 dot exactly
        d = int(np.sum(np.floor(a * b * DOT_SCALE)))
        na = np.sqrt(float(int(np.sum(np.floor(a * a * DOT_SCALE)))))
        nb = np.sqrt(float(int(np.sum(np.floor(b * b * DOT_SCALE)))))
        return d / (na * nb)

    assert set(got) == {v for v in vecs if v < N_QUERIES}
    for qid, hits in got.items():
        qlab, qe = vecs[qid]
        scored = sorted(
            (
                (-qcos(qe, ce), cid)
                for cid, (clab, ce) in vecs.items()
                if cid != qid and clab != qlab
            ),
        )[:TOP_K]
        want = [
            (i + 1, cid, int(np.floor(-neg * 1e6)))
            for i, (neg, cid) in enumerate(scored)
        ]
        assert sorted(hits) == want, f"qid {qid}"


def test_embedding_diversity_matches_numpy_pairwise(spark):
    import numpy as np

    from parallelutilities_jl_spark.operators.similarity import (
        DIV_SCALE,
        q_embedding_diversity,
    )

    row = q_embedding_diversity(spark, SF).collect()[0]
    con = duckdb.connect()
    vecs = [
        np.floor(np.array(e, dtype=np.float64) * DIV_SCALE).astype(object)
        for (e,) in con.sql(
            f"SELECT embedding FROM '{SF}/embeddings.parquet'"
        ).fetchall()
    ]
    n = len(vecs)
    # definitional O(n^2)-equivalent check via exact Python bigints
    svec = sum(vecs)  # elementwise, arbitrary-precision objects
    a = int(sum(int(x) * int(x) for x in svec))
    b = int(sum(int(np.dot(v, v)) for v in vecs))
    import math

    assert row.n == n
    assert row.mean_self_dot_e6 == math.floor(b / (n * DIV_SCALE))
    assert row.mean_pair_dot_e6 == math.floor(
        (a - b) / (n * (n - 1) * DIV_SCALE)
    )
    # the pairwise identity really covers all pairs: spot-check against
    # a direct pair sum on a small prefix
    m = 40
    direct = sum(
        int(np.dot(vecs[i], vecs[j]))
        for i in range(m)
        for j in range(m)
        if i != j
    )
    sm = sum(vecs[:m])
    bm = sum(int(np.dot(v, v)) for v in vecs[:m])
    assert direct == int(sum(int(x) * int(x) for x in sm)) - bm


def test_rolling_active_users_matches_python_sets(spark):
    from parallelutilities_jl_spark.operators.relational import (
        ROLLING_WINDOW_DAYS,
        q_rolling_active_users,
    )

    got = {
        r.obs_day: r.n_active
        for r in q_rolling_active_users(spark, SF).collect()
    }
    con = duckdb.connect()
    ud = con.sql(
        f"SELECT DISTINCT user_id, CAST(ts AS DATE) "
        f"FROM '{SF}/events.parquet'"
    ).fetchall()
    days = sorted({d for _, d in ud})
    assert days
    import datetime

    for obs in days:  # every day observed in the stream must be present
        active = {
            u
            for u, d in ud
            if d <= obs
            and d > obs - datetime.timedelta(days=ROLLING_WINDOW_DAYS)
        }
        assert got[obs] == len(active), f"day {obs}"
    # clipped: no observation day past the stream end
    assert max(got) == max(days)


def test_trimmed_robust_stats_match_python_sort(spark):
    from parallelutilities_jl_spark.operators.relational import (
        TRIM_PCT,
        q_trimmed_robust_stats,
    )

    row = q_trimmed_robust_stats(spark, SF).collect()[0]
    con = duckdb.connect()
    vals = sorted(
        int(v)
        for (v,) in con.sql(
            f"SELECT l_quantity FROM '{SF}/lineitem.parquet' "
            "WHERE l_quantity IS NOT NULL"
        ).fetchall()
    )
    n = len(vals)
    k = n * TRIM_PCT // 100
    trimmed = vals[k : n - k]
    winsor = [vals[k]] * k + trimmed + [vals[n - k - 1]] * k
    assert row.n == n and row.k == k
    assert row.lo_v == vals[k] and row.hi_v == vals[n - k - 1]
    assert row.trimmed_mean_e6 == sum(trimmed) * 10**6 // len(trimmed)
    assert row.winsor_mean_e6 == sum(winsor) * 10**6 // n
    assert k > 0  # non-vacuous: the trim really removes rows


def test_user_behavior_similarity_matches_python_sparse_cosine(spark):
    import math

    from parallelutilities_jl_spark.operators.relational import (
        BEHAV_N_QUERY,
        BEHAV_TOP_N,
        q_user_behavior_similarity,
    )

    got = [
        (r.ua, r.ub, r.cos_e6)
        for r in q_user_behavior_similarity(spark, SF).collect()
    ]
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, CAST(ts AS DATE), COUNT(*) "
        f"FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    vec: dict[int, dict] = {}
    for u, d, c in rows:
        vec.setdefault(u, {})[d] = int(c)
    scored = []
    for ua in sorted(vec):
        if ua >= BEHAV_N_QUERY:
            continue
        va = vec[ua]
        for ub, vb in vec.items():
            if ub == ua:
                continue
            dot = sum(va[d] * vb[d] for d in va.keys() & vb.keys())
            if dot == 0:
                continue
            na = math.sqrt(float(sum(x * x for x in va.values())))
            nb = math.sqrt(float(sum(x * x for x in vb.values())))
            scored.append(
                (ua, ub, math.floor(dot * 1e6 / (na * nb)))
            )
    want = sorted(scored, key=lambda t: (-t[2], t[0], t[1]))[:BEHAV_TOP_N]
    assert got == want and got


def test_shard_manifest_matches_python_sequential_pack(spark):
    from parallelutilities_jl_spark.operators.multimodal import (
        SHARD_BYTES,
        q_multimodal_shard_manifest,
    )

    got = {
        r.shard_id: (
            r.n_assets,
            r.shard_bytes,
            r.first_asset,
            r.last_asset,
            r.n_image,
        )
        for r in q_multimodal_shard_manifest(spark, SF).collect()
    }
    con = duckdb.connect()
    rows = con.sql(
        f"SELECT doc_id, octet_length(encode(text)) "
        f"FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    # definitional sequential packing (the two-tier prefix sum must
    # reproduce exactly this single-threaded fold)
    want: dict[int, list] = {}
    off = 0
    for doc_id, nb in rows:
        sid = off // SHARD_BYTES
        st = want.setdefault(sid, [0, 0, doc_id, doc_id, 0])
        st[0] += 1
        st[1] += nb
        st[3] = doc_id
        st[4] += 1 if doc_id % 3 == 0 else 0
        off += nb
    assert got == {k: tuple(v) for k, v in want.items()}
    assert len(got) > 2  # the cap really cuts multiple shards


def test_dedup_eval_confusion_matches_python_classifier(spark):
    """Re-derive the confusion matrix from the raw signatures and
    shingle sets computed in pure Python (md5 only, no Spark logic)."""
    import hashlib
    import re as _re

    from parallelutilities_jl_spark.functions import texthash as TH
    from parallelutilities_jl_spark.operators.dedup import (
        _EVAL_DEN,
        _EVAL_NUM,
        BANDS,
        N_HASHES,
        ROWS_PER_BAND,
        SHINGLE_K,
        q_dedup_eval_confusion,
    )

    row = q_dedup_eval_confusion(spark, SF).collect()[0]
    con = duckdb.connect()
    texts = con.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()

    def norm(t):
        return _re.sub(r"\s+", " ", (t or "").lower().strip())

    def md5_int60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    shs = {}
    sig = {}
    for doc_id, t in texts:
        ws = norm(t).split(" ")
        if len(ws) < SHINGLE_K:
            continue
        ss = {
            " ".join(ws[i : i + SHINGLE_K])
            for i in range(len(ws) - SHINGLE_K + 1)
        }
        shs[doc_id] = ss
        hs = [md5_int60(x) for x in ss]
        sig[doc_id] = [
            min(h ^ TH.MINHASH_XOR_SALTS[i] for h in hs)
            for i in range(N_HASHES)
        ]
    # LSH candidates (band key = md5 of joined band rows)
    buckets: dict = {}
    for d, sg in sig.items():
        for b in range(BANDS):
            key = hashlib.md5(
                "|".join(
                    str(sg[b * ROWS_PER_BAND + r])
                    for r in range(ROWS_PER_BAND)
                ).encode()
            ).hexdigest()
            buckets.setdefault((b, key), []).append(d)
    cands = set()
    for ds in buckets.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cands.add((ds[i], ds[j]))
    tp = fp = fn = tn = 0
    for a, b in cands:
        m = sum(1 for i in range(N_HASHES) if sig[a][i] == sig[b][i])
        ni = len(shs[a] & shs[b])
        un = len(shs[a]) + len(shs[b]) - ni
        pred = m * _EVAL_DEN >= _EVAL_NUM * N_HASHES
        truth = ni * _EVAL_DEN >= _EVAL_NUM * un
        tp += pred and truth
        fp += pred and not truth
        fn += (not pred) and truth
        tn += (not pred) and (not truth)
    assert (row.n_candidates, row.tp, row.fp, row.fn, row.tn) == (
        len(cands),
        tp,
        fp,
        fn,
        tn,
    )
    assert row.n_candidates > 0 and (tp + fn) > 0  # non-vacuous
    assert row.precision_e6 == (
        tp * 10**6 // (tp + fp) if tp + fp else None
    )
    assert row.recall_e6 == (
        tp * 10**6 // (tp + fn) if tp + fn else None
    )


def test_median_mad_match_python_sort(spark):
    from parallelutilities_jl_spark.operators.relational import (
        q_median_mad_stats,
    )

    row = q_median_mad_stats(spark, SF).collect()[0]
    con = duckdb.connect()
    vals = sorted(
        int(v)
        for (v,) in con.sql(
            f"SELECT l_quantity FROM '{SF}/lineitem.parquet' "
            "WHERE l_quantity IS NOT NULL"
        ).fetchall()
    )
    n = len(vals)
    med = vals[(n + 1) // 2 - 1]  # lower median, 1-indexed rank (n+1)//2
    devs = sorted(abs(v - med) for v in vals)
    mad = devs[(n + 1) // 2 - 1]
    assert (row.n, row.median, row.mad) == (n, med, mad)
    assert mad > 0  # non-vacuous spread on the fixture


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_vocab_fuzzy_pairs_distances_are_true_levenshtein(spark):
    rows = q_vocab_fuzzy_pairs(spark, SF).collect()
    assert rows  # non-vacuous on the fixture vocab
    for r in rows:
        assert r.dist == _lev(r.tok_a, r.tok_b) <= FUZZY_MAX_DIST
        assert r.tok_a < r.tok_b
        assert r.tok_a[0] == r.tok_b[0]  # blocking contract
