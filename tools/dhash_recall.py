#!/usr/bin/env python
"""Measure dHash banding recall against the exact all-pairs hamming
scan on any fixture dir — the reproducible source of the SCALING.md
banding-recall numbers (x10 stress corpus: 6598/6598, recall 1.0).
Both sides run the committed fingerprint algebra (_dhash_fp_sql), so
the measurement isolates the banding step; per-regime split shows
where the pigeonhole guarantee (hamming <= bands-1 differing bits
always share a clean band) ends and the probabilistic tail begins.

    python tools/dhash_recall.py [sf_dir]   # default /root/testdata/sf0.1
    PU_STRESS_DIR corpora work too: python tools/dhash_recall.py /tmp/pu_sfx1
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from parallelutilities_jl_spark.operators import multimodal as M

    con = duckdb.connect()
    path = os.path.join(SF_DIR, "documents.parquet")
    glob = path if os.path.isfile(path) else f"{path}/*.parquet"
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{glob}'")
    exact = con.execute(f"""
WITH {M._dhash_fp_sql()}
SELECT a.asset_id, b.asset_id, bit_count(xor(a.dhash, b.dhash)) AS h
FROM fp a JOIN fp b ON a.asset_id < b.asset_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= {M.DHASH_HAM_MAX}
""").fetchall()
    banded = set(
        (a, b) for a, b, _ in con.execute(
            M._oracle_dhash_near_dup()
        ).fetchall()
    )
    con.close()
    low = {(a, b) for a, b, h in exact if h <= M.DHASH_BANDS - 1}
    high = {(a, b) for a, b, h in exact if h >= M.DHASH_BANDS}
    allp = {(a, b) for a, b, _ in exact}
    # banding + verify can only SUBSET the exact pair set (same
    # fingerprints, same hamming gate) — assert the invariant instead
    # of reporting a structurally-always-zero "false accepts" count
    assert banded <= allp, "banded pairs must be a subset of exact"
    out = {
        "sf_dir": SF_DIR,
        "exact_pairs": len(allp),
        "banded_pairs": len(banded),
        "recall": round(len(banded & allp) / len(allp), 4) if allp else 1.0,
        "guaranteed_regime": {
            "pairs": len(low),
            "found": len(low & banded),
        },
        "probabilistic_regime": {
            "pairs": len(high),
            "found": len(high & banded),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
