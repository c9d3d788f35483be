#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of the flagship
queries at sf0.01 on local[32]. Run from the repo root:

    python tools/gen_plans.py > PLANS.md
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"

# query -> one-line "what this plan demonstrates"
SHOWCASE = {
    "q1_pricing_summary": (
        "scan-heavy agg: pushdown + pruning + partial/final hash agg. "
        "Decimal(28,6) sum buffers (float-parity policy): exact and "
        "order-independent; ~3x the double-sum agg cost, the price of "
        "cross-engine exactness (TPC-H's real schema is decimal anyway)."
    ),
    "q5_local_supplier_volume": (
        "star join: every dimension a BroadcastHashJoin, one agg Exchange"
    ),
    "q7_volume_shipping": (
        "fact-fact join shuffles on the key; dims broadcast; AQE handles skew"
    ),
    "q18_large_orders": (
        "semi-join filter pushed ahead of the wide join; single agg Exchange"
    ),
    "product_split": (
        "the product grid is generated, never materialized: range crossJoin "
        "+ closed-form partition math, no input files at all"
    ),
    "which_partition": (
        "O(1) metadata op as a no-scan codegen projection — no Exchange"
    ),
    "minhash_near_dup": (
        "one corpus-sized shuffle (groupBy doc_id), banded LSH self-join "
        "on (band, sig) buckets, exact Jaccard on candidates only"
    ),
    "ann_cosine_topk": (
        "brute-force tier: tiny query set broadcast against the corpus; "
        "per-query top-k via window over the joined scores"
    ),
    "hash_split_documents": (
        "deterministic split assignment is a pure projection; the only "
        "Exchange is the tiny census agg"
    ),
    "paragraph_dedup": (
        "chunk-hash census: explode + one hash shuffle (dedup_exact shape), "
        "then a broadcast join of per-hash counts back onto chunks"
    ),
    "contamination_check": (
        "eval-set shingles broadcast (benchmark << corpus); corpus side "
        "scans without a shuffle until the tiny per-doc agg"
    ),
    "corpus_filter_pipeline": (
        "all keep-rules evaluated in one projection over one scan; "
        "retention agg output is per-source tiny"
    ),
    "unigram_logppl": (
        "unigram-LM filter: two map-side-combinable aggs (doc-term tf, "
        "corpus word counts); the LM rides back as a broadcast join"
    ),
    "ann_int8_topk": (
        "int8-quantized corpus: quantize in one projection, broadcast the "
        "query set; integer dots stay in whole-stage codegen"
    ),
    "simhash_near_dup": (
        "hamming-LSH banding: fingerprint agg once, band equi-join for "
        "candidates, bit_count verify on candidates only"
    ),
    "incremental_dedup": (
        "ingest screen: batch keys broadcast-probe the store, hits "
        "broadcast back — the corpus-sized store side never shuffles"
    ),
    "stateful_ewma": (
        "batch-parity plan of the recursive per-key EWMA fold: one "
        "keyed shuffle builds the ordered per-key array, the integer "
        "fold runs as an aggregate HOF — verification plan for the "
        "O(1)-state applyInPandasWithState operator"
    ),
    "sequence_packing": (
        "global cumsum without a global sort: checkpointed token counts, "
        "shard-partitioned windows, S-row offsets funnel"
    ),
    "ann_pq_topk": (
        "product quantization: codebook fit collapses to tiny driver "
        "state; search is the code table against a broadcast per-query "
        "LUT + one map-side-combinable (qid, cid) integer sum"
    ),
    "training_order_packing": (
        "end-to-end corpus prep in one plan: fingerprint dedup, hash "
        "shuffle, pack along training order — every stage shard-parallel"
    ),
    "cms_heavy_hitters": (
        "count-min sketch: one map-side-combinable token-count shuffle; "
        "the 4x1024 sketch broadcasts back to score candidates; top-k is "
        "a TakeOrdered, not a global sort"
    ),
    "zorder_cell_stats": (
        "Morton keys are pure bit-arithmetic projections in codegen; the "
        "only Exchange is the per-cell agg (at write time the same key "
        "drives the sort that makes 2-D pruning work)"
    ),
    "runtime_filtered_join": (
        "selective slice vs fact join; at >10 GB probe scans Catalyst "
        "injects might_contain(bloom) into the fact scan ahead of the "
        "shuffle (asserted under simulated size in tests); at fixture "
        "scale the filtered side simply broadcasts"
    ),
    "quality_curriculum": (
        "equal-frequency tiers without NTILE: one map-side-combinable "
        "groupBy on the quantized score; the prefix-sum window runs over "
        "the <=1001-row histogram, never the data"
    ),
    "leakage_safe_split": (
        "split hash keyed on the near-dup component representative: "
        "component map (LSH + label propagation) left-joins the corpus, "
        "then one tiny census agg — no dup pair straddles splits"
    ),
    "ann_index_delta": (
        "IVF delta ingest: k-by-dim centroid agg broadcast onto the "
        "exploded batch, per-(vec, cell) integer distance agg, "
        "struct-min argmin — one lazy plan, no refit, no collect"
    ),
    "dsir_importance_weights": (
        "DSIR data selection: one token-stream tf shuffle; both n-gram "
        "histograms are <=256-row broadcasts; the importance weight is "
        "an exact fixed-point integer sum per doc"
    ),
    "embedding_power_iteration": (
        "distributed matvec rounds: the 64-row direction broadcasts "
        "onto the long-format corpus, projections and component sums "
        "are exact int64/decimal aggs — the whole 2-round chain is one "
        "lazy plan, model never collects"
    ),
    "knn_mutual_graph": (
        "corpus-as-queries ANN over TRAINED constant-size cells: "
        "symmetric 3-probe cell equi-join candidates (sampled Lloyd "
        "fit + O(sqrt k) hierarchical probes; assignment frame "
        "materialized so planning stays O(1) in k_eff), unordered "
        "pairs scored ONCE and mirrored via explode(array(row, "
        "swapped row)) in the SAME stage — one scored SMJ subtree, no "
        "self-union re-execution — per-node top-k windows partitioned "
        "by qid, mutuality as a pair-keyed count==2 over the N*k-row "
        "directed edge list"
    ),
    "multimodal_dedup_census": (
        "binary dedup accounting: payloads hash in place; only 32-byte "
        "hashes + lengths enter the two-level (modality, sha) agg"
    ),
    "skyline_parts": (
        "Pareto skyline without the O(n^2) dominance join OR a data-"
        "sized sort: per-price histogram agg, running max over the "
        "bounded histogram only, frontier broadcast back onto the scan"
    ),
    "embedding_diversity": (
        "mean pairwise dot over ALL n^2 pairs with NO pairwise join — "
        "the sum-vector identity turns it into one 64-row per-dim agg "
        "+ one row agg; decimal(38,0) squared accumulators, one "
        "correctly-rounded final division"
    ),
    "triangle_count": (
        "graph-motif census: id-oriented edge list, wedge equi-join "
        "closed against the edges — two shuffles, no cartesian; the "
        "1-row census frames cross via bounded BNLJ"
    ),
    "rolling_active_users": (
        "exact sliding-window distinct: compact to user-days FIRST, "
        "then the 7-way offset fan-out and count-distinct run on the "
        "compacted frame — the only data-sized shuffle is the dedup"
    ),
    "q2_min_cost_supplier": (
        "min-cost supplier WITHOUT a correlated re-scan: one lineitem "
        "pass feeds a (part, supplier) min agg, the per-part winner "
        "falls out of a partkey window over that agg (2 exchanges "
        "total), every dimension a BroadcastHashJoin, bounded top-100 "
        "as TakeOrdered — no sort, no cartesian"
    ),
    "stream_upsert_state": (
        "foreachBatch upsert sink's per-batch reduction (batch-parity "
        "plan): one hash exchange on user_id + per-partition local "
        "sort for the row_number winner — never a global sort; the "
        "state view re-reduces the same key at full ts precision, so "
        "state ≡ batch recompute however the stream was chunked"
    ),
    "semantic_dedup_scaled": (
        "SemDeDup at constant cell size (k grows with N): bounded-"
        "sample k-means fit, two-level coarse→fine assignment as "
        "broadcast joins, within-cell pair scoring rides cell-bounded "
        "SMJs — 3 exchanges, 0 sorts, no corpus-sized re-fit"
    ),
    "embedding_cosine_dups": (
        "banded hyperplane-LSH with the exact-integer τ bound INSIDE "
        "the band self-join: band rows carry an int16-grid sketch, "
        "non-survivor candidates die on in-cache integer dots before "
        "any exchange — no pair-level distinct shuffle of the "
        "candidate fan-out; the 64-d double arrays join for survivors "
        "only"
    ),
    "dedup_order_plan": (
        "keep-first dedup ordering from the containment matrix: the "
        "corpus-sized work is the census's fixed-width distinct + "
        "S-bounded collect_set; the argmax window rides the S²-row "
        "matrix and the rank window S rows — exact-integer keys, so "
        "the permutation is engine-independent"
    ),
    "quality_threshold_plan": (
        "config planner shape: one corpus scan into a (source x "
        "<=1001-bucket) hash-agg histogram, then every window and the "
        "threshold struct-max ride the bounded frame — the per-source "
        "sort is <=1001 rows at any corpus size"
    ),
    "vocab_coverage_plan": (
        "the count-tier trick: wordcount hash-agg, then a second "
        "hash-agg down to O(sqrt tokens) (count, words) tiers — the "
        "coverage windows sort the sqrt-sized frame, never the "
        "vocabulary; pure int64 ceil arithmetic end-to-end"
    ),
    "dedup_threshold_sensitivity": (
        "nine Jaccard deciles in one pass: the ngram_jaccard candidate "
        "subtree with the tau-pushdown at 0.1, then <=9-row decile "
        "histograms feed a stack() generator — all nine rows from one "
        "aggregate, no spine join, no second pass over candidates"
    ),
    "lsh_banding_plan": (
        "one localCheckpointed signature frame fans into four band "
        "geometries, each the minhash_near_dup explode + (band,key) agg "
        "+ capped bucket self-join reduced to a 1-row aggregate; the "
        "recall column is a literal (exact-rational ppm, no float)"
    ),
    "ann_nprobe_plan": (
        "recall/cost curve in one candidate pass: the multiprobe "
        "equi-join with the probe rank carried, an explode of [p..4] "
        "per candidate (never a per-np re-join), per-np windows on the "
        "bounded frame, and the Q-bounded broadcast exact baseline"
    ),
    "simhash_hamming_census": (
        "threshold tuning table: the capped simhash band self-join "
        "feeds a pair-distinct then a <=25-row hamming histogram; the "
        "cumulative window's SinglePartition exchange moves <=25 rows "
        "— candidate-bound by design, tail bounded by the 8-bit band"
    ),
    "winnowing_fingerprints": (
        "ZERO exchanges: the SIGMOD-2003 per-window (min, rightmost) "
        "selection is in-row HOF algebra — integer keys h*2^20 - pos "
        "under array_min/array_distinct, then one explode; no window "
        "function, nothing shuffles, the scan IS the plan"
    ),
    "winnowing_overlap": (
        "substring-level contamination screen: the zero-exchange "
        "fingerprint scan, one fp-keyed exchange shared by the df-cap "
        "count and the self-join, boilerplate hashes (df > 64) dead "
        "before the join, pair counts map-side combined"
    ),
    "multimodal_wav_energy_env": (
        "real-codec feature plan: synthesize + decode + frame-energy "
        "algebra fused into one mapInPandas chain over the scan — "
        "zero exchanges, the per-blob shape a media corpus needs"
    ),
    "dataset_card_report": (
        "composition showcase: five audited per-source censuses meet "
        "in four S-row equi-joins on source — the card adds zero "
        "corpus-sized work to its components at any scale"
    ),
    "winnowing_contamination": (
        "train-vs-eval screen: two zero-exchange winnow scans, the "
        "benchmark-sized eval fingerprint frame broadcast, corpus "
        "boilerplate (df > 64) dead before the join, two map-side "
        "combined per-doc aggs — nothing corpus-sized shuffles twice"
    ),
    "forget_cascade_plan": (
        "deletion cascade: the quality-canonical subtree unchanged, "
        "plus ONE component-keyed partial/final agg whose MAX over "
        "the int64 argmax key re-elects the canonical — no window, "
        "no new corpus-sized exchange, tombstones a pure predicate"
    ),
}

HEADER = '''# PLANS — physical plans of flagship queries (sf0.01, local[32])

Generated by `python tools/gen_plans.py`. What to look for:
`PushedFilters`/`ReadSchema` at the scans (pushdown + pruning),
`BroadcastHashJoin` for every dimension, a single `Exchange` for
fact-fact work, and wide `WholeStageCodegen` spans (no Python in hot
paths). Double SUMs go through decimal(28,6) per the float-parity
policy (exact, combine-order-independent) — visible as decimal sum
buffers in the agg nodes.
'''


def main() -> None:
    from parallelutilities_jl_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark(app_name="pu_plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    print(HEADER)
    for name, blurb in SHOWCASE.items():
        df = qs[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        print(f"## {name}\n\n{blurb}\n\n```\n{plan}```\n")


if __name__ == "__main__":
    main()
