"""Property pins for the LSH bucket cap (round-15 verdict item 7):
`candidate_pairs` is the shared choke-point of every near-dup family,
and its `max_bucket` drop is the one lossy step between banding and
verification. These tests pin its EXACT semantics against an
independent Python replay over hypothesis-generated band tables, the
cap's monotonicity, and the recall floor: a pair is lost if and only
if EVERY bucket it shares is oversize — so on corpora whose true
near-dup groups are within the cap, capped recall equals uncapped
recall exactly."""

from __future__ import annotations

from parallelutilities_jl_spark.operators.dedup import candidate_pairs


def _reference_pairs(rows, cap):
    """Independent replay of the cap semantics: group (band, key),
    drop oversize groups, emit a<b pairs, dedup."""
    buckets: dict = {}
    for doc, band, key in rows:
        buckets.setdefault((band, key), set()).add(doc)
    pairs = set()
    for docs in buckets.values():
        if cap is not None and len(docs) > cap:
            continue
        ds = sorted(docs)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                pairs.add((ds[i], ds[j]))
    return pairs


def _spark_pairs(spark, rows, cap):
    df = spark.createDataFrame(
        [(int(d), int(b), k) for d, b, k in rows],
        "doc_id long, band long, key string",
    )
    return {
        (r.doc_a, r.doc_b)
        for r in candidate_pairs(df, max_bucket=cap).collect()
    }


def test_property_cap_semantics_match_reference(spark):
    """For ANY band table and ANY cap, the engine's candidate set must
    equal the independent replay; caps are monotone; and the pairs a
    cap loses are exactly those whose every shared bucket is
    oversize."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    @st.composite
    def band_table(draw):
        n_docs = draw(st.integers(min_value=2, max_value=7))
        n_bands = draw(st.integers(min_value=1, max_value=3))
        n_keys = draw(st.integers(min_value=1, max_value=3))
        rows = []
        for d in range(n_docs):
            for b in range(n_bands):
                k = draw(st.integers(min_value=0, max_value=n_keys - 1))
                rows.append((d, b, f"k{k}"))
        return rows

    @settings(
        max_examples=8, deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(rows=band_table(), cap=st.sampled_from([1, 2, 3, None]))
    def run(rows, cap):
        got = _spark_pairs(spark, rows, cap)
        want = _reference_pairs(rows, cap)
        assert got == want, (cap, sorted(rows))
        if cap is not None:
            uncapped = _reference_pairs(rows, None)
            # soundness: the cap only removes pairs, never invents them
            assert got <= uncapped
            # monotone: a looser cap can only add pairs
            assert got <= _reference_pairs(rows, cap + 1)
            # the recall floor: a lost pair shares ONLY oversize buckets
            buckets: dict = {}
            for doc, band, key in rows:
                buckets.setdefault((band, key), set()).add(doc)
            for a, b in uncapped - got:
                shared = [
                    ds for ds in buckets.values() if a in ds and b in ds
                ]
                assert shared and all(len(ds) > cap for ds in shared), (
                    a, b, cap,
                )

    run()


def test_cap_at_or_above_max_bucket_is_lossless(spark):
    """The operating regime the near-dup queries rely on: when every
    bucket fits the cap, capped candidates == uncapped candidates ==
    full recall of the banding scheme (MAX_LSH_BUCKET=2000 vs fixture
    group sizes of ~3)."""
    rows = []
    # three near-dup groups of sizes 2, 3, 4 sharing per-group keys in
    # band 0, plus a singleton; band 1 all-distinct keys (no pairs)
    doc = 0
    for gi, size in enumerate((2, 3, 4)):
        for _ in range(size):
            rows.append((doc, 0, f"g{gi}"))
            rows.append((doc, 1, f"u{doc}"))
            doc += 1
    rows.append((doc, 0, "solo"))
    rows.append((doc, 1, f"u{doc}"))
    uncapped = _spark_pairs(spark, rows, None)
    assert uncapped == _reference_pairs(rows, None)
    assert len(uncapped) == 1 + 3 + 6
    for cap in (4, 5, 2000):
        assert _spark_pairs(spark, rows, cap) == uncapped, cap
    # one notch below the largest group: exactly that group's pairs drop
    got3 = _spark_pairs(spark, rows, 3)
    assert got3 == _reference_pairs(rows, 3)
    assert len(got3) == 1 + 3
