"""Cached-block lifetime policy (round-13 verdict items 1/4): after a
query's result is materialized, `release_cached_blocks` must leave ZERO
persistent RDD blocks in the session — the 49 `localCheckpoint`/
`persist` sites otherwise accumulate storage memory linearly across a
long-lived roster (the mechanism behind the round-13 driver bench's
progressive 5-8x heavy-head inflation), and the module-level fit caches
must drop their handles first so nothing dangles on a truncated-lineage
frame."""

from __future__ import annotations

from parallelutilities_jl_spark.session import release_cached_blocks


def _n_persistent(spark) -> int:
    return len(spark.sparkContext._jsc.getPersistentRDDs())


def _materialize(df) -> int:
    return df.count()


def test_release_after_checkpoint_heavy_query(spark, sf_dir):
    """A localCheckpoint-using query pins blocks; release drops ALL of
    them (getPersistentRDDs empty) and reports how many it freed."""
    from parallelutilities_jl_spark.operators.dedup import q_minhash_near_dup

    release_cached_blocks(spark)  # clean slate
    assert _n_persistent(spark) == 0

    n_rows = _materialize(q_minhash_near_dup(spark, sf_dir))
    assert _n_persistent(spark) > 0, (
        "expected the minhash localCheckpoint to pin blocks — if this "
        "stops holding, pick another checkpoint-heavy query"
    )
    freed = release_cached_blocks(spark)
    assert freed > 0
    assert _n_persistent(spark) == 0

    # the query still runs correctly from a cold state
    assert _materialize(q_minhash_near_dup(spark, sf_dir)) == n_rows
    release_cached_blocks(spark)


def test_release_clears_fit_caches_and_query_recovers(spark, sf_dir):
    """The fit caches hold localCheckpoint'ed frames; release must clear
    the dicts BEFORE unpersisting (a surviving handle would be
    unrecomputable — truncated lineage), and the query must rebuild the
    fit transparently on its next call."""
    from parallelutilities_jl_spark.operators import clustering as cl

    release_cached_blocks(spark)
    n1 = _materialize(cl.q_kmeans_assign(spark, sf_dir))
    assert cl._FLAT_FIT_CACHE, "kmeans fit should be memoized after a run"

    release_cached_blocks(spark)
    assert not cl._FLAT_FIT_CACHE
    assert not cl._FIT_CACHE and not cl._PQ_FIT_CACHE
    assert not cl._PI_CACHE and not cl._EDGE_CACHE
    assert _n_persistent(spark) == 0

    # rebuilds from scratch — no dangling handle, identical result size
    n2 = _materialize(cl.q_kmeans_assign(spark, sf_dir))
    assert n2 == n1
    release_cached_blocks(spark)


def test_release_is_idempotent_on_empty_session(spark):
    release_cached_blocks(spark)
    assert release_cached_blocks(spark) == 0
