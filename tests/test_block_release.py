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


# ---- per-query scope (round-15: the resident-service shape) ---------------


def test_block_scope_releases_only_scope_created_blocks(spark, sf_dir):
    """A block pinned BEFORE the scope survives it; blocks pinned inside
    are freed on exit — the per-query lifetime a resident multi-query
    service needs (the global release would clobber the outer block)."""
    from parallelutilities_jl_spark.session import block_scope

    release_cached_blocks(spark)
    outer = spark.range(1000).localCheckpoint()
    outer.count()
    n_outer = _n_persistent(spark)
    assert n_outer > 0

    from parallelutilities_jl_spark.operators.dedup import q_minhash_near_dup

    with block_scope(spark) as stats:
        n_rows = _materialize(q_minhash_near_dup(spark, sf_dir))
        assert _n_persistent(spark) > n_outer
    assert stats["released"] > 0
    assert _n_persistent(spark) == n_outer
    # the pre-existing block is still usable AND the query recomputes
    assert outer.count() == 1000
    assert _materialize(q_minhash_near_dup(spark, sf_dir)) == n_rows
    release_cached_blocks(spark)


def test_block_scope_evicts_only_scope_added_cache_entries(spark, sf_dir):
    """A fit-cache entry created inside a scope is evicted on exit (its
    checkpoint blocks are freed — a surviving handle would dangle on
    truncated lineage); an entry warmed BEFORE the scope keeps both its
    handle and its blocks, and still serves queries afterwards."""
    from parallelutilities_jl_spark.operators import clustering as cl
    from parallelutilities_jl_spark.session import block_scope

    release_cached_blocks(spark)
    n_warm = _materialize(cl.q_kmeans_assign(spark, sf_dir))
    assert cl._FLAT_FIT_CACHE, "kmeans fit should be memoized"
    warm_keys = set(cl._FLAT_FIT_CACHE)

    with block_scope(spark) as stats:
        _materialize(cl.q_ann_pq_topk(spark, sf_dir))
        assert cl._PQ_FIT_CACHE, "PQ fit should be memoized in-scope"
    assert stats["evicted"] > 0
    assert not cl._PQ_FIT_CACHE  # scope-added: evicted with its blocks
    assert set(cl._FLAT_FIT_CACHE) == warm_keys  # pre-existing: intact
    # the warm cache still serves from its intact blocks
    assert _materialize(cl.q_kmeans_assign(spark, sf_dir)) == n_warm
    release_cached_blocks(spark)


def test_every_module_cache_dict_is_registered():
    """Mechanical registration lint (round-14 advice): every
    module-level dict named *CACHE* in the engine package must be
    wired into the session registry — both cleared by a registered
    cleaner (global release) and enrolled for scoped eviction
    (block_scope). An unregistered future cache would dangle on
    truncated lineage the first time a release runs."""
    import importlib
    import pkgutil

    import parallelutilities_jl_spark as pkg
    from parallelutilities_jl_spark import session as sess

    found = []
    for info in pkgutil.walk_packages(pkg.__path__, pkg.__name__ + "."):
        mod = importlib.import_module(info.name)
        for name, val in vars(mod).items():
            if (
                isinstance(val, dict)
                and "CACHE" in name.upper()
                and mod.__name__.startswith(pkg.__name__)
                and name not in ("_SCOPED_CACHES",)
            ):
                found.append((mod.__name__, name, val))
    assert found, "lint is vacuous: no module caches discovered"
    scoped_ids = {id(c) for c in sess._SCOPED_CACHES}
    unscoped = [f"{m}.{n}" for m, n, d in found if id(d) not in scoped_ids]
    assert not unscoped, f"caches not enrolled for scoped eviction: {unscoped}"

    # cleaner coverage: after all registered cleaners run, every
    # discovered cache must be empty (sentinel proves the clear is real)
    for _m, _n, d in found:
        d["__lint_sentinel__"] = None
    for fn in sess._CACHE_CLEANERS:
        fn()
    uncleared = [f"{m}.{n}" for m, n, d in found if d]
    for _m, _n, d in found:
        d.pop("__lint_sentinel__", None)
    assert not uncleared, f"caches not cleared by any cleaner: {uncleared}"


def test_block_scope_evicts_overwritten_entries(spark):
    """Round-15 ADVICE: an entry OVERWRITTEN under a pre-existing key
    during the scope must be evicted on exit (its replacement's blocks
    are unpersisted; a surviving handle would dangle), while untouched
    pre-existing entries survive. Pinned with a synthetic registered
    cache so the invariant is enforced even though today's
    check-then-return memoizers never overwrite."""
    from parallelutilities_jl_spark import session as sess

    cache: dict = {"keep": object(), "clobber": object()}
    sess._SCOPED_CACHES.append(cache)
    try:
        with sess.block_scope(spark) as stats:
            cache["clobber"] = object()  # overwrite under existing key
            cache["fresh"] = object()  # plain scope-added entry
        assert stats["evicted"] >= 2
        assert "keep" in cache  # untouched pre-existing entry survives
        assert "clobber" not in cache  # overwritten: evicted
        assert "fresh" not in cache  # scope-added: evicted
    finally:
        sess._SCOPED_CACHES.remove(cache)


def test_block_scope_evicts_del_then_recompute(spark):
    """Round-16 review finding: an entry DELETED and RECOMPUTED inside
    the scope must be evicted on exit even if CPython hands the
    replacement the freed object's address — the snapshot must hold
    value references and compare identity, not id() integers."""
    from parallelutilities_jl_spark import session as sess

    cache: dict = {"k": object()}
    sess._SCOPED_CACHES.append(cache)
    try:
        with sess.block_scope(spark) as stats:
            del cache["k"]
            cache["k"] = object()  # may reuse the freed address
        assert stats["evicted"] >= 1
        assert "k" not in cache
    finally:
        sess._SCOPED_CACHES.remove(cache)
