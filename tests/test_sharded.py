"""Scatter-gather sharded serving == local serving, with bounded shards.

The coordinator (ShardedSearcher) must return bit-identical results to
the single-process Searcher on every query family (it inherits the
scoring paths and replaces only the lookup layer), and each shard actor
must have loaded ONLY its own term partition — the per-actor memory
bound that makes the shape multi-node-viable.
"""

import numpy as np
import pytest

from search_ingest_ray.query.searcher import Searcher
from search_ingest_ray.query.sharded import ShardedSearcher


@pytest.fixture(scope="module")
def pair(ray_session, sf_dir):
    from search_ingest_ray.pipelines.flagship import documents_index
    root = documents_index(sf_dir, analyzer="simple",
                           store_fields=("lang", "text"),
                           with_positions=True)
    return Searcher(root), ShardedSearcher(root)


def test_sharded_search_terms_identical(pair):
    local, sharded = pair
    for terms in (["merge", "scan"], ["merge"], ["zzznosuch"]):
        d1, s1 = local.search_terms(terms, k=25)
        d2, s2 = sharded.search_terms(terms, k=25)
        assert d1.tolist() == d2.tolist()
        assert s1.tolist() == s2.tolist()


def test_sharded_filtered_and_bool_identical(pair):
    local, sharded = pair
    d1, s1 = local.search_terms(["merge", "scan"], k=10,
                                filters={"lang": "de"})
    d2, s2 = sharded.search_terms(["merge", "scan"], k=10,
                                  filters={"lang": "de"})
    assert d1.tolist() == d2.tolist() and s1.tolist() == s2.tolist()
    b1 = local.search_bool(["merge", "scan"], should=["window"],
                           must_not=["spark"], k=10)
    b2 = sharded.search_bool(["merge", "scan"], should=["window"],
                             must_not=["spark"], k=10)
    assert b1[0].tolist() == b2[0].tolist()
    assert b1[1].tolist() == b2[1].tolist()


def test_sharded_phrase_identical(pair):
    local, sharded = pair
    d1, s1 = local.match_phrase(["scan", "merge"], k=10**9)
    d2, s2 = sharded.match_phrase(["scan", "merge"], k=10**9)
    assert np.sort(d1).tolist() == np.sort(d2).tolist()


def test_sharded_expansions_identical(pair):
    local, sharded = pair
    assert sharded.suggest("s", k=10) == local.suggest("s", k=10)
    assert sharded.fuzzy_terms("merg", max_dist=1, k=10) == \
        local.fuzzy_terms("merg", max_dist=1, k=10)
    assert sharded.wildcard_terms("m*e", k=10) == \
        local.wildcard_terms("m*e", k=10)


def test_shards_load_only_their_partition(pair):
    _, sharded = pair
    # exercise lookups + expansions first (done by earlier tests when run
    # as a module; re-touch here so the test stands alone)
    sharded.search_terms(["merge", "scan"], k=5)
    sharded.suggest("s", k=5)
    loaded = sharded.shard_loaded_partitions()
    assert set(loaded) == set(range(sharded.P))
    for tp, parts in loaded.items():
        assert parts == [tp], f"shard {tp} loaded {parts}"


def test_sharded_warm_and_dfs_keep_coordinator_dictionary_free(pair):
    """warm() and df lookups must go to the shards: the coordinator
    process loading every partition's dictionary locally is exactly the
    aggregate-memory footprint the sharded shape exists to avoid."""
    local, sharded = pair
    assert sharded.warm() > 0  # shards report ready
    terms = ["merge", "scan", "window", "zzznosuch"]
    assert sharded._dfs_of(terms) == local._dfs_of(terms)
    assert sharded.df_of("merge") == local.df_of("merge") > 0
    # the coordinator never loaded a partition dictionary of its own
    assert all(ent is None for ent in sharded._parts.values())


def test_sharded_df_aggregations_identical(pair):
    """term_vectors / significant_terms route df through the shard-side
    dictionary lookup and must match local serving exactly."""
    local, sharded = pair
    d, _ = local.search_terms(["merge"], k=1)
    doc = int(d[0])
    assert sharded.term_vectors(doc).equals(local.term_vectors(doc))
    assert sharded.significant_terms(["merge", "scan"], k=10).equals(
        local.significant_terms(["merge", "scan"], k=10))


def test_shard_actor_death_self_heals(pair):
    """Kill a shard actor out from under the coordinator (the cluster-scale
    node-loss case): max_restarts rebuilds it from the immutable index and
    max_task_retries re-issues the in-flight call — queries keep returning
    identical results with no caller-side handling."""
    import ray
    local, sharded = pair
    d0, s0 = local.search_terms(["merge", "scan"], k=25)
    # clear the coordinator's term cache so the query re-touches shards
    sharded._term_cache.clear()
    for actor in sharded._shards.values():
        ray.kill(actor, no_restart=False)
    d1, s1 = sharded.search_terms(["merge", "scan"], k=25)
    assert d0.tolist() == d1.tolist()
    assert s0.tolist() == s1.tolist()
    # expansions (shard-side dictionary scans) also survive the restart
    assert local.suggest("me", 5) == sharded.suggest("me", 5)


def test_shard_actor_death_mid_serving_recovers_identically(pair):
    """Chaos: a shard actor is killed (restart allowed — the moral
    equivalent of a lost serving node); `max_restarts`/`max_task_retries`
    must transparently restart it, the shard reloads ONLY its partition
    lazily, and post-kill results are bit-identical to pre-kill."""
    import ray
    local, sharded = pair
    terms = ["merge", "scan"]
    d0, s0 = local.search_terms(terms, k=25)
    # warm, then kill one populated shard actor with restart enabled
    d1, s1 = sharded.search_terms(terms, k=25)
    np.testing.assert_array_equal(d0, d1)
    victim_tp = next(tp for tp, parts in
                     sharded.shard_loaded_partitions().items() if parts)
    ray.kill(sharded._shards[victim_tp], no_restart=False)
    d2, s2 = sharded.search_terms(terms, k=25)
    np.testing.assert_array_equal(d0, d2)
    np.testing.assert_array_equal(s0, s2)
    # the restarted actor holds only its own partition again
    assert sharded.shard_loaded_partitions()[victim_tp] == [victim_tp]


def test_sharded_span_ops_identical(pair):
    """span_not / span_within inherit the scatter-gather lookup layer —
    sharded results must be bit-identical to local."""
    local, sharded = pair
    for pre, post in ((0, 0), (2, 2), (5, 1)):
        np.testing.assert_array_equal(
            local.span_not("merge", "scan", pre=pre, post=post),
            sharded.span_not("merge", "scan", pre=pre, post=post))
    for slop in (0, 2, 6):
        np.testing.assert_array_equal(
            local.span_within("window", "merge", "scan", slop=slop),
            sharded.span_within("window", "merge", "scan", slop=slop))
