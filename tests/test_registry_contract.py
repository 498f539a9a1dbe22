"""Registry contract: the driver verifies the FIRST 50 entries per
round, so the rotation order is load-bearing — pin it, the entry
count, and the callable/oracle shape so an accidental edit cannot
silently shrink coverage or reorder the verification window."""

from __future__ import annotations


def test_registry_shape_and_window():
    from searchengine_ray.pipelines.registry import registry

    reg = registry()
    names = list(reg)
    assert len(names) == 154
    assert len(set(names)) == 154

    # round-5 window: positions 1-23 are the entries that had never
    # earned a driver hash row (r4 queue + wordbreak with its new
    # rejoin-identity oracle); 24-27 the engine-path entries changed
    # in r4; 28-50 re-verify the oldest (r2) rows.
    assert names[0] == "unigram_logppl"
    assert names[21] == "jsonl_roundtrip"
    assert names[22] == "wordbreak"
    assert names[23:27] == [
        "bm25_all", "phrase_search", "increment_compact", "dedup_minhash",
    ]
    window = set(names[:50])
    for must in (
        "readability", "retention", "tpch_q5", "tpch_q10", "tpch_q18",
        "anti_join", "custdist", "winsorize", "snapshot_diff",
        "heavy_hitters", "hll_sketch", "hits_scores", "k_core",
        "link_prediction", "sessionize", "range_join", "fetch_topk",
        "delete_search", "embedding_neardup", "multimodal_wav",
    ):
        assert must in window, must

    # shape: every value is (callable, sql) — as of round 5 EVERY
    # entry has an oracle (wordbreak's verifies the DP's
    # character-preservation invariant)
    for n, (fn, sql) in reg.items():
        assert callable(fn), n
        assert isinstance(sql, str) and sql.strip(), n


def test_driver_contract_surface():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert len(q) == 154
    assert set(o) == set(q)
