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

    # round-4 window: the first 50 are the never-driver-verified
    # mission entries (search/ranking/dedup/ANN/training/multimodal)
    assert names[0] == "boolean_query"
    assert names[49] == "multimodal_gif"
    window = set(names[:50])
    for must in (
        "snippets", "rrf_hybrid", "permuterm", "dfr_pl2", "bm25f_fielded",
        "containment_dedup", "winnowing_fingerprints", "pq_topk",
        "graph_ann", "bpe_train", "doc_packing", "data_mixture",
        "multimodal_png",
    ):
        assert must in window, must

    # the 82 r1-r3 hash-green entries close the rotation
    assert names[72] == "and_search"
    assert names[-1] == "wordbreak"

    # shape: every value is (callable, sql-or-None); only wordbreak
    # lacks an oracle
    no_sql = [n for n, (fn, sql) in reg.items() if sql is None]
    assert no_sql == ["wordbreak"]
    for n, (fn, sql) in reg.items():
        assert callable(fn), n
        assert sql is None or isinstance(sql, str), n


def test_driver_contract_surface():
    import __ray_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    assert len(q) == 154
    assert set(o) == set(q) - {"wordbreak"}
