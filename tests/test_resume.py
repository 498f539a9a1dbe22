"""Resumability: a build interrupted mid-postings-phase must resume,
skipping completed shard files, and produce byte-identical output to an
uninterrupted build (north_rule checkpoint/lineage; SURVEY.md §7.2 step 4)."""

from __future__ import annotations

import hashlib
from pathlib import Path

from searchengine_ray.build import IndexManifest, build_index, dump_postings
from searchengine_ray.sources import generate_corpus


def _digest(path: Path) -> dict[str, str]:
    return {
        f.name: hashlib.md5(f.read_bytes()).hexdigest()
        for f in sorted(path.glob("*.parquet"))
    }


def test_interrupted_postings_phase_resumes(ray_session, tmp_path):
    corpus = generate_corpus(tmp_path / "web", n_docs=500)
    ref = tmp_path / "ref"
    build_index(str(corpus), ref, html_column="html", doc_id_mode="url_index", num_shards=8)
    ref_digest = _digest(ref / "postings")

    idx = tmp_path / "idx"
    build_index(str(corpus), idx, html_column="html", doc_id_mode="url_index", num_shards=8)
    # simulate a crash mid-postings: phase record lost, half the shard
    # files gone (atomic writes mean no partial files can exist)
    m = IndexManifest.load(idx)
    del m.phases["postings"]
    m.save(idx)
    shard_files = sorted((idx / "postings").glob("*.parquet"))
    kept = {}
    for i, f in enumerate(shard_files):
        if i % 2 == 0:
            f.unlink()
        else:
            kept[f.name] = f.stat().st_mtime_ns

    m2 = build_index(str(corpus), idx, html_column="html", doc_id_mode="url_index", num_shards=8)
    assert m2.phase_complete("postings")
    # surviving shards untouched (skipped via per-shard checkpoint)
    for name, mtime in kept.items():
        assert (idx / "postings" / name).stat().st_mtime_ns == mtime, name
    # rebuilt shards byte-identical to the uninterrupted build
    assert _digest(idx / "postings") == ref_digest
    # lineage records mark the skipped shards
    skipped = [
        s for s, rec in m2.phases["postings"]["shards"].items() if rec.get("skipped")
    ]
    assert len(skipped) == len(kept)
    assert dump_postings(idx) == dump_postings(ref)


def test_analyze_phase_checkpoint_skips_rerun(ray_session, tmp_path):
    corpus = generate_corpus(tmp_path / "web", n_docs=200)
    idx = tmp_path / "idx"
    build_index(str(corpus), idx, html_column="html", doc_id_mode="url_index", num_shards=4)
    analyzed_mtimes = {
        f.name: f.stat().st_mtime_ns for f in (idx / "analyzed").glob("*.parquet")
    }
    build_index(str(corpus), idx, html_column="html", doc_id_mode="url_index", num_shards=4)
    after = {f.name: f.stat().st_mtime_ns for f in (idx / "analyzed").glob("*.parquet")}
    assert analyzed_mtimes == after
