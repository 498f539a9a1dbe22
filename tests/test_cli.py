"""`python -m searchengine_ray` — the `ray job submit` surface.

Each CLI invocation is a fresh driver process owning its own Ray
session (exactly what `ray job submit` does), so this test runs
subprocesses rather than in-process calls; cwd must be the repo root
(Ray workers resolve the package from the driver script directory)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

REPO = "/root/repo"


def _run(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "searchengine_ray", "--num-cpus", "4", *args],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("cli_corpus")
    docs = {
        0: "cat dog toy", 1: "cat dog dog", 2: "toy pig cat",
        3: "dog pig toy house", 4: "summer pizza house is great",
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(docs), pa.int64()),
                "text": pa.array(list(docs.values()), pa.string()),
            }
        ),
        d / "docs.parquet",
    )
    return str(d / "docs.parquet")


def test_build_query_info_roundtrip(corpus, tmp_path):
    idx = str(tmp_path / "idx")
    r = _run("build", corpus, idx, "--doc-id-column", "doc_id",
             "--num-shards", "4", "--block-size", "2")
    assert r.returncode == 0, r.stderr[-2000:]

    def hits_of(out: str) -> list[dict]:
        rows = []
        for line in out.strip().splitlines():
            try:
                v = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(v, dict) and "doc_id" in v:
                rows.append(v)
        return rows

    r = _run("query", idx, "cat dog", "--kind", "bm25", "--topk", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    hits = hits_of(r.stdout)
    assert hits and all("score" in h for h in hits)

    r = _run("query", idx, "pizza house", "--kind", "phrase")
    assert r.returncode == 0, r.stderr[-2000:]
    assert [h["doc_id"] for h in hits_of(r.stdout)] == [4]

    r = _run("info", idx)
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout[r.stdout.index("{"):])  # indented JSON block
    assert info.get("n_docs") == 5
