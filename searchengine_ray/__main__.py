"""CLI entrypoint — the ``ray job submit`` surface (north_rule):

    ray job submit -- python -m searchengine_ray build CORPUS INDEX [opts]
    python -m searchengine_ray query INDEX "free text" [--kind bm25] [--topk 10]
    python -m searchengine_ray increment CORPUS INDEX
    python -m searchengine_ray compact INDEX
    python -m searchengine_ray info INDEX

This is the only module in the package that may own a Ray session (the
driver contract in ``__ray_entry__`` forbids it there); init is guarded
for environments where the job runner already initialised Ray.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs.update(address="local", num_cpus=num_cpus)
        ray.init(**kwargs)
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="searchengine_ray")
    p.add_argument("--num-cpus", type=int, default=None, help="local ray.init CPU count")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from a parquet corpus")
    b.add_argument("corpus")
    b.add_argument("index_dir")
    b.add_argument("--html-column", default=None)
    b.add_argument("--text-column", default="text")
    b.add_argument("--doc-id-column", default=None)
    b.add_argument("--doc-id-mode", default="hash", choices=["hash", "url_index"])
    b.add_argument("--num-shards", type=int, default=64)
    b.add_argument("--block-size", type=int, default=128)
    b.add_argument("--no-positions", action="store_true")
    b.add_argument("--no-docs", action="store_true")
    b.add_argument("--codec", default="delta_varbyte")
    b.add_argument("--analyzer", default="punct_porter")
    b.add_argument("--no-resume", action="store_true")

    q = sub.add_parser("query", help="query an index")
    q.add_argument("index_dir")
    q.add_argument("text")
    q.add_argument("--kind", default="bm25", choices=["bm25", "tfidf", "and", "or", "phrase", "keyword"])
    q.add_argument("--topk", type=int, default=10)
    q.add_argument("--fetch", action="store_true", help="include document text")

    inc = sub.add_parser("increment", help="index new docs as a generation")
    inc.add_argument("corpus")
    inc.add_argument("index_dir")
    inc.add_argument("--scratch", default=None)
    inc.add_argument("--doc-id-column", default=None)
    inc.add_argument("--html-column", default=None)

    c = sub.add_parser("compact", help="merge generations, drop tombstones")
    c.add_argument("index_dir")

    d = sub.add_parser("delete", help="tombstone docs matching a keyword")
    d.add_argument("index_dir")
    d.add_argument("keyword")

    i = sub.add_parser("info", help="print the index manifest")
    i.add_argument("index_dir")

    args = p.parse_args(argv)

    if args.cmd == "info":
        from .build.manifest import IndexManifest

        m = IndexManifest.load(args.index_dir)
        info = {k: v for k, v in vars(m).items() if k != "phases"}
        info["phases"] = {k: {kk: vv for kk, vv in ph.items() if kk != "shards"}
                          for k, ph in m.phases.items()}
        print(json.dumps(info, indent=1, default=str))
        return 0

    ray = _ray_session(args.num_cpus)
    try:
        if args.cmd == "build":
            from .build import build_index

            m = build_index(
                args.corpus,
                args.index_dir,
                analyzer_mode=args.analyzer,
                positional=not args.no_positions,
                num_shards=args.num_shards,
                block_size=args.block_size,
                text_column=args.text_column,
                html_column=args.html_column,
                doc_id_column=args.doc_id_column,
                doc_id_mode=args.doc_id_mode,
                store_docs=not args.no_docs,
                codec=args.codec,
                resume=not args.no_resume,
            )
            print(json.dumps({"n_docs": m.n_docs, "avgdl": round(m.avgdl, 2),
                              "shards": m.num_shards, "salted": len(m.salted_terms)}))
        elif args.cmd == "query":
            from .query import SearchEngine

            eng = SearchEngine(args.index_dir)
            if args.kind in ("bm25", "tfidf"):
                res = (
                    eng.search_bm25(args.text, topk=args.topk)
                    if args.kind == "bm25"
                    else eng.search_tfidf(args.text.split(), args.topk)
                )
            else:
                fn = {
                    "and": eng.search_and, "or": eng.search_or,
                    "keyword": lambda ts: eng.search_keyword(" ".join(ts)),
                }.get(args.kind)
                ids = eng.search_phrase(args.text) if args.kind == "phrase" else fn(args.text.split())
                res = [(int(x), 1.0) for x in ids[: args.topk]]
            texts = eng.fetch_docs([d for d, _ in res]) if args.fetch else {}
            for rank, (doc, score) in enumerate(res):
                row = {"rank": rank, "doc_id": doc, "score": round(score, 6)}
                if args.fetch:
                    row["text"] = texts.get(doc, "")[:200]
                print(json.dumps(row))
        elif args.cmd == "increment":
            import tempfile

            from .build.merge import build_increment

            scratch = args.scratch or tempfile.mkdtemp(prefix="se_delta_")
            m = build_increment(
                args.corpus, args.index_dir, scratch,
                doc_id_column=args.doc_id_column, html_column=args.html_column,
            )
            print(json.dumps({"generations": m.generations, "n_docs": m.n_docs}))
        elif args.cmd == "compact":
            from .build.merge import compact

            m = compact(args.index_dir)
            print(json.dumps({"generations": m.generations, "n_docs": m.n_docs}))
        elif args.cmd == "delete":
            from .query import SearchEngine

            eng = SearchEngine(args.index_dir)
            n = eng.delete_by_keyword(args.keyword)
            print(json.dumps({"tombstoned": n}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
