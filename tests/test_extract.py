"""HTML extraction + synthetic corpus tests: the byte-identity invariant
``extract_text(html) == text`` per row (BASELINE.json input_hint)."""

from __future__ import annotations

import pyarrow.parquet as pq

from searchengine_ray.extract import extract_batch, extract_text
from searchengine_ray.sources import generate_chunk, generate_corpus, render_html


class TestExtractSpec:
    def test_tags_to_space_and_collapse(self):
        assert extract_text(b"<p>hello</p><p>world</p>") == "hello world"

    def test_comment_removed(self):
        assert extract_text(b"a<!-- no way -->b") == "ab"

    def test_script_style_removed(self):
        html = b"x<script>var a = '<p>zap</p>';</script>y<style>p{color:red}</style>z"
        assert extract_text(html) == "x y z"

    def test_script_case_insensitive_with_attrs(self):
        assert extract_text(b'a<SCRIPT type="x">1<2</SCRIPT>b') == "a b"

    def test_entities_decoded(self):
        assert extract_text(b"r&amp;d &lt;tag&gt; &quot;q&quot; &#39;s&#39;") == "r&d <tag> \"q\" 's'"

    def test_whitespace_collapsed_stripped(self):
        assert extract_text(b"  a\t\tb\r\nc  ") == "a b c"

    def test_invalid_utf8_replaced(self):
        assert extract_text(b"ok \xff\xfe end") == "ok �� end"


class TestCorpusInvariant:
    def test_render_roundtrip_goldens(self):
        cases = [
            "plain words here",
            "r&d a<b x>y say\"hi\"",
            "tokenized, text; with? punctuation! everywhere.",
            "東京 の 天気 は 晴れ です",
        ]
        for i, text in enumerate(cases):
            html = render_html(text, f"https://e/{i}", i)
            assert extract_text(html) == text, text

    def test_chunk_byte_identity_and_determinism(self):
        t1 = generate_chunk(0, 200, seed=42)
        t2 = generate_chunk(0, 200, seed=42)
        assert t1.equals(t2)
        texts = t1["text"].to_pylist()
        extracted = extract_batch(t1["html"]).to_pylist()
        assert texts == extracted
        assert t1.schema.names == ["url", "warc_ts", "html", "text", "lang"]
        langs = set(t1["lang"].to_pylist())
        assert "en" in langs

    def test_generate_corpus_resumable(self, tmp_path):
        out = generate_corpus(tmp_path / "c", n_docs=2500, chunks_per_file=2)
        files = sorted(p.name for p in out.glob("*.parquet"))
        assert files == ["webpages-00000.parquet", "webpages-00001.parquet"]
        total = sum(pq.read_metadata(out / f).num_rows for f in files)
        assert total == 2500
        # re-run is a no-op (files skipped) and content is stable
        before = (out / files[0]).stat().st_mtime_ns
        generate_corpus(tmp_path / "c", n_docs=2500, chunks_per_file=2)
        assert (out / files[0]).stat().st_mtime_ns == before


class TestExtractLinks:
    def test_basic_pairs(self):
        from searchengine_ray.extract.html import extract_links

        html = b'<p>x</p><a href="doc://5">hello world</a><a href="http://e.com/a">ext</a>'
        assert extract_links(html) == [("doc://5", "hello world"), ("http://e.com/a", "ext")]

    def test_nested_markup_and_entities(self):
        from searchengine_ray.extract.html import extract_links

        html = '<a href="doc://1"><b>bold</b> &amp; <i>ital</i></a>'
        assert extract_links(html) == [("doc://1", "bold & ital")]

    def test_commented_out_link_ignored(self):
        from searchengine_ray.extract.html import extract_links

        html = '<!-- <a href="doc://9">ghost</a> --><a href="doc://2">real</a>'
        assert extract_links(html) == [("doc://2", "real")]

    def test_attributes_and_case(self):
        from searchengine_ray.extract.html import extract_links

        html = '<A CLASS="x" HREF="doc://3" target="_blank">Click</A>'
        assert extract_links(html) == [("doc://3", "Click")]

    def test_anchor_aggregation(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from searchengine_ray.functions.anchors import anchor_term_counts

        pages = [
            b'<a href="doc://1">cat dog</a><a href="doc://2">cat</a>',
            b'<a href="doc://1">cat</a><a href="mailto:x">skip me</a>',
            b'<a href="doc://notanint">bad</a>',
        ]
        ds = rd.from_arrow(pa.table({"html": pa.array(pages, pa.binary())}))
        out = anchor_term_counts(ds)
        got = {(r.doc_id, r.term): r.n for r in out.itertuples(index=False)}
        assert got == {(1, "cat"): 2, (1, "dog"): 1, (2, "cat"): 1}
