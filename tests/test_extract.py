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


class TestExtractAdversarial:
    """The spec is TOTAL: malformed markup degrades to text
    deterministically — never an exception, never a hang. These pin the
    byte-exact outcome of each degradation so the invariant
    ``extract(html) == text`` can never silently drift on messy crawl
    input (round-3 verdict task 8)."""

    def test_unclosed_script_is_stripped_as_tag_content_kept(self):
        # no </script>: the block regex can't fire; the open tag falls
        # through to generic tag removal and the content stays as text
        assert extract_text(b"a<script>var x = 1; b") == "a var x = 1; b"

    def test_nested_script_closes_at_first_close(self):
        html = b"x<script>a<script>b</script>tail</script>y"
        # non-greedy: block ends at the FIRST </script>; the orphan
        # close tag is then stripped as a generic tag
        assert extract_text(html) == "x tail y"

    def test_unclosed_tag_at_eof_stays_as_text(self):
        assert extract_text(b"ok <p class=") == "ok <p class="

    def test_gt_inside_attribute_splits_tag(self):
        # the spec tag regex ends at the first '>' — remainder is text
        assert extract_text(b'<img alt="a>b">c') == 'b">c'

    def test_unclosed_comment_stays_as_text(self):
        assert extract_text(b"a <!-- lost b") == "a <!-- lost b"

    def test_comment_hiding_script_removed_first(self):
        # comments are removed BEFORE scripts: a commented-out script
        # never contributes text
        assert extract_text(b"a<!--<script>x</script>-->b") == "ab"

    def test_cdata_is_one_tag(self):
        assert extract_text(b"a<![CDATA[ x<y ]]>b") == "a b"

    def test_charset_declaration_does_not_switch_decoding(self):
        # spec always decodes UTF-8 (errors=replace) — a latin-1 byte
        # becomes U+FFFD even when a meta tag claims iso-8859-1
        html = b'<meta charset="iso-8859-1">caf\xe9'
        assert extract_text(html) == "caf�"

    def test_close_script_with_space_before_gt(self):
        assert extract_text(b"a<script>x</script >b") == "a b"

    def test_astral_and_invalid_numeric_entities(self):
        assert extract_text(b"a &#x1F600; b") == "a \U0001F600 b"
        # surrogate code point is replaced, not crashed on
        assert extract_text(b"s &#xD800; e") == "s � e"

    def test_bare_ampersand_unchanged_but_html5_prefix_rule_applies(self):
        assert extract_text(b"a & b c") == "a & b c"
        # html.unescape applies the HTML5 without-semicolon rule: '&not'
        # inside '&notanentity;' decodes to U+00AC — spec-pinned
        assert extract_text(b"x &notanentity; y") == "x ¬anentity; y"

    def test_null_byte_preserved(self):
        assert extract_text(b"a\x00b") == "a\x00b"

    def test_vertical_tab_and_formfeed_collapse(self):
        assert extract_text(b"a\x0b\x0c b") == "a b"

    def test_style_with_braces_and_angle(self):
        html = b"x<style>p::before{content:'<'}</style>y"
        assert extract_text(html) == "x y"

    def test_empty_and_tag_only_documents(self):
        assert extract_text(b"") == ""
        assert extract_text(b"<p><br/><div></div>") == ""

    def test_batch_path_matches_row_path_on_adversarial(self):
        import pyarrow as pa

        cases = [
            b"a<script>var x = 1; b",
            b'<img alt="a>b">c',
            b"a <!-- lost b",
            b'<meta charset="iso-8859-1">caf\xe9',
            None,
            b"",
        ]
        col = pa.array(cases, pa.binary())
        got = extract_batch(col).to_pylist()
        want = [extract_text(c) if c is not None else None for c in cases]
        assert got == want


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
