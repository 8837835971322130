"""Unit tests for the pure parsing primitives (reference test strategy:
invariant-based, synthesized inputs — SURVEY.md §5)."""

from agentic_doc_ray.textparse import (
    CORRUPT_MARKER,
    KIND_ERROR,
    KIND_FIGURE,
    KIND_MARGINALIA,
    KIND_TABLE,
    KIND_TEXT,
    KIND_TITLE,
    bbox_for,
    classify_block,
    parse_page,
    segment_blocks,
    strip_html,
)


class TestStripHtml:
    def test_keeps_main_content(self):
        html = "<html><body><p>this is a long enough paragraph of real content</p></body></html>"
        assert strip_html(html) == "this is a long enough paragraph of real content"

    def test_drops_nav_footer_header_aside_script_style(self):
        html = (
            "<nav><a href='#'>home</a></nav>"
            "<header>site header text that is long</header>"
            "<p>the actual main content paragraph kept here</p>"
            "<aside>sidebar junk that is long enough to keep</aside>"
            "<footer>(c) corp 2026 long footer text here</footer>"
            "<script>var boilerplate = 'not content at all';</script>"
            "<style>.x { color: red; } more rules here</style>"
        )
        assert strip_html(html) == "the actual main content paragraph kept here"

    def test_drops_link_farms_by_link_density(self):
        farm = "<div>" + "".join(f"<a href='/x'>link {i}</a> " for i in range(10)) + "</div>"
        html = farm + "<p>paragraph with plenty of plain visible text</p>"
        assert strip_html(html) == "paragraph with plenty of plain visible text"

    def test_drops_short_blocks(self):
        assert strip_html("<p>too short</p><p>this block is long enough to keep around</p>") == (
            "this block is long enough to keep around"
        )

    def test_multiple_paragraphs_joined_blank_line(self):
        html = "<p>first paragraph with enough characters</p><p>second paragraph with enough characters</p>"
        assert strip_html(html).count("\n\n") == 1

    def test_empty(self):
        assert strip_html("") == ""


class TestClassify:
    def test_title(self):
        assert classify_block("# My Heading")[0] == KIND_TITLE

    def test_table(self):
        assert classify_block("| a | b |\n| c | d |")[0] == KIND_TABLE

    def test_figure_extracts_media_ref(self):
        kind, ref = classify_block("![caption words](media://d/1/2)")
        assert kind == KIND_FIGURE and ref == "media://d/1/2"

    def test_marginalia_page_number(self):
        assert classify_block("Page 3 of 10")[0] == KIND_MARGINALIA
        assert classify_block("7")[0] == KIND_MARGINALIA

    def test_marginalia_allcaps_header(self):
        assert classify_block("ACME QUARTERLY REPORT")[0] == KIND_MARGINALIA

    def test_text_default(self):
        assert classify_block("plain prose sentence with lowercase words")[0] == KIND_TEXT

    def test_segment_blocks(self):
        assert segment_blocks("a\n\nb\n\n\n\nc") == ["a", "b", "c"]
        assert segment_blocks("") == []


class TestBbox:
    def test_bounds_and_orientation(self):
        # integ-test invariants: all in [0,1], r>l, b>t (test_parse_integ.py:375-401)
        for i in range(5):
            l, t, r, b = bbox_for(i, 5, KIND_TEXT)
            assert 0.0 <= l < r <= 1.0
            assert 0.0 <= t < b <= 1.0


class TestParsePage:
    def test_never_throws_on_corrupt(self):
        chunks = parse_page("d", 3, "pdf_page", CORRUPT_MARKER + "junk", "")
        assert len(chunks) == 1
        c = chunks[0]
        assert c.is_error and c.kind == KIND_ERROR and c.text == "" and c.error

    def test_chunk_ids_unique_and_deterministic(self):
        text = "# T\n\npara one words here\n\npara two words here"
        a = parse_page("d", 0, "pdf_page", text, "")
        b = parse_page("d", 0, "pdf_page", text, "")
        assert a == b
        ids = [c.chunk_id for c in a]
        assert len(set(ids)) == len(ids)

    def test_image_span_single_figure(self):
        chunks = parse_page("d", 0, "image", "Figure: a cat", "media://d/0/img")
        assert len(chunks) == 1
        assert chunks[0].kind == KIND_FIGURE
        assert chunks[0].media_ref == "media://d/0/img"

    def test_marginalia_flag_drops_chunks(self):
        text = "body text paragraph here\n\nPage 1 of 2"
        with_m = parse_page("d", 0, "pdf_page", text, "", include_marginalia=True)
        without = parse_page("d", 0, "pdf_page", text, "", include_marginalia=False)
        assert [c.kind for c in with_m] == [KIND_TEXT, KIND_MARGINALIA]
        assert [c.kind for c in without] == [KIND_TEXT]

    def test_html_kind_is_stripped(self):
        chunks = parse_page(
            "d", 0, "html", "<nav><a>x</a></nav><p>long enough paragraph of content</p>", ""
        )
        assert [c.text for c in chunks] == ["long enough paragraph of content"]
