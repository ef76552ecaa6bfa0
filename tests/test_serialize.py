"""HTML serialization of pristine parses (root.zig:87-163 semantics)."""

from html_parser_spark.kernel.htmlparse import parse
from html_parser_spark.kernel.matcher import query_one
from html_parser_spark.kernel.selector import compile_selector
from html_parser_spark.kernel.serialize import write_html, write_html_self


def q1(dom, sel):
    return query_one(dom, compile_selector(sel))


def test_roundtrip_simple():
    # root.zig:87-104
    dom = parse("<div id='a'><span>v</span></div>")
    assert write_html(dom, q1(dom, "div")) == b"<div id='a'><span>v</span></div>"


def test_void_tags_unclosed():
    dom = parse("<img id='i' class='x'>")
    assert write_html(dom, q1(dom, "img")) == b"<img id='i' class='x'>"


def test_raw_attrs_verbatim():
    dom = parse("<div data-q='1>2' naked=ab bool></div>")
    assert write_html(dom, q1(dom, "div")) == b"<div data-q='1>2' naked=ab bool></div>"


def test_self_excludes_children():
    # root.zig:219-229
    dom = parse("<div id='a'><span>v</span></div>")
    assert write_html_self(dom, q1(dom, "div")) == b"<div id='a'>"


def test_document_serialization_skips_comments_doctype():
    dom = parse("<!doctype html><!-- c --><p>a</p><?pi?><p>b</p>")
    assert write_html(dom, 0) == b"<p>a</p><p>b</p>"


def test_raw_text_content_verbatim():
    dom = parse("<script>var x = 1 < 2;</script>")
    assert write_html(dom, q1(dom, "script")) == b"<script>var x = 1 < 2;</script>"


def test_first8_lowercase_name_in_output():
    dom = parse("<DIV CLASS='x'>t</DIV>")
    assert write_html(dom, q1(dom, "div")) == b"<div CLASS='x'>t</div>"


# root.zig:106-145 — the post-query ("materialized") serialization form
def test_materialized_attrs_requote_and_escape():
    dom = parse(b"<img id='i' class='x' data-q='1>2'/>")
    from html_parser_spark.kernel.matcher import query_one
    from html_parser_spark.kernel.selector import compile_selector

    img = query_one(dom, compile_selector("img#i"))
    assert write_html(dom, img) == b"<img id='i' class='x' data-q='1>2'>"
    assert write_html(dom, img, materialized=True) == \
        b'<img id="i" class="x" data-q="1>2">'


def test_materialized_text_decodes_entity_subset():
    dom = parse(b"<p>&amp; &lt;</p>")
    assert write_html(dom, 1) == b"<p>&amp; &lt;</p>"
    assert write_html(dom, 1, materialized=True) == b"<p>& <</p>"


def test_materialized_escapes_decoded_specials_in_attrs():
    # decoded value contains & and " -> re-escaped on output
    dom = parse(b'<a t="a&amp;b&quot;c" flag>x</a>')
    assert write_html(dom, 1, materialized=True) == \
        b'<a t="a&amp;b&quot;c" flag>x</a>'


def test_write_html_self_excludes_children():
    dom = parse(b"<div id='a'><span>v</span></div>")
    from html_parser_spark.kernel.serialize import write_html_self

    assert write_html_self(dom, 1) == b"<div id='a'>"


def test_serialize_pathological_depth_iterative():
    """The serializer walks the preorder interval iteratively — a
    100k-deep nesting (a poison-pill page at web scale) must
    serialize, not die in RecursionError like a per-node recursion
    would at ~1000 frames."""
    from html_parser_spark.kernel.htmlparse import parse
    from html_parser_spark.kernel.serialize import write_html

    depth = 100_000
    deep = ("<div>" * depth + "x" + "</div>" * depth).encode()
    out = write_html(parse(deep), 1)
    assert out == b"<div>" * depth + b"x" + b"</div>" * depth
