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
