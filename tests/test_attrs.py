"""Attribute parsing semantics (attr_inline.zig observable behavior)."""

from html_parser_spark.kernel.attrs import attrs_of, get_attr
from html_parser_spark.kernel.htmlparse import parse
from html_parser_spark.kernel.matcher import query_one
from html_parser_spark.kernel.selector import compile_selector


def q1(dom, sel):
    return query_one(dom, compile_selector(sel))


def test_boolean_and_empty_assignment():
    # document.zig:1212-1231: `a=` (with trailing ws) ≡ boolean ≡ ""
    dom = parse("<div id='x' b a=   ></div>")
    x = q1(dom, "#x")
    assert get_attr(dom, x, "a") == b""
    assert get_attr(dom, x, "b") == b""
    assert get_attr(dom, x, "c") is None
    assert q1(dom, "div[a]") is not None
    assert q1(dom, "div[b]") is not None
    assert q1(dom, "div[c]") is None


def test_entity_decode_in_values():
    # document.zig:1233-1261
    dom = parse("<div id='x' q='&amp;z' n=a&amp;b></div>")
    x = q1(dom, "#x")
    assert get_attr(dom, x, "q") == b"&z"
    assert get_attr(dom, x, "n") == b"a&b"
    assert q1(dom, "div[q='&z'][n='a&b']") is not None


def test_many_entities_large_value():
    # document.zig:1286-1316
    html = "<div id='x' a='" + "&amp;" * 320 + "' b='ok'></div>"
    dom = parse(html)
    x = q1(dom, "#x")
    assert get_attr(dom, x, "a") == b"&" * 320
    assert get_attr(dom, x, "b") == b"ok"


def test_fast_path_names_match_generic():
    # document.zig:1479-1494
    dom = parse("<a id='x' class='btn primary' href='https://example.com' data-k='v'></a>")
    a = q1(dom, "a")
    assert get_attr(dom, a, "id") == b"x"
    assert get_attr(dom, a, "class") == b"btn primary"
    assert get_attr(dom, a, "href") == b"https://example.com"
    assert get_attr(dom, a, "data-k") == b"v"
    assert get_attr(dom, a, "missing") is None


def test_name_case_insensitive_value_case_preserved():
    dom = parse("<div ID='x' DaTa-K='MiXeD'></div>")
    d = q1(dom, "div")
    assert get_attr(dom, d, "id") == b"x"
    assert get_attr(dom, d, "DATA-K") == b"MiXeD"


def test_slash_terminates_attr_scan():
    # getAttrValue returns null at '/' — later attrs invisible
    dom = parse("<div id='x' a='1' / b='2'></div>")
    x = q1(dom, "#x")
    assert get_attr(dom, x, "a") == b"1"
    assert get_attr(dom, x, "b") is None


def test_naked_value_stops_at_slash():
    # parseRawValue: '/' ends a naked value (attr_inline.zig:324-327)
    dom = parse("<a id='x' href=http://e.com></a>")
    assert get_attr(dom, q1(dom, "#x"), "href") == b"http:"


def test_space_around_equals_is_two_booleans():
    # delim read immediately after name: `a = b` → a="" and b=""
    dom = parse("<div id='x' a = b></div>")
    x = q1(dom, "#x")
    assert get_attr(dom, x, "a") == b""
    assert get_attr(dom, x, "b") == b""
    assert get_attr(dom, x, "=") is None


def test_first_occurrence_wins():
    dom = parse("<div id='x' k='1' k='2'></div>")
    assert get_attr(dom, q1(dom, "#x"), "k") == b"1"


def test_unterminated_quote_runs_to_span_end():
    dom = parse("<div id='x' a='unterminated>text")
    # quote-aware tag-end scan never finds '>', attrs run to EOF
    x = q1(dom, "div")
    assert get_attr(dom, x, "a") == b"unterminated>text"


def test_quoted_gt_does_not_end_tag():
    dom = parse("<div id='x' data-q='1>2' y=z>inside</div>")
    x = q1(dom, "#x")
    assert get_attr(dom, x, "data-q") == b"1>2"
    assert get_attr(dom, x, "y") == b"z"


def test_attrs_of_returns_all():
    dom = parse("<div a=1 b='2' c d=''></div>")
    d = attrs_of(dom, 1)
    assert d == {b"a": b"1", b"b": b"2", b"c": b"", b"d": b""}
