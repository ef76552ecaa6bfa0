"""Golden selector matrix (document.zig:892-905, 977-1081) + the
reference's qwery/nwmatcher conformance cases (bench/conformance_cases)
run through full-document, node-scoped and cached paths."""

import json
import os

import pytest

from html_parser_spark.kernel.attrs import get_attr
from html_parser_spark.kernel.htmlparse import parse
from html_parser_spark.kernel.matcher import matches_at, query_all, query_one
from html_parser_spark.kernel.selector import SelectorError, compile_selector

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")

SELECTOR_FIXTURE_HTML = (
    "<html><body><div id='root'>"
    "<ul id='list'>"
    "<li id='li1' class='item a' data-k='v' data-prefix='prelude' data-suffix='trail-end'"
    " data-sub='in-middle' data-words='alpha beta gamma' lang='en-US'>"
    "<span id='name1' class='name'>one</span></li>"
    "<li id='li2' class='item b' data-k='v2' data-prefix='presto' data-suffix='mid-end'"
    " data-sub='middle' data-words='beta delta' lang='en'>"
    "<span id='name2' class='name'>two</span></li>"
    "<li id='li3' class='item c skip' data-k='x' data-prefix='nop' data-suffix='tail'"
    " data-sub='zzz' data-words='omega' lang='fr'>"
    "<span id='name3' class='name'>three</span></li>"
    "</ul>"
    "<div id='sibs'>"
    "<a id='a1' class='link'></a>"
    "<a id='a2' class='link hot'></a>"
    "<span id='after_a2' class='marker'></span>"
    "<a id='a3' class='link'></a>"
    "</div>"
    "</div></body></html>"
)

GOLDEN = [
    ("li", ["li1", "li2", "li3"]),
    ("#li2", ["li2"]),
    (".item", ["li1", "li2", "li3"]),
    ("li, .item", ["li1", "li2", "li3"]),
    ("[data-k]", ["li1", "li2", "li3"]),
    ("[data-k=v]", ["li1"]),
    ("[data-prefix^=pre]", ["li1", "li2"]),
    ("[data-suffix$=end]", ["li1", "li2"]),
    ("[data-sub*=middle]", ["li1", "li2"]),
    ("[data-words~=beta]", ["li1", "li2"]),
    ("[lang|=en]", ["li1", "li2"]),
    ("ul > li", ["li1", "li2", "li3"]),
    ("ul li > span.name", ["name1", "name2", "name3"]),
    ("li + li", ["li2", "li3"]),
    ("li ~ li", ["li2", "li3"]),
    ("a.link + span.marker", ["after_a2"]),
    ("a.hot ~ a.link", ["a3"]),
    ("li:first-child", ["li1"]),
    ("li:last-child", ["li3"]),
    ("li:nth-child(2)", ["li2"]),
    ("li:nth-child(2n+1)", ["li1", "li3"]),
    ("li:not(.skip)", ["li1", "li2"]),
    ("li:not([data-k=x])", ["li1", "li2"]),
    ("li#li1, li#li3", ["li1", "li3"]),
    (".does-not-exist", []),
]


@pytest.fixture(scope="module")
def fixture_dom():
    return parse(SELECTOR_FIXTURE_HTML)


def ids_of(dom, indexes):
    return [get_attr(dom, i, "id").decode() for i in indexes]


@pytest.mark.parametrize("sel,expected", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden_matrix(fixture_dom, sel, expected):
    got = ids_of(fixture_dom, query_all(fixture_dom, compile_selector(sel)))
    assert got == expected


@pytest.mark.parametrize("sel,expected", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_query_one_is_first_preorder_match(fixture_dom, sel, expected):
    idx = query_one(fixture_dom, compile_selector(sel))
    if expected:
        assert get_attr(fixture_dom, idx, "id").decode() == expected[0]
    else:
        assert idx is None


def test_node_scoped_queries(fixture_dom):
    # document.zig:1055-1081
    dom = fixture_dom
    lst = query_one(dom, compile_selector("#list"))
    assert ids_of(dom, query_all(dom, compile_selector("li"), lst)) == ["li1", "li2", "li3"]
    assert ids_of(dom, query_all(dom, compile_selector("span.name"), lst)) == ["name1", "name2", "name3"]
    assert ids_of(dom, query_all(dom, compile_selector("li:not(.skip)"), lst)) == ["li1", "li2"]

    sibs = query_one(dom, compile_selector("#sibs"))
    assert ids_of(dom, query_all(dom, compile_selector("a.link"), sibs)) == ["a1", "a2", "a3"]
    assert ids_of(dom, query_all(dom, compile_selector("a + span.marker"), sibs)) == ["after_a2"]
    assert query_all(dom, compile_selector("li"), sibs) == []


def test_scoped_descendant_is_complete_subtree_only(fixture_dom):
    dom = fixture_dom
    root = query_one(dom, compile_selector("#root"))
    # descendant combinator can climb to ancestors OF the scope? No —
    # anchored inside: 'div li' within #root must still match (ul is
    # inside), but matches outside #root's subtree are excluded.
    assert len(query_all(dom, compile_selector("ul li"), root)) == 3


def test_attr_heavy_no_match(fixture_dom):
    # document.zig:1318-1354 cached-selector equivalents
    for sel in ("a[href^=https][class*=button]:not(.missing)",
                "a[href^=https][class*=nav]:not(.missing)"):
        assert query_all(fixture_dom, compile_selector(sel)) == []


def test_multiple_class_predicates():
    # document.zig:1511-1522
    dom = parse("<div id='x' class='alpha beta gamma'></div><div id='y' class='alpha beta'></div>")
    assert ids_of(dom, query_all(dom, compile_selector("div.alpha.beta.gamma"))) == ["x"]
    assert query_all(dom, compile_selector("div.alpha.beta.delta")) == []


def test_class_whitespace_separators():
    # document.zig:1524-1539
    dom = parse("<div id='t' class='a\tb\nc\rd\x0ce'></div>")
    for c in "abcde":
        assert query_one(dom, compile_selector(f"#t.{c}")) is not None
    assert query_one(dom, compile_selector("#t[class~=d]")) is not None
    assert query_one(dom, compile_selector("#t[class~=e]")) is not None


def test_duplicate_ids_scoped():
    # document.zig:1541-1555
    dom = parse(
        "<div id='outside'><span id='dup' class='x'></span></div>"
        "<div id='scope'><span id='dup' class='y'></span></div>"
    )
    scope = query_one(dom, compile_selector("#scope"))
    found = query_one(dom, compile_selector("#dup.y"), scope)
    assert found is not None
    assert get_attr(dom, dom.parent[found], "id") == b"scope"


def test_nth_child_counts():
    # document.zig:1567-1606
    dom = parse("<div id='pseudos'><div></div><div></div><div></div><div></div><a></a><div></div><div></div></div>")
    counts = {
        "#pseudos :nth-child(odd)": 4,
        "#pseudos :nth-child(3n+1)": 3,
        "#pseudos :nth-child(+3n-2)": 3,
        "#pseudos :nth-child(-n+6)": 6,
        "#pseudos :nth-child(-n+5)": 5,
        "#pseudos div:first-child": 1,
        "#pseudos div:last-child": 1,
        "#pseudos div:nth-child(odd)": 3,
        "#pseudos div:nth-child(even)": 3,
    }
    for sel, n in counts.items():
        assert len(query_all(dom, compile_selector(sel))) == n, sel


def test_nth_child_excludes_topmost_elements():
    # nth-child requires a non-document parent (matcher.zig:331-333)
    dom = parse("<div id='a'></div><div id='b'></div>")
    assert query_all(dom, compile_selector("div:nth-child(1)")) == []
    # but first-child works at top level
    assert ids_of(dom, query_all(dom, compile_selector("div:first-child"))) == ["a"]


def test_leading_combinator_scoped():
    # document.zig:1608-1639
    frag = parse(
        "<root><div class='d i v'><p id='oooo'><em></em><em id='emem'></em></p></div>"
        "<p id='sep'><div class='a'><span></span></div></p></root>"
    )
    root = query_one(frag, compile_selector("root"))
    assert len(query_all(frag, compile_selector("> div p em"), root)) == 2
    assert len(query_all(frag, compile_selector("> div #oooo"), root)) == 1

    doc = parse(
        "<root><div id='hsoob'><div class='a b'><div class='d e sib' id='booshTest'>"
        "<p><span id='spanny'></span></p></div><em class='sib'></em>"
        "<span class='h i a sib'></span></div><p class='odd'></p></div>"
        "<div id='lonelyHsoob'></div></root>"
    )
    r2 = query_one(doc, compile_selector("root"))
    assert len(query_all(doc, compile_selector("> #hsoob"), r2)) == 1


def _load_cases(name):
    with open(os.path.join(FIXDIR, name)) as f:
        return json.load(f)


def test_nwmatcher_negative_cases():
    # all 20 expect 0 matches (bench/conformance_cases/nwmatcher_cases.json)
    with open(os.path.join(FIXDIR, "qwery_doc.html"), "rb") as f:
        dom = parse(f.read())
    for case in _load_cases("nwmatcher_cases.json"):
        try:
            sel = compile_selector(case["selector"])
        except SelectorError:
            pytest.fail(f"selector rejected: {case['selector']}")
        assert len(query_all(dom, sel)) == case["expected"], case["selector"]


def test_qwery_contextual_cases():
    # doc/frag contexts scope at <root> (scripts.zig:1732-1738);
    # 'document' context uses an external fixture not shipped → skipped.
    doms = {}
    for ctx, fn in (("doc", "qwery_doc.html"), ("frag", "qwery_frag.html")):
        with open(os.path.join(FIXDIR, fn), "rb") as f:
            doms[ctx] = parse(f.read())
    ran = 0
    for case in _load_cases("qwery_cases.json"):
        ctx = case["context"]
        if ctx == "document":
            continue
        dom = doms[ctx]
        root = query_one(dom, compile_selector("root"))
        got = len(query_all(dom, compile_selector(case["selector"]), root))
        assert got == case["expected"], f"{ctx} {case['selector']}"
        ran += 1
    assert ran == 16  # 6 frag + 10 doc cases ship in the reference JSON


def test_matches_at_consistency(fixture_dom):
    dom = fixture_dom
    sel = compile_selector("ul li > span.name")
    hits = set(query_all(dom, sel))
    for idx in range(1, len(dom.kind)):
        if dom.kind[idx] == 1:
            assert matches_at(dom, sel, idx) == (idx in hits)


def test_id_index_fast_path():
    """#id queryOne uses the lazily-built first-id index
    (document.zig:570-617); duplicate ids fall back to exact scan
    when the indexed hit fails the remaining predicates."""
    html = "".join(
        ["<html><body>"]
        + [f"<div id='n{i}' class='c{i % 7}'><span>t{i}</span></div>" for i in range(500)]
        + ["</body></html>"]
    )
    dom = parse(html)
    assert dom._id_index is None                      # built lazily
    hit = query_one(dom, compile_selector("#n250"))
    assert hit is not None and get_attr(dom, hit, "id") == b"n250"
    assert dom._id_index is not None and len(dom._id_index) == 500
    # index result == scan result for every id (the 2-group form
    # bypasses the fast path, exercising pure scan semantics)
    for probe in ("#n0", "#n499", "div#n33", "#absent", "span#n33"):
        fast = query_one(dom, compile_selector(probe))
        scan = query_one(dom, compile_selector(f"{probe}, never-matches"))
        assert fast == scan, probe
    # duplicate ids: first carrier wins for bare #d; predicate miss on
    # the first falls back to the scan and finds the second
    d2 = parse("<div id='d' class='a'>1</div><div id='d' class='b'>2</div>")
    first = query_one(d2, compile_selector("#d"))
    second = query_one(d2, compile_selector("#d.b"))
    assert get_attr(d2, first, "class") == b"a"
    assert second is not None and get_attr(d2, second, "class") == b"b"
    # scoped query: indexed hit outside the scope root is rejected
    scope = query_one(d2, compile_selector("#d.b"))
    assert query_one(d2, compile_selector("#d"), scope) is None


def test_tag_index_fast_path():
    """tag-anchored queryOne walks the lazily-built per-tag candidate
    list (document.zig:619-670); results equal full-scan semantics
    including scoped queries."""
    html = "".join(
        ["<html><body>"]
        + [f"<section><p class='c{i % 3}'>t{i}</p><span>s{i}</span></section>"
           for i in range(200)]
        + ["</body></html>"]
    )
    dom = parse(html)
    assert dom._tag_index == {}
    hit = query_one(dom, compile_selector("span"))
    assert hit is not None and b"span" in dom._tag_index
    assert len(dom._tag_index[b"span"]) == 200
    for probe in ("p.c2", "section > p", "span", "em", "p:first-child"):
        fast = query_one(dom, compile_selector(probe))
        scan = query_one(dom, compile_selector(f"{probe}, never-matches"))
        assert fast == scan, probe
    # scoped: candidates outside the scope subtree are skipped
    scope = query_one(dom, compile_selector("section, never-matches"))
    inner = query_one(dom, compile_selector("span"), scope)
    scan_inner = query_one(dom, compile_selector("span, never-matches"), scope)
    assert inner == scan_inner and inner is not None
