"""Selector compiler: grammar acceptance/rejection pinned to the
reference's own test sets (runtime.zig:525-653)."""

import pytest

from html_parser_spark.kernel.selector import SelectorError, compile_selector


def test_all_attribute_operators():
    sel = compile_selector("div[a][b=v][c^=x][d$=y][e*=z][f~=m][g|=en]")
    (group,) = sel.groups
    (comp,) = group
    assert [a.op for a in comp.attrs] == [
        "exists", "eq", "prefix", "suffix", "contains", "includes", "dash",
    ]
    assert comp.tag == b"div"


def test_combinator_chain_and_grouping():
    sel = compile_selector("a b > c + d ~ e, #x")
    assert len(sel.groups) == 2
    combs = [c.combinator for c in sel.groups[0]]
    assert combs == ["none", "descendant", "child", "adjacent", "sibling"]
    assert sel.groups[1][0].combinator == "none"
    assert sel.groups[1][0].id == b"x"


def test_leading_combinator_and_pseudo_only_compound():
    sel = compile_selector("> #hsoob")
    assert sel.groups[0][0].combinator == "child"
    assert sel.groups[0][0].id == b"hsoob"

    sel2 = compile_selector("#pseudos :nth-child(odd)")
    assert len(sel2.groups[0]) == 2
    assert sel2.groups[0][1].combinator == "descendant"
    p = sel2.groups[0][1].pseudos[0]
    assert (p.kind, p.a, p.b) == ("nth_child", 2, 1)


@pytest.mark.parametrize(
    "src,a,b",
    [
        (":nth-child(odd)", 2, 1),
        (":nth-child(even)", 2, 0),
        (":nth-child(3n+1)", 3, 1),
        (":nth-child(+3n-2)", 3, -2),
        (":nth-child(-n+6)", -1, 6),
        (":nth-child(-n+5)", -1, 5),
        (":nth-child(2)", 0, 2),
    ],
)
def test_nth_child_variants(src, a, b):
    p = compile_selector(src).groups[0][0].pseudos[0]
    assert (p.a, p.b) == (a, b)


@pytest.mark.parametrize(
    "src",
    [
        "", ",", "div >", "div +", "div ~", "div,", "#a#b",
        "div:not()", "div:not(.a,.b)", "div:nth-child()",
        "div:nth-child(2n+)", "div:unknown", "[attr", "div[attr^]",
    ],
)
def test_invalid_selectors_rejected(src):
    with pytest.raises(SelectorError):
        compile_selector(src)


def test_tag_and_attr_names_lowercased_values_not():
    sel = compile_selector("DiV[DaTa-K=MiXeD].KeepCase#KeepId")
    comp = sel.groups[0][0]
    assert comp.tag == b"div"
    assert comp.attrs[0].name == b"data-k"
    assert comp.attrs[0].value == b"MiXeD"
    assert comp.classes == (b"KeepCase",)
    assert comp.id == b"KeepId"


def test_requires_parent_flag():
    assert compile_selector("div > a").requires_parent
    assert compile_selector("div a").requires_parent
    assert compile_selector("li:nth-child(2)").requires_parent
    assert not compile_selector("a + b").requires_parent
    assert not compile_selector("a.x#y[z]").requires_parent


def test_quoted_attr_values():
    sel = compile_selector("div[q='&z'][n=\"a&b\"]")
    comp = sel.groups[0][0]
    assert comp.attrs[0].value == b"&z"
    assert comp.attrs[1].value == b"a&b"


def test_nth_matches_semantics():
    p = compile_selector(":nth-child(2n+1)").groups[0][0].pseudos[0]
    assert [i for i in range(1, 8) if p.nth_matches(i)] == [1, 3, 5, 7]
    p = compile_selector(":nth-child(-n+3)").groups[0][0].pseudos[0]
    assert [i for i in range(1, 8) if p.nth_matches(i)] == [1, 2, 3]
    p = compile_selector(":nth-child(3)").groups[0][0].pseudos[0]
    assert [i for i in range(1, 8) if p.nth_matches(i)] == [3]
