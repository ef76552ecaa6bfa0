"""html5lib tree-construction conformance (weakened tag-sequence oracle).

Mirrors the reference's external parser-suite scoring
(tools/scripts.zig:1791-2100, README.md:33-39 — 524/600 html5lib,
440/500 WPT with the same weakening).  The vendored subset lives in
tests/fixtures/html5lib_subset/ (reconstructed cases in the corpus
format; no network in this sandbox to fetch the real corpus).

The pinned floors make parser drift VISIBLE: a change that loses a
case fails here; a change that gains cases should raise the floor.
The known failures are the reference's own failure classes, preserved
by design (SURVEY.md §2): atomic svg/math subtrees, no adoption-agency
clone on misnested formatting, unmatched close tags ignored (so no
stray-</p> element synthesis), no <image>→<img> token rewriting,
xmp/iframe/noframes/noembed not treated as raw text, no drop of stray
table-section tags outside tables, no foster parenting (non-table
content stays inside <table>), no implied <colgroup>, and `<!--->`
swallowing to the next `-->` instead of closing immediately.
"""

import pytest

from tools.conformance import FIXTURE_DIR, load_dat, load_suite, run_suite

# floor per fixture file: (passed, total) as of round 4 (corpus grown
# 148 → 316 → 411 cases, prioritizing the divergence classes the
# reference itself fails: adoption agency, foster parenting, template,
# rawtext variants, and — new in round 4 — table sections/colgroup and
# formatting-reconstruction variants; the floors document WHICH quirks
# we share.  Round-4 failures are confined to two classes: implied
# <colgroup> synthesis + foster parenting (tests_table_sections) and
# adoption-agency formatting clones (tests_adoption_agency2) — both on
# the reference's own documented divergence list (BASELINE.md).
FLOORS = {
    # ruby rb/rt/rp/rtc + dl/li implied-closure chains — full pass
    "tests_ruby_dl.dat": (28, 28),
    # failures: nested <form> kept as an element — the reference has no
    # form-element-pointer state (same no-parser-state class as the
    # stray-table-tag quirk)
    "tests_forms_buttons.dat": (26, 28),
    # failures: xmp/iframe/noframes/noembed not raw text — the
    # reference's documented raw-text set (tables.zig) excludes them
    "tests_plaintext_rawtext.dat": (26, 30),
    # failures: </br> not synthesized as <br> (no end-tag-to-element
    # synthesis), stray col/frame kept in body (no insertion modes),
    # formatting not reconstructed after an intervening <hr>
    "tests_voids_pclosers.dat": (26, 30),
    "tests_adoption_agency.dat": (1, 14),
    "tests_adoption_agency2.dat": (13, 37),
    "tests_table_sections.dat": (45, 58),
    "tests_select.dat": (17, 22),
    "tests_structure4.dat": (21, 26),
    # svg-subtree-opaque is the REFERENCE's own design (findSvgSubtreeEnd
    # skips the subtree) — these cases document the shared quirk
    "tests_foreign2_frameset.dat": (6, 18),
    # failures: xmp/iframe/noframes/noembed not raw-text (documented),
    # <image> not renamed to img (no token renaming), and `</textarea d>`
    # not closing raw text — the reference's own findRawTextClose
    # (parser.zig:512-516) allows only whitespace before `>`
    "tests_rawtext2_comments.dat": (26, 32),
    # failures: implied colgroup, foster parenting, active-formatting
    # reconstruction — all documented divergence classes
    "tests_lists_blocks.dat": (29, 32),
    # failures are reference-design quirks, each pinned to source:
    # quote-respecting tag-end scan swallows a stray quote in an
    # unquoted attr (findTagEndRespectQuotes), unterminated tag at EOF
    # still materialized, stray end tags never synthesize elements
    # (</p>, </br>), permissive tag-name scanner accepts non-letter
    # starts (tables.zig:41-43 isTagNameChar), svg subtree opaque
    "tests_attrs_eof_quirks.dat": (23, 32),
    # failures: stray table tags (td/tr/caption/col/tbody) kept as
    # elements in body — the reference has no insertion-mode machinery
    # to drop them (parser.zig parse loop)
    "tests_inline_misc.dat": (26, 31),
    "tests_attrs_entities.dat": (29, 30),
    "tests_basic.dat": (39, 40),
    "tests_foster_parenting.dat": (12, 20),
    "tests_head_body.dat": (19, 26),
    "tests_implicit_headings.dat": (20, 24),
    "tests_misnesting.dat": (6, 15),
    "tests_raw_foreign.dat": (11, 19),
    "tests_rawtext_doctype.dat": (16, 21),
    "tests_structure2.dat": (14, 20),
    "tests_structure3.dat": (27, 28),
    "tests_tables.dat": (11, 14),
    "tests_template.dat": (18, 18),
    "wpt_html5lib_vendored.html": (19, 27),
    # 62 NEW full-document cases (no .dat mirrors); failures: adoption
    # agency clones (5), svg-subtree-opaque (4, findSvgSubtreeEnd
    # design), xmp not raw-text, nested <select> kept (no insertion
    # modes) — every one in a documented divergence class
    "wpt_html5lib_vendored2.html": (51, 62),
    # flow/interactive/media elements (details, dialog, figure, menu,
    # hgroup, search, picture, video, map, object, datalist, meter) —
    # full pass: nesting-only divergences (p not closed by the
    # post-HTML4 closers, optgroup/heading implied closes) are
    # invisible to the tag-sequence oracle
    "tests_flow_interactive.dat": (40, 40),
    # failures are all documented divergence classes: implied
    # <colgroup> not synthesized (×2), <div> in table not
    # foster-parented out, stray td/tr/tbody/caption/col kept in body
    # (no insertion modes), </p> / </br> not synthesized as elements
    "tests_tables2_strays.dat": (26, 35),
    # element-scope / implied-close family (button scope, a-in-a,
    # option/optgroup chains, p-closers, li/dd reaching through <div>,
    # object/marquee/applet containment, noscript head/body) — sole
    # failure is the canonical adoption-agency case <a>1<p>2</a>3</p>
    # (documented divergence class)
    "tests_scope_misc.dat": (33, 34),
    # MathML foreign content: token/integration-point cases pass
    # because the permissive parser nests unknown elements naturally;
    # failures are svg-subtree-opaque (findSvgSubtreeEnd design) and
    # math-in-table foster parenting — both documented classes
    "tests_math_content.dat": (23, 25),
    # 43 NEW full-document WPT-format cases (doctype placement,
    # comment tokenization incl. <!--> / <!--->, bogus markup, table
    # structure, head metadata, attribute quoting); all 6 failures in
    # documented divergence classes: </br> not synthesized, permissive
    # tag-name scanner accepts <%= as a tag (tables.zig:41-43), foster
    # parenting, stray td kept in body, adoption-agency cascade,
    # svg-subtree-opaque
    "wpt_html5lib_vendored3.html": (37, 43),
    # embedded/inline content (object/param/embed, map/area, canvas,
    # time/data/abbr/cite/q, kbd/samp/var/code, del/ins, bdi/bdo,
    # meter/progress/output/datalist, iframe fallback, sectioning
    # compositions, void runs, phrasing nests) — full pass: these are
    # the element families the permissive parser and the spec agree on
    "tests_embedded_inline.dat": (45, 45),
    # 61 NEW full-document WPT-format cases (dl/heading/li chains,
    # select insertion family, rawtext with markup-like text,
    # MathML layout elements, table cell flow, frameset docs,
    # attribute quoting, head metadata, forms); all 6 failures in
    # documented divergence classes: select insertion mode,
    # active-formatting reconstruction (×2), adoption agency (×2),
    # svg-subtree-opaque
    "wpt_html5lib_vendored4.html": (55, 61),
    # cross-family compositions (sectioning × lists × tables × forms
    # × media × phrasing nests) — full pass: each constituent family
    # is individually verified above; these pin their interactions
    "tests_compositions.dat": (40, 40),
    # comment/bang/PI/doctype tokenization edges; the 2 failures are
    # the reference's own tokenizer design, cited to source: skipPi
    # requires a full '?>' so '<?>' consumes to EOF
    # (parser.zig:458-466), and skipComment special-cases only
    # '<!-->' so the spec's '<!--->' empty comment also consumes to
    # EOF — both faithfully mirrored by kernel/htmlparse.py
    "tests_bogus_doctype.dat": (23, 25),
    # custom elements / web components (hyphenated tags, nested
    # autonomous elements, custom tags in lists/forms/headings) plus
    # obsolete-unknown elements (blink, spacer, isindex as ordinary
    # per the current spec) — the 2 failures are documented classes:
    # foster parenting (custom tag in table) and the select insertion
    # mode (non-option content dropped to text)
    "tests_custom_elements.dat": (18, 20),
    # 36 NEW round-5 cases pinning the REFERENCE's behavior in the two
    # open divergence classes (verdict-r4 item 7): foster parenting
    # (non-table content stays nested inside <table>/<tr>/<tbody> —
    # div/b/p/ul/form/h1/custom/img/a/style/em/code/blockquote/span)
    # and the select insertion mode (select keeps div/table/input/
    # select/button/keygen/textarea/script/ul/span children where they
    # appear; option/optgroup implied-closes still apply).  Expected
    # trees are the permissive parser's own output — a full pass that
    # turns any future drift in these families into a visible failure.
    "tests_foster_select_pinned.dat": (36, 36),
    # 44 round-5 cases pinning the REFERENCE's behavior in the
    # REMAINING documented divergence classes, so every class now has
    # both failing spec-cases (documenting the divergence) and passing
    # reference-pins (a drift tripwire): adoption agency (no formatting
    # clones — close pops to the match, deeper opens stay nested),
    # unmatched close tags ignored (no </p>/</br>/stray-close element
    # synthesis), stray table tags kept as elements outside tables,
    # the rawtext set (script/style/title/textarea raw; xmp/iframe/
    # noframes/noembed/noscript parsed as markup), svg subtrees opaque,
    # tokenizer quirks (</br> ignored, <%= as tag name, <?> PI to '>',
    # <!--> closes vs <!---> swallows, non-letter tag-name starts),
    # entity subset (&nbsp;/&copy; survive as text), implied-closure
    # chains (li/dt-dd/p/option/td), void elements, plaintext swallow.
    "tests_divergence_pinned.dat": (44, 44),
}
TOTAL_FLOOR = 1025


@pytest.mark.parametrize("name", sorted(FLOORS))
def test_per_file_floor(name):
    import os

    from tools.conformance import load_wpt

    path = os.path.join(FIXTURE_DIR, name)
    cases = load_wpt(path) if name.endswith(".html") else load_dat(path)
    passed, total, fails = run_suite(cases)
    floor, expected_total = FLOORS[name]
    assert total == expected_total, f"{name}: case count changed ({total})"
    detail = "; ".join(f"{c.source} got {list(g)}" for c, g in fails[:5])
    assert passed >= floor, f"{name}: {passed}/{total} < floor {floor} — {detail}"


def test_total_floor_and_report():
    cases = load_suite()
    passed, total, _ = run_suite(cases)
    assert total >= 140
    assert passed >= TOTAL_FLOOR, f"total {passed}/{total} dropped below {TOTAL_FLOOR}"


def test_loader_skips_fragment_cases(tmp_path):
    dat = tmp_path / "frag.dat"
    dat.write_text(
        "#data\n<td>x\n#errors\n#document-fragment\ntable\n#document\n| <td>\n\n"
        "#data\n<p>y\n#errors\n#document\n| <html>\n|   <head>\n|   <body>\n|     <p>\n"
    )
    cases = load_dat(str(dat))
    assert len(cases) == 1 and cases[0].expected == ("p",)
