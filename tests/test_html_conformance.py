"""Mini-DOM conformance corpus (P1): adversarial HTML against
hand-written expected extractions following BeautifulSoup/lxml semantics
(the reference's parser layer: app/scraper/base.py:59,
parsers/car_page.py:56-223, parsers/search_page.py:52-78).

The synthetic golden worlds render well-formed HTML; this corpus pins the
nasty cases a live page serves: text interleaved with children, nested
same-class elements, unclosed/mismatched tags, entities, uppercase tags,
comments, selector-lookalike markup inside <script> CDATA, whitespace in
class attributes, and node-adjacency (not text-adjacency) for the
``+`` combinator.
"""

from __future__ import annotations

import json

from auto_ria_spark.functions.html_extract import (car_payload,
                                                   listing_payload,
                                                   parse_html)


def test_text_interleaved_with_children():
    # get_text() document order: direct chunks and child subtrees interleave
    p = car_payload('<h1 class="head">Audi <span>A6</span> 2018 <i>TDI</i></h1>')
    assert p["title_h1"] == "Audi A6 2018 TDI"


def test_nested_same_class_spans_plate_direct_text():
    # span.state-num DIRECT text only — nested .state-num must not bleed in
    # (BeautifulSoup find(text=True, recursive=False))
    html = ('<span class="state-num">AA 1234 BB'
            '<span class="state-num">XX 0000 XX</span></span>')
    assert car_payload(html)["plate_text"] == "AA 1234 BB"


def test_nested_same_class_outer_wins_for_subtree_text():
    # select_one = FIRST matching node in document order; its text() is the
    # whole subtree including the nested same-class child
    root = parse_html('<div class="q"><i>a</i><div class="q">b</div>c</div>')
    node = root.select_one("div", "q")
    assert node.text() == "abc"


def test_unclosed_tags_truncated_page():
    # a page cut mid-element: open elements still hold their text
    html = ('<div class="price_value"><strong>25 500 $'
            '<h3 class="auto-content_title">Ford Focus')
    p = car_payload(html)
    # html.parser keeps appending into the open <strong>; BeautifulSoup's
    # lxml recovery does the same for inline content
    assert p["price_text"].startswith("25 500 $")
    assert p["title_h3"] == "Ford Focus"


def test_mismatched_close_tag_pops_to_matching_ancestor():
    # </div> closes the open span too; the stray </span> is ignored
    html = ('<div class="base-information">'
            '<span class="size18">140 тыс</div></span>'
            '<h1 class="head">T</h1>')
    p = car_payload(html)
    assert p["odometer_text"] == "140 тыс"
    assert p["title_h1"] == "T"


def test_entities_decode():
    p = car_payload(
        '<h1 class="head">S&amp;M &quot;Auto&quot; &#8226; Lux</h1>')
    assert p["title_h1"] == 'S&M "Auto" • Lux'


def test_uppercase_tags_and_attr_names():
    # tag/attribute NAMES are case-insensitive in HTML; class values not
    p = car_payload('<DIV CLASS="price_value"><STRONG>9 999 $</STRONG></DIV>')
    assert p["price_text"] == "9 999 $"


def test_class_attr_extra_whitespace():
    p = car_payload('<h1 class="  head   big ">Opel</h1>')
    assert p["title_h1"] == "Opel"


def test_commented_out_markup_is_ignored():
    html = ('<!-- <h1 class="head">not this</h1> -->'
            '<h1 class="head">this</h1>')
    assert car_payload(html)["title_h1"] == "this"


def test_selector_lookalikes_inside_script_cdata():
    # <script> content is CDATA: markup inside must NOT become elements
    html = ('<script>var t = \'<h1 class="head">nope</h1>\';</script>'
            '<h1 class="head">yes</h1>')
    assert car_payload(html)["title_h1"] == "yes"


def test_first_document_order_match_wins():
    html = ('<h1 class="head">first</h1><h1 class="head">second</h1>')
    assert car_payload(html)["title_h1"] == "first"


def test_direct_child_combinator_skips_text_and_deep_matches():
    # div.price_value > strong: whitespace text between them is fine, but a
    # strong nested deeper must not match the direct-child combinator
    p1 = car_payload(
        '<div class="price_value">\n  <strong>1 000 $</strong></div>')
    assert p1["price_text"] == "1 000 $"
    p2 = car_payload(
        '<div class="price_value"><em><strong>2 000 $</strong></em></div>')
    assert p2["price_text"] is None


def test_adjacent_sibling_is_node_adjacency():
    # .vin-checked + .data-check .vin — whitespace/text between the two
    # elements must not break adjacency (CSS + ignores text nodes)
    html = ('<div><span class="vin-checked">ok</span>\n   \n'
            '<div class="data-check"><span class="vin">WAUZZZ4G7EN123456'
            '</span></div></div>')
    assert car_payload(html)["vin_checked"] == "WAUZZZ4G7EN123456"
    # an ELEMENT between them does break it
    html2 = ('<div><span class="vin-checked">ok</span><i>x</i>'
             '<div class="data-check"><span class="vin">NO</span></div>'
             '</div>')
    assert car_payload(html2)["vin_checked"] is None


def test_void_elements_do_not_swallow_siblings():
    # <img> and <br> never take children: content after them stays at the
    # right depth
    html = ('<div class="photo-620x465"><img class="outline m-auto" '
            'src="https://cdn/x.jpg" data-image-id="img7"><br>'
            '<h1 class="head">after void</h1></div>')
    p = car_payload(html)
    assert p["image_main"] == "https://cdn/x.jpg"
    assert p["image_id"] == "img7"
    assert p["title_h1"] == "after void"


def test_self_closing_syntax():
    p = car_payload('<div class="photo-620x465">'
                    '<img src="https://cdn/y.jpg" /></div>')
    assert p["image_any"] == "https://cdn/y.jpg"
    assert p["image_main"] is None  # no outline/m-auto classes


def test_deleted_notice_requires_all_classes_and_id():
    base = ('<div id="autoDeletedTopBlock" class="notice notice--icon '
            'notice--orange">Это авто удалено и не принимает участия в '
            'поиске</div>')
    assert car_payload(base)["deleted"] is True
    # missing one class -> not the deleted block
    weaker = base.replace(" notice--orange", "")
    assert car_payload(weaker)["deleted"] is False
    # right classes, wrong id -> no
    wrong_id = base.replace("autoDeletedTopBlock", "other")
    assert car_payload(wrong_id)["deleted"] is False


def test_listing_links_dom_order_with_noise():
    html = (
        '<section class="ticket-item"><a class="m-link-ticket" '
        'href="https://auto.ria.test/c1.html" data-price="900">one</a>'
        '<a href="https://auto.ria.test/ad.html">ad (no class)</a></section>'
        '<div><section class="ticket-item"><div><a class="m-link-ticket" '
        'href="https://auto.ria.test/c2.html">two</a></div></section></div>'
        '<section class="ticket-item"><span>no link here</span></section>'
        '<a class="m-link-ticket" href="https://auto.ria.test/outside.html">'
        'outside any section</a>')
    p = listing_payload(html)
    assert json.loads(p["links"]) == [
        "https://auto.ria.test/c1.html", "https://auto.ria.test/c2.html"]
    assert json.loads(p["link_prices"]) == [900, None]


def test_seller_cascade_order_pro_beats_h4():
    html = ('<h4 class="seller_info_name"><a>Fallback Name</a></h4>'
            '<a class="sellerPro">Pro Dealer</a>')
    p = car_payload(html)
    assert p["seller_pro"] == "Pro Dealer"
    assert p["seller_h4_a"] == "Fallback Name"


def test_hash_expires_script_first_then_any_element():
    html = ('<div data-hash="dh" data-expires="de">x</div>'
            '<script data-hash="sh" data-expires="se"></script>')
    p = car_payload(html)
    # script[data-hash][data-expires] wins over the generic fallback
    assert (p["data_hash"], p["data_expires"]) == ("sh", "se")
    html2 = '<div data-hash="dh" data-expires="de">x</div>'
    p2 = car_payload(html2)
    assert (p2["data_hash"], p2["data_expires"]) == ("dh", "de")


# --- cascade-semantics corpus (round 6): the CSS selector-LIST and global
# combinator rules the reference's select_one calls rely on.  soupsieve
# evaluates "a, b" as a document-order UNION and "A > B" / "A B" globally;
# every expectation below is hand-computed from those rules against the
# reference's exact selectors (parsers/car_page.py:56-223).


def test_title_union_is_document_order_not_priority():
    # select_one("h1.head, h3.auto-content_title"): whichever matches
    # FIRST IN THE DOCUMENT wins — an earlier h3 beats a later h1
    p = car_payload('<h3 class="auto-content_title">H3 first</h3>'
                    '<h1 class="head">H1 later</h1>')
    assert p["title_h3"] == "H3 first"
    assert p["title_h1"] is None  # the JVM coalesce must see ONLY the winner
    p2 = car_payload('<h1 class="head">H1 first</h1>'
                     '<h3 class="auto-content_title">H3 later</h3>')
    assert p2["title_h1"] == "H1 first"
    assert p2["title_h3"] is None


def test_price_child_combinator_matches_any_price_div():
    # div.price_value > strong is GLOBAL: an empty first price div must
    # not mask a later one that has the <strong>
    p = car_payload('<div class="price_value">grn only</div>'
                    '<div class="price_value"><strong>7 500 $</strong></div>')
    assert p["price_text"] == "7 500 $"


def test_price_child_combinator_nested_price_divs():
    # the <strong> is a direct child of the INNER price_value div — the
    # combinator matches against any qualifying parent, so it hits even
    # though it is not a direct child of the outer one
    p = car_payload('<div class="price_value"><div class="price_value">'
                    '<strong>3 100 $</strong></div></div>')
    assert p["price_text"] == "3 100 $"


def test_odometer_descendant_matches_any_base_information():
    # div.base-information span.size18: a first base-information block
    # without the span must not mask a later block that has it
    p = car_payload('<div class="base-information"><b>no span</b></div>'
                    '<div class="base-information"><p>'
                    '<span class="size18">42 тис. км</span></p></div>')
    assert p["odometer_text"] == "42 тис. км"


def test_seller_info_a_child_combinator_is_global():
    # div.seller_info_name > a: the first div's <a> is nested in a <span>
    # (NOT a direct child) — the selector must fall through to the
    # second div's direct-child <a>
    p = car_payload('<div class="seller_info_name"><span><a>Nested</a>'
                    '</span></div>'
                    '<div class="seller_info_name"><a>Direct</a></div>')
    assert p["seller_info_a"] == "Direct"


def test_seller_union_view_seller_info_beats_later_user_name():
    # ONE select_one("div.user-name > h4.seller_info_name,
    # div.view-seller-info .seller_info_name"): the view-seller-info
    # descendant appears first in the document, so it wins the union
    # even though the user-name alternative is written first
    p = car_payload(
        '<div class="view-seller-info"><p><span class="seller_info_name">'
        'From View</span></p></div>'
        '<div class="user-name"><h4 class="seller_info_name">From H4</h4>'
        '</div>')
    assert p["seller_user_h4"] == "From View"


def test_seller_h4_a_child_combinator_is_global():
    # h4.seller_info_name > a: first h4 has only nested (non-child) <a>;
    # the global combinator finds the second h4's direct child
    p = car_payload('<h4 class="seller_info_name"><em><a>No</a></em></h4>'
                    '<h4 class="seller_info_name"><a>Yes</a></h4>')
    assert p["seller_h4_a"] == "Yes"


def test_vin_union_is_document_order_not_priority():
    # select_one("span.label-vin, span.vin-code, ...") — an earlier
    # vin-code beats a later label-vin (document order, not list order)
    p = car_payload('<span class="vin-code">VINCODE111</span>'
                    '<span class="label-vin">LABEL222</span>')
    assert p["vin_code"] == "VINCODE111"
    assert p["vin_label"] is None
    # ... and an adjacent-sibling match earlier in the document beats both
    p2 = car_payload(
        '<div><span class="vin-checked">ok</span>'
        '<div class="data-check"><span class="vin">ADJ333</span></div></div>'
        '<span class="label-vin">LABEL444</span>')
    assert p2["vin_checked"] == "ADJ333"
    assert p2["vin_label"] is None


def test_vin_adjacent_descendant_at_depth_and_adjacency_on_data_check():
    # .vin-checked+.data-check .vin: the .vin may sit at ANY depth under
    # the adjacent .data-check ...
    p = car_payload('<span class="vin-checked">i</span>'
                    '<div class="data-check"><p><b>'
                    '<span class="vin">DEEP555</span></b></p></div>')
    assert p["vin_checked"] == "DEEP555"
    # ... but the adjacency is on the .data-check ELEMENT itself: wrapping
    # it in another div breaks the + relation even though the wrapper is
    # adjacent to .vin-checked
    p2 = car_payload('<span class="vin-checked">i</span>'
                     '<div><div class="data-check">'
                     '<span class="vin">NO666</span></div></div>')
    assert p2["vin_checked"] is None


def test_image_selectors_are_global_across_photo_divs():
    # main: div.photo-620x465 img.outline.m-auto[src] anywhere; any:
    # div.photo-620x465 img[src] — first in document order, so the plain
    # img in the FIRST photo div supplies image_any while the SECOND
    # div's decorated img supplies image_main
    p = car_payload(
        '<div class="photo-620x465"><img src="https://cdn/plain.jpg"></div>'
        '<div class="photo-620x465"><img class="outline m-auto" '
        'src="https://cdn/main.jpg" data-image-id="img9"></div>')
    assert p["image_main"] == "https://cdn/main.jpg"
    assert p["image_any"] == "https://cdn/plain.jpg"
    assert p["image_id"] == "img9"


def test_image_src_attribute_presence_not_truthiness():
    # [src] is attribute PRESENCE (and the reference then returns the raw
    # value via has_attr): an empty src still matches img.outline.m-auto
    p = car_payload('<div class="photo-620x465">'
                    '<img class="outline m-auto" src=""></div>')
    assert p["image_main"] == ""


def test_plate_direct_text_skips_leading_child_element():
    # find(text=True, recursive=False) returns the first DIRECT string in
    # order — child elements before it are skipped, children after it
    # (the popup span) never bleed in
    html = ('<span class="state-num"><i>ua</i>AA 1234 BB'
            '<span>popup text</span></span>')
    assert car_payload(html)["plate_text"] == "AA 1234 BB"


def test_entities_decode_in_attribute_values():
    # charrefs decode inside attribute VALUES exactly as in text (html5
    # tokenizer rule; BeautifulSoup does the same)
    html = ('<section class="ticket-item"><a class="m-link-ticket" '
            'href="https://auto.ria.test/auto_a&amp;b_1.html">x</a>'
            '</section>'
            '<script data-hash="h&#65;sh" data-expires="2&amp;2"></script>')
    lp = listing_payload(html)
    assert json.loads(lp["links"]) == ["https://auto.ria.test/auto_a&b_1.html"]
    cp = car_payload(html)
    assert (cp["data_hash"], cp["data_expires"]) == ("hAsh", "2&2")


def test_listing_nested_ticket_items_duplicate_like_reference():
    # soup.select("section.ticket-item") returns BOTH the outer and the
    # nested section; item.select_one then finds the same descendant <a>
    # from each — the reference emits the link twice and so do we (the
    # engine's F1 first-occurrence dedup collapses it downstream)
    html = ('<section class="ticket-item"><section class="ticket-item">'
            '<a class="m-link-ticket" href="https://auto.ria.test/c9.html">'
            'x</a></section></section>')
    assert json.loads(listing_payload(html)["links"]) == [
        "https://auto.ria.test/c9.html", "https://auto.ria.test/c9.html"]
