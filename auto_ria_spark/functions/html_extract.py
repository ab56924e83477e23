"""Real-HTML extraction stage (P1) — the reference's parser layer over live
HTML, as an Arrow-batched ``mapInPandas`` stage.

The reference parses pages with BeautifulSoup+lxml selector cascades
(reference: app/scraper/base.py:38-59, parsers/car_page.py:56-223,
parsers/search_page.py:52-78).  This module reproduces those cascades over
a dependency-free mini-DOM built with the stdlib ``html.parser`` (lxml /
selectolax are not installed in this sandbox; the DOM interface below is
what an lxml swap would implement — one function, same output schema).

Division of labor: this stage extracts each selector's RAW value into the
structured payload keys (title_h1, price_text, seller_* …); the cascade
ORDER, digit-stripping, 'тис. км' scaling, plate validity, phone
normalization and defaults all remain JVM-side Spark SQL expressions
(functions/extract.py) — identical downstream plan for HTML and
structured worlds.

Selector inventory implemented (reference: parsers/car_page.py):
  title      h1.head | h3.auto-content_title                     (:56-59)
  price      div.price_value > strong                            (:61-67)
  odometer   div.base-information span.size18[.thin]             (:69-80)
  username   8-way cascade a.sellerPro → … → h4.seller_info_name>a (:82-126)
  image      div.photo-620x465 img.outline.m-auto[src], fallback
             div.photo-620x465 img[src]                          (:153-165)
  imgs count a.show-all text                                     (:167-177)
  plate      span.state-num DIRECT text (ignore nested spans)    (:179-194)
  VIN        span.label-vin | span.vin-code |
             .vin-checked+.data-check .vin                       (:196-201)
  deleted    div#autoDeletedTopBlock.notice.notice--icon.notice--orange
             with the 'удалено и не принимает участия' text      (:203-223)
  hash/exp   script[data-hash][data-expires], else any element
             with both attributes                                (:238-252)
  links      section.ticket-item a.m-link-ticket[href] DOM order
             (reference: parsers/search_page.py:52-78)
"""

from __future__ import annotations

import json
from collections.abc import Iterator
from html.parser import HTMLParser

_VOID = {"img", "br", "meta", "link", "input", "hr", "area", "base", "col",
         "embed", "source", "track", "wbr"}


class Node:
    __slots__ = ("tag", "attrs", "classes", "children", "texts", "content",
                 "parent")

    def __init__(self, tag: str, attrs: dict):
        self.tag = tag
        self.attrs = attrs
        self.classes = set((attrs.get("class") or "").split())
        self.children: list[Node] = []
        self.texts: list[str] = []   # DIRECT text chunks, in order
        # interleaved document-order content: str (text chunk) | Node —
        # the single source of truth for text(); children/texts are the
        # type-filtered views the selector code indexes.
        self.content: list[Node | str] = []
        self.parent: Node | None = None  # set by the builder; #root: None

    # -- text ---------------------------------------------------------------
    def text(self) -> str:
        """Subtree text in DOCUMENT order (BeautifulSoup get_text
        semantics): '<div>a<span>b</span>c</div>' is 'abc' — direct chunks
        and child subtrees interleave exactly as written."""
        out = []
        for item in self.content:
            out.append(item if isinstance(item, str) else item.text())
        return "".join(out)

    def direct_text(self) -> str | None:
        """First direct (non-recursive) text chunk — BeautifulSoup's
        ``find(text=True, recursive=False)`` analogue."""
        return self.texts[0] if self.texts else None

    # -- traversal ----------------------------------------------------------
    def walk(self) -> Iterator["Node"]:
        """All descendants in document order (self excluded)."""
        for c in self.children:
            yield c
            yield from c.walk()

    def matches(self, tag: str | None, classes: set[str],
                node_id: str | None = None) -> bool:
        if tag is not None and self.tag != tag:
            return False
        if node_id is not None and self.attrs.get("id") != node_id:
            return False
        return classes <= self.classes

    def select(self, tag: str | None, *classes: str,
               node_id: str | None = None) -> Iterator["Node"]:
        cs = set(classes)
        for n in self.walk():
            if n.matches(tag, cs, node_id):
                yield n

    def select_one(self, tag: str | None, *classes: str,
                   node_id: str | None = None) -> "Node | None":
        return next(self.select(tag, *classes, node_id=node_id), None)

    def child_one(self, tag: str | None, *classes: str) -> "Node | None":
        """Direct-child combinator ( > )."""
        cs = set(classes)
        for c in self.children:
            if c.matches(tag, cs):
                return c
        return None


class _TreeBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        self.stack[-1].content.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, dict(attrs))
        node.parent = self.stack[-1]
        self.stack[-1].children.append(node)
        self.stack[-1].content.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data:
            self.stack[-1].texts.append(data)
            self.stack[-1].content.append(data)


def parse_html(html: str) -> Node:
    b = _TreeBuilder()
    b.feed(html)
    # flush the parser's internal buffer: without close(), trailing text
    # that ends in an ambiguous '&' run stays buffered and is silently
    # dropped (found by the fuzz suite; real pages end in '>' so golden
    # outputs are unchanged)
    b.close()
    return b.root


def _txt(node: Node | None) -> str | None:
    return node.text() if node is not None else None


# -- CSS-combinator semantics (the soupsieve contract) -----------------------
# BeautifulSoup's select_one evaluates a selector LIST ("a, b") and every
# combinator GLOBALLY: the winner is the first element in DOCUMENT ORDER
# matching ANY alternative, not "all matches of alternative 1 before any of
# alternative 2", and "A > B" / "A B" match a B whose parent/ancestor is
# ANY matching A, not the children of the first A found.  The helpers below
# reproduce that: one document-order walk, predicate per alternative.
# (Pinned by the cascade cases in tests/test_html_conformance.py.)

def _doc_first(root: Node, *preds) -> Node | None:
    """First node in document order satisfying ANY predicate — the
    select_one("p1, p2, ...") selector-list semantics."""
    for n in root.walk():
        for p in preds:
            if p(n):
                return n
    return None


def _parent_is(n: Node, tag: str | None, *classes: str) -> bool:
    """CSS child combinator 'A > B': B's parent element matches A."""
    return (n.parent is not None
            and n.parent.matches(tag, set(classes)))


def _has_ancestor(n: Node, tag: str | None, *classes: str) -> bool:
    """CSS descendant combinator 'A B': any proper ancestor matches A."""
    cs = set(classes)
    a = n.parent
    while a is not None:
        if a.matches(tag, cs):
            return True
        a = a.parent
    return False


def _prev_elem(n: Node) -> Node | None:
    """Immediately-preceding ELEMENT sibling (CSS '+' ignores text)."""
    if n.parent is None:
        return None
    sibs = n.parent.children
    i = sibs.index(n)
    return sibs[i - 1] if i > 0 else None


def _username_cascade(root: Node) -> dict:
    """The 8-way seller cascade, one payload key per reference select_one
    CALL so the JVM-side coalesce applies the reference's exact priority
    order between calls; combinators and in-call selector lists are
    evaluated globally in document order (reference:
    parsers/car_page.py:82-126)."""
    out: dict = {}
    out["seller_pro"] = _txt(root.select_one("a", "sellerPro"))
    # div.seller_info_name > a — first qualifying <a> in document order
    out["seller_info_a"] = _txt(_doc_first(
        root, lambda n: n.tag == "a"
        and _parent_is(n, "div", "seller_info_name")))
    # "div.user-name > h4.seller_info_name, div.view-seller-info
    #  .seller_info_name" — ONE selector list: document-order union
    out["seller_user_h4"] = _txt(_doc_first(
        root,
        lambda n: n.matches("h4", {"seller_info_name"})
        and _parent_is(n, "div", "user-name"),
        lambda n: "seller_info_name" in n.classes
        and _has_ancestor(n, "div", "view-seller-info")))
    # .seller_info .seller_info_name — global descendant combinator
    out["seller_info_any"] = _txt(_doc_first(
        root, lambda n: "seller_info_name" in n.classes
        and _has_ancestor(n, None, "seller_info")))
    out["seller_grey_bold"] = _txt(
        root.select_one("div", "seller_info_name", "grey", "bold"))
    out["seller_bold"] = _txt(
        root.select_one("div", "seller_info_name", "bold"))
    # h4.seller_info_name > a
    out["seller_h4_a"] = _txt(_doc_first(
        root, lambda n: n.tag == "a"
        and _parent_is(n, "h4", "seller_info_name")))
    return out


def _vin_cascade(root: Node) -> dict:
    """ONE reference select_one over the 3-way list "span.label-vin,
    span.vin-code, .vin-checked+.data-check .vin" — document-order union
    (reference: parsers/car_page.py:196-201): the payload carries the
    winner in its own key (others None) so the JVM-side coalesce
    reproduces the union, not a fixed priority."""
    def adjacent_vin(n: Node) -> bool:
        # .vin-checked + .data-check .vin: n has class vin and a proper
        # ancestor with class data-check whose immediately-preceding
        # element sibling has class vin-checked
        if "vin" not in n.classes:
            return False
        a = n.parent
        while a is not None:
            if "data-check" in a.classes:
                prev = _prev_elem(a)
                if prev is not None and "vin-checked" in prev.classes:
                    return True
            a = a.parent
        return False

    out = {"vin_label": None, "vin_code": None, "vin_checked": None}
    v = _doc_first(root,
                   lambda n: n.matches("span", {"label-vin"}),
                   lambda n: n.matches("span", {"vin-code"}),
                   adjacent_vin)
    if v is not None:
        key = ("vin_label" if v.matches("span", {"label-vin"})
               else "vin_code" if v.matches("span", {"vin-code"})
               else "vin_checked")
        out[key] = v.text()
    return out


def car_payload(html: str) -> dict:
    root = parse_html(html)
    p: dict = {}
    # "h1.head, h3.auto-content_title" — ONE selector list: the winner is
    # whichever appears first in the document; only ITS key is set so the
    # JVM coalesce reproduces the union (reference: car_page.py:56-59)
    p["title_h1"] = p["title_h3"] = None
    t = _doc_first(root,
                   lambda n: n.matches("h1", {"head"}),
                   lambda n: n.matches("h3", {"auto-content_title"}))
    if t is not None:
        p["title_h1" if t.tag == "h1" else "title_h3"] = t.text()
    # div.price_value > strong — global child combinator: the first
    # qualifying <strong> anywhere, not "first price div, then child"
    p["price_text"] = _txt(_doc_first(
        root, lambda n: n.tag == "strong"
        and _parent_is(n, "div", "price_value")))
    # "div.base-information span.size18.thin, div.base-information
    #  span.size18" — union = first span.size18 under ANY base-information
    # in document order (.thin is a subset match, so the list collapses)
    p["odometer_text"] = _txt(_doc_first(
        root, lambda n: n.matches("span", {"size18"})
        and _has_ancestor(n, "div", "base-information")))
    p.update(_username_cascade(root))
    # div.photo-620x465 img.outline.m-auto[src] (global descendant), then
    # the div.photo-620x465 img[src] fallback (reference: :153-165);
    # [src] is attribute PRESENCE, matching the reference's has_attr gate
    p["image_main"] = p["image_any"] = p["image_id"] = None
    main = _doc_first(
        root, lambda n: n.tag == "img" and "src" in n.attrs
        and {"outline", "m-auto"} <= n.classes
        and _has_ancestor(n, "div", "photo-620x465"))
    if main is not None:
        p["image_main"] = main.attrs["src"]
        p["image_id"] = main.attrs.get("data-image-id")
    anyimg = _doc_first(
        root, lambda n: n.tag == "img" and "src" in n.attrs
        and _has_ancestor(n, "div", "photo-620x465"))
    if anyimg is not None:
        p["image_any"] = anyimg.attrs["src"]
        if p["image_id"] is None:
            p["image_id"] = anyimg.attrs.get("data-image-id")
    p["show_all_text"] = _txt(root.select_one("a", "show-all"))
    plate = root.select_one("span", "state-num")
    p["plate_text"] = plate.direct_text() if plate is not None else None
    p.update(_vin_cascade(root))
    deleted = False
    db = root.select_one("div", "notice", "notice--icon", "notice--orange",
                         node_id="autoDeletedTopBlock")
    if db is not None and "удалено и не принимает участия в поиске" in db.text():
        deleted = True
    p["deleted"] = deleted
    h = e = None
    for s in root.select("script"):
        if "data-hash" in s.attrs and "data-expires" in s.attrs:
            h, e = s.attrs["data-hash"], s.attrs["data-expires"]
            break
    if not h or not e:
        for n in root.walk():
            if "data-hash" in n.attrs and "data-expires" in n.attrs:
                h, e = n.attrs["data-hash"], n.attrs["data-expires"]
                break
    p["data_hash"], p["data_expires"] = h, e
    return p


def listing_payload(html: str) -> dict:
    """DOM-ordered car links (reference: parsers/search_page.py:52-78) plus
    the graft's per-link snippet metadata (data-price / data-fresh)."""
    root = parse_html(html)
    links, prices, fresh = [], [], []
    for item in root.select("section", "ticket-item"):
        a = item.select_one("a", "m-link-ticket")
        if a is not None and a.attrs.get("href"):
            links.append(a.attrs["href"])
            pr = a.attrs.get("data-price")
            fr = a.attrs.get("data-fresh")
            prices.append(int(pr) if pr else None)
            fresh.append(int(fr) if fr else None)
    payload = {"links": json.dumps(links)}
    if any(v is not None for v in prices):
        payload["link_prices"] = json.dumps(prices)
        payload["link_fresh"] = json.dumps(fresh)
    return payload


def payloads_from_html(fetched, out_cols: list[str], out_schema: str):
    """The P1 stage: replace each fetched row's HTML ``body`` with the
    structured payload JSON (listing/car pages; phone XHR bodies are JSON
    already and pass through).  Arrow-batched — one Python pass per batch,
    never per-row UDFs."""

    def stage(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            bodies = []
            for kind, body in zip(pdf["kind"], pdf["body"]):
                if body is None or kind == "phone":
                    bodies.append(body)
                elif kind in ("listing", "sitemap"):
                    bodies.append(json.dumps(
                        listing_payload(body), ensure_ascii=False))
                else:
                    bodies.append(json.dumps(
                        car_payload(body), ensure_ascii=False))
            out = pdf[out_cols].copy()
            out["body"] = bodies
            yield out

    return fetched.mapInPandas(stage, schema=out_schema)
