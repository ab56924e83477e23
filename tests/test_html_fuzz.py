"""Property-based fuzz of the mini-DOM (functions/html_extract) — the
round-5 shrink of the adversarial-HTML exposure left after the 19-case
conformance corpus (tests/test_html_conformance.py).

Two tiers over ≥1,200 seeded cases (deterministic ``random.Random``):

Tier 1 — WELL-FORMED adversarial serialization: a random spec tree
  (nested tags, interleaved text, comments, void elements) is serialized
  with randomized attribute quoting (double/single/unquoted/bare),
  random tag-name case, entity escapes (&amp; &lt; &#NN; &#xHH;) and
  self-closing void syntax, then parsed; the parsed DOM must match the
  spec EXACTLY (structure, attrs, document-order subtree text, direct
  text, selector first-match order, direct-child combinator) — expected
  values computed by an independent hand-model over the spec, never by
  the parser under test.

Tier 2 — MALFORMED mutations (unclosed / mismatched / stray / swapped
  closing tags, truncation, injected bare entities): exact tree shape is
  unspecified (BeautifulSoup itself varies by backend), but two
  invariants must survive ANY input:
    * document-order subtree text equals the flat parse's text-chunk
      concatenation (no text lost, duplicated, or reordered), and
    * document-order node walk equals the flat parse's start-tag
      sequence (tags + attrs)
  where "the flat parse" is a recorder HTMLParser that builds no tree —
  an independent model of what the tokenizer delivered.
"""

from __future__ import annotations

import random
import re
from html.parser import HTMLParser

from auto_ria_spark.functions.html_extract import parse_html

# script/style are CDATA elements in html.parser (raw-text content, no
# child tags) — the payload code reads only their attrs, and the
# generator keeps them out so every generated child is a real child
_TAGS = ["div", "span", "a", "h1", "h3", "h4", "section", "strong", "p",
         "li", "ul", "em", "b"]
_VOIDS = ["img", "br", "input"]
_CLASSES = ["head", "price_value", "size18", "thin", "seller_info_name",
            "bold", "grey", "ticket-item", "m-link-ticket", "state-num",
            "vin", "show-all", "c1", "c2", "c3"]
_ATTR_NAMES = ["id", "href", "src", "data-x", "data-hash", "data-expires",
               "title"]
_ATTR_VALS = ["a&b", "x<y", "привет", "12 500 $", "a'b", 'c"d',
              "/cars/123?page=2&x=1", "AbC-123", "тис. км", "v"]
_TEXTS = ["hello", "Ціна 12 500 $", "тис. км", "a & b", "x < y > z",
          "ёж і їжак", "  spaced  ", "1999 грн", "a&b&c", "tail"]


# --------------------------------------------------------------- generator
def _gen_spec(rng: random.Random, depth: int = 0) -> dict:
    tag = rng.choice(_VOIDS) if (depth and rng.random() < 0.12) \
        else rng.choice(_TAGS)
    attrs: dict = {}
    if rng.random() < 0.7:
        attrs["class"] = " ".join(
            rng.sample(_CLASSES, rng.randint(1, 3)))
    for name in rng.sample(_ATTR_NAMES, rng.randint(0, 2)):
        # bare attribute (no value) parses to None
        attrs[name] = None if rng.random() < 0.1 \
            else rng.choice(_ATTR_VALS)
    children: list = []
    if tag not in _VOIDS and depth < 4:
        for _ in range(rng.randint(0, 6 if depth == 0 else 3)):
            r = rng.random()
            if r < 0.40:
                children.append(rng.choice(_TEXTS))
            elif r < 0.50:
                children.append(("comment", "c%d" % rng.randrange(100)))
            else:
                children.append(_gen_spec(rng, depth + 1))
    return {"tag": tag, "attrs": attrs, "children": children}


def _esc_text(s: str, rng: random.Random) -> str:
    out = []
    for ch in s:
        if ch == "&":
            out.append("&amp;")
        elif ch == "<":
            out.append("&lt;")
        elif ch == ">":
            out.append("&gt;" if rng.random() < 0.5 else ">")
        elif rng.random() < 0.06:
            out.append("&#%d;" % ord(ch) if rng.random() < 0.5
                       else "&#x%x;" % ord(ch))
        else:
            out.append(ch)
    return "".join(out)


def _ser_attrs(attrs: dict, rng: random.Random) -> str:
    parts = []
    for k, v in attrs.items():
        if v is None:
            parts.append(" %s" % k)
            continue
        style = rng.randrange(3)
        if style == 2 and v and all(c.isalnum() or c in "-_./?" for c in v):
            parts.append(" %s=%s" % (k, v))
        elif style == 1:
            parts.append(" %s='%s'" % (
                k, v.replace("&", "&amp;").replace("'", "&#39;")))
        else:
            parts.append(' %s="%s"' % (
                k, v.replace("&", "&amp;").replace('"', "&quot;")))
    return "".join(parts)


def _serialize(spec: dict, rng: random.Random) -> str:
    tag = spec["tag"]
    shown = tag.upper() if rng.random() < 0.1 else tag
    out = ["<%s%s" % (shown, _ser_attrs(spec["attrs"], rng))]
    if tag in _VOIDS:
        # the space matters: an unquoted attr value directly before '/>'
        # swallows the slash into the value (HTML5 tokenizer semantics)
        out.append(" />" if rng.random() < 0.5 else ">")
        return "".join(out)
    out.append(" >" if rng.random() < 0.08 else ">")
    for c in spec["children"]:
        if isinstance(c, str):
            out.append(_esc_text(c, rng))
        elif isinstance(c, tuple):
            out.append("<!-- %s -->" % c[1])
        else:
            out.append(_serialize(c, rng))
    out.append("</%s>" % (shown if rng.random() < 0.5 else tag))
    return "".join(out)


# -------------------------------------------------- hand-model (spec side)
def _x_elems(spec: dict) -> list:
    return [c for c in spec["children"] if isinstance(c, dict)]


def _x_text(spec) -> str:
    if isinstance(spec, str):
        return spec
    if isinstance(spec, tuple):  # comment
        return ""
    return "".join(_x_text(c) for c in spec["children"])


def _x_first_text_run(spec: dict) -> str:
    """Concatenation of leading adjacent text children (what the parser
    delivers as the node's FIRST direct chunk — comments and child
    elements break the run)."""
    run = []
    for c in spec["children"]:
        if isinstance(c, str):
            run.append(c)
        else:
            break
    return "".join(run)


def _x_walk(spec: dict):
    for c in _x_elems(spec):
        yield c
        yield from _x_walk(c)


def _compare(node, spec) -> None:
    assert node.tag == spec["tag"]
    assert node.attrs == spec["attrs"], (node.attrs, spec["attrs"])
    assert node.text() == _x_text(spec)
    direct = "".join(node.texts)
    assert direct == "".join(
        c for c in spec["children"] if isinstance(c, str))
    first_run = _x_first_text_run(spec)
    if first_run:
        assert node.direct_text() == first_run
    kids, xkids = node.children, _x_elems(spec)
    assert len(kids) == len(xkids), (spec["tag"], len(kids), len(xkids))
    for n, s in zip(kids, xkids):
        _compare(n, s)


def _check_selectors(root, spec, rng: random.Random) -> None:
    # root is the parser's #root whose walk INCLUDES the spec's top node
    pairs = list(zip(root.walk(), [spec, *_x_walk(spec)]))
    # select_one = document-order first match, on random (tag, class)
    for _ in range(5):
        tag = rng.choice([None] + _TAGS)
        cls = rng.sample(_CLASSES, rng.randint(0, 2))
        want = next(
            (n for n, s in pairs
             if (tag is None or s["tag"] == tag)
             and set(cls) <= set((s["attrs"].get("class") or "").split())),
            None)
        assert root.select_one(tag, *cls) is want
    # direct-child combinator on a random interior node
    interior = [(n, s) for n, s in pairs if _x_elems(s)]
    if interior:
        n, s = rng.choice(interior)
        tag = rng.choice(_TAGS)
        want = next((c for c in _x_elems(s) if c["tag"] == tag), None)
        got = n.child_one(tag)
        if want is None:
            assert got is None
        else:
            assert got is n.children[_x_elems(s).index(want)]


def test_wellformed_roundtrip_1k_seeds():
    for seed in range(700):
        rng = random.Random(seed)
        spec = {"tag": "html", "attrs": {},
                "children": [_gen_spec(rng) for _ in range(rng.randint(1, 3))]}
        html = _serialize(spec, rng)
        root = parse_html(html)
        try:
            assert len(root.children) == 1
            _compare(root.children[0], spec)
            _check_selectors(root, spec, rng)
        except AssertionError:
            raise AssertionError(
                "seed %d diverged on:\n%s" % (seed, html[:2000]))


# ------------------------------------------------- tier 2: malformed input
class _Recorder(HTMLParser):
    """Flat tokenizer model: what chunks/tags the parse DELIVERED, with
    no tree built — the independent baseline the mini-DOM must conserve."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.data: list[str] = []
        self.starts: list[tuple] = []

    def handle_data(self, d):
        if d:
            self.data.append(d)

    def handle_starttag(self, tag, attrs):
        self.starts.append((tag, dict(attrs)))

    def handle_startendtag(self, tag, attrs):
        self.starts.append((tag, dict(attrs)))


def _mutate(html: str, rng: random.Random) -> str:
    for _ in range(rng.randint(1, 3)):
        kind = rng.randrange(5)
        if kind == 0:  # drop a random closing tag
            closes = list(re.finditer(r"</[a-zA-Z0-9]+>", html))
            if closes:
                m = rng.choice(closes)
                html = html[:m.start()] + html[m.end():]
        elif kind == 1:  # stray closing tag at a tag boundary
            cuts = [m.end() for m in re.finditer(">", html)]
            if cuts:
                i = rng.choice(cuts)
                html = html[:i] + "</%s>" % rng.choice(_TAGS) + html[i:]
        elif kind == 2:  # swap two closing tags (mismatched nesting)
            closes = list(re.finditer(r"</[a-zA-Z0-9]+>", html))
            if len(closes) >= 2:
                a, b = sorted(rng.sample(range(len(closes)), 2))
                ma, mb = closes[a], closes[b]
                html = (html[:ma.start()] + mb.group() +
                        html[ma.end():mb.start()] + ma.group() +
                        html[mb.end():])
        elif kind == 3:  # truncate (possibly mid-tag / mid-entity)
            if len(html) > 10:
                html = html[:rng.randrange(10, len(html))]
        else:  # inject a bare/broken entity into text
            cuts = [m.end() for m in re.finditer(">", html)]
            if cuts:
                i = rng.choice(cuts)
                html = html[:i] + rng.choice(
                    ["&", "&x", "&amp", "&#", "&#xzz;", "tail&"]) + html[i:]
    return html


def test_malformed_conserves_text_and_tag_order_500_seeds():
    for seed in range(500):
        rng = random.Random(10_000 + seed)
        spec = {"tag": "html", "attrs": {},
                "children": [_gen_spec(rng) for _ in range(rng.randint(1, 3))]}
        html = _mutate(_serialize(spec, rng), rng)
        rec = _Recorder()
        rec.feed(html)
        rec.close()
        root = parse_html(html)  # must not raise
        assert root.text() == "".join(rec.data), \
            "seed %d lost/reordered text on:\n%s" % (seed, html[:2000])
        assert [(n.tag, n.attrs) for n in root.walk()] == rec.starts, \
            "seed %d tag walk diverged on:\n%s" % (seed, html[:2000])
