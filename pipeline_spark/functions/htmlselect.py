"""Minimal CSS-selector engine over stdlib ``html.parser``.

Supports the selector subset the reference's scrape function is used
with (reference: select/Scrape.java delegates to jsoup):

  tag            ``div``
  id             ``#main``
  class          ``.title``
  attribute      ``[href]``, ``[rel=nofollow]``
  compound       ``a.external[href]``
  descendant     ``div p`` (any depth)
  child          ``ul > li``
  groups         ``h1, h2``

Pure Python, no dependencies — runs inside a pandas UDF batch.  Not a
full Selectors-4 engine; unsupported syntax raises at compile time so a
config error fails the plan, not silently matches nothing.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html.parser import HTMLParser

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}


@dataclass
class Node:
    tag: str
    attrs: dict[str, str]
    parent: "Node | None" = None
    children: list["Node"] = field(default_factory=list)
    text_parts: list[str] = field(default_factory=list)

    def text(self) -> str:
        out: list[str] = []

        def walk(n: Node) -> None:
            out.extend(n.text_parts)
            for c in n.children:
                walk(c)

        walk(self)
        return re.sub(r"\s+", " ", " ".join(out)).strip()

    def iter(self):
        yield self
        for c in self.children:
            yield from c.iter()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs}, parent=self.stack[-1])
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v or "") for k, v in attrs}, parent=self.stack[-1])
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if data.strip():
            self.stack[-1].text_parts.append(data)


def parse_html(text: str) -> Node:
    b = _TreeBuilder()
    b.feed(text or "")
    return b.root


_SIMPLE_RE = re.compile(
    r"^([a-zA-Z][a-zA-Z0-9-]*|\*)?"
    r"((?:[#.][\w-]+|\[[\w-]+(?:=[^\]]*)?\])*)$"
)
_PART_RE = re.compile(r"([#.][\w-]+|\[[\w-]+(?:=[^\]]*)?\])")


def _compile_simple(sel: str):
    m = _SIMPLE_RE.match(sel)
    if not m or (not m.group(1) and not m.group(2)):
        raise ValueError(f"scrape: unsupported CSS selector component '{sel}'")
    tag = (m.group(1) or "*").lower()
    checks = []
    for part in _PART_RE.findall(m.group(2) or ""):
        if part.startswith("#"):
            checks.append(("id", part[1:]))
        elif part.startswith("."):
            checks.append(("class", part[1:]))
        else:
            inner = part[1:-1]
            k, eq, v = inner.partition("=")
            checks.append(("attr=" if eq else "attr", (k, v.strip("'\""))))

    def match(n: Node) -> bool:
        if tag != "*" and n.tag != tag:
            return False
        for kind, want in checks:
            if kind == "id" and n.attrs.get("id") != want:
                return False
            if kind == "class" and want not in (n.attrs.get("class") or "").split():
                return False
            if kind == "attr" and want[0] not in n.attrs:
                return False
            if kind == "attr=" and n.attrs.get(want[0]) != want[1]:
                return False
        return True

    return match


def _compile_path(selector: str):
    """One comma-group: sequence of (combinator, simple-matcher)."""
    toks = re.split(r"\s*(>)\s*|\s+", selector.strip())
    steps, comb = [], " "
    for t in toks:
        if t is None or t == "":
            continue
        if t == ">":
            comb = ">"
            continue
        steps.append((comb, _compile_simple(t)))
        comb = " "
    if not steps:
        raise ValueError(f"scrape: empty CSS selector '{selector}'")
    return steps


def select(root: Node, selector: str) -> list[Node]:
    """All nodes matching the selector (document order, deduped)."""
    results: list[Node] = []
    seen: set[int] = set()
    for group in selector.split(","):
        steps = _compile_path(group)
        current = [root]
        for comb, match in steps:
            nxt: list[Node] = []
            for base in current:
                if comb == ">":
                    cand = base.children
                else:
                    cand = [n for n in base.iter() if n is not base]
                for n in cand:
                    if match(n):
                        nxt.append(n)
            # dedup per step, keep order
            dedup, s = [], set()
            for n in nxt:
                if id(n) not in s:
                    s.add(id(n))
                    dedup.append(n)
            current = dedup
        for n in current:
            if id(n) not in seen:
                seen.add(id(n))
                results.append(n)
    return results


def select_text(html: str, selector: str, *, attr: str | None = None, all_matches: bool = False):
    """Text (or an attribute) of the selector's match(es)."""
    nodes = select(parse_html(html), selector)
    vals = [n.attrs.get(attr, "") if attr else n.text() for n in nodes]
    if all_matches:
        return vals
    return vals[0] if vals else None
