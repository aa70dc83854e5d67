"""Main-content extraction from HTML (readability-style, stdlib only).

Web-crawled corpora are HTML; the training-data signal is the article
body, not the nav/footer/ad chrome around it.  This implements the
density-heuristic family (Readability / jusText / trafilatura are the
public references) over the same stdlib DOM the scrape selector engine
uses (``functions/htmlselect.py``):

  1. drop non-content subtrees by TAG (script/style/nav/footer/aside…)
     and by boilerplate id/class patterns (sidebar, cookie banner, share
     buttons…),
  2. score candidate containers (<article>/<main>, else <div>/<section>/
     <td>) by the text mass of their "good" paragraphs — long enough and
     not link-dominated (link density = anchor-text chars / total chars),
  3. emit the winning container's block-level text with paragraph breaks
     preserved, plus the document title and simple diagnostics.

Deterministic by construction (pure functions of the input bytes), so
the ``html_extract`` driver oracle can rebuild the expected text in SQL.
Reference analogue: none in mercari/pipeline (its scrape function is
selector-based); this is part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

import re

from pipeline_spark.functions.htmlselect import Node, parse_html

# subtrees that are never article content
_DROP_TAGS = {
    "script", "style", "noscript", "svg", "form", "template", "button",
    "select", "option", "iframe", "nav", "header", "footer", "aside",
    "figcaption",
}

# id/class fragments that mark chrome even on neutral tags
_BOILER_RE = re.compile(
    r"(?:^|[-_ ])(?:comment|sidebar|footer|header|nav|menu|share|social"
    r"|advert|promo|cookie|banner|related|breadcrumb|popup|masthead"
    r"|pagination|widget)s?(?:$|[-_ ])",
    re.I,
)

_BLOCK_TAGS = {
    "p", "div", "section", "article", "main", "li", "td", "pre",
    "blockquote", "h1", "h2", "h3", "h4", "h5", "h6", "ul", "ol",
    "table", "tr", "br",
}

_CANDIDATE_TAGS = ("article", "main", "div", "section", "td")


def _is_boiler(node: Node) -> bool:
    if node.tag in _DROP_TAGS:
        return True
    marker = f"{node.attrs.get('id', '')} {node.attrs.get('class', '')}"
    return bool(marker.strip()) and bool(_BOILER_RE.search(marker))


def _prune(node: Node) -> None:
    node.children = [c for c in node.children if not _is_boiler(c)]
    for c in node.children:
        _prune(c)


class _Measure:
    """Per-document memo of node text / link-text lengths.

    Scoring probes the same nodes from every ancestor candidate; without
    the memo each probe re-walks and re-joins the subtree strings, which
    goes super-linear on deep pages — and this runs per row inside a
    Spark mapInPandas hot path."""

    def __init__(self) -> None:
        self._text: dict[int, str] = {}
        self._link_len: dict[int, int] = {}

    def text(self, node: Node) -> str:
        t = self._text.get(id(node))
        if t is None:
            t = node.text()
            self._text[id(node)] = t
        return t

    def link_text_len(self, node: Node) -> int:
        v = self._link_len.get(id(node))
        if v is None:
            v = sum(len(self.text(n)) for n in node.iter() if n.tag == "a")
            self._link_len[id(node)] = v
        return v

    def link_density(self, node: Node) -> float:
        total = len(self.text(node))
        return (self.link_text_len(node) / total) if total else 0.0


def link_density(node: Node) -> float:
    return _Measure().link_density(node)


def _good_paragraphs(
    container: Node, min_chars: int, max_link_density: float,
    m: _Measure | None = None,
) -> list[Node]:
    m = m or _Measure()
    out = []
    for n in container.iter():
        if n.tag in ("p", "pre", "blockquote") or (
            n.tag == "li" and len(m.text(n)) >= 2 * min_chars
        ):
            t = m.text(n)
            if len(t) >= min_chars and m.link_density(n) <= max_link_density:
                out.append(n)
    return out


def _block_text(node: Node) -> str:
    """Text with block-level boundaries rendered as newlines."""
    parts: list[str] = []

    def walk(n: Node) -> None:
        if n.tag in _DROP_TAGS:
            return
        block = n.tag in _BLOCK_TAGS
        if block and parts and parts[-1] != "\n":
            parts.append("\n")
        for piece in n.text_parts:
            parts.append(piece)
        for c in n.children:
            walk(c)
        if block and parts and parts[-1] != "\n":
            parts.append("\n")

    walk(node)
    text = "".join(parts)
    # collapse intra-line whitespace, then blank lines
    lines = [re.sub(r"\s+", " ", ln).strip() for ln in text.split("\n")]
    return "\n".join(ln for ln in lines if ln)


def extract_main_text(
    html: str,
    *,
    min_paragraph_chars: int = 25,
    max_link_density: float = 0.5,
) -> dict:
    """Extract {title, text, n_paragraphs, link_density} from raw HTML.

    ``text`` is the block-structured content of the best candidate
    container; empty string when nothing qualifies (pure-chrome pages)."""
    root = parse_html(html)
    title = ""
    for n in root.iter():
        if n.tag == "title":
            title = n.text()
            break
    if not title:
        for n in root.iter():
            if n.tag == "h1":
                title = n.text()
                break

    _prune(root)

    # one DOM traversal collecting candidates; one memo for all probes
    m = _Measure()
    by_tag: dict[str, list[Node]] = {t: [] for t in _CANDIDATE_TAGS}
    for n in root.iter():
        if n.tag in by_tag:
            by_tag[n.tag].append(n)

    # candidate scoring: sum of good-paragraph chars per container
    best: Node | None = None
    best_score = 0
    for tag in _CANDIDATE_TAGS:
        for n in by_tag[tag]:
            score = sum(
                len(m.text(p))
                for p in _good_paragraphs(
                    n, min_paragraph_chars, max_link_density, m
                )
            )
            if score > best_score:
                best, best_score = n, score
        if best is not None and tag in ("article", "main"):
            break  # semantic containers win outright when they have content

    if best is None:
        # fall back to the whole (pruned) document if it has any good text
        score = sum(
            len(m.text(p))
            for p in _good_paragraphs(
                root, min_paragraph_chars, max_link_density, m
            )
        )
        best = root if score > 0 else None

    if best is None:
        return {
            "title": title, "text": "", "n_paragraphs": 0,
            "link_density": None,
        }
    paragraphs = _good_paragraphs(best, min_paragraph_chars, max_link_density, m)
    return {
        "title": title,
        "text": _block_text(best),
        "n_paragraphs": len(paragraphs),
        "link_density": round(m.link_density(best), 6),
    }
