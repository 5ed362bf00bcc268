"""Robust HTML tag/attribute extraction kernels (recover-mode analog).

The reference parses with libxml2 in HTML-recover mode
(extract_hrefs.c:87-95, extract_title.c:14-20, extract_meta.c:14-22), so it
eats real-world broken markup: single-quoted / unquoted / reordered /
oddly-spaced attributes, uppercase tag names, markup inside comments, tags
split across lines. The round-1 kernels required double-quoted,
canonically-ordered attributes; these kernels close that gap with a
two-level scan that stays pure-python-stdlib and Arrow-batch friendly:

1. strip ``<!-- -->`` comments and ``<script>``/``<style>`` bodies (libxml2
   never yields element nodes from either — and JS string literals like
   ``"<a href=..."`` must not produce links);
2. find target tags with a liberal ``<name ...>`` scan (any case, any
   whitespace, attributes in any order);
3. parse each tag's attributes with one attribute grammar: double-quoted,
   single-quoted, or unquoted values; first occurrence of a name wins
   (libxml2 duplicate-attr behavior); names lowercased; values
   entity-unescaped (libxml2 returns unescaped attribute values).

Intentional divergence from a full HTML5 tree builder (documented): no
tag-nesting recovery — extraction here is tag-local (href/src/meta pairs /
title text), which is exactly the slice of the DOM the reference consumes.
"""

from __future__ import annotations

import re
from html import unescape

import pandas as pd

# libxml2 (the reference parser) resolves only entity references with the
# TERMINATING ';' — Python's html.unescape applies HTML5 text rules and
# decodes semicolon-less named refs too, which corrupts URLs ('?a=1&gt=2'
# must stay '&gt=2', not become '>=2'). Decode strictly-terminated refs
# only, via unescape on each full '&...;' match.
_ENTITY_RE = re.compile(r"&(?:#\d+|#[xX][0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]*);")


def unescape_strict(s: str) -> str:
    return _ENTITY_RE.sub(lambda m: unescape(m.group(0)), s)

_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
# a missing closing tag extends the body to EOF (libxml2-recover treats the
# rest of a truncated document as script/style — exactly what the 1 MB
# response cap produces, fetch.py MAX_RESPONSE_SIZE): lazy .*? prefers the
# real closing tag when present, else the \\Z alternative eats to the end.
_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style)\b.*?(?:</\1\s*>|\Z)", re.IGNORECASE | re.DOTALL
)

# one attribute: name [= "dq" | 'sq' | bare]
_ATTR_RE = re.compile(
    r"""([a-zA-Z_][-\w:.]*)\s*(?:=\s*(?:"([^"]*)"|'([^']*)'|([^\s"'>]+)))?""",
    re.DOTALL,
)

_TAG_RES: dict[str, re.Pattern] = {}


def _tag_re(name: str) -> re.Pattern:
    pat = _TAG_RES.get(name)
    if pat is None:
        # (?=[\s/>]) not \b: \b fires at "-", so <a-button> would parse as <a>
        pat = re.compile(rf"<{name}(?=[\s/>])([^>]*)>", re.IGNORECASE | re.DOTALL)
        _TAG_RES[name] = pat
    return pat


_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title\s*>", re.IGNORECASE | re.DOTALL)


def parse_attrs(raw: str) -> dict[str, str | None]:
    """Attribute blob → {lowercase name: unescaped value or None (bare)}.
    First occurrence of a name wins."""
    out: dict[str, str | None] = {}
    for m in _ATTR_RE.finditer(raw):
        name = m.group(1).lower()
        if name in out:
            continue
        if m.group(2) is not None:
            val = m.group(2)
        elif m.group(3) is not None:
            val = m.group(3)
        elif m.group(4) is not None:
            val = m.group(4)
        else:
            out[name] = None
            continue
        out[name] = unescape_strict(val)
    return out


def _clean(html: str) -> str:
    return _SCRIPT_STYLE_RE.sub(" ", _COMMENT_RE.sub(" ", html))


def iter_tag_attrs(html: str, name: str):
    """Yield one attr dict per ``<name ...>`` occurrence, in document
    order, over comment/script/style-stripped markup."""
    for m in _tag_re(name).finditer(_clean(html)):
        yield parse_attrs(m.group(1))


def parse_document(html: str | None) -> dict:
    """One pass over a document → everything the analysis stage needs.

    Returns {title, meta: [(key, value)...], description, keywords,
    links: [href...], images: [{src, alt, width, height}...], base}.
    meta keys come from ``name=`` or, failing that, ``property=``
    (OpenGraph) — every pair the reference's extract_meta.c:8-60 emits.
    """
    if not html:
        return {
            "title": None, "meta": [], "description": None, "keywords": None,
            "links": [], "images": [], "base": None,
        }
    cleaned = _clean(html)

    tm = _TITLE_RE.search(cleaned)
    # entity-resolve the text node, as libxml2 does (strict form)
    title = unescape_strict(tm.group(1)) if tm else None

    meta: list[tuple[str, str]] = []
    description = keywords = None
    for attrs in (parse_attrs(m.group(1)) for m in _tag_re("meta").finditer(cleaned)):
        key = attrs.get("name") or attrs.get("property")
        content = attrs.get("content")
        if key is None or content is None:
            continue
        meta.append((key, content))
        if description is None and key == "description":
            description = content
        if keywords is None and key == "keywords":
            keywords = content

    links = []
    for attrs in (parse_attrs(m.group(1)) for m in _tag_re("a").finditer(cleaned)):
        href = attrs.get("href")
        if href is not None:
            links.append(href)

    images = []
    for attrs in (parse_attrs(m.group(1)) for m in _tag_re("img").finditer(cleaned)):
        src = attrs.get("src")
        if src is None:
            continue

        def _as_int(v):
            try:
                return int(v) if v is not None and v.isdigit() else None
            except AttributeError:
                return None

        images.append(
            {
                "src": src,
                "alt": attrs.get("alt") or None,
                "width": _as_int(attrs.get("width")),
                "height": _as_int(attrs.get("height")),
            }
        )

    base = None
    for attrs in (parse_attrs(m.group(1)) for m in _tag_re("base").finditer(cleaned)):
        if attrs.get("href") is not None:
            base = attrs["href"]
            break

    return {
        "title": title, "meta": meta, "description": description,
        "keywords": keywords, "links": links, "images": images, "base": base,
    }


def parse_document_series(html: pd.Series) -> pd.Series:
    """Vectorized wrapper: Series[str|bytes|None] → Series[dict]."""

    def one(v):
        if isinstance(v, (bytes, bytearray)):
            v = v.decode("utf-8", "replace")
        return parse_document(v)

    return html.map(one)
