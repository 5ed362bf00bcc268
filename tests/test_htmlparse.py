"""Messy-markup extraction parity: the robust kernels must eat the broken
HTML shapes real crawls hit (reference analog: libxml2 HTML-recover mode,
extract_hrefs.c:87-95) while agreeing with the strict kernels on
well-formed markup."""

import pandas as pd

from web_scraper_spark.functions import htmlparse, textops

MESSY = """
<HTML><head>
  <TITLE class=big>  Messy &amp; Proud </TITLE>
  <meta content="rev order desc" name="description">
  <meta name='keywords' content='a,b , c'>
  <meta property="og:title" content="OG Title">
  <meta property='og:image' content=http://img.example/x.png>
  <meta name="empty">
  <base target=_blank href='http://base.example/dir/'>
</head><body>
  <!-- <a href="http://commented.example/">nope</a> -->
  <script>var s = "<a href='http://js.example/'>";</script>
  <style>a { background: url("http://css.example/x") }</style>
  <a
     class="x"
     HREF='http://single.example/q?a=1'>one</a>
  <a href=http://unquoted.example/path>two</a>
  <a data-href="http://decoy.example/" href="http://double.example/">three</a>
  <a href="http://dup.example/first" href="http://dup.example/second">dup</a>
  <a name="anchor-only">no link</a>
  <IMG alt='pic one' src=http://img.example/a.png width=40 height="30">
  <img src="http://img.example/b.png" height=bogus>
</body></html>
"""


def test_parse_document_messy():
    d = htmlparse.parse_document(MESSY)
    # entities resolved in the text node, as libxml2 does (strict ';' form)
    assert d["title"] == "  Messy & Proud "
    assert d["description"] == "rev order desc"
    assert d["keywords"] == "a,b , c"
    assert ("og:title", "OG Title") in d["meta"]
    assert ("og:image", "http://img.example/x.png") in d["meta"]
    assert all(k != "empty" for k, _ in d["meta"])  # no content= → skipped
    assert d["base"] == "http://base.example/dir/"
    assert d["links"] == [
        "http://single.example/q?a=1",
        "http://unquoted.example/path",
        "http://double.example/",
        "http://dup.example/first",  # first occurrence of href wins
    ]
    assert d["images"] == [
        {"src": "http://img.example/a.png", "alt": "pic one", "width": 40, "height": 30},
        {"src": "http://img.example/b.png", "alt": None, "width": None, "height": None},
    ]


def test_entity_unescape_in_attrs():
    d = htmlparse.parse_document('<a href="http://e.example/?a=1&amp;b=2">x</a>')
    assert d["links"] == ["http://e.example/?a=1&b=2"]


def test_empty_and_none():
    assert htmlparse.parse_document(None)["links"] == []
    assert htmlparse.parse_document("")["title"] is None


def test_wellformed_agrees_with_strict_kernels():
    """On the synthetic corpus's well-formed shape, robust == strict."""
    html = (
        '<html><head><title>T1</title>'
        '<meta name="description" content="D1">'
        '<meta name="keywords" content="k1,k2">'
        '</head><body>'
        '<a href="http://h.example/a">A</a><a href="http://h.example/b">B</a>'
        '<img src="http://h.example/i.png" alt="i" width="10" height="20">'
        "</body></html>"
    )
    s = pd.Series([html])
    d = htmlparse.parse_document(html)
    assert d["title"] == textops.extract_title_series(s).iloc[0]
    assert d["description"] == textops.extract_desc_series(s).iloc[0]
    assert d["keywords"] == textops.extract_keywords_series(s).iloc[0]
    assert d["links"] == textops.extract_links_series(s).iloc[0]
    assert d["images"] == textops.extract_images_series(s).iloc[0]


def test_series_wrapper_handles_bytes():
    out = htmlparse.parse_document_series(
        pd.Series([b"<a href='http://b.example/'>x</a>", None])
    )
    assert out.iloc[0]["links"] == ["http://b.example/"]
    assert out.iloc[1]["links"] == []


def test_property_random_attr_order_and_quoting():
    """Property: for any attribute ordering / quoting style / whitespace
    mix, the kernels recover exactly the attrs we embedded."""
    import random

    rng = random.Random(1234)
    for trial in range(200):
        href = f"http://p{trial}.example/x{rng.randint(0, 999)}"
        alt = f"alt {trial}" if rng.random() < 0.5 else None
        w = rng.randint(1, 500)
        extra = [("data-x", f"v{trial}"), ("class", "a b"), ("hidden", None)]
        rng.shuffle(extra)

        def render(name, val):
            if val is None:
                return name
            q = rng.choice(['"', "'", ""])
            if q == "" and (" " in val or ">" in val):
                q = '"'
            ws = rng.choice(["=", " = ", "= ", " ="])
            return f"{name}{ws}{q}{val}{q}"

        attrs = [("href", href)] + extra + ([("alt", alt)] if alt else [])
        rng.shuffle(attrs)
        sep = rng.choice([" ", "\n  ", "\t"])
        tag = "<a" + sep + sep.join(render(n, v) for n, v in attrs) + ">"
        html = f"<html><body>{tag}x</a><img{sep}width={w}{sep}src='{href}.png'></body></html>"
        d = htmlparse.parse_document(html)
        assert d["links"] == [href], (trial, tag, d["links"])
        assert d["images"] == [
            {"src": href + ".png", "alt": None, "width": w, "height": None}
        ], (trial, d["images"])


class TestUnterminatedScriptStyle:
    def test_truncated_script_extends_to_eof(self):
        """A page cut mid-<script> (exactly what the 1 MB response cap
        produces) must treat the rest of the document as script body —
        libxml2-recover behavior — so JS string literals like
        '<a href=...' never become links."""
        from web_scraper_spark.functions.htmlparse import parse_document

        html = (
            '<html><head><title>ok</title></head><body>'
            '<a href="/real">r</a>'
            '<script>var s = "<a href=\'/fake1\'>x</a>"; '
            'document.write("<a href=/fake2>");'  # no closing </script>
        )
        d = parse_document(html)
        assert d["links"] == ["/real"]
        assert d["title"] == "ok"

    def test_terminated_script_still_bounded(self):
        from web_scraper_spark.functions.htmlparse import parse_document

        html = (
            '<body><script>var s = "<a href=/fake>";</script>'
            '<a href="/after">a</a></body>'
        )
        assert parse_document(html)["links"] == ["/after"]

    def test_unterminated_style_eats_tail(self):
        from web_scraper_spark.functions.htmlparse import parse_document

        html = '<body><a href="/k">k</a><style>.x { content: "<a href=/f>"; }'
        assert parse_document(html)["links"] == ["/k"]


def test_strict_entities_and_custom_elements():
    """libxml2 parity: entity refs decode ONLY with the terminating ';'
    (semicolon-less '&gt' in a query string must survive verbatim), and a
    hyphenated custom element (<a-button>) is NOT the <a> tag."""
    d = htmlparse.parse_document(
        '<a-button href="/fake">t</a-button>'
        '<a href="/x?a=1&gt=2&amp;b=3">y</a>'
        '<base-layout href="/nope"><title>A &#38; B &copy</title>'
    )
    assert d["links"] == ["/x?a=1&gt=2&b=3"]
    assert d["title"] == "A & B &copy"
