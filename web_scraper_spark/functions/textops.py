"""HTML extraction + content analysis as Arrow-vectorized pandas UDFs.

Clean-room re-expression of the reference's libxml2-based extractors:

- title       — XPath //title first node        (extract_title.c:8-51)
- description — //meta[@name='description']     (content_analyzer.c:137-173)
- keywords    — //meta[@name='keywords']        (content_analyzer.c:176-212)
- text        — DOM text nodes, skipping <script>/<style>, space-joined
                (content_analyzer.c:35-95)
- links       — //a/@href                       (extract_hrefs.c:103-147)
- images      — //img src/alt/width/height      (data_store.c:121-148 sink)
- sentiment   — SUBSTRING (not token) occurrence counts of a fixed
                10+10 lexicon; score = (pos-neg)/(pos+neg), 0 when none
                (content_analyzer.c:215-257)

Tag/attribute extraction (title/meta/links/images) delegates to the
recover-mode kernels in ``htmlparse`` — single-/un-quoted attributes, any
attribute order/case/whitespace, comment+script/style-aware — mirroring
libxml2's HTML_PARSE_RECOVER behavior on broken markup. Text/sentiment
stay on the fast regex strip (identical on well- and mal-formed markup for
the substring-count sentiment formula).

The crawl's hot path uses ``analyze_udf``: ONE Arrow transfer of the
content column and ONE parse per document yielding every analysis column
(title, description, keywords, sentiment, meta pairs, links, images) —
the per-column UDFs below are the test/API surface and re-parse per call.

Everything runs inside Arrow batches over pandas Series — no per-row
Python UDFs are registered with Spark.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import htmlparse

POSITIVE_WORDS = [
    "good", "great", "excellent", "amazing", "wonderful",
    "best", "love", "happy", "joy", "success",
]
NEGATIVE_WORDS = [
    "bad", "terrible", "awful", "worst", "hate",
    "sad", "angry", "failure", "poor", "disaster",
]

# reuse htmlparse's kernel, NOT a local copy: htmlparse extends an
# unterminated <script>/<style> to EOF (the 1 MB-truncation case) and a
# weaker duplicate here would leak JS source into the sentiment text
_SCRIPT_STYLE_RE = htmlparse._SCRIPT_STYLE_RE
_TAG_RE = re.compile(r"<[^>]+>")


def _as_text(content: pd.Series) -> pd.Series:
    """binary or string content column → python str Series.

    Decodes PER ELEMENT: sniffing only the first element breaks on a
    batch ordered [None, b'...', ...] — the bytes rows would reach
    pandas .str ops undecoded and raise."""
    return content.map(
        lambda b: b.decode("utf-8", "replace")
        if isinstance(b, (bytes, bytearray))
        else b
    )


def extract_title_series(html: pd.Series) -> pd.Series:
    return htmlparse.parse_document_series(html).map(lambda d: d["title"])


def extract_desc_series(html: pd.Series) -> pd.Series:
    return htmlparse.parse_document_series(html).map(lambda d: d["description"])


def extract_keywords_series(html: pd.Series) -> pd.Series:
    return htmlparse.parse_document_series(html).map(lambda d: d["keywords"])


def extract_meta_series(html: pd.Series) -> pd.Series:
    """Every name=/property= + content pair (P9, extract_meta.c:8-60)."""
    return htmlparse.parse_document_series(html).map(
        lambda d: [{"key": k, "value": v} for k, v in d["meta"]]
    )


def extract_text_series(html: pd.Series) -> pd.Series:
    """Visible text: drop script/style blocks, strip tags, space-join
    (the reference appends a space after every text node)."""
    s = _as_text(html)
    s = s.str.replace(_SCRIPT_STYLE_RE, " ", regex=True)
    s = s.str.replace(_TAG_RE, " ", regex=True)
    return s


def sentiment_series(text: pd.Series) -> pd.Series:
    """Exact reference formula: non-overlapping substring counts."""
    pos = sum(text.str.count(re.escape(w)) for w in POSITIVE_WORDS)
    neg = sum(text.str.count(re.escape(w)) for w in NEGATIVE_WORDS)
    total = pos + neg
    score = (pos - neg) / total.where(total > 0)
    return score.fillna(0.0)


def extract_links_series(html: pd.Series) -> pd.Series:
    return htmlparse.parse_document_series(html).map(lambda d: d["links"])


def extract_images_series(html: pd.Series) -> pd.Series:
    return htmlparse.parse_document_series(html).map(lambda d: d["images"])


# ------------------------------------------------------------------ Spark UDFs
@F.pandas_udf(T.StringType())
def title_udf(html: pd.Series) -> pd.Series:
    return extract_title_series(html)


@F.pandas_udf(T.StringType())
def description_udf(html: pd.Series) -> pd.Series:
    return extract_desc_series(html)


@F.pandas_udf(T.StringType())
def keywords_udf(html: pd.Series) -> pd.Series:
    return extract_keywords_series(html)


@F.pandas_udf(T.DoubleType())
def sentiment_udf(html: pd.Series) -> pd.Series:
    return sentiment_series(extract_text_series(html))


@F.pandas_udf(T.ArrayType(T.StringType()))
def links_udf(html: pd.Series) -> pd.Series:
    return extract_links_series(html)


_IMG_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("src", T.StringType()),
            T.StructField("alt", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )
)


@F.pandas_udf(_IMG_SCHEMA)
def images_udf(html: pd.Series) -> pd.Series:
    return extract_images_series(html)


_META_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("key", T.StringType()),
            T.StructField("value", T.StringType()),
        ]
    )
)


@F.pandas_udf(_META_SCHEMA)
def meta_udf(html: pd.Series) -> pd.Series:
    return extract_meta_series(html)


_ANALYSIS_SCHEMA = T.StructType(
    [
        T.StructField("title", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("keywords", T.StringType()),
        T.StructField("sentiment", T.DoubleType()),
        T.StructField("meta", _META_SCHEMA),
        T.StructField("links", T.ArrayType(T.StringType())),
        T.StructField("images", _IMG_SCHEMA),
    ]
)


def analyze_series(html: pd.Series) -> pd.DataFrame:
    """The P13 composite: ONE parse per document → every analysis column.
    The crawl's extract stage calls this once per batch instead of seven
    per-column UDFs — one Arrow transfer of the (largest) content column
    and one tag scan instead of seven."""
    docs = htmlparse.parse_document_series(html)
    return pd.DataFrame(
        {
            "title": docs.map(lambda d: d["title"]),
            "description": docs.map(lambda d: d["description"]),
            "keywords": docs.map(lambda d: d["keywords"]),
            "sentiment": sentiment_series(extract_text_series(html)),
            "meta": docs.map(lambda d: [{"key": k, "value": v} for k, v in d["meta"]]),
            "links": docs.map(lambda d: d["links"]),
            "images": docs.map(lambda d: d["images"]),
        }
    )


@F.pandas_udf(_ANALYSIS_SCHEMA)
def analyze_udf(html: pd.Series) -> pd.DataFrame:
    return analyze_series(html)


def sentiment_sql_expr(text: Column) -> Column:
    """Sentiment re-expressed as a pure JVM column expression (no Python):
    substring counts via length-difference. Used by the SQL-oracle query
    surface; numerically identical to sentiment_udf on the same text."""
    def count_word(w: str) -> Column:
        return (F.length(text) - F.length(F.replace(text, F.lit(w), F.lit("")))) / len(w)

    pos = sum(count_word(w) for w in POSITIVE_WORDS)
    neg = sum(count_word(w) for w in NEGATIVE_WORDS)
    total = pos + neg
    return F.when(total > 0, (pos - neg) / total).otherwise(F.lit(0.0))
