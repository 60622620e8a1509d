"""HTML -> text extraction over the input table's ``html:binary`` column
(input_hint: pages arrive as (url, warc_ts, html, text, lang); a crawl
pipeline's first step derives ``text`` from ``html``).

Entirely JVM-side (decode + regexp_replace + entity replaces in whole-stage
codegen — a narrow map, zero shuffle, the only plan shape that survives
10^12 rows). A production extractor adds boilerplate removal on top; the
invariant this one must hold — and the north-star requires — is
byte-identical extracted text per url on the synthetic corpus, which wraps
text in plain tags without entities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the five standard entities, ampersand LAST (single-pass unescape: any
# earlier replace must not manufacture new entity spellings for later ones)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&amp;", "&")]


def extract_text(docs: DataFrame, html_col: str = "html",
                 out_col: str = "extracted_text") -> DataFrame:
    """docs + html:binary -> docs + extracted text (tags stripped, the five
    standard entities unescaped)."""
    s = F.regexp_replace(F.decode(F.col(html_col), "UTF-8"), r"<[^>]*>", "")
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    return docs.withColumn(out_col, s)
