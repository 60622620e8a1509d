"""HTML -> text extraction over the input table's ``html:binary`` column
(input_hint: pages arrive as (url, warc_ts, html, text, lang); a crawl
pipeline's first step derives ``text`` from ``html``).

Entirely JVM-side (decode + regexp_replace + split/transform in whole-stage
codegen — a narrow map, zero shuffle, the only plan shape that survives
10^12 rows). A production extractor adds boilerplate removal on top; the
invariant this one must hold — and the north-star requires — is
byte-identical extracted text per url on the synthetic corpus.

Entity handling: the five named entities plus NUMERIC character references
(``&#8217;`` / ``&#x2019;``), which real crawl HTML hits on page one. A
computed replacement can't be expressed with regexp_replace alone, so the
refs are bracketed with control-char markers, split, and decoded per
element with a pure-Column UTF-8 byte builder — still one narrow
projection. Code points are decoded for 1 <= cp <= 0x10FFFF excluding
surrogates; anything else (overflow digits, cp 0) is left literally, and
named entities are processed AFTER numeric ones with ``&amp;`` last, so
``&amp;#65;`` correctly yields the literal ``&#65;``, and a numeric ref
decoding to ``&`` (``&#38;``) is emitted as a marker and restored only
after the named pass, so ``&#38;lt;`` yields the literal ``&lt;`` —
single-pass semantics in both directions. Raw \\x01/\\x02/\\x03 bytes in
the input would confuse the markers; all are invalid in HTML.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# the five standard entities, ampersand LAST (single-pass unescape: any
# earlier replace must not manufacture new entity spellings for later ones)
_ENTITIES = [("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
             ("&#39;", "'"), ("&amp;", "&")]

_M1, _M2, _M3 = "\x01", "\x02", "\x03"
_NUMREF = r"&#([0-9]{1,7}|[xX][0-9a-fA-F]{1,6});"


def _utf8_chr(cp):
    """Column expr: code point -> its UTF-8 character, built as a hex byte
    string and decoded (Spark's chr() truncates to one byte — useless past
    ASCII). Pure arithmetic + when-cases, stays in codegen."""
    def idiv(a, d):
        return F.floor(a / F.lit(d)).cast("bigint")

    def byte(b):
        return F.lpad(F.hex(b.cast("bigint")), 2, "0")

    one = byte(cp)
    two = F.concat(byte(idiv(cp, 64) + 192), byte(cp % 64 + 128))
    three = F.concat(byte(idiv(cp, 4096) + 224), byte(idiv(cp, 64) % 64 + 128),
                     byte(cp % 64 + 128))
    four = F.concat(byte(idiv(cp, 262144) + 240), byte(idiv(cp, 4096) % 64 + 128),
                    byte(idiv(cp, 64) % 64 + 128), byte(cp % 64 + 128))
    hexstr = (F.when(cp < 0x80, one)
              .when(cp < 0x800, two)
              .when(cp < 0x10000, three)
              .otherwise(four))
    return F.decode(F.unhex(hexstr), "UTF-8")


def _decode_numeric_refs(s):
    """Replace every numeric character reference in ``s`` with its
    character: bracket matches with markers, split, decode per element."""
    marked = F.regexp_replace(s, _NUMREF, _M1 + "$0" + _M2)

    def decode_elem(e):
        ent = F.substring_index(e, _M2, 1)            # "&#x2019;" / "&#65;"
        rest = F.substring(e, F.length(ent) + 2, F.length(e))
        body = F.substring(ent, 3, F.length(ent) - 3)  # between "&#" and ";"
        is_hex = F.substring(body, 1, 1).isin("x", "X")
        digits = F.when(is_hex, F.substring(body, 2, F.length(body))).otherwise(body)
        cp = F.when(is_hex, F.conv(digits, 16, 10)).otherwise(digits).cast("bigint")
        valid = (cp >= 1) & (cp <= 0x10FFFF) & ~((cp >= 0xD800) & (cp <= 0xDFFF))
            # a decoded '&' (cp 38) must NOT be visible to the later named-
        # entity pass ('&#38;lt;' is literal '&lt;', not '<' — single-pass
        # semantics, ADVICE r4); emit a marker and restore it after the
        # named replaces (extract_text)
        decoded = F.when(cp == 38, F.lit(_M3)).otherwise(_utf8_chr(cp))
        return F.when(~e.contains(_M2), e).otherwise(
            F.concat(F.when(valid, decoded).otherwise(ent), rest))

    return F.array_join(F.transform(F.split(marked, _M1), decode_elem), "")


def extract_text(docs: DataFrame, html_col: str = "html",
                 out_col: str = "extracted_text") -> DataFrame:
    """docs + html:binary -> docs + extracted text (tags stripped, numeric
    character references and the five standard named entities unescaped)."""
    s = F.regexp_replace(F.decode(F.col(html_col), "UTF-8"), r"<[^>]*>", "")
    s = _decode_numeric_refs(s)
    for ent, ch in _ENTITIES:
        s = F.replace(s, F.lit(ent), F.lit(ch))
    # restore numeric-decoded ampersands AFTER the named pass (see
    # _decode_numeric_refs: keeps '&#38;lt;' a literal '&lt;')
    s = F.replace(s, F.lit(_M3), F.lit("&"))
    return docs.withColumn(out_col, s)
