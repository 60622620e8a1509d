"""Edge semantics of the round-3 text operators (the oracle harness covers
the bulk corpus; these pin the boundary rows both engines must agree on)."""

from minhashsketch_spark.operators.text import repetition_stats, tfidf_top_terms


def test_repetition_stats_edges(spark):
    docs = spark.createDataFrame(
        [(1, "one"), (2, "a a a a"), (3, "a b a b"), (4, "   ")],
        "doc_id bigint, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(rows) == {1, 2, 3}  # blank doc emits no row (matches oracle)
    # single token: no bigrams, frac 0 (and no ANSI element_at(0) blowup)
    assert rows[1]["n_tokens"] == 1 and rows[1]["dup_bigram_frac"] == 0.0
    # all-repeat doc: 4 tokens 1 distinct; bigrams [a a]x3 -> 1 - 1/3
    assert rows[2]["dup_token_frac"] == 0.75
    assert rows[2]["dup_bigram_frac"] == 0.666667
    # alternating: tokens 4/2 -> 0.5; bigrams [a b, b a, a b] -> 1 - 2/3
    assert rows[3]["dup_token_frac"] == 0.5
    assert rows[3]["dup_bigram_frac"] == 0.333333


def test_tfidf_top_terms_ordering(spark):
    # corpus of 4 docs; "rare" appears in 1 doc, "common" in all
    docs = spark.createDataFrame(
        [(1, "common rare common"), (2, "common x"), (3, "common y"),
         (4, "common z")],
        "doc_id bigint, text string")
    rows = [(r["rank"], r["term"], r["tf"], r["df"])
            for r in tfidf_top_terms(docs, k=2).filter("doc_id = 1").collect()]
    # doc 1 scores: rare = 1*4/1 = 4, common = 2*4/4 = 2 -> rare first
    assert rows == [(1, "rare", 1, 1), (2, "common", 2, 4)]


def test_extract_text_byte_identical_on_real_html(spark):
    """north_star invariant: byte-identical extracted text per url — run
    the extractor against the corpus's genuinely stored html:binary column
    and require equality on every row, plus exact entity handling."""
    from pyspark.sql import functions as F

    from minhashsketch_spark.operators.extract import extract_text
    from minhashsketch_spark.sources.corpus import corpus_dataframe

    docs, _ = corpus_dataframe(spark, n_docs=300, seed=17)
    ext = extract_text(docs, html_col="html")
    n_bad = ext.filter(F.col("extracted_text") != F.col("text")).count()
    assert n_bad == 0

    tricky = spark.createDataFrame(
        [(1, "<p>a &amp;lt; b &quot;q&quot; &#39;s&#39; 5 &lt; 6</p>".encode())],
        "doc_id bigint, html binary")
    out = extract_text(tricky).collect()[0]["extracted_text"]
    # single-pass unescape: &amp;lt; -> &lt; (not <), standard behavior
    assert out == 'a &lt; b "q" \'s\' 5 < 6'


def test_extract_text_numeric_character_references(spark):
    """Numeric refs (decimal, lower/upper hex) across all four UTF-8 byte
    widths decode exactly; invalid code points (0, surrogates, > U+10FFFF,
    8+ digits) stay literal; &amp;#65; keeps single-pass semantics."""
    from minhashsketch_spark.operators.extract import extract_text

    cases = [
        (1, "<p>&#65;&#x41;&#X41;</p>", "AAA"),
        (2, "two-byte: &#233; &#xE9;", "two-byte: é é"),
        (3, "three-byte: &#8217; &#x2019;", "three-byte: ’ ’"),
        (4, "four-byte: &#128512; &#x1F600;", "four-byte: \U0001F600 \U0001F600"),
        (5, "max: &#x10FFFF; min: &#1;", "max: \U0010FFFF min: \x01"),
        (6, "invalid: &#0; &#xD800; &#xDFFF; &#1114112; &#99999999;",
            "invalid: &#0; &#xD800; &#xDFFF; &#1114112; &#99999999;"),
        (7, "guard: &amp;#65; and real &#65;", "guard: &#65; and real A"),
        (8, "adjacent&#65;&#66;refs", "adjacentABrefs"),
        (9, "nbsp a&#xA0;b", "nbsp a\xa0b"),
    ]
    docs = spark.createDataFrame(
        [(i, h.encode()) for i, h, _ in cases], "doc_id bigint, html binary")
    got = {r["doc_id"]: r["extracted_text"]
           for r in extract_text(docs).collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)


def test_simhash_arrow_equals_jvm_spelling(spark):
    """The zero-shuffle Arrow simhash must be BIT-IDENTICAL to the
    SQL-portable JVM spelling (which the DuckDB oracle mirrors), including
    on adversarial whitespace: Spark's trim() strips spaces only, split()
    keeps leading AND trailing empty fields (limit=-1), and Java \\s is
    ASCII-only (U+00A0 is a token character, not a separator)."""
    from minhashsketch_spark.operators.dedup import simhash, simhash_jvm

    fixtures = [
        (1, "plain tokens repeated tokens tokens"),
        (2, "\tleading tab"),            # leading separator -> empty token
        (3, "trailing tab\t"),           # trailing separator -> empty token
        (4, "  only  spaces  between  "),
        (5, "\t\t"),                     # all-separator, trim keeps it
        (6, "nbsp is-not-a-separator"),
        (7, ""),                         # no row
        (8, "    "),                     # trim -> empty, no row
        (9, "one"),
        (10, "mixed\nnewline\rand\fform\x0bfeeds"),
    ]
    docs = spark.createDataFrame(fixtures, "doc_id bigint, text string")
    a = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in simhash_jvm(docs).collect()}
    assert a == b
    assert 7 not in a and 8 not in a

    corpus = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ca = {r["doc_id"]: r["simhash"] for r in simhash(corpus).collect()}
    cb = {r["doc_id"]: r["simhash"] for r in simhash_jvm(corpus).collect()}
    assert ca == cb and len(ca) > 0


def test_extract_text_chained_refs_single_pass(spark):
    """ADVICE r4: '&#38;lt;' must decode to the LITERAL '&lt;' (single
    pass), never chain into '<'; both guard directions plus a real decoded
    ampersand in one fixture."""
    from minhashsketch_spark.operators.extract import extract_text

    html = (b"<p>&#38;lt; &amp;#65; &#38;amp; a&#38;b &#38;</p>")
    docs = spark.createDataFrame([(1, bytearray(html))], "id int, html binary")
    got = extract_text(docs).collect()[0]["extracted_text"]
    assert got == "&lt; &#65; &amp; a&b &"


def test_bpe_token_count_splits_punct_and_contractions(spark):
    """The BPE-ish count must exceed whitespace tokens when punctuation /
    contractions are present, and match hand-counted tokenizations."""
    from minhashsketch_spark.operators.text import token_stats

    rows = [(1, "don't stop, believing!"),
            (2, "plain words only"),
            (3, "v1.2 costs $42")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in token_stats(df).collect()}
    # don | 't | " stop" | "," | " believing" | "!"  (space absorbed into
    # the following word, GPT-2 style)
    assert got[1]["n_bpe_tokens"] == 6 and got[1]["n_tokens"] == 3
    # plain | " words" | " only"
    assert got[2]["n_bpe_tokens"] == 3 and got[2]["n_tokens"] == 3
    # v | 1 | . | 2 | " costs" | " $" | 42
    assert got[3]["n_bpe_tokens"] == 7


def test_compression_ratio_separates_repetition_from_prose(spark):
    from minhashsketch_spark.operators.text import compression_ratio

    rows = [(1, "spam " * 400),                       # hyper-compressible
            (2, "The quick brown fox jumps over the lazy dog near a "
                "riverbank while seventeen pelicans argue about tides."),
            (3, "")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[1]["ratio_x1000"] < 50          # repetition collapses
    assert 300 < got[2]["ratio_x1000"] <= 1100  # prose barely compresses
    assert got[3]["ratio_x1000"] == 1000 and got[3]["n_raw"] == 0
    import zlib

    for i, (_, t) in enumerate(((r[0], r[1]) for r in rows), 1):
        b = rows[i - 1][1].encode()
        assert got[i]["n_compressed"] == len(zlib.compress(b, 6))
