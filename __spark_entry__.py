"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship near-duplicate pipeline on sf0.001.
``queries()``    — one entry per implemented operator (SURVEY.md §2 + the
                   training-data operators); each takes (spark, sf_dir).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL where expressible; omitted for
                   sketch/CC/approx stages (driver records rows-only).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from minhashsketch_spark.config import PipelineConfig
from minhashsketch_spark.operators import dedup as D
from minhashsketch_spark.operators import multimodal as MM
from minhashsketch_spark.operators import similarity as S
from minhashsketch_spark.operators import text as TX
from minhashsketch_spark.operators.lsh import candidate_pairs
from minhashsketch_spark.operators.signatures import compute_signatures
from minhashsketch_spark.operators.verify import verified_pairs
from minhashsketch_spark.pipeline import run_pipeline

CFG = PipelineConfig(k=9, m=1, t=128, bands=32, rows=4, seed=42, threshold=0.7)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _docs_as_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with the pipeline's (url, text) shape: doc_id -> url string."""
    return _docs(spark, sf_dir).select(
        F.format_string("doc-%08d", F.col("doc_id")).alias("url"), "text")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full MinHash+LSH near-dup pipeline on sf0.001 documents."""
    docs = _docs_as_urls(spark, "/root/testdata/sf0.001")
    result = run_pipeline(spark, docs, CFG)
    return result["verified"].orderBy("url_a", "url_b")


# ---------------------------------------------------------------- queries

def _q_doc_shingle_counts(spark, sf_dir):
    sigs = compute_signatures(_docs_as_urls(spark, sf_dir), CFG)
    return sigs.select(
        F.substring("url", 5, 8).cast("bigint").alias("doc_id"),
        "n_shingles")


def _q_minhash_candidates(spark, sf_dir):
    sigs = compute_signatures(_docs_as_urls(spark, sf_dir), CFG)
    return candidate_pairs(sigs, CFG)


def _q_near_dup_pairs(spark, sf_dir):
    docs = _docs_as_urls(spark, sf_dir)
    sigs = compute_signatures(docs, CFG)
    pairs = candidate_pairs(sigs, CFG)
    return verified_pairs(pairs, sigs, docs, CFG)


def _q_near_dup_clusters(spark, sf_dir):
    docs = _docs_as_urls(spark, sf_dir)
    res = run_pipeline(spark, docs, CFG)
    return res["clusters"]


def _q_exact_dedup(spark, sf_dir):
    return D.exact_dedup(_docs(spark, sf_dir)).orderBy("fingerprint")


def _q_token_stats(spark, sf_dir):
    return TX.token_stats(_docs(spark, sf_dir))


def _q_quality_score(spark, sf_dir):
    return TX.quality_score(_docs(spark, sf_dir))


def _q_language_id(spark, sf_dir):
    return TX.language_id(_docs(spark, sf_dir))


def _q_md5_fingerprint(spark, sf_dir):
    return TX.md5_fingerprint(_docs(spark, sf_dir))


def _q_winnow_fingerprint(spark, sf_dir):
    # exploded (doc_id, fp) rows: array columns break the driver's
    # canonicalizer, and the flat shape is DuckDB-oracle-expressible
    fp = TX.winnowing_fingerprint(_docs(spark, sf_dir))
    return fp.select("doc_id", F.explode("fingerprint").alias("fp"))


def _q_ngram_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), min_jaccard=0.02)


def _q_simhash_pairs(spark, sf_dir):
    # max_hamming=3: the 4x15-bit pigeonhole blocking is exact at radius 3,
    # so the result equals the oracle's brute-force hamming scan
    sim = D.simhash(_docs(spark, sf_dir))
    return D.simhash_near_pairs(sim, max_hamming=3)


def _q_embedding_topk(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return S.cosine_topk(emb, queries, k=10)


def _q_embedding_topk_lsh(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    return S.lsh_cosine_topk(emb, queries, k=10)


def _q_embedding_near_dup(spark, sf_dir):
    return S.embedding_near_dup_pairs(_emb(spark, sf_dir), threshold=0.5)


def _q_substring_dups(spark, sf_dir):
    from minhashsketch_spark.operators.substring import substring_dup_pairs

    # testdata documents share a tiny vocabulary, so fingerprint
    # collisions are far denser than real webtext: keep the join selective
    return substring_dup_pairs(_docs_as_urls(spark, sf_dir), k=8, w=16,
                               min_shared=4, min_lcs=64, max_df=16)


def _q_corpus_sketch(spark, sf_dir):
    from minhashsketch_spark.operators.corpus_sketch import corpus_sketch_df
    from minhashsketch_spark.config import PipelineConfig

    cfg = PipelineConfig(k=9, m=4, t=16, bands=4, rows=4, seed=42, threshold=0.7)
    return corpus_sketch_df(_docs(spark, sf_dir), cfg)


def _q_multimodal_features(spark, sf_dir):
    media = MM.media_from_documents(_docs(spark, sf_dir))
    feats = MM.extract_features(media, fake=True)
    return feats.select("media_id", "kind", "n_bytes",
                        F.round(F.element_at("feature", 1), 5).alias("f0"))


def _q_exact_dedup_corpus(spark, sf_dir):
    from minhashsketch_spark.operators.dedup_corpus import exact_dedup_corpus

    return exact_dedup_corpus(_docs(spark, sf_dir)).select("doc_id", "n_chars")


def _q_near_dedup_corpus(spark, sf_dir):
    from minhashsketch_spark.operators.dedup_corpus import near_dedup_corpus

    docs = _docs_as_urls(spark, sf_dir)
    res = run_pipeline(spark, docs, CFG)
    return near_dedup_corpus(docs, res["clusters"]).select("url")


def _q_tpch_q1(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity") * 100).cast("bigint").alias("sum_qty_c"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
            .cast("bigint").alias("revenue_c"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def _q_revenue_by_nation(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice") * 100).cast("bigint").alias("revenue_c"))
        .orderBy("n_name")
    )


def _q_top_events_per_user(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        ev.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("user_id", "rank", "event_id", "event_type", "value")
    )


def _q_event_type_stats(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").alias("n_events"),
             F.countDistinct("user_id").alias("n_users"),
             F.round(F.sum("value") * 100).cast("bigint").alias("value_c"))
        .orderBy("event_type")
    )


def _q_tpch_q3_like(spark, sf_dir):
    """3-way join + filter + agg + top-k (scan->SMJ/broadcast->window)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(F.col("c_mktsegment") == "BUILDING")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) * 100)
             .cast("bigint").alias("revenue_c"),
             F.count("*").alias("n_lines"))
        .orderBy(F.desc("revenue_c"), F.asc("l_orderkey"))
        .limit(10)
    )


def _q_parts_by_brand(spark, sf_dir):
    """agg + HAVING + avg over a dimension scan."""
    p = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        p.groupBy("p_brand")
        .agg(F.count("*").alias("n_parts"),
             F.round(F.avg("p_retailprice"), 2).alias("avg_price"),
             F.max("p_size").alias("max_size"))
        .filter(F.col("n_parts") >= 5)
        .orderBy("p_brand")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # MinHash near-dup pipeline (SURVEY.md §2.1 O1-O17 re-expressed)
        "doc_shingle_counts": _q_doc_shingle_counts,
        "minhash_candidates": _q_minhash_candidates,
        "near_dup_pairs": _q_near_dup_pairs,
        "near_dup_clusters": _q_near_dup_clusters,
        # training-data dedup family
        "exact_dedup": _q_exact_dedup,
        "ngram_jaccard": _q_ngram_jaccard,
        "simhash_pairs": _q_simhash_pairs,
        # text analysis
        "token_stats": _q_token_stats,
        "quality_score": _q_quality_score,
        "language_id": _q_language_id,
        "md5_fingerprint": _q_md5_fingerprint,
        "winnow_fingerprint": _q_winnow_fingerprint,
        # similarity search
        "embedding_topk": _q_embedding_topk,
        "embedding_topk_lsh": _q_embedding_topk_lsh,
        "embedding_near_dup": _q_embedding_near_dup,
        # multimodal plumbing
        "multimodal_features": _q_multimodal_features,
        "corpus_sketch": _q_corpus_sketch,
        "substring_dups": _q_substring_dups,
        "exact_dedup_corpus": _q_exact_dedup_corpus,
        "near_dedup_corpus": _q_near_dedup_corpus,
        # relational coverage (scan/filter/agg/join/window — §2.2)
        "tpch_q1": _q_tpch_q1,
        "revenue_by_nation": _q_revenue_by_nation,
        "top_events_per_user": _q_top_events_per_user,
        "event_type_stats": _q_event_type_stats,
        "tpch_q3_like": _q_tpch_q3_like,
        "parts_by_brand": _q_parts_by_brand,
    }


def _winnow_oracle(k: int = 8, w: int = 16) -> str:
    """DuckDB replica of operators/text.py::winnowing_fingerprint.

    Byte-level access via hex(encode(text)) (2 hex chars per byte); the
    polynomial rolling hash (mod 2**64, splitmix64 multiplier) is done in
    HUGEINT with an explicit mod; signed two's-complement view at the end
    matches Spark's bigint storage.
    """
    m_const = 0x9E3779B97F4A7C15
    pows = [pow(m_const, k - 1 - j, 2**64) for j in range(k)]
    terms = " + ".join(
        f"((('0x' || substr(h, 2*(i+{j})-1, 2))::BIGINT)::HUGEINT * {pows[j]}::HUGEINT)"
        for j in range(k))
    return f"""
        WITH hx AS (
          SELECT doc_id, hex(encode(text)) AS h, octet_length(encode(text)) AS n
          FROM documents
        ),
        hashes AS (
          SELECT doc_id, i, (({terms}) % 18446744073709551616::HUGEINT) AS hv,
                 n - {k} + 1 AS n_h
          FROM hx, unnest(range(1, n - {k} + 2)) AS t(i)
          WHERE n >= {k}
        ),
        wmin AS (
          SELECT doc_id, n_h, i,
                 min(hv) OVER (PARTITION BY doc_id ORDER BY i
                               ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS wm
          FROM hashes
        )
        SELECT DISTINCT doc_id,
               CASE WHEN wm >= 9223372036854775808::HUGEINT
                    THEN (wm - 18446744073709551616::HUGEINT)::BIGINT
                    ELSE wm::BIGINT END AS fp
        FROM wmin
        WHERE i <= greatest(n_h - {w} + 1, 1)
    """


def _simhash_oracle(max_hamming: int = 3, bits: int = 60) -> str:
    """DuckDB replica of operators/dedup.py::simhash + brute-force Hamming
    pairs (the Spark side blocks with a 4x15-bit pigeonhole — exact at
    radius 3 — so brute force over all pairs is the equivalent oracle)."""
    votes = ",\n                 ".join(
        f"sum(((h >> {b}) & 1) * 2 - 1) AS v{b}" for b in range(bits))
    assemble = " + ".join(
        f"(CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(bits))
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 ('0x' || substr(md5(unnest(regexp_split_to_array(trim(text), '\\s+'))), 1, 15))::BIGINT AS h
          FROM documents WHERE length(trim(text)) > 0
        ),
        votes AS (
          SELECT doc_id,
                 {votes}
          FROM toks GROUP BY doc_id
        ),
        sh AS (SELECT doc_id, ({assemble})::BIGINT AS simhash FROM votes)
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               bit_count(xor(a.simhash, b.simhash)) AS hamming
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
    """


def oracle_sql() -> dict[str, str]:
    return {
        "winnow_fingerprint": _winnow_oracle(k=8, w=16),
        "simhash_pairs": _simhash_oracle(max_hamming=3),
        "doc_shingle_counts": """
            SELECT doc_id,
                   len(list_distinct([substring(text, i, 9)
                                      FOR i IN range(1, greatest(length(text)-7, 1))])) AS n_shingles
            FROM documents
        """,
        "exact_dedup": """
            SELECT md5(text) AS fingerprint, count(*) AS n_docs, min(doc_id) AS keeper_id
            FROM documents GROUP BY md5(text)
        """,
        "token_stats": r"""
            WITH t AS (
              SELECT doc_id, length(text) AS n_chars, trim(text) AS tt FROM documents
            )
            SELECT doc_id, n_chars,
                   CASE WHEN length(tt)=0 THEN 0
                        ELSE len(regexp_split_to_array(tt, '\s+')) END AS n_tokens,
                   CASE WHEN length(tt)=0 OR len(regexp_split_to_array(tt, '\s+'))=0 THEN 0.0
                        ELSE round(length(regexp_replace(tt, '\s+', '', 'g'))::double
                                   / len(regexp_split_to_array(tt, '\s+')), 4) END AS avg_token_len
            FROM t
        """,
        "quality_score": r"""
            WITH t AS (
              SELECT doc_id, text, length(text) AS n,
                     length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digits,
                     length(regexp_replace(text, '[^!.,;:?]', '', 'g')) AS n_punct,
                     len(regexp_split_to_array(' ' || text || ' ', '\sthe\s')) - 1 AS stopword_hits,
                     CASE WHEN length(trim(text))=0 THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
              FROM documents
            )
            SELECT doc_id, n AS n_chars, n_digits, n_punct, stopword_hits,
                   CASE WHEN n=0 THEN 0.0
                        ELSE round(100.0 * (1.0 - n_digits::double/n)
                                   * (1.0 - n_punct::double/n)
                                   * least(1.0, n_tokens::double/100.0), 4) END AS quality_score
            FROM t
        """,
        "language_id": r"""
            WITH t AS (
              SELECT doc_id,
                     len(regexp_split_to_array(' ' || lower(text) || ' ', ' the ')) - 1
                     + len(regexp_split_to_array(' ' || lower(text) || ' ', ' and ')) - 1
                     + len(regexp_split_to_array(' ' || lower(text) || ' ', ' of ')) - 1 AS en_hits,
                     len(regexp_split_to_array(' ' || lower(text) || ' ', ' der ')) - 1
                     + len(regexp_split_to_array(' ' || lower(text) || ' ', ' und ')) - 1
                     + len(regexp_split_to_array(' ' || lower(text) || ' ', ' die ')) - 1 AS de_hits,
                     length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS zh_hits
              FROM documents
            )
            SELECT doc_id, en_hits, de_hits, zh_hits,
                   CASE WHEN en_hits >= de_hits AND en_hits >= zh_hits AND en_hits > 0 THEN 'en'
                        WHEN de_hits >= zh_hits AND de_hits > 0 THEN 'de'
                        WHEN zh_hits > 0 THEN 'zh'
                        ELSE 'unknown' END AS detected_lang
            FROM t
        """,
        "md5_fingerprint": """
            SELECT doc_id, md5(text) AS fingerprint FROM documents
        """,
        "exact_dedup_corpus": """
            WITH ranked AS (
              SELECT doc_id, n_chars,
                     row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
              FROM documents
            )
            SELECT doc_id, n_chars FROM ranked WHERE rn = 1
        """,
        "ngram_jaccard": r"""
            WITH toks AS (
              SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
              FROM documents WHERE length(trim(text)) > 0
            ),
            tg AS (
              SELECT doc_id, unnest(list_distinct(
                       [t[i] || ' ' || t[i+1] || ' ' || t[i+2] FOR i IN range(1, len(t)-1)]
                     )) AS trigram
              FROM toks WHERE len(t) >= 3
            ),
            sizes AS (SELECT doc_id, count(*) AS n_tg FROM tg GROUP BY doc_id),
            rare AS (
              SELECT tg.doc_id, tg.trigram FROM tg
              JOIN (SELECT trigram FROM tg GROUP BY trigram HAVING count(*) <= 50) r
                ON tg.trigram = r.trigram
            ),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
              FROM rare a JOIN rare b ON a.trigram = b.trigram AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b, n_common,
                   round(n_common::double / (sa.n_tg + sb.n_tg - n_common), 6) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE n_common::double / (sa.n_tg + sb.n_tg - n_common) >= 0.02
        """,
        "embedding_topk": """
            WITH q AS (SELECT vec_id AS query_id, embedding::double[] AS qv
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id AS neighbor_id,
                     round(list_cosine_similarity(q.qv, e.embedding::double[]), 6) AS cosine
              FROM q, embeddings e WHERE e.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, cosine,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY cosine DESC, neighbor_id ASC) AS rank
              FROM scored
            )
            SELECT query_id, rank, neighbor_id, cosine FROM ranked WHERE rank <= 10
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   CAST(round(sum(l_quantity) * 100) AS BIGINT) AS sum_qty_c,
                   CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_c,
                   count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "revenue_by_nation": """
            SELECT n_name, count(*) AS n_orders,
                   CAST(round(sum(o_totalprice) * 100) AS BIGINT) AS revenue_c
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name
        """,
        "top_events_per_user": """
            WITH ranked AS (
              SELECT user_id, event_id, event_type, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id ASC) AS rank
              FROM events WHERE user_id < 20
            )
            SELECT user_id, rank, event_id, event_type, value FROM ranked WHERE rank <= 3
        """,
        "event_type_stats": """
            SELECT event_type, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   CAST(round(sum(value) * 100) AS BIGINT) AS value_c
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "tpch_q3_like": """
            SELECT l_orderkey,
                   CAST(round(sum(l_extendedprice * (1 - l_discount)) * 100) AS BIGINT) AS revenue_c,
                   count(*) AS n_lines
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue_c DESC, l_orderkey ASC
            LIMIT 10
        """,
        "parts_by_brand": """
            SELECT p_brand, count(*) AS n_parts,
                   round(avg(p_retailprice), 2) AS avg_price,
                   max(p_size) AS max_size
            FROM part GROUP BY p_brand HAVING count(*) >= 5 ORDER BY p_brand
        """,
    }
