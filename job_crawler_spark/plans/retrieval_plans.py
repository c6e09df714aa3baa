"""Gated BM25 full-text retrieval over the ``documents`` table.

The search-ranking operator class: given a literal set of keyword queries,
score every document with Okapi BM25 (Robertson et al., TREC-3; the
Lucene ``k1``/``b`` practical form with the non-negative
``ln(1 + (N - df + 0.5) / (df + 0.5))`` idf) and return the top-k
documents per query. This is the ranking step a crawl corpus feeds once
parsed — the reference exposes keyword search over stored jobs
(``main.py:471-530`` search_jobs LIKE-filtering); BM25 is the
scale-correct generalization of that contains-match to ranked retrieval.

Cross-engine determinism contract (same as the KL-drift query): every
arithmetic step is an identical IEEE expression tree in Spark and DuckDB;
``ln`` may differ in the last ulp between libm and the JVM, so the
summed score is passed through ``stable_round(_, 6)`` BEFORE ranking and
ties break on doc_id — the emitted rank is a pure function of the rounded
score in both engines.

Scale shape (the 100 TB plan, pinned in tests/test_plans.py):

- ONE corpus scan, ONE token explode, ONE (doc_id, term) hash aggregate —
  the tf frame is tracked-localCheckpointed so its two consumers (document
  lengths, query-term match) do not re-run the scan+shuffle.
- Everything query-sided is tiny and broadcast: the literal query-term
  table, the per-term df aggregate (query-vocab-sized), and the 1-row
  (N, avgdl) corpus stats — the corpus never shuffles on term.
- Per-(query, doc) scoring aggregates on (query_id, doc_id) —
  map-side-combinable sum over at most |query| rows each.
- Top-k per query via a rank window over the scored frame; with O(1)
  queries the window partitions are corpus-wide, so at 100 TB the scored
  frame is first cut by a broadcast per-query score floor (score > 0
  already prunes to docs sharing a term) — documented here, exercised at
  gate scale by the same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from job_crawler_spark.functions.compat import stable_round, stable_round_sql

# Disjoint term sets so per-term df is independent of which query asks.
BM25_QUERIES: dict[int, tuple[str, ...]] = {
    1: ("fast", "hash", "join"),
    2: ("window", "query", "sort"),
    3: ("stream", "batch", "merge", "spark"),
}
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP_K = 5


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 documents per keyword query by BM25, deterministic ranks."""
    from job_crawler_spark.operators.checkpoints import (
        tracked_local_checkpoint,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # tf feeds BOTH the document-length aggregate and the query-term match;
    # checkpoint so the corpus scan + token shuffle run once, not twice.
    tf = tracked_local_checkpoint(tf)

    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # exact-integer corpus stats; the single division is correctly rounded
    # and therefore engine-identical (no AVG: its internal order is opaque)
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )

    qterms = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES.items() for t in terms],
        "query_id INT, term STRING",
    )
    tf_q = tf.join(F.broadcast(qterms), "term")
    dfreq = tf_q.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    norm = F.col("tf") * (BM25_K1 + 1) / (
        F.col("tf")
        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("dl") / F.col("avgdl"))
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        tf_q.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            stable_round(F.sum(idf * norm), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select("query_id", "doc_id", "n_terms", "score", "rank")
        .orderBy("query_id", "rank")
    )
    out._graft_checkpoints = [tf]
    return out


def _bm25_sql() -> str:
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, terms in BM25_QUERIES.items()
        for t in terms
    )
    score = stable_round_sql(
        "SUM(LN(1 + (n_docs - df + 0.5) / (df + 0.5))"
        f" * tf * ({BM25_K1} + 1)"
        f" / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * dl / avgdl)))",
        6,
    )
    return f"""
        WITH toks AS (
          SELECT doc_id,
                 unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
          FROM documents
        ),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
               WHERE term <> '' GROUP BY doc_id, term),
        dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
        stats AS (SELECT COUNT(*) AS n_docs,
                         SUM(dl) * 1.0 / COUNT(*) AS avgdl FROM dl),
        qterms(query_id, term) AS (VALUES {qvals}),
        tf_q AS (SELECT query_id, doc_id, tf.term, tf
                 FROM tf JOIN qterms USING (term)),
        dfreq AS (SELECT term, COUNT(*) AS df FROM tf_q GROUP BY term),
        scored AS (
          SELECT query_id, doc_id, COUNT(*) AS n_terms, {score} AS score
          FROM tf_q
          JOIN dl USING (doc_id)
          JOIN dfreq USING (term)
          CROSS JOIN stats
          GROUP BY query_id, doc_id
        ),
        r AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY score DESC, doc_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, doc_id, n_terms, score, rank
        FROM r WHERE rank <= {BM25_TOP_K}
        ORDER BY query_id, rank
    """


def q_inverted_postings(
    spark: SparkSession, sf_dir: str, *, df_via_window: bool = True
) -> DataFrame:
    """Positional inverted-index CONSTRUCTION over ``documents`` — the
    index-build operator class (vs ``bm25_topk``, which is the ranked
    RETRIEVAL class consuming such an index): one postings row per
    (term, doc_id) carrying the term frequency, the document frequency,
    and the in-document positions as a gap-encoded (delta) integer list —
    first position absolute, each subsequent entry the gap to its
    predecessor — the classic positional-postings compression every
    search engine ships (Zobel & Moffat, ACM CS 2006; Lucene's
    proximity/phrase data). The reference's LIKE-scan search
    (``main.py:471-530``) is what an index like this replaces at scale.

    Scale shape: ONE corpus scan -> token posexplode (narrow) -> ONE
    map-side-combinable (term, doc_id) hash aggregate collecting tf and
    the sorted position list; gap encoding is a pure JVM array transform
    (zip_with against the 0-prepended shifted self — no per-row Python,
    no second explode). The df column rides a term-partitioned window —
    at 100 TB vocabulary skew (stopword terms) makes that window the hot
    spot (a window ships EVERY posting of a hot term to one partition),
    so ``df_via_window=False`` computes df as a hash aggregate — whose
    map-side partial combine moves one partial row per (task, term), the
    aggregate-algebra fix that makes salting unnecessary for counts —
    and broadcast-joins the vocab-sized result back (implemented below;
    bit-equal output and plan pinned window-free in
    tests/test_plans.py). At gate scale the single window keeps the
    gated plan to exactly two exchanges. Output is naturally
    term-partitioned — exactly the layout a shard-per-term index store
    wants to ingest.

    The DuckDB oracle rebuilds the same postings from scratch with list
    lambdas (range/list_transform gap encoding) — an independent
    formulation of both the positional explode and the delta encoding.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
            "pos", "term"
        ),
    ).filter(F.col("term") != "")
    pl = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf"),
        F.array_sort(F.collect_list(F.col("pos").cast("long"))).alias(
            "poss"
        ),
    )
    poss = F.col("poss")
    shifted = F.concat(
        F.array(F.lit(0).cast("long")),
        F.slice(poss, 1, F.size(poss) - 1),
    )
    # serialized as a comma-joined string: the gate canonicalizer hashes
    # a sorted pandas frame and array cells are unhashable, and a real
    # index store serializes the gap list anyway (varint bytes there,
    # csv here for a text-stable value hash)
    deltas = F.array_join(
        F.zip_with(poss, shifted, lambda a, b: a - b).cast(
            "array<string>"
        ),
        ",",
    ).alias("pos_deltas")
    if df_via_window:
        out = pl.select(
            "term",
            "doc_id",
            "tf",
            deltas,
            F.count(F.lit(1)).over(Window.partitionBy("term")).alias("df"),
        )
    else:
        # stopword-skew-proof df: partial-combined hash aggregate (one
        # partial row per task per term crosses the wire, however hot the
        # term) + vocab-sized broadcast back — no term-partitioned window.
        # pl feeds both the df aggregate and the join; materialize it once
        # (at scale the postings frame is written to the index store
        # anyway — df derives from the materialized frame, not a rescan).
        from job_crawler_spark.operators.checkpoints import (
            tracked_local_checkpoint,
        )

        pl = tracked_local_checkpoint(pl)
        dfreq = pl.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        out = pl.join(F.broadcast(dfreq), "term").select(
            "term", "doc_id", "tf", deltas, "df"
        )
        out = out.orderBy("term", "doc_id")
        out._graft_checkpoints = [pl]
        return out
    return out.orderBy("term", "doc_id")


RANK_EVAL_K = BM25_TOP_K  # evaluate the bm25 top-k as retrieved
RANK_REL_MIN = 2  # binary-relevance threshold for precision@k


def q_ranking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-evaluation metrics — the IR-eval operator class
    (Järvelin & Kekäläinen's nDCG; precision@k): score the
    `bm25_topk` ranking per query with graded relevance rel = n_terms
    (distinct query terms matched — the judgment-free graded proxy)
    as nDCG@k over the retrieved set (IDCG re-sorts the SAME retrieved
    grades descending — the standard variant when no exhaustive
    judgments exist; stated contract) plus binary precision@k
    (rel >= RANK_REL_MIN, divided by the fixed k).

    Determinism: gains 2^rel - 1 are exact integers; each position
    contributes one division by log2(pos+1); the per-query sums span
    <= k terms, so last-ulp log/summation noise dies in stable_round@6.
    IDCG's ideal order is rel-descending with ties broken by rank —
    tie ORDER cannot change the value (equal grades contribute
    equally at swapped positions), so the tiebreak is only for plan
    determinism.

    Scale shape: everything downstream of bm25_topk's scored frame is
    per-query tiny — two window passes over <= k-row partitions and
    one aggregate; the heavy lifting (corpus scan, tf, checkpoints)
    is bm25's and its checkpoint handles are carried through for
    release. Zero Python.
    """
    from job_crawler_spark.functions.compat import stable_round

    bm = q_bm25_topk(spark, sf_dir)
    rel = F.col("n_terms")
    gain = F.pow(F.lit(2.0), rel) - 1
    ideal = Window.partitionBy("query_id").orderBy(
        rel.desc(), F.col("rank").asc()
    )
    d = bm.select(
        "query_id",
        "rank",
        rel.alias("rel"),
        gain.alias("gain"),
        F.row_number().over(ideal).alias("ideal_pos"),
    )
    agg = d.groupBy("query_id").agg(
        F.count(F.lit(1)).alias("n_retrieved"),
        F.sum(F.col("gain") / F.log2(F.col("rank") + 1)).alias("dcg"),
        F.sum(F.col("gain") / F.log2(F.col("ideal_pos") + 1)).alias(
            "idcg"
        ),
        F.sum((F.col("rel") >= RANK_REL_MIN).cast("long")).alias(
            "n_rel"
        ),
    )
    out = agg.select(
        "query_id",
        "n_retrieved",
        stable_round(F.col("dcg"), 6).alias("dcg"),
        stable_round(F.col("idcg"), 6).alias("idcg"),
        F.when(
            F.col("idcg") > 0,
            stable_round(F.col("dcg") / F.col("idcg"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("ndcg"),
        stable_round(
            F.col("n_rel") / F.lit(float(RANK_EVAL_K)), 6
        ).alias("p_at_k"),
    ).orderBy("query_id")
    out._graft_checkpoints = getattr(bm, "_graft_checkpoints", [])
    return out


def _ranking_eval_sql() -> str:
    from job_crawler_spark.functions.compat import stable_round_sql

    dcg = stable_round_sql("dcg", 6)
    idcg = stable_round_sql("idcg", 6)
    ndcg = stable_round_sql("dcg / idcg", 6)
    p_at_k = stable_round_sql(f"n_rel / {float(RANK_EVAL_K)}", 6)
    return f"""
        WITH bm AS ({_bm25_sql()}),
        d AS (
          SELECT query_id, rank, n_terms AS rel,
                 POWER(2.0, n_terms) - 1 AS gain,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY n_terms DESC, rank ASC) AS ideal_pos
          FROM bm
        ),
        agg AS (
          SELECT query_id, COUNT(*) AS n_retrieved,
                 SUM(gain / log2(rank + 1)) AS dcg,
                 SUM(gain / log2(ideal_pos + 1)) AS idcg,
                 CAST(SUM(CASE WHEN rel >= {RANK_REL_MIN}
                          THEN 1 ELSE 0 END) AS BIGINT) AS n_rel
          FROM d GROUP BY query_id
        )
        SELECT query_id, n_retrieved, {dcg} AS dcg, {idcg} AS idcg,
               CASE WHEN idcg > 0 THEN {ndcg} ELSE 0.0 END AS ndcg,
               {p_at_k} AS p_at_k
        FROM agg ORDER BY query_id
    """


PHRASES: dict[int, tuple[str, str]] = {
    1: ("table", "hash"),
    2: ("customer", "join"),
    3: ("merge", "group"),
}
PHRASE_TOP_K = 10


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional PHRASE query — the proximity-retrieval operator class
    consuming exactly the data `inverted_postings` builds (Lucene's
    PhraseQuery; Zobel & Moffat §6 "phrase querying"): for each literal
    two-word phrase, the documents where the words occur ADJACENTLY
    (pos2 = pos1 + 1), with the adjacency count, top-k per query by
    (n_matches DESC, doc_id ASC). Closes the retrieval loop the way
    doc_bpe_tokens closes the tokenizer loop: index build
    (inverted_postings) -> ranked retrieval (bm25_topk) -> proximity
    retrieval (this).

    Scale shape — the corpus-shuffle-FREE form: ONE scan, the phrase
    table broadcast-crossJoined (|phrases| rows), and the adjacency
    count evaluated as a pure JVM array lambda per (doc, phrase) —
    size(filter(sequence, i -> tk[i]=t1 AND tk[i+1]=t2)) — so the
    corpus is never exploded to positions and never shuffles at all;
    only the (query, matching-doc) scored frame reaches the top-k
    window, whose rank filter pushes as a WindowGroupLimit. (A first
    draft joined slot-1 hit lists to slot-2 hit lists on position+1 —
    the plan scanned the corpus twice, once per slot branch, because
    Catalyst does not CSE across self-join sides.) Against a PRE-BUILT
    postings store (`inverted_postings`' layout) the same semantics
    intersect gap-decoded hit lists without touching the corpus; the
    DuckDB oracle keeps that positional-join formulation as the
    independent check of this array form. Zero Python; integer-exact.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tkn = F.filter(
        F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
        lambda t: t != "",
    )
    phrases = spark.createDataFrame(
        [(qid, t1, t2) for qid, (t1, t2) in PHRASES.items()],
        "query_id INT, t1 STRING, t2 STRING",
    )
    scored = (
        docs.select("doc_id", tkn.alias("tk"))
        .filter(F.size("tk") >= 2)
        .crossJoin(F.broadcast(phrases))
        .select(
            "query_id",
            "doc_id",
            F.expr(
                "size(filter(sequence(1, size(tk) - 1),"
                " i -> element_at(tk, i) = t1"
                " AND element_at(tk, i + 1) = t2))"
            ).cast("long").alias("n_matches"),
        )
        .filter(F.col("n_matches") > 0)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("n_matches").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= PHRASE_TOP_K)
        .select("query_id", "doc_id", "n_matches", "rank")
        .orderBy("query_id", "rank")
    )


def _phrase_search_sql() -> str:
    qvals = ", ".join(
        f"({qid}, '{t1}', '{t2}')" for qid, (t1, t2) in PHRASES.items()
    )
    return rf"""
        WITH tk AS (
          SELECT doc_id,
                 string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents
        ),
        pos AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(tk) + 1),
                                       i -> {{'p': i, 't': tk[i]}})) AS e
          FROM tk
        ),
        toks AS (
          SELECT doc_id, e['p'] AS p, e['t'] AS term FROM pos
          WHERE e['t'] <> ''
        ),
        q(query_id, t1, t2) AS (VALUES {qvals}),
        scored AS (
          SELECT q.query_id, a.doc_id, COUNT(*) AS n_matches
          FROM q
          JOIN toks a ON a.term = q.t1
          JOIN toks b ON b.doc_id = a.doc_id AND b.p = a.p + 1
                     AND b.term = q.t2
          GROUP BY q.query_id, a.doc_id
        ),
        r AS (
          SELECT query_id, doc_id, n_matches,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY n_matches DESC, doc_id ASC) AS rank
          FROM scored
        )
        SELECT query_id, doc_id, n_matches, rank
        FROM r WHERE rank <= {PHRASE_TOP_K}
        ORDER BY query_id, rank
    """


def _inverted_postings_sql() -> str:
    return r"""
        WITH tk AS (
          SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS tk
          FROM documents
        ),
        tok AS (
          SELECT doc_id, u.t AS term, u.p AS pos FROM (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(tk) + 1),
                          i -> {'t': tk[i], 'p': i - 1})) AS u
            FROM tk
          ) WHERE u.t <> ''
        ),
        pl AS (
          SELECT term, doc_id, COUNT(*) AS tf, list_sort(list(pos)) AS poss
          FROM tok GROUP BY term, doc_id
        )
        SELECT term, doc_id, tf,
               array_to_string(
                 list_transform(range(1, len(poss) + 1),
                   i -> CASE WHEN i = 1 THEN poss[1]
                        ELSE poss[i] - poss[i - 1] END), ',') AS pos_deltas,
               COUNT(*) OVER (PARTITION BY term) AS df
        FROM pl ORDER BY term, doc_id
    """


QUERIES = {
    "bm25_topk": q_bm25_topk,
    "inverted_postings": q_inverted_postings,
    "phrase_search": q_phrase_search,
    "ranking_eval": q_ranking_eval,
}

ORACLES = {
    "phrase_search": _phrase_search_sql(),
    "ranking_eval": _ranking_eval_sql(),
    "bm25_topk": _bm25_sql(),
    "inverted_postings": _inverted_postings_sql(),
}
