"""Corpus-statistics language-model scoring (north-star extension).

CCNet-style quality filtering scores every document by the perplexity
of a small LM; the cheapest member of that family is the corpus's own
unigram model:

    score(doc) = - (1/|doc|) * sum_t ln p(t),   p(t) = count(t) / N

— the per-token cross-entropy of the document against the corpus
unigram distribution. Low = lexically typical, high = unusual (rare
words, junk, wrong language); thresholding it is the standard cheap
pre-filter before an expensive model pass.

Scale shape: the vocabulary build is one map-side-combinable groupBy
on the token (vocabulary-sized shuffle — same cost class as tf-idf);
the corpus total N rides along as a broadcast scalar, NOT a driver
`.count()`. Scoring joins the exploded tokens against the vocabulary.
The synthetic corpus's vocabulary broadcasts; a 100 TB web corpus's
does not — there, truncate to the top-V tokens (V ~ 1e6) and give the
tail a single OOV probability mass, which turns the join back into a
broadcast and is exactly what the published CCNet pipeline does.

Every step is count arithmetic + one ln, so the DuckDB oracle replays
it to the last bit before 4-dp rounding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rustic_witcher_spark.operators.dedup import normalized_text


def unigram_logprob_score(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document unigram cross-entropy: (id_col, n_tokens, nll).

    ``nll`` is the mean negative log-probability of the document's
    tokens under the corpus unigram distribution, rounded to 4 dp.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("__t")
    )
    vocab = toks.groupBy("__t").agg(F.count("*").alias("__c"))
    total = toks.agg(F.count("*").alias("__n"))
    scored = (
        toks.join(vocab, "__t")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(-F.log(F.col("__c").cast("double") / F.col("__n"))), 4
            ).alias("nll"),
        )
    )
    return scored


def sql_unigram_logprob_score(text_norm_expr: str, id_expr: str, table: str) -> str:
    """DuckDB twin of ``unigram_logprob_score``."""
    return f"""
WITH toks AS (
  SELECT {id_expr} AS id, unnest(string_split({text_norm_expr}, ' ')) AS t
  FROM {table}
),
vocab AS (SELECT t, count(*) AS c FROM toks GROUP BY 1),
tot AS (SELECT count(*) AS n FROM toks)
SELECT toks.id AS {id_expr}, count(*) AS n_tokens,
       round(avg(-ln(vocab.c::DOUBLE / tot.n)), 4) AS nll
FROM toks JOIN vocab USING (t) CROSS JOIN tot
GROUP BY 1
"""


# ------------------------------------------------------- chunk-level dedup
#
# C4-style sub-document dedup: hash fixed-size token windows ("chunks"
# — the stand-in for paragraph/line boundaries, which the synthetic
# corpus lacks) and measure, per document, how much of it duplicates
# chunks seen elsewhere. One explode + one groupBy on the chunk hash
# (the shuffle is chunk-cardinality-sized); the per-doc roll-up is
# map-side combinable.


def chunk_dup_stats(
    df: DataFrame, text_col: str, id_col: str, chunk_words: int = 10
) -> DataFrame:
    """(id_col, n_chunks, n_dup_chunks, dup_ratio): how many of the
    document's ``chunk_words``-token windows also occur in ANOTHER
    document. Full trailing chunks only (a short tail is its own
    near-unique chunk and would dilute the signal)."""
    # let-bind the token array (the char_shingles / minhash idiom):
    # captured inside the chunking lambda it would re-run the regex
    # normalization + split PER CHUNK — O(n²) in document length, a
    # multi-hour stall on a single 1M-token document.
    def chunks_of(toks: Column) -> Column:
        nchunks = F.floor(F.size(toks) / chunk_words).cast("int")
        grams = F.transform(
            F.sequence(F.lit(0), nchunks - 1),
            lambda i: F.array_join(F.slice(toks, i * chunk_words + 1, chunk_words), " "),
        )
        return F.when(nchunks > 0, grams).otherwise(F.array().cast("array<string>"))

    chunks = F.element_at(
        F.transform(F.array(F.split(normalized_text(F.col(text_col)), " ")), chunks_of), 1
    )
    exploded = df.select(F.col(id_col), F.explode(chunks).alias("__chunk"))
    # chunk -> set-of-docs size; a chunk is "duplicated" for a doc if
    # some OTHER doc also has it (count distinct docs >= 2)
    owners = exploded.distinct().groupBy("__chunk").agg(F.count("*").alias("__docs"))
    return (
        exploded.join(owners, "__chunk")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("__docs") >= 2, 1).otherwise(0)).alias("n_dup_chunks"),
        )
        .withColumn(
            "dup_ratio", F.round(F.col("n_dup_chunks") / F.col("n_chunks"), 4)
        )
    )


def sql_chunk_dup_stats(
    text_norm_expr: str, id_expr: str, table: str, chunk_words: int = 10
) -> str:
    """DuckDB twin of ``chunk_dup_stats``."""
    return f"""
WITH tk AS (SELECT {id_expr} AS id, string_split({text_norm_expr}, ' ') AS ts FROM {table}),
ex AS (
  SELECT id,
         array_to_string(ts[(i - 1) * {chunk_words} + 1 : i * {chunk_words}], ' ') AS chunk
  FROM tk, unnest(range(1, (len(ts) // {chunk_words})::BIGINT + 1)) AS r(i)
),
owners AS (SELECT chunk, count(*) AS docs FROM (SELECT DISTINCT id, chunk FROM ex) GROUP BY 1)
SELECT ex.id AS {id_expr}, count(*) AS n_chunks,
       sum(CASE WHEN owners.docs >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_chunks,
       round(sum(CASE WHEN owners.docs >= 2 THEN 1 ELSE 0 END) / count(*), 4) AS dup_ratio
FROM ex JOIN owners USING (chunk)
GROUP BY 1
"""
