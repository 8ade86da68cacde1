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

from pyspark.sql import Column, DataFrame, Window
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
    # integer roll-up of vocab, not a second corpus pass (bit-identical
    # value; vocab's exchange is reused instead of re-running the
    # explode — the bigram faces' discipline)
    total = vocab.agg(F.sum("__c").alias("__n"))
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
    # Per-doc chunk multiplicities FIRST (r12): the exploded stream fed
    # both the owner count (via distinct) and the per-doc rollup, and
    # Catalyst has no cross-branch subtree reuse — the chunking
    # projection (normalize + split + array_join per window) ran twice.
    # Grouping to (id, chunk, m) lets both consumers share ONE exchange
    # (ReuseExchange: identical subtree), and every downstream value is
    # an integer sum of these exact counts — bit-identical to the
    # instance-level form: owners-per-chunk = COUNT of (id, chunk) rows
    # (== count distinct docs: a chunk is "duplicated" if some OTHER
    # doc also has it), n_chunks = Σ m, n_dup_chunks = Σ m over
    # duplicated chunks.
    docchunk = exploded.groupBy(id_col, "__chunk").agg(F.count(F.lit(1)).alias("__m"))
    owners = docchunk.groupBy("__chunk").agg(F.count(F.lit(1)).alias("__docs"))
    return (
        docchunk.join(owners, "__chunk")
        .groupBy(id_col)
        .agg(
            F.sum("__m").alias("n_chunks"),
            F.sum(
                F.when(F.col("__docs") >= 2, F.col("__m")).otherwise(F.lit(0))
            ).alias("n_dup_chunks"),
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


# --------------------------------------------------- interpolated bigram LM
#
# One rung up the CCNet quality-filter ladder from the unigram score:
# per-document cross-entropy under a Jelinek-Mercer interpolated bigram
# model estimated from the corpus itself,
#
#     p(w | v) = lam * c(v,w)/c(v,·) + (1 - lam) * c(w)/N
#
# (c(v,·) = count of v as a bigram LEFT context, so the conditional
# rows sum to 1). Captures word-ORDER typicality the unigram model is
# blind to: scrambled or templated text shares the unigram profile of
# normal prose but pays a large bigram penalty.
#
# Scale shape: three map-side-combinable groupBys (bigram, context,
# unigram) and three equi-joins back onto the exploded bigram stream —
# every key is a token or token pair (Zipfian, AQE-skew-splittable
# joins; NO window over a token key). At web scale, truncate each
# count table to top-V with an OOV mass exactly like the unigram
# docstring describes — the joins then broadcast.


def bigram_logprob_score(
    df: DataFrame, text_col: str, id_col: str, lam: float = 0.7
) -> DataFrame:
    """Per-document interpolated-bigram cross-entropy:
    (id_col, n_bigrams, nll), nll rounded to 4 dp. Documents with
    fewer than two tokens (or NULL text) have no bigrams and drop out,
    matching the SQL twin's inner joins."""

    def bigrams_of(toks: Column) -> Column:
        nb = F.size(toks) - 1
        pairs = F.transform(
            F.sequence(F.lit(1), nb),
            lambda i: F.struct(
                F.element_at(toks, i).alias("v"),
                F.element_at(toks, i + 1).alias("w"),
            ),
        )
        return F.when(nb >= 1, pairs).otherwise(
            F.array().cast("array<struct<v:string,w:string>>")
        )

    # let-bind the token array (the chunk_dup_stats idiom) so the
    # normalization+split runs once per doc, not once per bigram
    pairs = F.element_at(
        F.transform(F.array(F.split(normalized_text(F.col(text_col)), " ")), bigrams_of), 1
    )
    from rustic_witcher_spark.operators.materialize import materialize

    big = df.select(F.col(id_col), F.explode(pairs).alias("__p")).select(
        F.col(id_col), F.col("__p.v").alias("__v"), F.col("__p.w").alias("__w")
    )
    toks = df.select(
        F.col(id_col), F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("__t")
    )
    # The two count tables are MATERIALIZED (r13): they are the CCNet-
    # style bigram/unigram count tables a production run persists anyway
    # (bounded by distinct bigrams / vocab, never corpus-scale), and
    # without the cut every consumer re-planned the whole explode chain
    # (Catalyst has no cross-branch subtree reuse — the r12 plan still
    # carried 5 corpus-scan subtrees). cv/total stay integer ROLL-UPS of
    # cb/cu (sums of exact counts — bit-identical values).
    cb = materialize(big.groupBy("__v", "__w").agg(F.count("*").alias("__cb")))
    cv = cb.groupBy("__v").agg(F.sum("__cb").alias("__cv"))
    cu = materialize(toks.groupBy("__t").agg(F.count("*").alias("__cu")))
    total = cu.agg(F.sum("__cu").alias("__n"))
    p = (
        F.lit(lam) * (F.col("__cb").cast("double") / F.col("__cv"))
        + F.lit(1.0 - lam) * (F.col("__cu").cast("double") / F.col("__n"))
    )
    # Attach the probability with ONE join (r13, guide §2.3/§8): the
    # per-(v,w) probability is a pure function of the bounded count
    # tables, so it is computed on THEM (pw below) and the corpus-scale
    # bigram-instance stream is shuffled ONCE to pick it up — the
    # previous chain (join cb, then cv, then cu) re-shuffled every
    # instance row three times (by (v,w), by v, by w) to attach numbers
    # that never depended on the instance. Expression tree and join
    # semantics unchanged (inner joins are lossless here: every (v,w)
    # of big IS a cb key, every cb key has a cv row and a cu row).
    pw = (
        cb.join(cv, "__v")
        .join(cu, F.col("__w") == F.col("__t"))
        .crossJoin(F.broadcast(total))
        .select("__v", "__w", p.alias("__p"))
    )
    return (
        big.join(pw, ["__v", "__w"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log(F.col("__p"))), 4).alias("nll"),
        )
    )


def sql_bigram_logprob_score(
    text_norm_expr: str, id_expr: str, table: str, lam: float = 0.7
) -> str:
    """DuckDB twin of ``bigram_logprob_score`` — identical expression
    tree (lam * (cb/cv) + (1-lam) * (cu/n), then ln/avg/round) so the
    scores agree bit-for-bit before 4-dp rounding."""
    return f"""
WITH tk AS (SELECT {id_expr} AS id, string_split({text_norm_expr}, ' ') AS ts FROM {table}),
big AS (
  SELECT id, ts[i] AS v, ts[i + 1] AS w
  FROM tk, unnest(range(1, len(ts))) AS r(i)
),
toks AS (SELECT id, unnest(ts) AS t FROM tk),
cb AS (SELECT v, w, count(*) AS cb FROM big GROUP BY 1, 2),
cv AS (SELECT v, count(*) AS cv FROM big GROUP BY 1),
cu AS (SELECT t, count(*) AS cu FROM toks GROUP BY 1),
tot AS (SELECT count(*) AS n FROM toks)
SELECT big.id AS {id_expr}, count(*) AS n_bigrams,
       round(avg(-ln({lam} * (cb.cb::DOUBLE / cv.cv) + {1.0 - lam} * (cu.cu::DOUBLE / tot.n))), 4) AS nll
FROM big JOIN cb USING (v, w) JOIN cv USING (v) JOIN cu ON big.w = cu.t CROSS JOIN tot
GROUP BY 1
"""


# OOV symbol: the SUB control char. normalized_text only lowercases and
# collapses whitespace, so a literal \x1a CAN survive as a token — the
# truncated face therefore (a) excludes it from the top-V candidate set
# and (b) thereby always maps it to OOV, making "SUB tokens pool with
# the tail" a DEFINED behavior on both engines rather than a silent
# stats merge when \x1a would have made top-V.
OOV = chr(26)


def bigram_logprob_score_topv(
    df: DataFrame, text_col: str, id_col: str, top_v: int, lam: float = 0.7
) -> DataFrame:
    """The web-scale variant of ``bigram_logprob_score``: every token
    outside the corpus's ``top_v`` most frequent (count desc, token asc
    — deterministic) collapses to a single OOV symbol BEFORE bigram
    construction, exactly the CCNet truncation. All three count tables
    are then bounded by (V+1) — broadcastable at any corpus size — and
    the conditional mass of the long tail pools into the OOV row
    instead of fragmenting into singleton bigrams.

    Plan shape: posexplode keeps token order; the top-V membership
    attaches via a BROADCAST left join (V rows); bigrams form with ONE
    lead() window partitioned by document (bounded by document length
    — the acceptable window class, not a Zipfian key); the three count
    groupBys stay map-side combinable. With ``top_v`` >= the true
    vocabulary size this is pinned output-identical to the exact face.

    Returns (id_col, n_bigrams, nll) like the exact face.
    """
    from rustic_witcher_spark.operators.materialize import materialize

    toks = df.select(
        F.col(id_col),
        F.posexplode(F.split(normalized_text(F.col(text_col)), " ")).alias("__pos", "__t"),
    )
    # ONE materialized vocabulary count table feeds top-V selection, the
    # OOV-pooled unigram counts AND the total — each used to re-run its
    # own corpus-wide explode (no cross-branch subtree reuse in
    # Catalyst). The count table is the CCNet unigram table: vocab-
    # bounded, the thing a production run would persist anyway. All
    # derivations below are integer sums of these exact counts, so
    # every downstream value is bit-identical to the per-pass form.
    tokc = materialize(toks.groupBy("__t").agg(F.count("*").alias("__c")))
    top = (
        tokc.filter(F.col("__t") != OOV)  # see OOV note: SUB never wins a slot
        .orderBy(F.col("__c").desc(), F.col("__t").asc())
        .limit(top_v)
        .select("__t", F.lit(1).alias("__keep"))
    )
    mapped = toks.join(F.broadcast(top), "__t", "left").select(
        F.col(id_col),
        "__pos",
        F.when(F.col("__keep").isNotNull(), F.col("__t")).otherwise(F.lit(OOV)).alias("__t"),
    )
    w = Window.partitionBy(id_col).orderBy("__pos")
    big = (
        mapped.withColumn("__w", F.lead("__t").over(w))
        .filter(F.col("__w").isNotNull())
        .select(F.col(id_col), F.col("__t").alias("__v"), "__w")
    )
    # The bigram count table is MATERIALIZED (r13): bounded by (V+1)²
    # worst-case (in practice far less), it is the count table a CCNet
    # run persists — and without the cut both the cb and cv consumers
    # re-planned big's whole explode+window chain (exchange reuse only
    # dedupes BELOW the exchange; the sort+lead window above it re-ran
    # once per consumer). cv stays an integer roll-up of cb.
    cb = materialize(big.groupBy("__v", "__w").agg(F.count("*").alias("__cb")))
    cv = cb.groupBy("__v").agg(F.sum("__cb").alias("__cv"))
    # OOV-pooled unigram counts from the vocab table (sum of exact
    # counts == recount of the pooled tokens), not another corpus pass
    cu = (
        tokc.join(F.broadcast(top), "__t", "left")
        .select(
            F.when(F.col("__keep").isNotNull(), F.col("__t")).otherwise(F.lit(OOV)).alias("__t"),
            "__c",
        )
        .groupBy("__t")
        .agg(F.sum("__c").alias("__cu"))
    )
    total = tokc.agg(F.sum("__c").alias("__n"))
    p = (
        F.lit(lam) * (F.col("__cb").cast("double") / F.col("__cv"))
        + F.lit(1.0 - lam) * (F.col("__cu").cast("double") / F.col("__n"))
    )
    # ONE probability-attach join (r13 — same restructure as the exact
    # face): p is a pure function of the bounded tables, so compute it
    # on them and shuffle the corpus-scale instance stream once, not
    # three times. Inner joins are lossless (every (v,w) of big is a cb
    # key with cv/cu rows); expression tree unchanged.
    pw = (
        cb.join(cv, "__v")
        .join(cu, F.col("__w") == F.col("__t"))
        .crossJoin(F.broadcast(total))
        .select("__v", "__w", p.alias("__p"))
    )
    return (
        big.join(pw, ["__v", "__w"])
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(-F.log(F.col("__p"))), 4).alias("nll"),
        )
    )


def sql_bigram_logprob_score_topv(
    text_norm_expr: str, id_expr: str, table: str, top_v: int, lam: float = 0.7
) -> str:
    """DuckDB twin of ``bigram_logprob_score_topv`` — same top-V
    truncation (count desc, token asc), same OOV pooling, same
    interpolated expression tree."""
    return f"""
WITH tk AS (SELECT {id_expr} AS id, string_split({text_norm_expr}, ' ') AS ts FROM {table}),
tp AS (SELECT id, i AS pos, ts[i] AS t FROM tk, unnest(range(1, len(ts) + 1)) AS r(i)),
top AS (
  SELECT t FROM (SELECT t, count(*) AS c FROM tp WHERE t <> chr(26) GROUP BY 1)
  ORDER BY c DESC, t ASC LIMIT {top_v}
),
mp AS (
  SELECT tp.id, tp.pos,
         CASE WHEN top.t IS NULL THEN chr(26) ELSE tp.t END AS t
  FROM tp LEFT JOIN top ON tp.t = top.t
),
big AS (
  SELECT id, t AS v, lead(t) OVER (PARTITION BY id ORDER BY pos) AS w FROM mp
  QUALIFY w IS NOT NULL
),
cb AS (SELECT v, w, count(*) AS cb FROM big GROUP BY 1, 2),
cv AS (SELECT v, count(*) AS cv FROM big GROUP BY 1),
cu AS (SELECT t, count(*) AS cu FROM mp GROUP BY 1),
tot AS (SELECT count(*) AS n FROM mp)
SELECT big.id AS {id_expr}, count(*) AS n_bigrams,
       round(avg(-ln({lam} * (cb.cb::DOUBLE / cv.cv) + {1.0 - lam} * (cu.cu::DOUBLE / tot.n))), 4) AS nll
FROM big JOIN cb USING (v, w) JOIN cv USING (v) JOIN cu ON big.w = cu.t CROSS JOIN tot
GROUP BY 1
"""
