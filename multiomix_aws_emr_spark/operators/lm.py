"""Corpus-trained bigram language-model scoring (stupid backoff) — the
perplexity-proxy quality filter tier of an LLM data pipeline.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) filters/buckets Common Crawl
by KenLM perplexity; Gopher/C4 keep cheaper heuristics. This module is
the Spark-native middle tier: train an order-2 count LM **on the corpus
itself** (or any reference corpus) with two hash aggregations, score any
document set with equi-joins + one per-doc aggregate — no external model
artifact, no Python in the hot path, every stage a shuffle on a
well-spread token key (stopword-headed skew is exactly the shape AQE
skew-join splits; the same note as ``text_unigram_rarity``).

Scoring is Brants et al. 2007 "stupid backoff" (the web-scale LM rule):

    S(w2 | w1) = c(w1 w2) / c(w1)          if the bigram was seen
               = alpha * S(w2)             otherwise
    S(w2)      = c(w2) / N                 (alpha stands in as the
                                            epsilon count when w2 itself
                                            is unseen)

Per-document output is the mean log2 score over adjacent-token bigrams —
higher = more fluent under the training corpus; a filter keeps docs above
a percentile exactly like the rarity/quality rules. Tokenization matches
functions/ngrams.bigram_rows (whitespace split, empties dropped, case
preserved) so LM scores compose with the other n-gram operators without
a second tokenizer.

At 100 TB: training is ONE map-side-combinable count over one explode
pass — doc-final tokens ride as (w1, NULL) pair rows so unigram counts
roll up from the bigram-TYPE table, which is corpus-sublinear, instead
of re-tokenizing the corpus; the model stays a pair of DataFrames —
joined, never collected — so nothing caps vocabulary size driver-side.
Scoring touches the corpus once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def token_pair_rows(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    keep_last: bool = False,
) -> DataFrame:
    """(id_col, w1, w2) — one row per adjacent token pair per document.

    Same derivation shape as functions/ngrams.bigram_rows (posexplode +
    window lead: plain codegen, no per-run Janino HOF class) but keeps
    the tokens as two columns so count joins don't re-split strings.
    ``keep_last=True`` keeps each document's FINAL token as a row with
    ``w2`` NULL — then every token occurrence appears as ``w1`` of
    exactly one row, which is what lets training derive unigram counts
    from the same pass (see :func:`train_bigram_lm`)."""
    w = Window.partitionBy(id_col).orderBy("pos")
    tok = df.select(
        id_col, F.posexplode(F.split(text_col, " ")).alias("pos", "tok")
    ).filter(F.col("tok") != "")
    pairs = tok.select(
        id_col,
        F.col("tok").alias("w1"),
        F.lead("tok", 1).over(w).alias("w2"),
    )
    return pairs if keep_last else pairs.filter(F.col("w2").isNotNull())


def train_bigram_lm(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> dict:
    """Count model from a training corpus in ONE corpus-scale pass.
    Returns ``{"bigrams": (w1, w2, c12), "unigrams": (w, c1), "total":
    (total_tokens,)}`` — all DataFrames (the total is a 1-row frame
    broadcast into scoring, so the model never leaves the cluster).

    The single pass (r14 — the first form tokenized twice): pair rows
    with doc-final tokens kept as ``(w1, NULL)`` put every token
    occurrence in the ``w1`` seat of exactly one row, so ONE
    ``(w1, w2)``-level count aggregation over the corpus yields the
    bigram table directly AND the unigram counts as a roll-up over
    bigram TYPES — ``c1(w) = sum of c12 over w's continuations
    (NULL included)`` — a second aggregation that is corpus-SUBLINEAR
    (it never sees token rows, only the type table)."""
    pair_counts = (
        token_pair_rows(
            docs, id_col=id_col, text_col=text_col, keep_last=True
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    unigrams = pair_counts.groupBy(F.col("w1").alias("w")).agg(
        F.sum("c12").alias("c1")
    )
    bigrams = pair_counts.filter(F.col("w2").isNotNull())
    total = unigrams.agg(F.sum("c1").cast("double").alias("total_tokens"))
    return {"bigrams": bigrams, "unigrams": unigrams, "total": total}


def score_bigram_lm(
    docs: DataFrame,
    model: dict,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """Per-document mean log2 stupid-backoff score under ``model``:
    ``(id_col, n_bigrams, avg_log2_s)`` — rounded to 5 (the repo's
    cross-engine grain). Documents with <2 tokens score NULL with
    ``n_bigrams = 0`` (nothing to condition on), and stay in the output
    so a quality gate can route them explicitly.

    Plan: tokenize once; LEFT join bigram counts on (w1, w2), unigram
    counts on the context w1 (denominator) and on w2 (backoff numerator)
    — three equi-joins on token keys, AQE-splittable; the 1-row total
    crossJoins in as a broadcast scalar; one final per-doc aggregate. No
    Python stage anywhere."""
    pairs = token_pair_rows(docs, id_col=id_col, text_col=text_col)
    uni = model["unigrams"]
    joined = (
        pairs.join(model["bigrams"], ["w1", "w2"], "left")
        .join(
            uni.select(F.col("w").alias("w1"), F.col("c1").alias("_c_w1")),
            "w1",
            "left",
        )
        .join(
            uni.select(F.col("w").alias("w2"), F.col("c1").alias("_c_w2")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(model["total"]))
    )
    s_backoff = F.lit(alpha) * (
        F.coalesce(F.col("_c_w2").cast("double"), F.lit(alpha))
        / F.col("total_tokens")
    )
    s = F.when(
        F.col("c12").isNotNull() & F.col("_c_w1").isNotNull(),
        F.col("c12").cast("double") / F.col("_c_w1").cast("double"),
    ).otherwise(s_backoff)
    scored = joined.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.round(F.avg(F.log2(s)), 5).alias("avg_log2_s"),
    )
    # <2-token docs produce no pair rows: route them back explicitly
    all_docs = docs.select(id_col).distinct()
    return (
        all_docs.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            "avg_log2_s",
        )
    )
