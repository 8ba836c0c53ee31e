"""Contract tests for operators/lm.py — the stupid-backoff bigram LM
quality-scoring tier (Brants 2007; the CCNet-shaped perplexity-proxy
filter). Verified against a plain-Python reference on the fixture corpus,
including the held-out/backoff path the self-scored corpus never hits."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from multiomix_aws_emr_spark.operators.lm import (
    score_bigram_lm,
    train_bigram_lm,
)

ALPHA = 0.4


def _tokens(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def _py_model(rows):
    uni: dict[str, int] = {}
    bi: dict[tuple[str, str], int] = {}
    total = 0
    for r in rows:
        toks = _tokens(r.text)
        total += len(toks)
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    return uni, bi, float(total)


def _py_scores(rows, uni, bi, total):
    out = {}
    for r in rows:
        toks = _tokens(r.text)
        logs = []
        for a, b in zip(toks, toks[1:]):
            if (a, b) in bi and a in uni:
                s = bi[(a, b)] / uni[a]
            else:
                s = ALPHA * (uni.get(b, ALPHA) / total)
            logs.append(math.log2(s))
        out[r.doc_id] = (
            len(logs),
            round(sum(logs) / len(logs), 5) if logs else None,
        )
    return out


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def test_bigram_lm_self_scoring_matches_python_reference(spark, sf_dir):
    d = _docs(spark, sf_dir)
    rows = d.collect()
    uni, bi, total = _py_model(rows)
    want = _py_scores(rows, uni, bi, total)

    model = train_bigram_lm(d)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_log2_s)
        for r in score_bigram_lm(d, model, alpha=ALPHA).collect()
    }
    assert set(got) == set(want)
    for doc_id, (n, avg) in want.items():
        gn, gavg = got[doc_id]
        assert gn == n, doc_id
        if avg is None:
            assert gavg is None, doc_id
        else:
            assert abs(gavg - avg) <= 2e-5, (doc_id, gavg, avg)


def test_bigram_lm_backoff_on_held_out_docs(spark, sf_dir):
    """Train on even doc_ids, score odd ones: unseen bigrams take the
    alpha*unigram backoff and unseen unigrams the alpha epsilon — the
    branches the self-scored corpus can never exercise."""
    d = _docs(spark, sf_dir)
    train = d.filter(F.col("doc_id") % 2 == 0)
    held = d.filter(F.col("doc_id") % 2 == 1)
    uni, bi, total = _py_model(train.collect())
    held_rows = held.collect()
    want = _py_scores(held_rows, uni, bi, total)
    # the held-out half must actually exercise backoff for the test to
    # mean anything
    assert any(
        (a, b) not in bi
        for r in held_rows
        for a, b in zip(_tokens(r.text), _tokens(r.text)[1:])
    )

    model = train_bigram_lm(train)
    got = {
        r.doc_id: (r.n_bigrams, r.avg_log2_s)
        for r in score_bigram_lm(held, model, alpha=ALPHA).collect()
    }
    assert set(got) == set(want)
    for doc_id, (n, avg) in want.items():
        gn, gavg = got[doc_id]
        assert gn == n
        if avg is None:
            assert gavg is None
        else:
            assert abs(gavg - avg) <= 2e-5, (doc_id, gavg, avg)


def test_bigram_lm_plan_and_degenerate_docs(spark):
    """No Python stage anywhere in train or score; <2-token documents
    come back with n_bigrams=0 and NULL score instead of vanishing."""
    d = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "single"), (3, ""), (4, "a b")],
        "doc_id long, text string",
    )
    model = train_bigram_lm(d)
    scored = score_bigram_lm(d, model)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan

    by_id = {r.doc_id: r for r in scored.collect()}
    assert set(by_id) == {1, 2, 3, 4}
    assert by_id[2].n_bigrams == 0 and by_id[2].avg_log2_s is None
    assert by_id[3].n_bigrams == 0 and by_id[3].avg_log2_s is None
    assert by_id[1].n_bigrams == 5
    # "a b" is a seen bigram scored 1.0 under its own model -> log2 = 0
    assert by_id[4].avg_log2_s == pytest.approx(0.0)
    # self-scored corpus: every score is a seen-bigram ratio <= 1
    assert all(
        r.avg_log2_s <= 0 for r in by_id.values() if r.avg_log2_s is not None
    )


# The validated DuckDB oracle for the r16 `text_lm_score` promotion
# (drafted and hash-verified r15 at sf0.001/0.01 — SURVEY §7 round-15
# extension): train the stupid-backoff bigram LM on the doc_id % 20 != 0
# split, score ALL documents, emit (doc_id, n_bigrams, avg_log2_s)
# rounded to 5. The test below keeps the draft from rotting; promotion
# is: declare the query with exactly this SQL and this composition.
LM_SCORE_ORACLE_DRAFT = """
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS w,
         doc_id % 20 != 0 AS is_train
  FROM documents
), pairs AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM d, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
), tpairs AS (
  SELECT w1, w2, COUNT(*) AS c12 FROM (
    SELECT w[i] AS w1, w[i+1] AS w2
    FROM d, UNNEST(generate_series(1, len(w) - 1)) AS t(i)
    WHERE is_train AND len(w) >= 2
  ) GROUP BY w1, w2
), tuni AS (
  SELECT tok AS w, COUNT(*) AS c1 FROM (
    SELECT UNNEST(w) AS tok FROM d WHERE is_train
  ) GROUP BY tok
), tot AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n FROM tuni),
s AS (
  SELECT p.doc_id,
         CASE WHEN b.c12 IS NOT NULL AND u1.c1 IS NOT NULL
              THEN CAST(b.c12 AS DOUBLE) / u1.c1
              ELSE 0.4 * (COALESCE(CAST(u2.c1 AS DOUBLE), 0.4) / tot.n)
         END AS sc
  FROM pairs p
  LEFT JOIN tpairs b USING (w1, w2)
  LEFT JOIN tuni u1 ON p.w1 = u1.w
  LEFT JOIN tuni u2 ON p.w2 = u2.w, tot
)
SELECT d.doc_id,
       CAST(COALESCE(q.cnt, 0) AS BIGINT) AS n_bigrams,
       ROUND(q.avg_log2, 5) AS avg_log2_s
FROM (SELECT doc_id FROM d) d
LEFT JOIN (
  SELECT doc_id, COUNT(*) AS cnt, AVG(log2(sc)) AS avg_log2
  FROM s GROUP BY doc_id
) q USING (doc_id)
"""


def test_lm_score_oracle_draft_parity(spark, sf_dir):
    """The r16 promotion artifact: train on the % 20 != 0 split, score
    everything — the Spark composition must hash-match the DuckDB draft
    oracle exactly (rows, names, rounded values), including the backoff
    branch the eval-slice docs exercise. Keeping this green means the
    r16 declaration is a mechanical move."""
    import duckdb
    import pandas as pd

    d = _docs(spark, sf_dir)
    model = train_bigram_lm(d.filter("doc_id % 20 != 0"))
    got = (
        score_bigram_lm(d, model)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    want = (
        con.execute(LM_SCORE_ORACLE_DRAFT)
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[want.columns], want, check_dtype=False
    )
    # the split actually exercises backoff: some scored pair is unseen
    assert (got["avg_log2_s"].dropna() < 0).any()
