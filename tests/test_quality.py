"""Contract tests for operators/quality.py — the full Gopher repetition
panel (Rae et al. 2021 Table A1) against a plain-Python reference,
including the separator levels (lines vs paragraphs), tie-breaks, short
docs, and empty docs."""

from __future__ import annotations

import re

import pytest

from pyspark.sql import functions as F

from multiomix_aws_emr_spark.operators.quality import (
    ngram_repetition,
    repetition_signals,
    segment_repetition,
)

TOP_NS = (2, 3)
DUP_NS = (2, 5)


def _toks(text):
    return [t for t in text.split(" ") if t]


def _py_segments(text, sep_re):
    segs = [s for s in re.split(sep_re, text) if s != ""]
    if not segs:
        return (0, None, None)
    counts: dict[str, int] = {}
    for s in segs:
        counts[s] = counts.get(s, 0) + 1
    total = len(segs)
    distinct = len(counts)
    chars = sum(c * len(s) for s, c in counts.items())
    excess = sum((c - 1) * len(s) for s, c in counts.items())
    return (
        total,
        round((total - distinct) / total, 5),
        round(excess / chars, 5) if chars else None,
    )


def _py_ngrams(text):
    toks = _toks(text)
    out = {}
    for n in sorted(set(TOP_NS) | set(DUP_NS)):
        grams = [
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        ]
        if not grams or not len(text):
            out[n] = (None, None)
            continue
        counts: dict[str, int] = {}
        for g in grams:
            counts[g] = counts.get(g, 0) + 1
        top = max(c * len(g) for g, c in counts.items())
        dup = sum(c * len(g) for g, c in counts.items() if c >= 2)
        out[n] = (round(top / len(text), 5), round(dup / len(text), 5))
    return out


DOCS = [
    (1, "the cat sat on the mat the cat sat on the mat"),
    (2, "alpha beta\nalpha beta\ngamma\n\ndelta epsilon\n\ndelta epsilon"),
    (3, "one two three four five six seven eight nine ten"),
    (4, "x"),
    (5, ""),
    (6, "rep rep rep rep rep rep rep rep"),
    (7, "a b\na b\na b\n\na b\na b"),
]


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_segment_repetition_lines_and_paragraphs_match_python(frame):
    for sep_spark, sep_py, prefix in (
        ("\n", r"\n", "line"),
        ("\n\n+", r"\n\n+", "paragraph"),
    ):
        got = {
            r.doc_id: r
            for r in segment_repetition(
                frame, sep=sep_spark, prefix=prefix
            ).collect()
        }
        assert set(got) == {d for d, _ in DOCS}
        for doc_id, text in DOCS:
            total, dup_frac, dup_char = _py_segments(text, sep_py)
            r = got[doc_id]
            assert r[f"n_{prefix}s"] == total, (prefix, doc_id)
            assert r[f"dup_{prefix}_frac"] == dup_frac, (prefix, doc_id)
            assert r[f"dup_{prefix}_char_frac"] == dup_char, (prefix, doc_id)


def test_ngram_repetition_matches_python_and_handles_short_docs(frame):
    got = {
        r.doc_id: r
        for r in ngram_repetition(
            frame, top_ns=TOP_NS, dup_ns=DUP_NS
        ).collect()
    }
    assert set(got) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        want = _py_ngrams(text)
        r = got[doc_id]
        for n in TOP_NS:
            assert r[f"top_{n}_gram_char_frac"] == want[n][0], (doc_id, n)
        for n in DUP_NS:
            assert r[f"dup_{n}_gram_char_frac"] == want[n][1], (doc_id, n)


def test_repetition_signals_panel_shape_plan_and_fixture(spark, sf_dir, frame):
    panel = repetition_signals(frame, top_ns=TOP_NS, dup_ns=DUP_NS)
    plan = panel._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    rows = {r.doc_id: r for r in panel.collect()}
    assert set(rows) == {d for d, _ in DOCS}
    # doc 6 is pure repetition: every 2-gram identical -> dup mass is the
    # whole gram stream, and the top bigram's share is deterministic
    assert rows[6].dup_2_gram_char_frac == pytest.approx(
        7 * 7 / len(DOCS[5][1]), abs=1e-4
    )
    # empty doc: present, all fractions NULL
    assert rows[5].n_chars == 0 and rows[5].dup_line_frac is None
    assert rows[5].top_2_gram_char_frac is None

    # fixture smoke: every doc_id present, fractions in [0, ...) or NULL
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    out = repetition_signals(d, top_ns=(2,), dup_ns=(5,))
    n = d.count()
    assert out.count() == n
    bad = out.filter(
        (F.col("dup_line_frac") < 0)
        | (F.col("top_2_gram_char_frac") < 0)
        | (F.col("dup_5_gram_char_frac") < 0)
    )
    assert bad.count() == 0


def test_unigram_rarity_single_pass_identical_contract(spark, sf_dir):
    """The production type-table shape (operators/quality.unigram_rarity)
    must be value-identical to the declared text_unigram_rarity query on
    the fixture corpus — same schema, same rows, same rounded values
    (the kmeans_quantizer_swap precedent: a production swap earns its
    keep by matching the declared contract bit-for-bit)."""
    from multiomix_aws_emr_spark.operators.quality import unigram_rarity
    from multiomix_aws_emr_spark.queries import QUERIES
    from multiomix_aws_emr_spark.sources.tables import load

    declared = QUERIES["text_unigram_rarity"](spark, sf_dir)
    component = unigram_rarity(load(spark, sf_dir, "documents"))
    assert component.schema == declared.schema
    a = sorted(declared.collect())
    b = sorted(component.collect())
    assert a == b and len(a) > 0


def test_unigram_rarity_single_pass_reuses_exchange(spark, sf_dir):
    """The component's point is ONE tokenize pass: after execution the
    final adaptive plan must contain ReusedExchange nodes standing in
    for the repeated (doc, tok) aggregation subtree."""
    from multiomix_aws_emr_spark.operators.quality import unigram_rarity
    from multiomix_aws_emr_spark.sources.tables import load

    df = unigram_rarity(load(spark, sf_dir, "documents"))
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan
