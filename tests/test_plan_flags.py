"""GENERATE_PROJ detector tests — the round-5 defect class, machine-
caught with a positive control.

Round-5 verdict item 2: `quality_ensemble_vote` shipped a plan where the
three heavy quality-flag expression trees landed in the Project ABOVE
the Generate (Catalyst's ExtractGenerator rewrite) and were re-evaluated
once per exploded bigram — a 12× constant-factor defect (51 s vs ~4 s at
sf0.1) that the exchange/join-strategy audit could not see. The detector
(plans/inspect.py::n_generate_hot_projects) flags heavy expressions
(tokenizers / array HOFs) in a Project directly above a Generate that
reference only non-generated columns.

Positive control = the literal pre-fix ensemble shape, rebuilt here.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from weather_analysis_bigdata__spark.plans.inspect import (
    n_generate_hot_projects,
)


@pytest.fixture(scope="module")
def registry():
    from weather_analysis_bigdata__spark.registry import all_queries

    return all_queries()


def _exec_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_positive_control_prefix_ensemble_shape_flagged(spark):
    """The round-5 defective shape: heavy doc-grained expressions
    selected in the SAME projection as an explode. After
    ExtractGenerator they sit above the Generate and MUST be flagged."""
    from weather_analysis_bigdata__spark.functions.textops import (
        tokens,
        word_ngrams,
    )

    d = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z")], "doc_id long, text string"
    )
    text = F.col("text")
    bad = d.select(
        "doc_id",
        # a heavy doc-grained expression (tokenize + HOF over text)
        (F.size(F.array_distinct(tokens(text))) > 2).alias("keep"),
        F.explode_outer(word_ngrams(tokens(text), 2)).alias("g"),
    )
    assert n_generate_hot_projects(_exec_plan(bad)) >= 1


def test_negative_control_gram_local_work_not_flagged(spark):
    """Work over the GENERATED column in the Project above the Generate
    is inherent (it is per-gram by definition) and must NOT be flagged —
    the fixed ensemble's bucket hash is exactly this shape."""
    from weather_analysis_bigdata__spark.functions.textops import (
        tokens,
        word_ngrams,
    )

    d = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y z")], "doc_id long, text string"
    )
    ok = d.select(
        "doc_id",
        F.explode_outer(word_ngrams(tokens(F.col("text")), 2)).alias("g"),
    ).withColumn("h", F.md5(F.col("g")))
    assert n_generate_hot_projects(_exec_plan(ok)) == 0


def test_fixed_ensemble_plan_is_clean(spark, sf_dir, registry):
    """The shipped quality_ensemble_vote must carry NO hot Project above
    its Generate (flags are in a doc-grained generator-free projection,
    equi-joined on doc_id), and the stitch is shuffle-hash not SMJ."""
    df = registry["quality_ensemble_vote"].fn(spark, sf_dir)
    plan = _exec_plan(df)
    assert n_generate_hot_projects(plan) == 0
    assert "Generate" in plan  # the perplexity explode is still there
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_agreement_plan_is_clean(spark, sf_dir, registry):
    plan = _exec_plan(registry["quality_filter_agreement"].fn(spark, sf_dir))
    assert n_generate_hot_projects(plan) == 0
