"""Quality-classifier distillation: learnability, determinism, guards,
custom teachers, and the map-only scoring plan."""

import pytest
from pyspark.sql import functions as F

from siddhi_io_cdc_spark.functions.classifier import (
    QualityClassifier,
    apply_quality_classifier,
    classifier_features,
    fast_sigmoid,
    teacher_label,
    train_quality_classifier,
)


def _corpus(spark):
    """Separable fixture: long stopword-rich docs (keep) vs short ones."""
    good = "the cat and the dog have been to the house with the others " * 12
    bad = "zx qv wk jp md"
    rows = [(i, good if i % 2 == 0 else bad) for i in range(80)]
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_classifier_learns_separable_teacher(spark):
    df = _corpus(spark)
    model = train_quality_classifier(df)
    scored = apply_quality_classifier(df, model)
    lab = classifier_features(df, "text").withColumn("y", teacher_label())
    joined = scored.join(lab.select("doc_id", "y"), "doc_id")
    acc = (
        joined.where(F.col("quality_keep") == (F.col("y") == 1.0)).count()
        / joined.count()
    )
    assert acc == 1.0


def test_classifier_training_is_deterministic(spark):
    df = _corpus(spark)
    assert train_quality_classifier(df) == train_quality_classifier(df)


def test_classifier_custom_teacher_label(spark):
    df = _corpus(spark)
    # distill a different rule: keep iff mean word length under 4
    model = train_quality_classifier(df, label=(F.col("f2") < 4.0).cast("double"))
    scored = apply_quality_classifier(df, model)
    lab = classifier_features(df, "text").select(
        "doc_id", (F.col("f2") < 4.0).alias("y")
    )
    joined = scored.join(lab, "doc_id")
    acc = (
        joined.where(F.col("quality_keep") == F.col("y")).count() / joined.count()
    )
    assert acc == 1.0


def test_classifier_guards(spark):
    df = _corpus(spark)
    with pytest.raises(ValueError):
        train_quality_classifier(df, n_iters=0)
    with pytest.raises(ValueError):
        train_quality_classifier(
            spark.createDataFrame([], "doc_id bigint, text string")
        )


def test_fast_sigmoid_matches_rational_form(spark):
    rows = (
        spark.range(1)
        .select(
            *[
                fast_sigmoid(F.lit(z)).alias(f"s{i}")
                for i, z in enumerate([-10.0, -1.0, 0.0, 0.5, 3.0])
            ]
        )
        .first()
    )
    for i, z in enumerate([-10.0, -1.0, 0.0, 0.5, 3.0]):
        assert rows[f"s{i}"] == 0.5 + z / (2.0 * (1.0 + abs(z)))


def test_apply_plan_is_map_only(spark):
    df = _corpus(spark)
    model = QualityClassifier(
        (0.1,) * 6, (1.0, 1.0, 0.0, 0.0, 0.5), (1.0,) * 5
    )
    plan = (
        apply_quality_classifier(df, model)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # only fan_out's round-robin widening; no hash shuffle, no Python
    assert "Exchange hashpartitioning" not in plan and "Python" not in plan


def test_round9_is_half_away_from_zero():
    """Collected-scalar rounding must match the engines' HALF_UP (away from
    zero), not Python round()'s banker's half-to-even — an exact half at
    the 9th decimal would otherwise desynchronize every GD iteration."""
    from siddhi_io_cdc_spark.functions.classifier import _round9

    assert _round9(0.0000000005) == 1e-9       # round() gives 0.0
    assert _round9(-0.0000000005) == -1e-9     # away from zero
    assert _round9(0.0000000015) == 2e-9
    assert _round9(1.2345678915) == 1.234567892
    assert _round9(0.1) == 0.1                 # shortest-repr passthrough
