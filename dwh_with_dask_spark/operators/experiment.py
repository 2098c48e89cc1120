"""A/B experiment analysis: deterministic assignment + two-proportion z-test.

ABSENT-IN-REFERENCE (SURVEY.md §2B north-star): the analytics layer a
warehouse's event tables exist to feed. Both halves follow the repo's
determinism contract:

- **assignment** is the md5-draw idiom (``curation.md5_prefix``): a unit
  keeps its arm forever, across re-partitions, re-runs, and corpus
  growth — the property an experiment actually needs (an RNG assignment
  re-randomizes on every run and silently contaminates arms);
- **the test statistic** uses only IEEE +,-,*,/ and ``sqrt`` (all
  correctly rounded per IEEE-754, unlike ``ln``/``exp``), in one FIXED
  expression tree mirrored by the SQL oracle — so the z-score is
  bit-identical cross-engine with no rounding idiom.

Scale shape: assignment is a stateless map-side expression (no shuffle);
the test is one unit-keyed aggregate (the per-unit conversion rollup)
plus a 4-counter global aggregate — at 100 TB the whole analysis is one
pass over the fact with map-side partial counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dwh_with_dask_spark.operators.curation import frac_to_hex, md5_prefix


def ab_assign(
    unit: Column | str,
    salt: str = "exp",
    treat_frac: float = 0.5,
    control: str = "control",
    treatment: str = "treatment",
) -> Column:
    """Deterministic two-arm assignment from the md5 draw on the unit
    key: stable, stateless, uniform up to 1/16⁴ granularity — the
    ``hash_split`` contract specialized to experiments (salt = the
    experiment id, so concurrent experiments get independent draws)."""
    draw = md5_prefix(unit, 4, salt)
    return F.when(
        draw < F.lit(frac_to_hex(treat_frac, 4)), F.lit(treatment)
    ).otherwise(F.lit(control))


def two_proportion_ztest(
    units: DataFrame,
    arm_col: str = "arm",
    converted_col: str = "converted",
    control: str = "control",
    treatment: str = "treatment",
) -> DataFrame:
    """Pooled two-proportion z-test over a per-UNIT frame (one row per
    experimental unit with its arm and boolean conversion) — the
    standard conversion-rate readout. Returns ONE row:
    (n_control, x_control, rate_control, n_treatment, x_treatment,
    rate_treatment, abs_lift, z_score).

    ``z = (rate_t - rate_c) / sqrt(p·(1-p)·(1/n_c + 1/n_t))`` with the
    pooled rate ``p``; NULL when an arm is empty or the pooled rate is
    degenerate (0 or 1 ⇒ zero standard error — division by zero would
    otherwise raise under ANSI mode). Every operation is an IEEE
    correctly-rounded +,-,*,/,sqrt in a fixed tree, so the oracle
    hash-matches exactly, no round() needed. Sign convention: positive
    z means the TREATMENT converts more.

    The caller owns unit-level rollup (e.g. ``max(event == 'purchase')``
    per user) — the test consumes one row per unit, which is what keeps
    the variance formula valid (event-level rows would be correlated
    within a unit)."""
    is_c = F.col(arm_col) == control
    is_t = F.col(arm_col) == treatment
    conv = F.col(converted_col).cast("long")
    agg = units.agg(
        F.sum(F.when(is_c, 1).otherwise(0)).alias("n_control"),
        F.sum(F.when(is_c, conv).otherwise(0)).alias("x_control"),
        F.sum(F.when(is_t, 1).otherwise(0)).alias("n_treatment"),
        F.sum(F.when(is_t, conv).otherwise(0)).alias("x_treatment"),
    )
    n_c = F.col("n_control").cast("double")
    n_t = F.col("n_treatment").cast("double")
    x_c = F.col("x_control").cast("double")
    x_t = F.col("x_treatment").cast("double")
    rate_c = x_c / n_c
    rate_t = x_t / n_t
    p = (x_c + x_t) / (n_c + n_t)
    se = F.sqrt(
        p * (F.lit(1.0) - p) * (F.lit(1.0) / n_c + F.lit(1.0) / n_t)
    )
    ok = (
        (F.col("n_control") > 0)
        & (F.col("n_treatment") > 0)
        & (p > 0)
        & (p < 1)
    )
    return agg.select(
        "n_control",
        "x_control",
        F.when(F.col("n_control") > 0, rate_c).alias("rate_control"),
        "n_treatment",
        "x_treatment",
        F.when(F.col("n_treatment") > 0, rate_t).alias("rate_treatment"),
        F.when(ok, rate_t - rate_c).alias("abs_lift"),
        F.when(ok, (rate_t - rate_c) / se).alias("z_score"),
    )
