"""Declarative data-quality checks (Deequ/dbt-test style, public idea).

ABSENT-IN-REFERENCE (SURVEY.md §2B north-star): the validation layer a
warehouse load runs before publishing — uniqueness, completeness,
referential integrity, accepted ranges/sets — declared as rules and
evaluated in as few passes as the rule mix allows:

- row-local rules (not-null, range, set membership, custom predicate)
  fold into ONE aggregation over the table — a single scan regardless
  of rule count;
- uniqueness rules each need a distinct count (one Expand-backed
  aggregate shared by all uniqueness rules, the profile_table split);
- referential rules are one left-anti join per referenced table —
  broadcast when the dimension is small, the usual equi-join shapes
  otherwise.

Output is uniform: (rule, column, violations, n_rows, passed) — one
row per rule, so the suite lands in a dashboard or a CI gate the same
way. All counts are exact; the oracle reproduces each rule as plain
SQL (plans/analytics.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Rule:
    """One check. ``kind``: not_null | unique | in_set | in_range |
    predicate | foreign_key."""

    kind: str
    column: str
    name: str | None = None
    values: list | None = None          # in_set
    lo: float | None = None             # in_range (inclusive)
    hi: float | None = None
    predicate: Column | None = None     # predicate: violation when FALSE/NULL
    ref: DataFrame | None = None        # foreign_key
    ref_col: str | None = None
    extra: dict = field(default_factory=dict)

    @property
    def rule_name(self) -> str:
        return self.name or f"{self.kind}:{self.column}"


def dq_checks(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → (rule, column, violations,
    n_rows, passed)."""
    spark = df.sparkSession
    rowlocal: list[Rule] = []
    uniques: list[Rule] = []
    fks: list[Rule] = []
    for r in rules:
        if r.kind == "unique":
            uniques.append(r)
        elif r.kind == "foreign_key":
            fks.append(r)
        elif r.kind in ("not_null", "in_set", "in_range", "predicate"):
            rowlocal.append(r)
        else:
            raise ValueError(f"unknown rule kind {r.kind!r}")

    def violation(r: Rule) -> Column:
        c = F.col(r.column)
        if r.kind == "not_null":
            bad = c.isNull()
        elif r.kind == "in_set":
            bad = c.isNull() | ~c.isin(r.values)
        elif r.kind == "in_range":
            bad = c.isNull() | (c < F.lit(r.lo)) | (c > F.lit(r.hi))
        else:  # predicate: anything not definitely-true violates
            bad = ~F.coalesce(r.predicate, F.lit(False))
        return F.sum(bad.cast("long")).alias(f"__v_{r.rule_name}")

    parts: list[DataFrame] = []

    if rowlocal or uniques:
        aggs = [F.count(F.lit(1)).alias("__n")]
        aggs += [violation(r) for r in rowlocal]
        base = df.agg(*aggs)
        if uniques:
            # distinct counts split into their own aggregate so string
            # min/max buffers never demote the Expand to a sort
            # (operators/profile.py, measured there)
            dis = df.agg(
                *[
                    F.count_distinct(F.col(r.column)).alias(
                        f"__d_{r.rule_name}"
                    )
                    for r in uniques
                ],
                *[
                    F.count(F.col(r.column)).alias(f"__nn_{r.rule_name}")
                    for r in uniques
                ],
            )
            # single-row aggregate: hint the broadcast explicitly, same
            # convention as every scalar crossJoin in the repo (ADVICE r12)
            base = base.crossJoin(F.broadcast(dis))
        rows = []
        for r in rowlocal:
            rows.append(
                F.struct(
                    F.lit(r.rule_name).alias("rule"),
                    F.lit(r.column).alias("column"),
                    F.col(f"__v_{r.rule_name}").alias("violations"),
                    F.col("__n").alias("n_rows"),
                )
            )
        for r in uniques:
            # violations = non-null rows beyond one per distinct value
            rows.append(
                F.struct(
                    F.lit(r.rule_name).alias("rule"),
                    F.lit(r.column).alias("column"),
                    (
                        F.col(f"__nn_{r.rule_name}")
                        - F.col(f"__d_{r.rule_name}")
                    ).alias("violations"),
                    F.col("__n").alias("n_rows"),
                )
            )
        parts.append(base.select(F.inline(F.array(*rows))))

    for r in fks:
        orphans = (
            df.select(F.col(r.column))
            .filter(F.col(r.column).isNotNull())
            .join(
                r.ref.select(F.col(r.ref_col).alias(r.column)).distinct(),
                r.column,
                "left_anti",
            )
            .agg(F.count(F.lit(1)).alias("violations"))
        )
        n = df.agg(F.count(F.lit(1)).alias("n_rows"))
        parts.append(
            orphans.crossJoin(F.broadcast(n)).select(
                F.lit(r.rule_name).alias("rule"),
                F.lit(r.column).alias("column"),
                "violations",
                "n_rows",
            )
        )

    if not parts:
        raise ValueError("dq_checks: no rules supplied")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "rule", "column", "violations", "n_rows",
        (F.col("violations") == 0).alias("passed"),
    )


def dq_row_flags(
    df: DataFrame, rules: list[Rule], flag_col: str = "dq_violations"
) -> DataFrame:
    """Per-ROW rule evaluation for gating/quarantine routing: appends
    ``flag_col`` = array of violated rule names (empty = clean row).

    Row-local rules only (not_null / in_set / in_range / predicate) —
    the subset that is streaming-legal with zero state; ``unique`` and
    ``foreign_key`` need corpus-global context and stay in the batch
    ``dq_checks`` aggregate. One codegen'd projection, no shuffle."""
    names, flags = [], []
    for r in rules:
        if r.kind not in ("not_null", "in_set", "in_range", "predicate"):
            raise ValueError(
                f"dq_row_flags: rule kind {r.kind!r} is not row-local"
            )
        c = F.col(r.column)
        if r.kind == "not_null":
            bad = c.isNull()
        elif r.kind == "in_set":
            bad = c.isNull() | ~c.isin(r.values)
        elif r.kind == "in_range":
            bad = c.isNull() | (c < F.lit(r.lo)) | (c > F.lit(r.hi))
        else:
            bad = ~F.coalesce(r.predicate, F.lit(False))
        names.append(r.rule_name)
        flags.append(F.when(bad, F.lit(r.rule_name)))
    arr = F.array_compact(F.array(*flags)) if flags else F.array().cast(
        "array<string>"
    )
    return df.withColumn(flag_col, arr)
