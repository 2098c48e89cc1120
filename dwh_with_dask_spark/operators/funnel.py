"""Ordered-funnel analysis over event streams.

ABSENT-IN-REFERENCE (SURVEY.md §2B north-star): sequential conversion
counting — of the users who did step 1, how many later did step 2, then
step 3 — the windowFunnel-style operator of event-analytics engines,
built Spark-first:

- events are filtered to the funnel's step types at the scan (predicate
  pushdown — the fat event log never leaves the scan un-pruned);
- ONE shuffle on the user key collects each user's (ts, step) pairs;
  ``array_sort`` orders them row-locally by (timestamp, FUNNEL-STEP
  INDEX) — not by the step's type string — so at tied timestamps the
  earlier funnel step is folded first and a same-instant conversion
  (``ts_step_i == ts_step_{i-1}``, legal under the oracle's ``>=``
  min-scan) is never dropped just because the later step's type sorts
  lexicographically earlier;
- a single ``F.aggregate`` fold walks the sorted array carrying the
  per-step first-reach timestamps — the classic sequential-scan funnel
  state machine, expressed as a codegen'd higher-order function instead
  of a Python loop. No window, no self-join per step, no driver collect;
- the final global step counts are one tiny partial-aggregated sum.

Semantics (matches the min-scan SQL formulation the oracle uses):
``reach[0] = min ts of step0``; ``reach[i] = min ts of step_i with
ts >= reach[i-1]``. Steps must be pairwise-distinct event types — with
repeated types a single event could legally satisfy two adjacent steps
in the SQL formulation but not in the fold; the constructor rejects
that ambiguity instead of silently diverging.

At 100 TB per-user event counts are bounded (the collected array is one
user's funnel-relevant events only) and skew is an AQE concern like any
key shuffle; a ``within`` gap cap bounds state the same way the
streaming session window does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_reach(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Per-key first-reach timestamps: (key, reach array<timestamp>).

    ``reach[i]`` is null iff the key never completed step i in order.
    ``within`` (e.g. ``'3 days'``): step i only counts if it lands at
    most that long after step i-1's first reach — the conversion-window
    cap. First-touch semantics throughout: the window anchors on the
    FIRST reach of the previous step, not on any later retry.
    """
    if len(steps) != len(set(steps)):
        raise ValueError("funnel steps must be pairwise distinct")
    n = len(steps)
    step_arr = F.array(*[F.lit(s) for s in steps])
    within_ivl = F.expr(f"INTERVAL {within}") if within is not None else None

    # Sort key is (t, step index): struct comparison is field-by-field,
    # so ties on t resolve to the EARLIER funnel step first — required
    # for the fold to match the oracle's `>=` min-scan when two steps
    # land on the same timestamp (ADVICE r5: 'click' < 'view' would
    # otherwise drop a same-instant view→click conversion).
    per_key = (
        events.filter(F.col(type_col).isin(steps))
        .groupBy(F.col(key_col).alias("key"))
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("t"),
                        F.array_position(step_arr, F.col(type_col))
                        .cast("int")
                        .alias("i"),
                        F.col(type_col).alias("s"),
                    )
                )
            ).alias("seq")
        )
    )

    init = F.array(*[F.lit(None).cast("timestamp") for _ in range(n)])
    # Fold one event into the reach state: a step slot fills when it is
    # empty, the event is its type, and the previous slot filled at an
    # earlier-or-equal timestamp. `transform` reads the PRE-event state
    # for every slot, so one event can never cascade through two slots.
    def _merge(acc, ev):
        # element_at is 1-based; clamp the previous-slot index to 1 so the
        # i=0 branch (whose OR arm is already true) never evaluates an
        # index-0 access under ANSI mode.
        def slot(v, i):
            prev_slot = F.element_at(acc, F.greatest(i, F.lit(1)))
            after_prev = prev_slot.isNotNull() & (ev["t"] >= prev_slot)
            if within_ivl is not None:
                after_prev = after_prev & (ev["t"] <= prev_slot + within_ivl)
            return F.when(v.isNotNull(), v).when(
                (ev["s"] == F.element_at(step_arr, i + F.lit(1)))
                & ((i == F.lit(0)) | after_prev),
                ev["t"],
            )

        return F.transform(acc, slot)

    return per_key.select("key", F.aggregate("seq", init, _merge).alias("reach"))


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
) -> DataFrame:
    """Funnel summary: (step_no, step, n_keys) — keys reaching each step
    in order. Monotone non-increasing by construction."""
    reach = funnel_reach(events, steps, key_col, ts_col, type_col, within)
    counts = reach.agg(
        *[
            F.sum(
                F.element_at("reach", i + 1).isNotNull().cast("long")
            ).alias(f"__n{i}")
            for i in range(len(steps))
        ]
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("int").alias("step_no"),
                F.lit(s).alias("step"),
                F.col(f"__n{i}").alias("n_keys"),
            )
            for i, s in enumerate(steps)
        ]
    )
    return counts.select(F.inline(rows))
