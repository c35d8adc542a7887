"""As-of and range joins — operators Spark lacks natively, built as
compositions of built-in ops (SURVEY.md §7 phase 4 / guide 'Common
OLAP patterns').

as-of join (backward): for each left row, the single most recent right
row with rt <= lt within the same key. Implemented with the
union+window trick:

    tag left/right → union → window last_value over (key ORDER BY ts,
    right-first tiebreak) → filter left rows

One shuffle on (key), no per-key pandas, no cross join — the plan is a
single sort-based window, which scales to arbitrarily large inputs and
AQE-handles key skew. (pd.merge_asof-per-group via applyInPandas is
the fallback when the payload is too wide to union; same API.)

range join: equi-bucketize the range key so candidates meet on
(key, bucket) instead of a cross join; exact predicate re-applied
after. Bucket width ≈ range width ⇒ each left row probes ≤2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_right",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """For each left row: latest right row with right_on <= left_on,
    matched within `by`. Right payload columns arrive suffixed; rows
    with no prior right row keep NULLs (left outer semantics).

    ``right_tiebreak`` (ADVICE r11): a right-side column name ordering
    EQUAL-``right_on`` right rows deterministically — ascending with
    NULLs last, so the row with the greatest tiebreak (NULL = +inf)
    wins. Without it, which of several right rows sharing a timestamp
    is picked is partitioning-dependent."""
    lcols = left.columns
    tb_type = dict(right.dtypes)[right_tiebreak] if right_tiebreak else "int"
    tagged_l = left.select(
        F.col(by).alias("_by"),
        F.col(left_on).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(tb_type).alias("_tb"),
        F.struct(*[F.col(c) for c in lcols]).alias("_l"),
        F.lit(None).cast("struct<" + ",".join(
            f"{c}:{dict(right.dtypes)[c]}" for c in right_cols
        ) + ">").alias("_r"),
    )
    tagged_r = right.select(
        F.col(by).alias("_by"),
        F.col(right_on).alias("_ts"),
        F.lit(0).alias("_is_left"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(0)).cast(
            tb_type
        ).alias("_tb"),
        F.lit(None).cast(tagged_l.schema["_l"].dataType).alias("_l"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    )
    # right rows sort BEFORE left rows at equal ts → a right row at
    # exactly lt matches (<= semantics, like pd.merge_asof default);
    # the tiebreak orders only WITHIN right rows at one timestamp
    # (left rows all carry NULL and are already separated by _is_left)
    w = (
        Window.partitionBy("_by")
        .orderBy(F.col("_ts"), F.col("_is_left"), F.col("_tb").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = tagged_l.unionByName(tagged_r).withColumn(
        "_last_r", F.last("_r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("_is_left") == 1).select(
        F.col("_l.*"),
        *[F.col(f"_last_r.{c}").alias(c + suffix) for c in right_cols],
    )
    return out


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: str,
    max_gap_seconds: int,
) -> DataFrame:
    """Pairs (left, right) with same `by` and right_ts in
    [left_ts - gap, left_ts]: bucketize time by the gap width and join
    on (by, bucket±1) — candidates per row are bounded by bucket
    population, never the whole key group."""
    gap = F.lit(max_gap_seconds)
    lb = left.withColumn("_lb", (F.unix_timestamp(left_ts) / gap).cast("long"))
    # rename the right-side key so the equi-join condition can't resolve
    # both sides to the same attribute when left/right share lineage
    rb = right.withColumnRenamed(by, "_rby").withColumn(
        "_rb", (F.unix_timestamp(right_ts) / gap).cast("long")
    )
    # a right row in [lt-gap, lt] lives in bucket(lt) or bucket(lt)-1
    probe = lb.withColumn("_probe", F.explode(F.array(F.col("_lb"), F.col("_lb") - 1)))
    joined = probe.join(rb, (F.col("_probe") == F.col("_rb")) & (F.col(by) == F.col("_rby")))
    cond = (F.col(right_ts) <= F.col(left_ts)) & (
        F.col(right_ts) >= F.col(left_ts) - F.make_dt_interval(secs=gap)
    )
    return joined.filter(cond).drop("_lb", "_rb", "_probe", "_rby")


def asof_join_backward_pandas(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: str,
    right_cols: list[str],
    suffix: str = "_right",
) -> DataFrame:
    """The cogrouped-pandas strategy for the same as-of semantics:
    applyInPandas over a cogroup on the key, pd.merge_asof per group.
    Prefer this over the union+window plan when the LEFT payload is
    wide (the union plan carries left payload through the window sort;
    this one sorts only within each Arrow batch). Same one-shuffle
    cost, but Python workers in the path — measure before choosing."""
    import pandas as pd

    out_fields = []
    for f in left.schema.fields:
        out_fields.append(f"{f.name} {f.dataType.simpleString()}")
    rtypes = dict(right.dtypes)
    for c in right_cols:
        out_fields.append(f"{c}{suffix} {rtypes[c]}")
    schema = ", ".join(out_fields)
    lcols = list(left.columns)

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(l_pdf) == 0:
            return pd.DataFrame(columns=lcols + [c + suffix for c in right_cols])
        l_sorted = l_pdf.sort_values(left_on)
        r_sorted = r_pdf.sort_values(right_on)[[right_on, *right_cols]].rename(
            columns={c: c + suffix for c in right_cols}
        )
        merged = pd.merge_asof(
            l_sorted, r_sorted, left_on=left_on, right_on=right_on, direction="backward"
        )
        return merged[lcols + [c + suffix for c in right_cols]]

    return (
        left.groupBy(by)
        .cogroup(right.groupBy(by))
        .applyInPandas(merge, schema=schema)
    )


def point_in_time_join(
    facts: DataFrame,
    dim_history: DataFrame,
    key: str,
    fact_ts: str,
    payload_cols: list[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    suffix: str = "_dim",
) -> DataFrame:
    """Point-in-time (feature-store / time-travel) join: each fact row
    picks the dimension VERSION that was valid at the fact's own
    timestamp — the join that makes training features leakage-free
    (a model trained on facts must never see a dimension state from
    the future) and the read side of ``relational.scd2_history``.

    Semantics: the version with the latest ``valid_from`` <=
    fact_ts, provided fact_ts < ``valid_to`` (NULL = open current
    version; half-open intervals, matching SCD2's contract). Facts
    before any version, or falling in a GAP of a non-contiguous
    history, get NULL payload (left-outer, never dropped).

    Scale shape: built ON the as-of join's union+window plan — one
    hash exchange on the key + one sort-window, never a range/theta
    join that would explode per-key pairs; the expiry check is a
    row-local filter after the window. SCD2 histories are contiguous
    per key so the expiry branch only fires on gapped custom
    histories — kept for generality, costs one comparison.

    Equal-``valid_from`` versions (ADVICE r11 medium): SCD2 histories
    built from equal-timestamp state changes can hold a ZERO-DURATION
    version [t, t) alongside the survivor [t, next). A zero-length
    version is valid at NO timestamp (half-open interval is empty), so
    it is dropped up front — and the remaining equal-``valid_from``
    rows (malformed custom histories only) resolve deterministically
    to the latest-surviving one via the as-of tiebreak on ``valid_to``
    ascending NULLs-last (NULL = open = greatest). Both rules match
    the interval-predicate oracle exactly."""
    right_cols = [*payload_cols, valid_from, valid_to]
    live = dim_history.filter(
        F.col(valid_to).isNull() | (F.col(valid_to) != F.col(valid_from))
    )
    joined = asof_join_backward(
        facts,
        live,
        fact_ts,
        valid_from,
        key,
        right_cols,
        suffix=suffix,
        right_tiebreak=valid_to,
    )
    vt = F.col(valid_to + suffix)
    expired = vt.isNotNull() & (vt <= F.col(fact_ts))
    out = joined
    for c in right_cols:
        out = out.withColumn(
            c + suffix, F.when(expired, F.lit(None)).otherwise(F.col(c + suffix))
        )
    return out
