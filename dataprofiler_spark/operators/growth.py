"""Growth-trend / capacity-overflow prediction.

Semantics parity with the reference's auto-increment module
(/root/reference/src/core/autoincrement_metrics.py), re-expressed for Spark:
Spark/Iceberg has no sequences, so "current value" is max(id) over the table
(SURVEY.md §7.4 documents this deliberate semantic mapping). Everything else
is preserved exactly:

  growth rate   linregress slope over (days-since-base, value); returned
                only if > 0, else None          (autoincrement_metrics.py:78-125)
  days_until_full  remaining / slope; 0.0 if already full; None if slope<=0
                                                (:128-152)
  usage %       (current / max_type) * 100      (autoincrement.py:207-231)
  alert tiers   CRITICAL days<30 or usage>=90; WARNING days<90 or usage>=75;
                days-based beats usage-based    (:24-28, :60-75)
  rounding      usage 6dp, growth 2dp, days 2dp (:151-152, :292; autoincrement.py:228)

The slope is the closed form covar_pop(x,y)/var_pop(x) — identical to
scipy.stats.linregress's least-squares slope, but computed as two Spark
aggregates instead of a driver-side scipy call (SURVEY.md §2.10).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Integer max values per type (reference autoincrement.py:24-56; Spark types)
INT_MAX_VALUES = {
    "smallint": 32767,
    "int": 2147483647,
    "integer": 2147483647,
    "bigint": 9223372036854775807,
}

# Alert thresholds (autoincrement_metrics.py:24-28)
CRITICAL_DAYS, WARNING_DAYS = 30, 90
CRITICAL_USAGE, WARNING_USAGE = 90.0, 75.0


@dataclass(frozen=True)
class GrowthProfile:
    current_value: int | None
    max_type_value: int
    usage_percentage: float
    remaining_values: int
    growth_rate_per_day: float | None
    days_until_full: float | None
    alert_status: str


def regression_slope(history: DataFrame, ts_col: str, value_col: str) -> float | None:
    """Least-squares slope per day over a (timestamp, value) series.
    Mirrors calculate_growth_rate: needs ≥2 points, positive slope only
    (autoincrement_metrics.py:78-125)."""
    if history.limit(2).count() < 2:
        return None
    from dataprofiler_spark.functions.expressions import epoch_days

    days = epoch_days(ts_col)
    row = history.agg(
        (F.covar_pop(days, F.col(value_col)) / F.var_pop(days)).alias("slope")
    ).collect()[0]
    slope = row["slope"]
    if slope is None or slope <= 0:
        return None
    return float(slope)


def days_until_full(remaining: int, slope: float | None) -> float | None:
    """autoincrement_metrics.py:128-152: 0.0 if already full, None if no
    positive growth, else remaining/slope rounded 2dp."""
    if remaining <= 0:
        return 0.0
    if slope is None or slope <= 0:
        return None
    return round(remaining / slope, 2)


def alert_status(days: float | None, usage_pct: float) -> str:
    """autoincrement_metrics.py:60-75 — days-based beats usage-based."""
    if days is not None:
        if days < CRITICAL_DAYS:
            return "CRITICAL"
        if days < WARNING_DAYS:
            return "WARNING"
    if usage_pct >= CRITICAL_USAGE:
        return "CRITICAL"
    if usage_pct >= WARNING_USAGE:
        return "WARNING"
    return "OK"


def growth_profile_to_row(p: "GrowthProfile", table_name: str, column_name: str) -> dict:
    """One auto_increment_metrics sink row (reference layout
    clickhouse.py:192-226) from a GrowthProfile."""
    return {
        "table_name": table_name,
        "column_name": column_name,
        "current_value": p.current_value,
        "max_type_value": p.max_type_value,
        "usage_percentage": p.usage_percentage,
        "remaining_values": p.remaining_values,
        "daily_growth_rate": p.growth_rate_per_day,
        "days_until_full": p.days_until_full,
        "alert_status": p.alert_status,
    }


def grouped_growth_profiles(
    df: DataFrame,
    group_col: str,
    id_col: str,
    id_type: str,
    ts_col: str,
    value_col: str | None = None,
) -> DataFrame:
    """Capacity profiles for MANY groups in ONE distributed aggregation —
    the scale shape of `growth_profile` (which is the reference-parity
    single-table API with its driver-side collects). Per group: current =
    floor(max(id)), usage %, positive-slope growth rate, days-until-full,
    alert tier — identical math and rounding to growth_profile
    (autoincrement_metrics.py:24-152), as column expressions.

    One job regardless of group count; at 10^6 tables/groups the driver
    loop would be 10^6 jobs."""
    from dataprofiler_spark.functions.expressions import epoch_days

    value_col = value_col or id_col
    max_type = INT_MAX_VALUES[id_type.lower()]
    days = epoch_days(ts_col)
    agg = df.groupBy(group_col).agg(
        F.floor(F.max(id_col)).cast("long").alias("current_value"),
        F.covar_pop(days, F.col(value_col)).alias("__cov"),
        F.var_pop(days).alias("__var"),
    )
    current = F.col("current_value")
    usage = F.round(current / max_type * 100, 6)
    remaining = F.lit(max_type) - current
    # single-timestamp groups: var = 0 → no measurable slope (guarded —
    # a bare division would raise under ANSI mode)
    slope = F.when(F.col("__var") > 0, F.col("__cov") / F.col("__var"))
    days_until = (
        F.when(remaining <= 0, F.lit(0.0))
        .when(slope > 0, F.round(remaining / slope, 2))
        .otherwise(F.lit(None).cast("double"))
    )
    out = agg.select(
        group_col,
        current,
        usage.alias("usage_percentage"),
        F.when(slope > 0, F.round(slope, 2)).alias("growth_rate_per_day"),
        days_until.alias("days_until_full"),
    )
    d = F.col("days_until_full")
    u = F.col("usage_percentage")
    alert = (
        F.when(d.isNotNull() & (d < CRITICAL_DAYS), "CRITICAL")
        .when(d.isNotNull() & (d < WARNING_DAYS), "WARNING")
        .when(u >= CRITICAL_USAGE, "CRITICAL")
        .when(u >= WARNING_USAGE, "WARNING")
        .otherwise("OK")
    )
    return out.withColumn("alert_status", alert)


def growth_profile(
    df: DataFrame,
    id_col: str,
    id_type: str,
    history: DataFrame | None = None,
    ts_col: str = "scan_time",
    value_col: str = "current_value",
) -> GrowthProfile:
    """Capacity profile for a monotonically-growing id column.

    current = max(id) over the table (one agg job; the sequence point-read
    of autoincrement.py:139-178 has no Spark analog). History is the
    engine's own metrics sink — the same closed loop as the reference
    (sink is also a source, autoincrement_metrics.py:155-212)."""
    max_type = INT_MAX_VALUES[id_type.lower()]
    row = df.agg(F.max(id_col).alias("mx")).collect()[0]
    current = row["mx"]
    if current is None:
        # no rows: usage 0, full capacity remaining (autoincrement.py:213-219)
        return GrowthProfile(None, max_type, 0.0, max_type, None, None, "OK")
    current = int(current)
    usage = round((current / max_type) * 100, 6)
    remaining = max_type - current
    slope = regression_slope(history, ts_col, value_col) if history is not None else None
    slope_rounded = round(slope, 2) if slope is not None else None
    days = days_until_full(remaining, slope)
    return GrowthProfile(
        current, max_type, usage, remaining, slope_rounded, days,
        alert_status(days, usage),
    )


def daily_count_anomalies(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    z_threshold: float = 2.0,
) -> DataFrame:
    """Volume-anomaly detection over the event history: per-(group, day)
    row counts z-scored against the group's own mean/stddev_pop →
    (group, day, cnt, z, is_anomaly). The monitoring-side companion to the
    growth profiles: a day whose ingest volume deviates > z_threshold σ
    from the group's norm flags a pipeline incident (dropped feed, replay,
    runaway producer).

    Scale shape: two hash aggregations (day counts collapse map-side; the
    per-group stats frame is group-sized) + one group-sized broadcast join
    back — no window over the full history, no driver loop. Groups with a
    single day or zero variance yield z = NULL / is_anomaly = false (no
    baseline to deviate from)."""
    daily = df.groupBy(
        F.col(group_col), F.to_date(F.col(ts_col)).alias("day")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # null-safe join back: a NULL group value (rows with a missing
    # source/type — exactly the feed most likely to misbehave) must keep
    # its history, not vanish through a plain equi-join
    stats = daily.groupBy(group_col).agg(
        F.avg("cnt").alias("__mean"), F.stddev_pop("cnt").alias("__std")
    ).withColumnRenamed(group_col, "__g")
    z = F.when(
        F.col("__std") > 0, (F.col("cnt") - F.col("__mean")) / F.col("__std")
    )
    return (
        daily.join(F.broadcast(stats), F.col(group_col).eqNullSafe(F.col("__g")))
        .select(
            group_col,
            "day",
            "cnt",
            F.round(z, 6).alias("z"),
            F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
        )
    )


def metric_history_anomalies(
    history: DataFrame,
    group_cols: list[str],
    metric_col: str,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Generic z-score anomaly flagging over a stored metric history: each
    observation of `metric_col` is scored against ITS OWN group's
    mean/stddev_pop across snapshots → all history columns + (z,
    is_anomaly). The closed-loop monitor the reference's dashboard eyeballs
    (metric-delta panels), made into a verdict: a profile snapshot whose
    row_count/null rate/distinct count deviates > z_threshold σ from the
    column's history flags a data incident.

    Same shape as daily_count_anomalies: one group-sized stats aggregate +
    a null-safe broadcast join back (NULL group keys keep their history) —
    no window over the history. Groups with <2 snapshots or zero variance
    yield z = NULL / is_anomaly = false."""
    stats = history.groupBy(*group_cols).agg(
        F.avg(metric_col).alias("__mean"), F.stddev_pop(metric_col).alias("__std")
    )
    for i, g in enumerate(group_cols):
        stats = stats.withColumnRenamed(g, f"__g{i}")
    cond = None
    for i, g in enumerate(group_cols):
        eq = F.col(g).eqNullSafe(F.col(f"__g{i}"))
        cond = eq if cond is None else (cond & eq)
    z = F.when(
        F.col("__std") > 0, (F.col(metric_col) - F.col("__mean")) / F.col("__std")
    )
    return (
        history.join(F.broadcast(stats), cond)
        .select(
            *history.columns,
            F.round(z, 6).alias("z"),
            F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
        )
    )


def metric_history_anomalies_robust(
    history: DataFrame,
    group_cols: list[str],
    metric_col: str,
    z_threshold: float = 3.5,
) -> DataFrame:
    """MAD-based robust variant of metric_history_anomalies: score each
    observation with the modified z-score 0.6745·(x − median)/MAD, where
    MAD = median(|x − group median|). A mean/σ z-score is itself dragged by
    the outlier it is trying to flag (one 100× row-count spike inflates σ
    enough to hide itself); median/MAD have a 50% breakdown point, so one
    bad snapshot can never mask itself. 3.5 is the standard
    Iglewicz–Hoban cutoff.

    Shape: two group-sized aggregates (median, then MAD of deviations —
    MAD is inherently two-pass: the deviations need the median first) +
    null-safe broadcast joins back; no window over the history. Zero MAD
    (≥half the group identical) yields rz = NULL / is_anomaly = false —
    absent, never ±inf."""
    med = history.groupBy(*group_cols).agg(F.median(metric_col).alias("__med"))
    for i, g in enumerate(group_cols):
        med = med.withColumnRenamed(g, f"__mg{i}")
    cond = None
    for i, g in enumerate(group_cols):
        eq = F.col(g).eqNullSafe(F.col(f"__mg{i}"))
        cond = eq if cond is None else (cond & eq)
    with_med = history.join(F.broadcast(med), cond)
    mad = with_med.groupBy(*group_cols).agg(
        F.median(F.abs(F.col(metric_col) - F.col("__med"))).alias("__mad")
    )
    for i, g in enumerate(group_cols):
        mad = mad.withColumnRenamed(g, f"__ag{i}")
    cond2 = None
    for i, g in enumerate(group_cols):
        eq = F.col(g).eqNullSafe(F.col(f"__ag{i}"))
        cond2 = eq if cond2 is None else (cond2 & eq)
    rz = F.when(
        F.col("__mad") > 0,
        F.lit(0.6745) * (F.col(metric_col) - F.col("__med")) / F.col("__mad"),
    )
    return (
        with_med.join(F.broadcast(mad), cond2)
        .select(
            *history.columns,
            F.round(rz, 6).alias("robust_z"),
            F.coalesce(F.abs(rz) > z_threshold, F.lit(False)).alias("is_anomaly"),
        )
    )


def cusum_level_shift(
    history: DataFrame,
    group_cols: list[str],
    metric_col: str,
    order_col: str,
    threshold_sigmas: float = 3.0,
) -> DataFrame:
    """CUSUM level-shift detection over an ordered metric history: point
    z-scores (metric_history_anomalies) catch spikes but are blind to a
    sustained shift (a feed that quietly halves stays within ±2σ of the
    polluted mean forever). CUSUM accumulates S_t = Σ(x_i − x̄); a level
    shift makes S trend, so range(S) = max(S) − min(S) grows linearly
    with the shifted span. Flags groups where range(S) >
    threshold_sigmas · σ · √n.

    Calibration of the normalized score range/(σ·√n): a stationary iid
    series is a Brownian bridge — its score concentrates near ~1.25 and
    rarely exceeds 2.5; a mid-history level shift SATURATES the score at
    √n/2 (σ itself absorbs the shift), so 3.0 separates the two for
    n ≥ 36 points; shorter histories cannot clear it by construction —
    collect more points rather than lowering the threshold.

    One cumulative window per group (ordered by `order_col`) + a
    group-sized aggregate; returns (group…, n_points, cusum_range_sigmas,
    shift_detected). Zero-variance or <2-point groups make no claim."""
    w_all = Window.partitionBy(*group_cols)
    # RANGE frame, not ROWS: rows tied on order_col accumulate
    # atomically (all peers included), so range(S) is deterministic even
    # when the history has duplicate timestamps
    w_cum = (
        Window.partitionBy(*group_cols)
        .orderBy(order_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staged = history.select(
        *group_cols,
        order_col,
        F.col(metric_col).alias("__x"),
        F.avg(metric_col).over(w_all).alias("__mean"),
        F.stddev_pop(metric_col).over(w_all).alias("__std"),
        # observations, not rows: NULL metrics carry no mass in
        # mean/stddev/cumsum and must not inflate the sqrt(n) denominator
        F.count(metric_col).over(w_all).alias("__n"),
    ).withColumn(
        "__s", F.sum(F.col("__x") - F.col("__mean")).over(w_cum)
    )
    rng = F.max("__s") - F.min("__s")
    sig = F.first("__std")
    n = F.first("__n")
    score = F.when(
        (sig > 0) & (n >= 2), rng / (sig * F.sqrt(n.cast("double")))
    )
    return staged.groupBy(*group_cols).agg(
        n.cast("long").alias("n_points"),
        F.round(score, 6).alias("cusum_range_sigmas"),
        F.coalesce(score > threshold_sigmas, F.lit(False)).alias("shift_detected"),
    )


def daily_count_anomalies_seasonal(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Day-of-week-aware volume anomalies: each day's count is scored
    against ITS OWN (group, weekday) history — a weekly-pattern feed
    (weekend dips, Monday surges) false-positives under the flat daily
    z-score and stays quiet here, while a genuinely anomalous Monday is
    judged against other Mondays only. Same null-safe broadcast shape as
    daily_count_anomalies with weekday in the key; <2 snapshots or zero
    variance per (group, dow) → no claim."""
    daily = df.groupBy(
        F.col(group_col),
        F.to_date(F.col(ts_col)).alias("day"),
        F.dayofweek(F.col(ts_col)).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = (
        daily.groupBy(group_col, "dow")
        .agg(F.avg("cnt").alias("__mean"), F.stddev_pop("cnt").alias("__std"))
        .withColumnRenamed(group_col, "__g")
        .withColumnRenamed("dow", "__d")
    )
    # dow null-safe too: a NULL-timestamp bucket (dow NULL) must keep
    # its history like every other misbehaving feed, not vanish
    cond = F.col(group_col).eqNullSafe(F.col("__g")) & F.col("dow").eqNullSafe(
        F.col("__d")
    )
    z = F.when(
        F.col("__std") > 0, (F.col("cnt") - F.col("__mean")) / F.col("__std")
    )
    return (
        daily.join(F.broadcast(stats), cond)
        .select(
            group_col,
            "day",
            "dow",
            "cnt",
            F.round(z, 6).alias("z"),
            F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
        )
    )
