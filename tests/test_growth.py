"""Growth-trend parity with the reference's own unit tests
(/root/reference/tests/test_autoincrement.py:89-263): known slope
100/day → 95-105; insufficient data → None; negative slope → None;
alert thresholds; days-until-full arithmetic."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators.growth import (
    INT_MAX_VALUES,
    alert_status,
    days_until_full,
    growth_profile,
    regression_slope,
)


def _history(spark, values, start="2026-01-01"):
    base = dt.datetime.fromisoformat(start)
    rows = [(base + dt.timedelta(days=i), float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "scan_time timestamp, current_value double")


def test_known_slope(spark):
    h = _history(spark, [1000 + 100 * i for i in range(10)])
    slope = regression_slope(h, "scan_time", "current_value")
    assert 95 <= slope <= 105  # reference test_autoincrement.py:186-198


def test_insufficient_data_returns_none(spark):
    h = _history(spark, [1000])
    assert regression_slope(h, "scan_time", "current_value") is None


def test_negative_slope_returns_none(spark):
    h = _history(spark, [1000 - 50 * i for i in range(5)])
    assert regression_slope(h, "scan_time", "current_value") is None


def test_days_until_full():
    # autoincrement_metrics.py:128-152
    assert days_until_full(1000, 100.0) == 10.0
    assert days_until_full(0, 100.0) == 0.0
    assert days_until_full(-5, 100.0) == 0.0
    assert days_until_full(1000, None) is None
    assert days_until_full(1000, 0.0) is None


def test_alert_thresholds():
    # autoincrement_metrics.py:24-28, 60-75; days-based beats usage-based
    assert alert_status(10, 50.0) == "CRITICAL"
    assert alert_status(60, 50.0) == "WARNING"
    assert alert_status(365, 95.0) == "CRITICAL"
    assert alert_status(365, 80.0) == "WARNING"
    assert alert_status(365, 50.0) == "OK"
    assert alert_status(None, 92.0) == "CRITICAL"
    assert alert_status(None, 10.0) == "OK"


def test_growth_profile_end_to_end(spark):
    df = spark.range(1, 1001).selectExpr("cast(id as int) as id")
    h = _history(spark, [800 + 100 * i for i in range(5)])
    p = growth_profile(df, "id", "int", history=h)
    assert p.current_value == 1000
    assert p.max_type_value == INT_MAX_VALUES["int"]
    assert p.remaining_values == INT_MAX_VALUES["int"] - 1000
    assert 95 <= p.growth_rate_per_day <= 105
    assert p.days_until_full == round(p.remaining_values / p.growth_rate_per_day, 2)
    assert p.alert_status == "OK"


def test_growth_profile_empty_table(spark):
    df = spark.range(0).selectExpr("cast(id as int) as id")
    p = growth_profile(df, "id", "int")
    # autoincrement.py:213-219: None current → usage 0, full remaining
    assert p.current_value is None
    assert p.usage_percentage == 0.0
    assert p.remaining_values == INT_MAX_VALUES["int"]
    assert p.alert_status == "OK"


def test_near_overflow_critical(spark):
    mx = INT_MAX_VALUES["int"]
    df = spark.createDataFrame([(mx - 10,)], "id int")
    p = growth_profile(df, "id", "int")
    assert p.usage_percentage >= 99.9999
    assert p.alert_status == "CRITICAL"


def test_grouped_growth_matches_per_group_loop(spark):
    """The one-job grouped implementation must reproduce growth_profile's
    math per group exactly (same rounding, same alert tiers), including a
    single-timestamp group (no measurable slope — guarded division)."""
    from datetime import datetime

    from dataprofiler_spark.operators.growth import (
        grouped_growth_profiles,
        growth_profile,
    )

    rows = []
    base = datetime(2026, 1, 1)
    for d in range(10):  # group 'a': clean +100/day growth
        rows.append(("a", float(100 * (d + 1)), datetime(2026, 1, d + 1)))
    for d in range(10):  # group 'b': shrinking (negative slope → no alert)
        rows.append(("b", float(1000 - 90 * d), datetime(2026, 1, d + 1)))
    rows.append(("c", 32000.0, base))  # single point, 97% usage → WARNING+
    df = spark.createDataFrame(rows, "g string, value double, ts timestamp")

    grouped = {r.g: r for r in grouped_growth_profiles(
        df, "g", "value", "smallint", ts_col="ts", value_col="value").collect()}
    for g in ("a", "b", "c"):
        sub = df.filter(F.col("g") == g)
        p = growth_profile(sub, "value", "smallint", history=sub,
                           ts_col="ts", value_col="value")
        r = grouped[g]
        assert r.current_value == p.current_value, g
        assert r.usage_percentage == p.usage_percentage, g
        assert r.growth_rate_per_day == p.growth_rate_per_day, g
        assert r.days_until_full == p.days_until_full, g
        assert r.alert_status == p.alert_status, g
    assert grouped["a"].growth_rate_per_day == pytest.approx(100.0)
    assert grouped["b"].growth_rate_per_day is None
    assert grouped["c"].alert_status in ("WARNING", "CRITICAL")


def test_daily_count_anomalies_planted_spike(spark):
    """A day with 10x the group's normal volume is flagged; normal days and
    a zero-variance group are not (no baseline to deviate from)."""
    from dataprofiler_spark.operators.growth import daily_count_anomalies

    rows = []
    for d in range(1, 11):  # type 'a': 5/day for 10 days, day 5 spikes to 50
        n = 50 if d == 5 else 5
        rows += [(f"2024-01-{d:02d} 12:00:00", "a")] * n
    rows += [("2024-01-01 12:00:00", "b")] * 3 + [("2024-01-02 12:00:00", "b")] * 3
    df = spark.createDataFrame(rows, "ts_s string, event_type string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    out = {(r.event_type, str(r.day)): r for r in daily_count_anomalies(df, "event_type").collect()}
    assert out[("a", "2024-01-05")].is_anomaly is True
    assert out[("a", "2024-01-05")].z > 2.0
    assert all(not r.is_anomaly for k, r in out.items() if k != ("a", "2024-01-05"))
    # zero-variance group: z is NULL, flagged False
    assert out[("b", "2024-01-01")].z is None


def test_anomalies_keep_null_group(spark):
    """Rows with a NULL group value keep their history through the
    null-safe join — a dropped-feed incident on the NULL-source rows is
    exactly what the monitor must flag, not silently drop."""
    from dataprofiler_spark.operators.growth import daily_count_anomalies

    rows = []
    for d in range(1, 11):
        n = 50 if d == 5 else 5
        rows += [(f"2024-01-{d:02d} 12:00:00", None)] * n
    df = spark.createDataFrame(rows, "ts_s string, event_type string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )
    out = daily_count_anomalies(df, "event_type").collect()
    assert len(out) == 10  # NULL group fully present
    assert sum(1 for r in out if r.is_anomaly) == 1


def test_robust_mad_anomalies(spark):
    """MAD scoring: the planted spike cannot mask itself (50% breakdown),
    zero-MAD groups make no claim, NULL group keys keep their history."""
    from dataprofiler_spark.operators.growth import (
        metric_history_anomalies,
        metric_history_anomalies_robust,
    )

    rows = (
        [("a", float(v)) for v in [10, 11, 9, 10, 12, 10, 1000]]
        + [("b", 5.0)] * 6
        + [(None, float(v)) for v in [3, 4, 3, 400]]
    )
    df = spark.createDataFrame(rows, "g string, m double")
    out = {(r.g, r.m): r for r in
           metric_history_anomalies_robust(df, ["g"], "m").collect()}
    assert out[("a", 1000.0)].is_anomaly is True
    assert out[("a", 10.0)].is_anomaly is False
    assert all(not r.is_anomaly for (g, _), r in out.items() if g == "b")
    assert out[("b", 5.0)].robust_z is None  # zero MAD -> no claim
    assert out[(None, 400.0)].is_anomaly is True  # NULL group scored

    # the motivating contrast: with n=7 one 100x spike drags sigma enough
    # that the plain z-score stays under its own threshold
    plain = {(r.g, r.m): r for r in
             metric_history_anomalies(df, ["g"], "m", z_threshold=2.5).collect()}
    assert abs(plain[("a", 1000.0)].z) < 2.5  # masked for mean/sigma


def test_cusum_detects_level_shift_zscore_misses(spark):
    """A feed that halves mid-history: every point stays within ~2sigma of
    the polluted mean (point z-scores quiet) but CUSUM's range grows with
    the shifted span — shift_detected. A stationary noisy series of the
    same variance stays quiet."""
    from dataprofiler_spark.operators.growth import (
        cusum_level_shift,
        metric_history_anomalies,
    )

    shifted = [("a", i, 100.0 + (i % 3)) for i in range(30)] + \
              [("a", 30 + i, 50.0 + (i % 3)) for i in range(30)]
    # stationary control with the SAME overall variance scale: alternate
    # around the mean
    flat = [("b", i, (100.0 if i % 2 == 0 else 50.0)) for i in range(60)]
    df = spark.createDataFrame(shifted + flat, "g string, t long, m double")

    out = {r.g: r for r in cusum_level_shift(df, ["g"], "m", "t").collect()}
    assert out["a"].shift_detected is True
    assert out["b"].shift_detected is False
    assert out["a"].cusum_range_sigmas > out["b"].cusum_range_sigmas

    # the motivating blindness: point z never fires on the shifted feed
    z = metric_history_anomalies(df.filter(F.col("g") == "a"), ["g"], "m",
                                 z_threshold=2.5).collect()
    assert all(not r.is_anomaly for r in z)

    # degenerate groups: constant series and single point -> no claim
    deg = spark.createDataFrame(
        [("c", 0, 5.0), ("c", 1, 5.0), ("d", 0, 9.0)], "g string, t long, m double"
    )
    degs = {r.g: r for r in cusum_level_shift(deg, ["g"], "m", "t").collect()}
    assert degs["c"].shift_detected is False and degs["c"].cusum_range_sigmas is None
    assert degs["d"].shift_detected is False


def test_seasonal_anomalies_respect_weekday_pattern(spark):
    """A weekly pattern (low weekends) false-positives under the flat
    daily z but is quiet under day-of-week scoring; a genuinely bad
    Monday fires in both."""
    import datetime

    from dataprofiler_spark.operators.growth import (
        daily_count_anomalies,
        daily_count_anomalies_seasonal,
    )

    rows = []
    start = datetime.date(2024, 1, 1)  # a Monday
    for week in range(6):
        for dow in range(7):
            d = start + datetime.timedelta(days=week * 7 + dow)
            n = 20 if dow < 5 else 4  # strong weekend dip
            if week == 5 and dow == 0:
                n = 100  # the planted bad Monday
            rows += [(f"{d} 12:00:00", "a")] * n
    df = spark.createDataFrame(rows, "ts_s string, event_type string").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "event_type"
    )
    # NOTE the threshold: a single outlier among n points cannot exceed
    # z = sqrt(n-1) (it drags its own group's sigma); with 6 Mondays the
    # ceiling is ~2.24, so 2.0 is the honest detectable threshold here
    rows_out = daily_count_anomalies_seasonal(
        df, "event_type", z_threshold=2.0
    ).collect()
    flagged = {str(r.day) for r in rows_out if r.is_anomaly}
    assert flagged == {"2024-02-05"}  # ONLY the planted Monday
    assert not [r for r in rows_out if r.dow in (1, 7) and r.is_anomaly]

    # the motivating contrast, asserted on z magnitudes: the flat daily
    # score reads every ordinary weekend as a strong deviation (|z| > 1,
    # constant false-positive pressure), while the seasonal score gives
    # those same days |z| ~ 0 (each weekend judged against weekends)
    flat = daily_count_anomalies(df, "event_type", z_threshold=2.0).collect()
    import datetime as _dt

    def _is_weekend(day):
        return day.weekday() >= 5  # Sat/Sun

    flat_weekend = [abs(r.z) for r in flat
                    if _is_weekend(r.day) and r.z is not None]
    # ~0.9 sigma of standing deviation on EVERY weekend (the planted
    # spike inflates the flat sigma, or it would read ~1.6): constant
    # false-positive pressure the seasonal score removes entirely
    assert flat_weekend and min(flat_weekend) > 0.8
    seasonal_weekend = [abs(r.z) for r in rows_out
                        if r.dow in (1, 7) and r.z is not None]
    assert all(z < 0.5 for z in seasonal_weekend)
