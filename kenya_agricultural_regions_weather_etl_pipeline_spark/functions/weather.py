"""Agronomic derivations as *native Column expressions* (SURVEY.md §2.3).

The reference computes these with row-at-a-time pandas ``df.apply``
Python functions (/root/reference/daily_weather_etl_kenya.py:315-319) —
an interpreted Python loop. Here every one is a Catalyst expression
that whole-stage-codegens into the same generated loop as the rest of
the projection: zero Python on the hot path, vectorized end to end,
which is the difference between hours and minutes at 100 TB.

A ``pandas_udf`` twin of the heat index is kept ONLY to exercise the
Arrow UDF capability (tests compare it against the native expr).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(x: Column, n: int) -> Column:
    """Deterministic round-half-up: floor(x·10ⁿ + 0.5)/10ⁿ (+0.0 kills −0.0).

    ``F.round`` on doubles and DuckDB ``round()`` disagree on half-way
    ties (HALF_UP vs HALF_EVEN dialects) and on negative zero — SURVEY.md
    §5d. Writing the SAME explicit IEEE formula on both sides makes the
    result bit-identical in any engine.
    """
    s = float(10**n)
    return F.floor(x * F.lit(s) + F.lit(0.5)) / F.lit(s) + F.lit(0.0)


def round_half_up_sql(x: str, n: int) -> str:
    """Verbatim SQL twin of :func:`round_half_up` for DuckDB oracles."""
    s = float(10**n)
    return f"(floor(({x}) * {s} + 0.5) / {s} + 0.0)"


def heat_index(temp: Column, humidity: Column) -> Column:
    """Simplified heat index (Rothfusz-style regression).

    Semantics of ``calculate_heat_index``
    (/root/reference/daily_weather_etl_kenya.py:342-363): below 27°C the
    heat index IS the temperature; at/above, a 9-term polynomial in
    (temp, humidity), rounded to 2 decimals.
    """
    t, h = temp, humidity
    poly = (
        F.lit(-8.78469475556)
        + F.lit(1.61139411) * t
        + F.lit(2.33854883889) * h
        + F.lit(-0.14611605) * t * h
        + F.lit(-0.012308094) * t * t
        + F.lit(-0.0164248277778) * h * h
        + F.lit(0.002211732) * t * t * h
        + F.lit(0.00072546) * t * h * h
        + F.lit(-0.000003582) * t * t * h * h
    )
    return F.when(t < 27, t).otherwise(round_half_up(poly, 2))


def heat_index_sql(temp: str, humidity: str) -> str:
    """ANSI-SQL twin of :func:`heat_index` (for DuckDB oracles)."""
    t, h = temp, humidity
    poly = (
        f"-8.78469475556 + 1.61139411*{t} + 2.33854883889*{h} "
        f"+ -0.14611605*{t}*{h} + -0.012308094*{t}*{t} "
        f"+ -0.0164248277778*{h}*{h} + 0.002211732*{t}*{t}*{h} "
        f"+ 0.00072546*{t}*{h}*{h} + -0.000003582*{t}*{t}*{h}*{h}"
    )
    return f"CASE WHEN {t} < 27 THEN {t} ELSE {round_half_up_sql(poly, 2)} END"


def dew_point(temp: Column, humidity: Column) -> Column:
    """Magnus-formula dew point, a=17.27 b=237.7, rounded to 2 decimals
    (``calculate_dew_point``, /root/reference/daily_weather_etl_kenya.py:365-377).

    NOTE: the reference adds ``humidity/100`` to alpha *without* a log —
    we reproduce its exact (simplified) arithmetic, not the textbook
    ``ln(RH/100)`` variant, because parity with the reference is the spec.
    """
    a, b = 17.27, 237.7
    alpha = (F.lit(a) * temp) / (F.lit(b) + temp) + humidity / F.lit(100.0)
    return round_half_up((F.lit(b) * alpha) / (F.lit(a) - alpha), 2)


def dew_point_sql(temp: str, humidity: str) -> str:
    alpha = f"((17.27*{temp})/(237.7+{temp}) + {humidity}/100.0)"
    return round_half_up_sql(f"(237.7*{alpha})/(17.27-{alpha})", 2)


def is_favorable_temp(temp: Column) -> Column:
    """18 ≤ temp ≤ 28 (/root/reference/daily_weather_etl_kenya.py:317)."""
    return (temp >= 18) & (temp <= 28)


def is_high_humidity(humidity: Column) -> Column:
    """humidity > 70 (/root/reference/daily_weather_etl_kenya.py:318)."""
    return humidity > 70


def rainfall_category(rainfall: Column) -> Column:
    """5-way rainfall binning (``categorize_rainfall``,
    /root/reference/daily_weather_etl_kenya.py:379-390): a chained
    CASE WHEN, not a UDF."""
    return (
        F.when(rainfall == 0, "No Rain")
        .when(rainfall < 2.5, "Light Rain")
        .when(rainfall < 10, "Moderate Rain")
        .when(rainfall < 50, "Heavy Rain")
        .otherwise("Very Heavy Rain")
    )


def rainfall_category_sql(rainfall: str) -> str:
    return (
        f"CASE WHEN {rainfall} = 0 THEN 'No Rain' "
        f"WHEN {rainfall} < 2.5 THEN 'Light Rain' "
        f"WHEN {rainfall} < 10 THEN 'Moderate Rain' "
        f"WHEN {rainfall} < 50 THEN 'Heavy Rain' "
        f"ELSE 'Very Heavy Rain' END"
    )


def date_parts(ts: Column) -> dict[str, Column]:
    """date/hour/month/year extraction
    (/root/reference/daily_weather_etl_kenya.py:322-325)."""
    return {
        "date": F.to_date(ts),
        "hour": F.hour(ts),
        "month": F.month(ts),
        "year": F.year(ts),
    }


def heat_index_pandas_udf():
    """Arrow-vectorized pandas_udf twin of :func:`heat_index`.

    Exists only to exercise the UDF surface (SURVEY.md §2.7) — the
    native expression above is the production path (JVM codegen beats
    even Arrow-batched Python by avoiding the serialization hop).
    """
    import numpy as np
    import pandas as pd  # noqa: F401
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _heat_index(temp, humidity):
        poly = (
            -8.78469475556
            + 1.61139411 * temp
            + 2.33854883889 * humidity
            + -0.14611605 * temp * humidity
            + -0.012308094 * temp**2
            + -0.0164248277778 * humidity**2
            + 0.002211732 * temp**2 * humidity
            + 0.00072546 * temp * humidity**2
            + -0.000003582 * temp**2 * humidity**2
        )
        poly = np.floor(poly * 100.0 + 0.5) / 100.0 + 0.0  # round_half_up twin
        return poly.where(temp >= 27, temp)

    return _heat_index


def floored_mod(x, m: float):
    """Floored modulo as a Column expr — the pseudo-weather projection
    shared by the agro plans and the entry module's registered queries.
    Must stay bit-identical to its DuckDB twin :func:`floored_mod_sql`
    (``x - floor(x/m)*m``); one definition serves both callers (ADVICE
    r8: two Python copies of an oracle-coupled expression is silent
    drift risk)."""
    from pyspark.sql import functions as F

    return x - F.floor(x / F.lit(m)) * F.lit(m)


def floored_mod_sql(x: str, m: float) -> str:
    """DuckDB twin of :func:`floored_mod` — identical arithmetic text."""
    return f"({x} - floor({x}/{m})*{m})"
