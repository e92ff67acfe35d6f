"""Agronomic consumer plans — the decision-support queries the
reference pipeline exists to feed (its README's crop-planning goal;
`/root/reference/daily_weather_etl_kenya.py:342-390` stops at
per-reading derivations, these aggregate longitudinally).

Moved here from ``__spark_entry__`` (VERDICT r7 #4/#8 hygiene: plan
compositions live in the package, the entry module only registers
them). Bodies are byte-for-byte the r7 driver-green implementations;
the DuckDB oracles in ``oracles/`` are unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import weather as W
from ..functions.weather import floored_mod
from ..sources.tables import load_table




def agro1_growing_degree_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROWING DEGREE DAYS — the agronomic accumulation the reference's
    consumers compute FROM its weather table (the pipeline's whole
    point is crop planning for Kenya's regions;
    daily_weather_etl_kenya.py:342-390 stops at per-reading
    derivations). Per region-day: tmax/tmin of validated temperatures,
    capped-average GDD = max(0, min((tmax+tmin)/2, 30°C) − 10°C base),
    then the cumulative per-region GDD curve (the planting-calendar
    signal). Arithmetic is integer MILLI-degrees end-to-end — 2dp
    temperatures quantize exactly to centi-ints, (a+b)·5 is the exact
    half-sum in milli, greatest/least/running-sum all int64 — one
    double division at the end, so the running accumulation is
    order-free on any engine/partitioning (the a22/x104 discipline).
    Scale shape: one (region, date)-keyed agg with map-side partials +
    one per-region ordered window — region cardinality bounds state,
    never row count."""
    ev = load_table(spark, sf_dir, "events")
    t = F.round(F.lit(-10) + floored_mod(F.col("value"), 70.0), 2)
    pseudo = ev.select(
        F.concat(
            F.lit("R"), F.lpad((F.col("user_id") % 15).cast("string"), 2, "0")
        ).alias("region"),
        t.alias("temperature"),
        F.to_date("ts").alias("date"),
    )
    validated = pseudo.filter(
        (F.col("temperature") >= -5) & (F.col("temperature") <= 50)
    )
    daily = validated.groupBy("region", "date").agg(
        F.floor(F.max("temperature") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("tmax_c"),
        F.floor(F.min("temperature") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("tmin_c"),
    )
    gdd_m = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            (F.col("tmax_c") + F.col("tmin_c")) * 5, F.lit(30000).cast("long")
        )
        - F.lit(10000),
    )
    w = Window.partitionBy("region").orderBy("date")
    return (
        daily.select("region", "date", gdd_m.alias("gdd_m"))
        .select(
            "region",
            F.date_format("date", "yyyy-MM-dd").alias("date"),
            (F.col("gdd_m").cast("double") / F.lit(1000.0)).alias("gdd"),
            (
                F.sum("gdd_m").over(w).cast("double") / F.lit(1000.0)
            ).alias("cum_gdd"),
        )
    )


def agro2_dry_spells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DRY-SPELL detection — the drought signal an agricultural
    consumer reads off the reference's weather table (rainfall is the
    pipeline's most scrutinized column; daily_weather_etl_kenya.py's
    rainfall binning stops at per-reading categories). Per region-day
    the rainfall total accumulates in integer DECI-millimetres (1dp
    readings quantize exactly);
    maximal runs of consecutive dry days are found with the
    gaps-and-islands window (epoch_day − row_number is constant within
    a run — pure int64 arithmetic, no session UDF, no iteration) and
    rolled up per region: dry-day count, spell count, longest and mean
    spell. "Dry" is RELATIVE — a day below the region's own 25th
    percentile of daily totals (the w16 learned-threshold discipline:
    an absolute mm cutoff can't survive reading-density changes, a
    quantile of the region's own history can). Scale shape: one
    (region, date) agg + a 15-row learned-threshold broadcast + one
    per-region window + one (region, island) agg — everything keyed,
    state bounded by region × day cardinality, order-free integers on
    every accumulation path."""
    ev = load_table(spark, sf_dir, "events")
    rain = F.round(floored_mod(F.col("value") * 13.7, 60.0), 1)
    pseudo = ev.select(
        F.concat(
            F.lit("R"), F.lpad((F.col("user_id") % 15).cast("string"), 2, "0")
        ).alias("region"),
        rain.alias("rainfall_1h"),
        F.to_date("ts").alias("date"),
    )
    daily = pseudo.groupBy("region", "date").agg(
        F.sum(
            F.floor(F.col("rainfall_1h") * 10.0 + F.lit(0.5)).cast("long")
        ).alias("rain_deci")
    )
    thresh = daily.groupBy("region").agg(
        F.expr("percentile(rain_deci, 0.25)").alias("p25")
    )
    dry = daily.join(F.broadcast(thresh), "region").filter(
        F.col("rain_deci") < F.col("p25")
    ).select(
        "region",
        "date",
        F.datediff(F.col("date"), F.lit("1970-01-01").cast("date")).alias(
            "epoch_day"
        ),
    )
    w = Window.partitionBy("region").orderBy("epoch_day")
    islands = dry.withColumn(
        "grp", F.col("epoch_day") - F.row_number().over(w)
    )
    spells = islands.groupBy("region", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("spell_len")
    )
    return spells.groupBy("region").agg(
        F.sum("spell_len").cast("long").alias("n_dry_days"),
        F.count(F.lit(1)).cast("long").alias("n_spells"),
        F.max("spell_len").cast("long").alias("longest_spell"),
        (
            F.sum("spell_len").cast("double") / F.count(F.lit(1))
        ).alias("mean_spell"),
    )


def e2e_agro_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AGRICULTURAL DECISION REPORT — what the reference pipeline
    exists to feed (its README's crop-planning goal; the reference
    itself stops at loading rows): one 15-row per-region verdict
    joining the season's total growing degree days (agro1's
    accumulation), the drought profile (agro2's spell census), and the
    favorable-temperature rate (the reference's own P3 flag,
    daily_weather_etl_kenya.py:315, aggregated longitudinally). The
    verdict is a deterministic CASE over the three signals — the
    decision-support row a county agronomist reads. Composes three
    exact-oracled derivations on integer grids; the join keys are the
    15 region codes, so the report replays exactly. Scale shape: three
    keyed aggs over one events scan each + two 15-row broadcast
    joins."""
    gdd = (
        agro1_growing_degree_days(spark, sf_dir)
        # re-quantize to the milli grid before summing: per-day gdd is
        # an exact multiple of 0.001, so the int recovery is lossless
        # and the cross-day accumulation stays order-free int64
        .groupBy("region")
        .agg(
            (
                F.sum(
                    F.expr("CAST(floor(gdd * 1000.0 + 0.5) AS BIGINT)")
                ).cast("double")
                / F.lit(1000.0)
            ).alias("total_gdd"),
        )
    )
    spells = agro2_dry_spells(spark, sf_dir).select(
        "region", "n_dry_days", "longest_spell"
    )
    ev = load_table(spark, sf_dir, "events")
    t = F.round(F.lit(-10) + floored_mod(F.col("value"), 70.0), 2)
    pseudo = ev.select(
        F.concat(
            F.lit("R"), F.lpad((F.col("user_id") % 15).cast("string"), 2, "0")
        ).alias("region"),
        t.alias("temperature"),
    ).filter((F.col("temperature") >= -5) & (F.col("temperature") <= 50))
    fav = pseudo.groupBy("region").agg(
        (
            F.sum(W.is_favorable_temp(F.col("temperature")).cast("long"))
            .cast("double")
            / F.count(F.lit(1))
        ).alias("favorable_rate")
    )
    rep = gdd.join(F.broadcast(spells), "region").join(
        F.broadcast(fav), "region"
    )
    verdict = (
        F.when(
            (F.col("favorable_rate") >= 0.2)
            & (F.col("longest_spell") <= 3),
            "plant",
        )
        .when(F.col("longest_spell") >= 5, "drought_risk")
        .otherwise("monitor")
    )
    return rep.select(
        "region",
        "total_gdd",
        "n_dry_days",
        "longest_spell",
        W.round_half_up(F.col("favorable_rate"), 6).alias("favorable_rate"),
        verdict.alias("verdict"),
    )


def agro3_reference_et0(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REFERENCE EVAPOTRANSPIRATION (Hargreaves–Samani 1985) — the
    third agronomic consumer: ET₀ = 0.0023·Ra·(Tmean+17.8)·√(Tmax−Tmin)
    per region-day, the temperature-only ET estimate used exactly where
    this pipeline operates (no radiation sensors, daily min/max only).
    Tmean is the standard (Tmax+Tmin)/2; Ra (extraterrestrial
    radiation) needs latitude the corpus doesn't carry, so it is a
    per-region FIXTURE constant (20 + idx mod 10 MJ/m²/day, documented
    stand-in — the formula's structure, not Ra's provenance, is what
    the engine exercises). Daily tmax/tmin come exact off the centi-int
    grid (agro1's quantization), the per-day ET₀ is one identical
    double product chain on both engines, quantized to 1e-6 before the
    monthly sum — order-free accumulation. Output: per region-month
    day count, mean and total ET₀ (the irrigation-planning numbers)."""
    ev = load_table(spark, sf_dir, "events")
    t = F.round(F.lit(-10) + floored_mod(F.col("value"), 70.0), 2)
    pseudo = ev.select(
        F.concat(
            F.lit("R"), F.lpad((F.col("user_id") % 15).cast("string"), 2, "0")
        ).alias("region"),
        (F.col("user_id") % 15).cast("long").alias("ridx"),
        t.alias("temperature"),
        F.to_date("ts").alias("date"),
    ).filter((F.col("temperature") >= -5) & (F.col("temperature") <= 50))
    daily = pseudo.groupBy("region", "ridx", "date").agg(
        F.floor(F.max("temperature") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("tmax_c"),
        F.floor(F.min("temperature") * 100.0 + F.lit(0.5))
        .cast("long")
        .alias("tmin_c"),
    )
    ra = (F.lit(20.0) + (F.col("ridx") % 10).cast("double"))
    tmean = (F.col("tmax_c") + F.col("tmin_c")).cast("double") / F.lit(200.0)
    trange = (F.col("tmax_c") - F.col("tmin_c")).cast("double") / F.lit(
        100.0
    )
    et0 = (
        F.lit(0.0023) * ra * (tmean + F.lit(17.8)) * F.sqrt(trange)
    )
    q = F.floor(et0 * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        daily.withColumn("et0_q", q)
        .groupBy("region", F.date_format("date", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            (
                F.sum("et0_q").cast("double")
                / F.count(F.lit(1))
                / F.lit(1000000.0)
            ).alias("mean_et0"),
            (
                F.sum("et0_q").cast("double") / F.lit(1000000.0)
            ).alias("total_et0"),
        )
    )
