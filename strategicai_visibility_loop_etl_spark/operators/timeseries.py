"""Time-series regularization: resample an event stream onto a dense
per-key daily grid with forward-fill.

The reference pipeline is snapshot-based; a visibility engine tracking
metrics over time needs the classic gap-fill shape — turn irregular
events into a regular series so downstream window math (moving
averages q33, retention q62) sees no holes. Pandas spells it
``resample('D').ffill()``; the Spark-first form below is a sequence
explode plus one ``last(ignorenulls)`` running window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(18,6)"


def resample_daily_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Dense daily series per key with forward-filled values:
    (key, day, value, is_gap) for every day in the key's observed
    span — gap days carry the last observed day's value and
    ``is_gap = true``.

    Per-(key, day) totals sum through DECIMAL so the value is
    identical under any partition/merge order (cross-engine exact,
    like every other money-typed sum in this engine). The dense grid
    is ``sequence(min_day, max_day)`` exploded per key — generated,
    never shuffled in — and the fill is one ``last(value, ignorenulls)``
    running window over the key's days: one shuffle on the key, state
    bounded by the span length. At 100 TB the explode output is
    O(keys × span-days), the size the dense result inherently is; no
    stage materializes more than that.
    """
    day = F.to_date(F.col(ts_col))
    daily = df.groupBy(F.col(key_col), day.alias("day")).agg(
        F.sum(F.col(value_col).cast(_DEC)).alias("day_value")
    )
    span = daily.groupBy(key_col).agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    grid = span.select(
        key_col, F.explode(F.sequence("d0", "d1")).alias("day")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(daily, [key_col, "day"], "left")
        .select(
            key_col,
            "day",
            F.last("day_value", ignorenulls=True).over(w).alias("value"),
            F.col("day_value").isNull().alias("is_gap"),
        )
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    window: int = 7,
    z_threshold: float = 3.0,
    min_periods: int = 4,
    out_decimals: int = 6,
) -> DataFrame:
    """Per-key rolling z-score anomaly detection: each point scored
    against the mean/std of the PRECEDING ``window`` points (the
    current point excluded — no self-masking), flagged when
    |z| > ``z_threshold``. The standard metrics-monitoring shape
    (traffic spikes, crawl anomalies, pipeline regressions).

    Engine-exactness: ``y_col`` must be DECIMAL — rolling mean and
    variance come from exact rolling sums (Σy, Σy², n) via the
    frame window, then the closed form var = (n·Σy² − (Σy)²)/(n(n−1));
    nothing depends on the engine's incremental-variance algorithm
    (Welford vs naive differ in low bits), only the final z passes
    through double. z is NULL (and the row unflagged) with fewer than
    ``min_periods`` history points or zero variance.

    One shuffle (the per-key window); frames are ROWS-based over the
    observed points in ``x_col`` order, so gaps don't change the
    window population — both the Spark plan and the SQL replay agree
    row for row.
    """
    y = F.col(y_col).cast("decimal(28,6)")
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(x_col))
        .rowsBetween(-window, -1)
    )
    n = F.count(y).over(w)
    sy = F.sum(y).over(w)
    syy = F.sum(y * y).over(w)
    den = (n * syy - sy * sy).cast("decimal(38,12)")
    ok = (n >= min_periods) & (den > 0)
    mean = sy.cast("double") / n.cast("double")
    var = den.cast("double") / (n * (n - 1)).cast("double")
    from ..functions.numeric import round_c  # noqa: PLC0415

    z = F.when(
        ok,
        round_c(
            (F.col(y_col).cast("double") - mean) / F.sqrt(var), out_decimals
        ),
    )
    return df.select(
        *key_cols,
        F.col(x_col),
        F.col(y_col),
        n.cast("long").alias("n_history"),
        z.alias("z"),
        F.coalesce(F.abs(z) > z_threshold, F.lit(False)).alias("is_anomaly"),
    )


def decay_weights_ppq(half_life_days: int, max_age_days: int) -> list[int]:
    """Integer decay-weight table: ``round(2^(−d/h) · 10^18)`` for
    d = 0..max_age_days — the one place the irrational decay curve
    is evaluated, so the Spark plan and any replaying oracle embed
    THE SAME integer literals and the aggregate stays exact-integer
    arithmetic (no ``pow`` in either engine's plan)."""
    if half_life_days < 1 or max_age_days < 0:
        raise ValueError("need half_life_days >= 1 and max_age_days >= 0")
    scale = 10**18
    return [
        int(round(2.0 ** (-d / half_life_days) * scale))
        for d in range(max_age_days + 1)
    ]


def decayed_counts(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    half_life_days: int = 7,
    max_age_days: int = 400,
) -> DataFrame:
    """Exponentially time-decayed counts per key — the "trending"
    primitive (what's hot NOW, not cumulatively): each event weighs
    ``2^(−age_days / half_life_days)`` relative to the newest event
    in the frame, so a key's decayed count halves every half-life of
    silence.

    Exactness: the decay curve is pre-tabulated as INTEGER
    10^18-scaled weights (``decay_weights_ppq``) indexed by whole-day
    age — no ``pow``/``exp`` in the plan, every product and sum an
    exact integer (DECIMAL(38,0)), one double division at the end
    through ``round_c``.  Events older than ``max_age_days`` weigh
    exactly 0 (2^(−400/7) ≈ 1e-18 is already below the table's
    resolution — the cutoff is the numerics, made explicit).

    Shape at 100 TB: ONE shuffle — the (key, age) hash aggregate
    (map-side partial combine collapses each partition to at most
    |keys|·|days| rows first); the anchor date rides a broadcast
    1-row aggregate; the weight lookup is an array literal
    ``element_at``.  Output: key columns, ``n_events``,
    ``decayed_count``.
    """
    weights = decay_weights_ppq(half_life_days, max_age_days)
    w_arr = F.array(*[F.lit(w).cast("long") for w in weights])
    anchor = df.agg(F.max(F.to_date(F.col(ts_col))).alias("__anchor"))
    per_age = (
        df.crossJoin(F.broadcast(anchor))
        .select(
            *key_cols,
            F.datediff(F.col("__anchor"), F.to_date(F.col(ts_col))).alias(
                "age"
            ),
        )
        .groupBy(*key_cols, "age")
        .agg(F.count("*").alias("cnt"))
    )
    w = F.when(
        F.col("age") <= max_age_days, F.element_at(w_arr, F.col("age") + 1)
    ).otherwise(F.lit(0).cast("long"))
    from ..functions.numeric import round_c

    return (
        per_age.select(
            *key_cols,
            "cnt",
            # cast BEFORE the multiply: cnt(long) x 10^18-scale weight
            # overflows BIGINT; decimal multiply is exact.
            (F.col("cnt").cast("decimal(38,0)") * w).alias("scaled"),
        )
        .groupBy(*key_cols)
        .agg(
            F.sum("cnt").alias("n_events"),
            round_c(
                F.sum("scaled").cast("double") / F.lit(1e18), 6
            ).alias("decayed_count"),
        )
    )


def ewma_smooth(
    df: DataFrame,
    group_cols: list[str],
    time_col: str,
    value_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-group exponentially weighted moving average:
    ``s_0 = x_0; s_t = α·x_t + (1−α)·s_{t−1}`` over the group's series
    ordered by ``time_col`` — the standard smoother for metric
    dashboards and drift monitors, complementing the window-mean in
    q33 (EWMA never forgets a level shift slowly the way a fixed
    window does) and the half-life counts in ``decayed_counts``
    (those decay EVENT MASS; this smooths a METRIC SERIES).

    Output: one row per input point with ``ewma`` and ``residual``
    (= value − previous smoothed level, the one-step-ahead surprise —
    NULL at the series head where no level exists yet). Rows whose
    ``value_col`` is NULL are excluded before the series forms (the
    repo's NULL-exclusion convention — ks_test, basket_affinity): the
    recurrence has no NULL-absorbing step, so a gap simply skips to
    the next observation instead of poisoning the series tail.

    Exactness: the recurrence is evaluated as literally
    ``α·x + (1−α)·s`` — two IEEE multiplies and one add per step, in
    series order — so any engine replaying the same recurrence
    (DuckDB: a recursive CTE over per-group step numbers) is
    bit-identical; no pow/exp anywhere.

    Scale shape: ONE hash aggregate collects each group's series
    (sorted in-row, a model-free per-group array bounded by the
    series length — days/weeks per key, NOT corpus rows), one linear
    array fold computes every prefix level, one explode restores row
    form. Sequential state is group-local by construction, so groups
    parallelize perfectly; at 100 TB the bound to watch is points per
    group (e.g. 3 years of days = ~1.1k), never group count.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    a = F.lit(float(alpha))
    one_m = F.lit(1.0 - float(alpha))
    # NULL values are EXCLUDED before the series collects (the
    # ks_test/basket_affinity convention): a single NULL x would make
    # s NULL at that step and a*x + (1-a)*NULL poisons every later
    # ewma/residual in the group — the documented DuckDB recurrence
    # filters identically.
    series = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(time_col).alias("t"),
                        F.col(value_col).cast("double").alias("x"),
                    )
                )
            ).alias("__pts")
        )
    )
    folded = F.aggregate(
        F.col("__pts"),
        F.array().cast(
            "array<struct<t:" + dict(df.dtypes)[time_col] + ","
            "x:double,s:double,r:double>>"
        ),
        lambda acc, e: F.concat(
            acc,
            F.array(
                F.struct(
                    e["t"].alias("t"),
                    e["x"].alias("x"),
                    F.when(F.size(acc) == 0, e["x"])
                    .otherwise(
                        a * e["x"] + one_m * F.element_at(acc, -1)["s"]
                    )
                    .alias("s"),
                    F.when(
                        F.size(acc) > 0,
                        e["x"] - F.element_at(acc, -1)["s"],
                    ).alias("r"),
                )
            ),
        ),
    )
    return (
        series.select(*group_cols, F.explode(folded).alias("__e"))
        .select(
            *group_cols,
            F.col("__e.t").alias(time_col),
            F.col("__e.x").alias(value_col),
            F.col("__e.s").alias("ewma"),
            F.col("__e.r").alias("residual"),
        )
    )


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    event_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Kaplan–Meier product-limit survival curve per group — the
    censoring-correct retention estimator (Kaplan & Meier 1958): a
    user last seen yesterday has NOT churned, they are CENSORED, and
    naive retention (q62's cohort ratios) silently counts them as
    lost. Input: one row per unit with ``duration_col`` (time
    observed, e.g. days active) and ``event_col`` (1 = the event —
    churn/failure — was OBSERVED at that duration, 0 = censored
    there).

    At each distinct duration t with at least one observed event:
    ``S(t) = prod_{u <= t} (1 - d_u / n_u)`` where ``d_u`` = events
    at u and ``n_u`` = units still at risk (duration >= u). Output:
    (group, duration, n_risk, n_events, n_censored, survival).

    Exactness: d and n are exact counts; each factor ``1 - d/n`` is
    one IEEE division; the running product multiplies in duration
    order with a 12dp round per step — a SQL twin replays the
    identical recurrence (the ewma pattern: recursive CTE over
    per-group step numbers).

    Scale shape: ONE hash aggregate to (group, duration) rows, one
    per-group collected fold over the distinct-duration series
    (bounded by distinct durations per group — days, not units; the
    ewma bound), one explode. At-risk counts come from a reverse
    cumulative sum INSIDE the fold (total units minus the units
    already passed), so no window over unit rows exists anywhere.

    NULL durations are excluded; NULL event flags count as censored
    (observing nothing is a censor, the conservative default).
    """
    gcols = list(group_cols or [])
    ev = F.when(
        F.coalesce(F.col(event_col), F.lit(0)).cast("int") != 0, 1
    ).otherwise(0)
    per_t = (
        df.filter(F.col(duration_col).isNotNull())
        .groupBy(*gcols, F.col(duration_col).alias("t"))
        .agg(
            F.sum(ev).cast("long").alias("d"),
            (F.count(F.lit(1)) - F.sum(ev)).cast("long").alias("c"),
        )
    )
    series = per_t.groupBy(*gcols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("t"), F.col("d"), F.col("c")))
        ).alias("__pts"),
        F.sum(F.col("d") + F.col("c")).alias("__n_total"),
    )
    # fold carries (t, d, c, n_risk, s): n_risk = total - units with
    # smaller duration (all still at risk at t); s multiplies the
    # factor only when events were observed at t (the KM convention:
    # censoring times don't step the curve)
    from ..functions.numeric import round_c

    def _s_next(st, e):
        return round_c(
            st["s"]
            * (
                F.lit(1.0)
                - e["d"].cast("double") / st["left"].cast("double")
            ),
            12,
        )

    folded = F.aggregate(
        F.col("__pts"),
        F.struct(
            F.array().cast(
                "array<struct<t:" + dict(per_t.dtypes)["t"] + ","
                "d:long,c:long,n:long,s:double>>"
            ).alias("acc"),
            F.col("__n_total").alias("left"),
            F.lit(1.0).alias("s"),
        ),
        lambda st, e: F.struct(
            F.concat(
                st["acc"],
                F.array(
                    F.struct(
                        e["t"].alias("t"),
                        e["d"].alias("d"),
                        e["c"].alias("c"),
                        st["left"].alias("n"),
                        _s_next(st, e).alias("s"),
                    )
                ),
            ).alias("acc"),
            (st["left"] - e["d"] - e["c"]).alias("left"),
            _s_next(st, e).alias("s"),
        ),
    )
    out = series.select(
        *gcols, F.explode(folded["acc"]).alias("__e")
    ).select(
        *gcols,
        F.col("__e.t").alias("duration"),
        F.col("__e.n").alias("n_risk"),
        F.col("__e.d").alias("n_events"),
        F.col("__e.c").alias("n_censored"),
        F.col("__e.s").alias("survival"),
    )
    return out.orderBy(*gcols, "duration")


def seasonal_decompose(
    df: DataFrame,
    group_cols: list[str],
    time_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Additive seasonal decomposition per group (the classical
    moving-average method, decompose-style): ``value = trend +
    seasonal + residual`` with a centered moving average as trend —
    a plain ``period``-point window for odd periods, the classical
    2×-period half-weighted-endpoint form for even periods (a plain
    even window is asymmetric and leaks half the slope into the
    seasonal means) — per-phase means of the detrended series as the
    seasonal component (normalized to sum ≈ 0 over one period), and
    the leftover as residual. The metrics-monitoring complement of
    rows 120/172: the z-score flags points, EWMA smooths levels —
    this SEPARATES the weekly rhythm from the trend so a Monday dip
    stops paging anyone.

    Exactness: the trend is an exact DECIMAL window sum divided by
    its exact count (the rolling-zscore discipline); phase means and
    the normalizing mean are DECIMAL sums with single divisions;
    every subtraction runs in a fixed order — a SQL twin replays the
    whole pipeline. Trend (and so seasonal/residual) is NULL at the
    edges where the centered window is incomplete, and rows with
    NULL values pass through with NULL components (never excluded —
    the time grid matters here, unlike ewma's event series).

    Scale shape: one per-group window (ROWS frame over ``period``
    points), one (group, phase) hash aggregate, one group aggregate
    for the normalizer, two broadcast-able join-backs. Phase =
    row position mod period under the per-group (time) order —
    supply a regular (resampled, row 94) series for calendar-aligned
    phases.
    """
    from ..functions.numeric import round_c  # noqa: PLC0415

    if period < 2:
        raise ValueError("period must be >= 2")
    half = period // 2
    w_ord = Window.partitionBy(*group_cols).orderBy(time_col)
    y = round_c(F.col(value_col).cast("double"), 6).cast("decimal(28,6)")
    phase = F.pmod(F.row_number().over(w_ord) - 1, F.lit(period)).alias(
        "__phase"
    )
    if period % 2 == 1:
        # odd period: a plain centered window IS symmetric
        w_frame = w_ord.rowsBetween(-half, half)
        base = df.select(
            *group_cols,
            F.col(time_col),
            F.col(value_col),
            y.alias("__y"),
            phase,
            F.count(y).over(w_frame).alias("__wn"),
            F.sum(y).over(w_frame).alias("__ws"),
        )
        trend = F.when(
            F.col("__wn") == period,
            F.col("__ws").cast("double") / F.col("__wn").cast("double"),
        )
    else:
        # even period: the classical 2x-period WEIGHTED centered MA —
        # endpoints at half weight — via exact decimals:
        # (2*S - x_lo - x_hi) / (2*period) over the (period+1)-point
        # frame. A plain (-h, period-1-h) frame is asymmetric (half a
        # step late) and leaks half the slope into every seasonal
        # phase mean (review-caught; the slope-unbiasedness is
        # pytest-pinned).
        w_frame = w_ord.rowsBetween(-half, half)
        base = df.select(
            *group_cols,
            F.col(time_col),
            F.col(value_col),
            y.alias("__y"),
            phase,
            F.count(y).over(w_frame).alias("__wn"),
            F.sum(y).over(w_frame).alias("__ws"),
            F.lag(y, half).over(w_ord).alias("__lo"),
            F.lead(y, half).over(w_ord).alias("__hi"),
        )
        trend = F.when(
            (F.col("__wn") == period + 1)
            & F.col("__lo").isNotNull()
            & F.col("__hi").isNotNull(),
            (
                F.lit(2) * F.col("__ws") - F.col("__lo") - F.col("__hi")
            ).cast("double")
            / F.lit(2.0 * period),
        )
    detr = base.select(
        *group_cols,
        time_col,
        value_col,
        "__phase",
        trend.alias("__trend"),
        F.when(
            trend.isNotNull() & F.col("__y").isNotNull(),
            round_c(F.col("__y").cast("double") - trend, 9),
        ).alias("__d"),
    )
    phase_means = detr.groupBy(*group_cols, "__phase").agg(
        (
            F.sum(F.col("__d").cast("decimal(28,9)")).cast("double")
            / F.count("__d").cast("double")
        ).alias("__pm")
    )
    norm = phase_means.groupBy(*group_cols).agg(
        (
            F.sum(round_c(F.col("__pm"), 9).cast("decimal(28,9)"))
            .cast("double")
            / F.count("__pm").cast("double")
        ).alias("__mean_pm")
    )
    seasonal = round_c(F.col("__pm") - F.col("__mean_pm"), 9)
    out = (
        detr.join(phase_means, [*group_cols, "__phase"], "left")
        .join(norm, group_cols, "left")
        .select(
            *group_cols,
            time_col,
            value_col,
            round_c(F.col("__trend"), 6).alias("trend"),
            F.when(
                F.col("__pm").isNotNull(), round_c(seasonal, 6)
            ).alias("seasonal"),
            F.when(
                F.col("__trend").isNotNull()
                & F.col("__pm").isNotNull()
                & F.col(value_col).isNotNull(),
                round_c(
                    round_c(F.col(value_col).cast("double"), 6)
                    - F.col("__trend")
                    - seasonal,
                    6,
                ),
            ).alias("residual"),
        )
    )
    return out.orderBy(*group_cols, time_col)


def autocorrelation(
    df: DataFrame,
    group_cols: list[str],
    time_col: str,
    value_col: str,
    max_lag: int = 7,
    out_decimals: int = 6,
) -> DataFrame:
    """Per-group autocorrelation function (ACF) at lags 1..max_lag —
    the rhythm detector that answers "does this metric echo itself a
    day/week later?" BEFORE `seasonal_decompose` is pointed at a
    period (its period parameter should come from the ACF peak, not a
    guess), and the memory-structure companion of the level/trend
    monitors (`ewma_smooth`, `rolling_zscore_anomalies`):

        r_k = sum_t (x_t - mean)(x_{t+k} - mean) / sum_t (x_t - mean)^2

    (the standard full-series-mean estimator), expanded into RAW SUMS
    so nothing is ever centered row-by-row: one window pass attaches
    the k lead columns, ONE hash aggregate per group collects exact
    DECIMAL sums of x, x^2, and per-lag x_t*x_{t+k} / head / tail
    sums, and each r_k is a fixed-order double expression over those
    sums — order- and engine-independent (the linear_trend exact-sum
    discipline; Welford-style incremental forms differ in low bits
    across engines).

    Scale shape: one per-group-keyed exchange (the sort window), whose
    partitioning the aggregate reuses; no self-join, no per-lag scan —
    max_lag widens the row, not the plan. Series are assumed
    regularly spaced with unique ``time_col`` per group (build them
    with a daily rollup; gaps shift what "lag k" means, as with any
    positional ACF). NULL values are excluded before positions form.

    Output: (group, lag, n_pairs, r); r is NULL for a constant series
    (zero denominator) and for lags with no pairs (lag >= n).
    """
    from ..functions.numeric import round_c  # noqa: PLC0415

    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    x = round_c(F.col(value_col).cast("double"), 6)
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(time_col)
    base = df.filter(F.col(value_col).isNotNull()).select(
        *group_cols,
        x.alias("__x"),
        round_c(x * x, 6).alias("__x2"),
        *[
            F.lead(x, k).over(w).alias(f"__lead_{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    aggs = [
        F.count(F.lit(1)).cast("long").alias("__n"),
        # Exact constant-series detection (the moments_profile guard):
        # 6dp square rounding can round x^2 UP for small-magnitude
        # constants (0.0009^2 = 8.1e-7 rounds to 1e-6), leaving
        # den = s2 - n*mean^2 a positive rounding artifact and r_k a
        # spurious n_pairs/n. min==max over the rounded value decides
        # exactly and collapses map-side — no extra exchange.
        F.min(F.col("__x")).alias("__mn"),
        F.max(F.col("__x")).alias("__mx"),
        F.sum(F.col("__x").cast("decimal(28,6)")).alias("__s1"),
        F.sum(F.col("__x2").cast("decimal(32,6)")).alias("__s2"),
    ]
    for k in range(1, max_lag + 1):
        lead = F.col(f"__lead_{k}")
        aggs += [
            F.sum(
                round_c(F.col("__x") * lead, 6).cast("decimal(32,6)")
            ).alias(f"__c_{k}"),
            F.sum(
                F.when(lead.isNotNull(), F.col("__x")).cast("decimal(28,6)")
            ).alias(f"__h_{k}"),
            F.sum(lead.cast("decimal(28,6)")).alias(f"__t_{k}"),
            F.count(lead).cast("long").alias(f"__cnt_{k}"),
        ]
    agg = base.groupBy(*group_cols).agg(*aggs)
    melted = agg.select(
        *group_cols,
        "__n",
        "__mn",
        "__mx",
        F.col("__s1").cast("double").alias("__s1d"),
        F.col("__s2").cast("double").alias("__s2d"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        F.col(f"__c_{k}").cast("double").alias("c"),
                        F.col(f"__h_{k}").cast("double").alias("h"),
                        F.col(f"__t_{k}").cast("double").alias("t"),
                        F.col(f"__cnt_{k}").alias("n_pairs"),
                    )
                    for k in range(1, max_lag + 1)
                ]
            )
        ).alias("__e"),
    )
    nd = F.col("__n").cast("double")
    mean = F.col("__s1d") / nd
    den = F.col("__s2d") - nd * (mean * mean)
    e = F.col("__e")
    num = (
        e["c"]
        - mean * (e["h"] + e["t"])
        + e["n_pairs"].cast("double") * (mean * mean)
    )
    r = F.when(
        (den > 0)
        & (F.col("__mn") < F.col("__mx"))
        & (e["n_pairs"] > 0),
        round_c(num / den, out_decimals),
    )
    return melted.select(
        *group_cols,
        e["lag"].alias("lag"),
        e["n_pairs"].alias("n_pairs"),
        r.alias("r"),
    ).orderBy(*group_cols, "lag")


def cusum_changepoints(
    df: DataFrame,
    group_cols: list[str],
    time_col: str,
    value_col: str,
    k_sigma: float = 0.5,
    h_sigma: float = 4.0,
) -> DataFrame:
    """Two-sided CUSUM changepoint detection (Page 1954) per group —
    the SUSTAINED-shift detector between `rolling_zscore_anomalies`
    (single-point spikes; a 0.8σ level shift never trips a 3σ z) and
    `seasonal_decompose` (rhythm): the one-sided sums

        s+_t = max(0, s+_{t-1} + (x_t - mu) - kσ)
        s-_t = max(0, s-_{t-1} + (mu - x_t) - kσ)

    accumulate drift beyond a slack of ``k_sigma``·σ and alarm when
    either exceeds ``h_sigma``·σ — small persistent shifts integrate
    up while in-control noise resets to zero.

    mu/σ here are the series' own mean and sample std from exact
    decimal sums (the self-baselined form; for a true in-control
    baseline, winsorize or slice the training window upstream and
    feed the result here). The recurrence is evaluated exactly as
    written — IEEE add/subtract/max per step, mu / kσ / hσ rounded
    once up front — so a SQL engine replaying the same recursive
    recurrence lands bit-identically (the ewma/kaplan_meier fold
    contract).

    Scale shape: one stats aggregate + join-back, ONE hash aggregate
    collecting each group's sorted series (bounded by points-per-group
    — days/weeks, never corpus rows), one linear array fold, one
    explode. Degenerate groups (n < 2 or σ = 0) keep their rows with
    NULL cusums and no alarm. NULL values are excluded.
    """
    from ..functions.numeric import round_c  # noqa: PLC0415

    stats = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("__sn"),
            F.sum(
                round_c(F.col(value_col).cast("double"), 6).cast(
                    "decimal(28,6)"
                )
            ).alias("__ss1"),
            F.sum(
                round_c(
                    round_c(F.col(value_col).cast("double"), 6)
                    * round_c(F.col(value_col).cast("double"), 6),
                    6,
                ).cast("decimal(32,6)")
            ).alias("__ss2"),
            # Exact constant-series detection (the moments_profile /
            # ACF guard): 6dp square rounding can leave var_num a
            # positive artifact for small-magnitude constants (e.g.
            # 0.0009), yielding a spurious non-NULL sd and 0.0 cusums
            # where the contract says NULL. min==max over the rounded
            # value decides exactly, map-side.
            F.min(round_c(F.col(value_col).cast("double"), 6)).alias(
                "__smn"
            ),
            F.max(round_c(F.col(value_col).cast("double"), 6)).alias(
                "__smx"
            ),
        )
    )
    nd = F.col("__sn").cast("double")
    mu = round_c(F.col("__ss1").cast("double") / nd, 6)
    var_num = F.col("__ss2").cast("double") - nd * (mu * mu)
    sd = F.when(
        (F.col("__sn") > 1)
        & (var_num > 0)
        & (F.col("__smn") < F.col("__smx")),
        round_c(F.sqrt(var_num / (nd - F.lit(1.0))), 6),
    )
    stats = stats.select(
        *group_cols,
        mu.alias("__mu"),
        sd.alias("__sd"),
        round_c(F.lit(float(k_sigma)) * sd, 6).alias("__slack"),
        round_c(F.lit(float(h_sigma)) * sd, 6).alias("__thr"),
    )
    # NULL-SAFE join back: the stats aggregate keeps NULL-keyed
    # groups, and a plain equi-join would silently drop their rows
    # from the report instead of emitting the degenerate NULL cusums.
    stats_r = stats.select(
        *[F.col(c).alias(f"__k_{i}") for i, c in enumerate(group_cols)],
        "__mu",
        "__sd",
        "__slack",
        "__thr",
    )
    series = (
        df.filter(F.col(value_col).isNotNull())
        .join(
            stats_r,
            [
                F.col(c).eqNullSafe(F.col(f"__k_{i}"))
                for i, c in enumerate(group_cols)
            ],
        )
        .drop(*[f"__k_{i}" for i in range(len(group_cols))])
        .groupBy(*group_cols)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(time_col).alias("t"),
                        F.col(value_col).cast("double").alias("x"),
                    )
                )
            ).alias("__pts"),
            F.first("__mu").alias("__mu"),
            F.first("__sd").alias("__sd"),
            F.first("__slack").alias("__slack"),
            F.first("__thr").alias("__thr"),
        )
    )
    # Fold with slack coalesced to 0 for degenerate groups (greatest()
    # skips NULLs, which would silently zero the state instead of
    # propagating "undefined") -- outputs are masked on __sd below.
    mu_c = F.coalesce(F.col("__mu"), F.lit(0.0))
    slack_c = F.coalesce(F.col("__slack"), F.lit(0.0))
    folded = F.aggregate(
        F.col("__pts"),
        F.array().cast(
            "array<struct<t:" + dict(df.dtypes)[time_col] + ","
            "x:double,sp:double,sn:double>>"
        ),
        lambda acc, e: F.concat(
            acc,
            F.array(
                F.struct(
                    e["t"].alias("t"),
                    e["x"].alias("x"),
                    F.greatest(
                        F.lit(0.0),
                        F.when(
                            F.size(acc) > 0, F.element_at(acc, -1)["sp"]
                        ).otherwise(F.lit(0.0))
                        + (e["x"] - mu_c)
                        - slack_c,
                    ).alias("sp"),
                    F.greatest(
                        F.lit(0.0),
                        F.when(
                            F.size(acc) > 0, F.element_at(acc, -1)["sn"]
                        ).otherwise(F.lit(0.0))
                        + (mu_c - e["x"])
                        - slack_c,
                    ).alias("sn"),
                )
            ),
        ),
    )
    ok = F.col("__sd").isNotNull()
    e = F.col("__e")
    return (
        series.select(
            *group_cols,
            "__sd",
            "__thr",
            F.explode(folded).alias("__e"),
        )
        .select(
            *group_cols,
            e["t"].alias(time_col),
            e["x"].alias(value_col),
            F.when(ok, round_c(e["sp"], 6)).alias("cusum_pos"),
            F.when(ok, round_c(e["sn"], 6)).alias("cusum_neg"),
            F.coalesce(
                F.when(
                    ok,
                    (e["sp"] > F.col("__thr")) | (e["sn"] > F.col("__thr")),
                ),
                F.lit(False),
            ).alias("alarm"),
        )
        .orderBy(*group_cols, time_col)
    )


def holt_smooth(
    df: DataFrame,
    group_cols: list[str],
    time_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
) -> DataFrame:
    """Per-group Holt linear (double-exponential) smoothing — the
    trend-aware upgrade of :func:`ewma_smooth` (a plain EWMA lags a
    trending series by a constant amount forever; Holt's coupled
    level+trend recurrences don't):

        l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
        b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

    with l_1 = x_1, b_1 = 0 (the lookahead-free init — a fold sees
    elements once; the trend converges off the first few steps).
    Output per point: level, trend, forecast (= l_{t-1} + b_{t-1},
    the one-step-ahead prediction; NULL at the head) and residual
    (= x - forecast, the surprise a monitor alarms on).

    Exactness/scale: the ewma fold contract verbatim — NULL values
    excluded before the series forms, the recurrence evaluated as
    written (IEEE multiply/add per step, engine-replayable via a
    recursive CTE), ONE hash aggregate collecting each group's sorted
    series (bounded by points-per-group, never corpus rows), one
    explode back to rows.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError("alpha must be in (0, 1]")
    if not 0.0 <= beta <= 1.0:
        raise ValueError("beta must be in [0, 1]")
    a = F.lit(float(alpha))
    one_a = F.lit(1.0 - float(alpha))
    b = F.lit(float(beta))
    one_b = F.lit(1.0 - float(beta))
    series = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(time_col).alias("t"),
                        F.col(value_col).cast("double").alias("x"),
                    )
                )
            ).alias("__pts")
        )
    )

    def _step(acc, e):
        prev = F.element_at(acc, -1)
        first = F.size(acc) == 0
        fcst = F.when(~first, prev["l"] + prev["b"])
        lvl = F.when(first, e["x"]).otherwise(
            a * e["x"] + one_a * (prev["l"] + prev["b"])
        )
        trd = F.when(first, F.lit(0.0)).otherwise(
            b * (lvl - prev["l"]) + one_b * prev["b"]
        )
        return F.concat(
            acc,
            F.array(
                F.struct(
                    e["t"].alias("t"),
                    e["x"].alias("x"),
                    lvl.alias("l"),
                    trd.alias("b"),
                    fcst.alias("f"),
                    (e["x"] - fcst).alias("r"),
                )
            ),
        )

    folded = F.aggregate(
        F.col("__pts"),
        F.array().cast(
            "array<struct<t:" + dict(df.dtypes)[time_col] + ","
            "x:double,l:double,b:double,f:double,r:double>>"
        ),
        _step,
    )
    e = F.col("__e")
    return (
        series.select(*group_cols, F.explode(folded).alias("__e"))
        .select(
            *group_cols,
            e["t"].alias(time_col),
            e["x"].alias(value_col),
            e["l"].alias("level"),
            e["b"].alias("trend"),
            e["f"].alias("forecast"),
            e["r"].alias("residual"),
        )
    )


def time_weighted_mean(
    df: DataFrame,
    group_cols: list[str],
    ts_col: str,
    value_col: str,
    out_decimals: int = 6,
) -> DataFrame:
    """Per-group time-weighted average of an IRREGULARLY sampled
    series — the honest mean for state-like metrics (a price, a queue
    depth, a config value) where the plain row mean over-weights busy
    periods: each observation holds until the next one, so it weighs
    by its holding DURATION (left-continuous step interpolation, the
    TWAP convention; the last observation has no duration and drops
    from the weighted numerator — classic finite-horizon TWAP).

        twa = sum_i x_i * (t_{i+1} - t_i) / (t_n - t_1)

    ``ts_col`` must be numeric (epoch micros — the `_ev` convention)
    and UNIQUE per group: collapse duplicate timestamps upstream
    (e.g. a per-(group, ts) aggregate), or the lead window is
    nondeterministic. The plain row mean rides along (``row_mean``)
    so the over-weighting is visible in one frame.

    Exactness: durations are exact BIGINT differences; each
    x·duration product rides an asymmetric-width DECIMAL
    ((18,6)x(19,0) — exact in Spark and a replaying engine's int128);
    the final division is one fixed-order double expression. Scale
    shape: one per-group sort window + one hash aggregate on the same
    key. Groups with a single point (zero span) report NULL twa.

    Value domain: |x| < 1e12 for twa (the (18,6) product width; the
    (19,0) duration leg already spans any int64 micros gap) and
    |x| < 1e22 for row_mean (the (28,6) sum width); NaN/±Inf are
    outside both. Every decimal cast is preceded by a row-level
    domain guard — under ANSI mode (Spark 4's default) an unguarded
    cast would throw NUMERIC_VALUE_OUT_OF_RANGE / CAST_INVALID_INPUT
    and kill the whole report (the benford_audit magnitude-window
    discipline) — and a group containing a violator reports NULL for
    the affected leg only (a 1e15 value nulls twa but row_mean still
    reports; 1e23 or NaN nulls both).
    """
    from ..functions.numeric import round_c  # noqa: PLC0415

    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(ts_col)
    stepped = base.select(
        *group_cols,
        F.col(ts_col).cast("long").alias("__t"),
        round_c(F.col(value_col).cast("double"), 6).alias("__x"),
        (F.lead(F.col(ts_col).cast("long"), 1).over(w) - F.col(ts_col).cast("long")).alias(
            "__dur"
        ),
    )
    # Row-level domain guards BEFORE every decimal cast — under ANSI
    # mode (Spark 4 default) an out-of-range or NaN value would throw
    # inside the cast and kill the whole report. Each output leg has
    # its own domain: (18,6) for the duration products, (28,6) for the
    # plain sum; a group containing a violator reports NULL for that
    # leg only.
    finite = ~(F.isnan(F.col("__x")) | F.col("__x").isin(
        float("inf"), float("-inf")))
    ok_w = finite & (F.abs(F.col("__x")) < F.lit(1e12))
    ok_m = finite & (F.abs(F.col("__x")) < F.lit(1e22))
    agg = stepped.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        (F.max("__t") - F.min("__t")).alias("span"),
        F.sum(
            (
                F.when(ok_w, F.col("__x")).cast("decimal(18,6)")
                * F.col("__dur").cast("decimal(19,0)")
            ).cast("decimal(38,6)")
        ).alias("__wsum"),
        F.max((~ok_w).cast("int")).alias("__oob_w"),
        F.max((~ok_m).cast("int")).alias("__oob_m"),
        F.sum(F.when(ok_m, F.col("__x")).cast("decimal(28,6)")).alias(
            "__xsum"
        ),
    )
    twa = F.when(
        (F.col("span") > 0) & (F.col("__oob_w") == 0),
        round_c(
            F.col("__wsum").cast("double") / F.col("span").cast("double"),
            out_decimals,
        ),
    )
    row_mean = F.when(
        F.col("__oob_m") == 0,
        round_c(
            F.col("__xsum").cast("double") / F.col("n_points").cast("double"),
            out_decimals,
        ),
    )
    return agg.select(
        *group_cols,
        "n_points",
        "span",
        twa.alias("twa"),
        row_mean.alias("row_mean"),
    ).orderBy(*group_cols)
