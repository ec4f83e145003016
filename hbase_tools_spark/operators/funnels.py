"""Event-journey analytics: ordered funnels, retention cohorts, and
semi-structured (JSON) property rollups over the ``events`` stream
history — the product-analytics batch family that sits beside
sessionization (operators/analyzer.py) and the S2 windowed streams.

The reference's closest analog is the report family's staged severity
rollups (reports/\\*.java) — multi-step conditional aggregation over an
entity timeline; here the steps are USER journey stages rather than
region health tiers, which is the shape a training-data telemetry
pipeline (ingest → filter → dedup → publish, per document batch)
reports on as well.

Scale notes (100 TB of events):
  * the funnel is ONE user-keyed aggregate (sorted per-type time
    arrays; later stages are array folds over them) — a single
    shuffle whose state is bounded by per-user activity, never
    event-cardinality;
  * per-stage timestamps compare at exact integer microseconds
    (``unix_micros`` / ``epoch_us``) — no float time math anywhere;
  * retention pre-aggregates events to distinct (user, day) FIRST —
    the heavy shuffle carries at most users×days rows with map-side
    dedup — then joins the user-cardinality cohort relation;
  * the JSON rollup extracts typed fields with the engine-native JSON
    path reader (JVM Jackson; no Python), then two-phase aggregates on
    the (event_type, bucket) grid — a few dozen groups, map-side
    partials do nearly all the work.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import Model
from ..functions.cache import stage_persist
from ..functions.exprs import fround, fround_sql
from ..registry import query

#: Ordered funnel stages (the fixture's five event types include these
#: three in a natural acquisition order).
_FUNNEL_STAGES = ("view", "click", "purchase")

_RETENTION_MAX_OFFSET = 29  # day offsets reported per cohort (0..29)
_PROPS_BUCKETS = 10         # modulus for the JSON k-bucket grid


# ---------------------------------------------------------------------------
# Ordered funnel: view -> click -> purchase
# ---------------------------------------------------------------------------

_FUNNEL_STAGE_SQL = f"""
ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
),
s0 AS (SELECT count(DISTINCT user_id) AS n FROM ev),
s1 AS (
  SELECT user_id, min(tus) AS t1 FROM ev
  WHERE event_type = '{_FUNNEL_STAGES[0]}' GROUP BY user_id
),
s2 AS (
  SELECT ev.user_id, min(ev.tus) AS t2
  FROM ev JOIN s1 USING (user_id)
  WHERE ev.event_type = '{_FUNNEL_STAGES[1]}' AND ev.tus > s1.t1
  GROUP BY ev.user_id
),
s3 AS (
  SELECT ev.user_id, min(ev.tus) AS t3
  FROM ev JOIN s2 USING (user_id)
  WHERE ev.event_type = '{_FUNNEL_STAGES[2]}' AND ev.tus > s2.t2
  GROUP BY ev.user_id
)
"""


@query(
    "events_funnel",
    oracle=f"""
WITH {_FUNNEL_STAGE_SQL},
counts AS (
  SELECT s0.n AS n0,
         (SELECT count(*) FROM s1) AS n1,
         (SELECT count(*) FROM s2) AS n2,
         (SELECT count(*) FROM s3) AS n3
  FROM s0
)
SELECT step_order, stage, n_users, conv_from_prev, conv_from_first
FROM (
  SELECT 1 AS step_order, '{_FUNNEL_STAGES[0]}' AS stage,
         CAST(n1 AS BIGINT) AS n_users,
         {fround_sql('CAST(n1 AS DOUBLE) / n0', 6)} AS conv_from_prev,
         CAST(1.0 AS DOUBLE) AS conv_from_first
  FROM counts
  UNION ALL
  SELECT 2, '{_FUNNEL_STAGES[1]}', CAST(n2 AS BIGINT),
         {fround_sql('CAST(n2 AS DOUBLE) / n1', 6)},
         {fround_sql('CAST(n2 AS DOUBLE) / n1', 6)}
  FROM counts
  UNION ALL
  SELECT 3, '{_FUNNEL_STAGES[2]}', CAST(n3 AS BIGINT),
         {fround_sql('CAST(n3 AS DOUBLE) / n2', 6)},
         {fround_sql('CAST(n3 AS DOUBLE) / n1', 6)}
  FROM counts
) f
""",
    views=[],
)
def events_funnel(m: Model) -> DataFrame:
    """Ordered funnel over the event history: users whose first
    '{view}' precedes a later '{click}' precedes a later '{purchase}'
    (strict event-time order at exact integer microseconds), with
    per-stage conversion from the previous stage and from the funnel
    head.

    Each stage is the earliest qualifying time AFTER the user's
    previous-stage time.  The whole chain is ONE user-keyed aggregate:
    per user the first-stage min plus SORTED per-type time arrays,
    then stage k is ``array_min(filter(times_k, > t_{k-1}))`` — empty
    filters propagate null, so non-reaching users drop out of the
    conversion counts for free.  One shuffle on ``user_id`` (map-side
    partial collect_list), arrays bounded by per-user activity; for
    degenerate power users the chained per-stage min-join form (git
    history) is the unbounded-safe fallback.  The conversion table
    then explodes from a single 1-row count aggregate."""
    from ..functions.partitioning import spread_if_undersplit

    ev = spread_if_undersplit(m.events, "user_id").select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus")
    )
    # ONE user-keyed aggregate computes the whole chain: per user the
    # first-stage min plus SORTED per-type time arrays, then each later
    # stage is array_min(filter(times, > previous)) — empty filters
    # propagate null, so non-reaching users fall out of the counts for
    # free.  One shuffle, one job round (the chained-join form cost 4
    # sequential checkpoint jobs).  Arrays are per-user-activity
    # bounded; for degenerate power users the chained per-stage
    # min-join form (git history) is the unbounded-safe fallback.
    is_ = lambda t: F.col("event_type") == t  # noqa: E731
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(is_(_FUNNEL_STAGES[0]), F.col("tus"))).alias("t1"),
        F.sort_array(
            F.collect_list(F.when(is_(_FUNNEL_STAGES[1]), F.col("tus")))
        ).alias("clicks"),
        F.sort_array(
            F.collect_list(F.when(is_(_FUNNEL_STAGES[2]), F.col("tus")))
        ).alias("purchases"),
    )
    t2 = F.array_min(F.filter("clicks", lambda x: x > F.col("t1")))
    t3 = F.array_min(F.filter("purchases", lambda x: x > F.col("t2")))
    staged = (
        per_user.select("t1", "purchases", t2.alias("t2"))
        .select("t1", "t2", t3.alias("t3"))
    )
    counts = staged.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count("t1").alias("n1"),
        F.count("t2").alias("n2"),
        F.count("t3").alias("n3"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    stage_structs = F.array(
        F.struct(
            F.lit(1).alias("step_order"),
            F.lit(_FUNNEL_STAGES[0]).alias("stage"),
            F.col("n1").cast("bigint").alias("n_users"),
            fround(d("n1") / d("n0"), 6).alias("conv_from_prev"),
            F.lit(1.0).alias("conv_from_first"),
        ),
        F.struct(
            F.lit(2).alias("step_order"),
            F.lit(_FUNNEL_STAGES[1]).alias("stage"),
            F.col("n2").cast("bigint").alias("n_users"),
            fround(d("n2") / d("n1"), 6).alias("conv_from_prev"),
            fround(d("n2") / d("n1"), 6).alias("conv_from_first"),
        ),
        F.struct(
            F.lit(3).alias("step_order"),
            F.lit(_FUNNEL_STAGES[2]).alias("stage"),
            F.col("n3").cast("bigint").alias("n_users"),
            fround(d("n3") / d("n2"), 6).alias("conv_from_prev"),
            fround(d("n3") / d("n1"), 6).alias("conv_from_first"),
        ),
    )
    return counts.select(F.explode(stage_structs).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# Retention cohorts: day-grain cohort x day-offset activity grid
# ---------------------------------------------------------------------------


@query(
    "events_retention_cohorts",
    oracle=f"""
WITH ud AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day FROM events
),
cohort AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id),
sizes AS (SELECT cohort_day, count(*) AS cohort_size FROM cohort GROUP BY cohort_day)
SELECT ud.cohort_day,
       strftime(DATE '1970-01-01' + INTERVAL (ud.cohort_day) DAY, '%Y-%m-%d')
         AS cohort_date,
       ud.day_offset,
       CAST(count(*) AS BIGINT) AS n_active,
       CAST(max(sizes.cohort_size) AS BIGINT) AS cohort_size,
       {fround_sql('count(*) * 1.0 / max(sizes.cohort_size)', 6)} AS retention
FROM (
  SELECT ud.user_id, cohort.cohort_day, ud.day - cohort.cohort_day AS day_offset
  FROM ud JOIN cohort USING (user_id)
) ud
JOIN sizes USING (cohort_day)
WHERE ud.day_offset <= {_RETENTION_MAX_OFFSET}
GROUP BY ud.cohort_day, ud.day_offset
""",
    views=[],
)
def events_retention_cohorts(m: Model) -> DataFrame:
    """Retention cohort grid: users cohorted by first-active day, and
    for each (cohort day, day offset ≤ {29}) the count and fraction of
    the cohort active that day — the classic triangle retention table.

    Plan: events collapse to DISTINCT (user, day) FIRST (the only
    event-cardinality shuffle, with map-side dedup), cohorts derive
    from THAT relation (user-keyed min), and the offset grid is a
    user-keyed join of the two user/day-cardinality relations followed
    by a (cohort_day, offset) rollup — a bounded grid (days²/2 rows).
    Cohort sizes join back broadcast (one row per cohort day).  At
    100 TB nothing here touches raw events twice."""
    ud = (
        m.events.select(
            "user_id",
            (F.floor(F.unix_timestamp("ts") / 86400)).cast("bigint").alias("day"),
        )
        .distinct()
    )
    ud = stage_persist(ud)  # reused by cohort AND the grid
    cohort = ud.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = cohort.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    grid = (
        ud.join(cohort, "user_id")
        .select(
            "cohort_day", (F.col("day") - F.col("cohort_day")).alias("day_offset")
        )
        .where(F.col("day_offset") <= _RETENTION_MAX_OFFSET)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        grid.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            F.date_format(
                F.date_add(F.lit("1970-01-01").cast("date"), F.col("cohort_day").cast("int")),
                "yyyy-MM-dd",
            ).alias("cohort_date"),
            "day_offset",
            F.col("n_active").cast("bigint").alias("n_active"),
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            fround(F.col("n_active") * 1.0 / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


# ---------------------------------------------------------------------------
# JSON property rollup: typed extraction from semi-structured props
# ---------------------------------------------------------------------------


@query(
    "events_props_rollup",
    oracle=f"""
SELECT event_type, k_bucket,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(min(k) AS BIGINT)   AS min_k,
       CAST(max(k) AS BIGINT)   AS max_k,
       CAST(round(sum(CAST(value AS DECIMAL(18,4))), 4) AS DOUBLE)
         AS total_value
FROM (
  SELECT event_type, value,
         CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE))
              AS BIGINT) AS k,
         CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE))
              AS BIGINT) % {_PROPS_BUCKETS} AS k_bucket,
         TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS kd
  FROM events
) e
WHERE kd IS NOT NULL AND kd = floor(kd)
GROUP BY event_type, k_bucket
""",
    views=[],
)
def events_props_rollup(m: Model) -> DataFrame:
    """Semi-structured property rollup: the JSON ``props`` column's
    ``k`` field extracted as a typed integer and aggregated on the
    (event_type × k % {10}) grid — counts, k range, exact-decimal value
    totals.  The analog of the reference's qualifier parse+rollup (X7:
    technical-meta qualifiers → typed columns → aggregate), re-expressed
    over the JSON metadata every training-telemetry pipeline carries.

    Extraction is ``get_json_object`` — JVM-side Jackson inside
    whole-stage codegen, no Python — and a real pipeline would hoist it
    into the bronze→silver materialization so the path parse runs once.
    The rollup grid is a few dozen groups: map-side partials collapse
    the shuffle to ~groups×partitions rows.  Null/absent keys are
    filtered explicitly (same predicate both engines)."""
    # Parse through DOUBLE + an exact-integer gate: a direct
    # string->BIGINT cast diverges across engines on fractional values
    # (DuckDB rounds '12.5' to 13, Spark truncates), while floor over
    # an exact-integer double then casts identically everywhere.
    # from_json with an explicit schema parses the document ONCE into
    # a typed struct (get_json_object re-walked the JSON per reference;
    # measured 1.17 s -> 0.63 s warm at sf0.1).  Extract as STRING and
    # try_cast: a "k double" schema NULLs quoted numerics ("k":"12.5")
    # under PERMISSIVE parsing while the oracle's
    # TRY_CAST(json_extract_string(...)) coerces them — string->double
    # via try_cast (NULL on malformed, never ANSI-throws) is the
    # coercion path both engines share (round-6 ADVICE).
    kd = F.from_json("props", "k string").getField("k").try_cast("double")
    k = F.floor(kd).cast("bigint")
    return (
        m.events.select(
            "event_type",
            "value",
            kd.alias("kd"),
            k.alias("k"),
            (k % _PROPS_BUCKETS).alias("k_bucket"),
        )
        .where(F.col("kd").isNotNull() & (F.col("kd") == F.floor("kd")))
        .groupBy("event_type", "k_bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Daily-volume anomaly detection: z-score of each (type, day) count
# against that type's day-count distribution
# ---------------------------------------------------------------------------

_ANOMALY_Z = 2.0  # |z| above which a day is flagged


@query(
    "events_anomaly_zscore",
    oracle=f"""
WITH dc AS (
  SELECT event_type, CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         count(*) AS c
  FROM events GROUP BY event_type, day
),
st AS (
  SELECT event_type, count(*) AS n, sum(c) AS sx, sum(c * c) AS sxx
  FROM dc GROUP BY event_type
)
SELECT event_type, day, CAST(c AS BIGINT) AS n_events,
       {fround_sql('CAST(sx AS DOUBLE) / n', 6)} AS mean_events,
       {fround_sql('sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / (n * (n - 1)))', 6)} AS std_events,
       {fround_sql('(CAST(c AS DOUBLE) - CAST(sx AS DOUBLE) / n) / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / (n * (n - 1)))', 6)} AS zscore,
       abs((CAST(c AS DOUBLE) - CAST(sx AS DOUBLE) / n)
           / sqrt(CAST(n * sxx - sx * sx AS DOUBLE) / (n * (n - 1))))
         > {_ANOMALY_Z} AS anomalous
FROM dc JOIN st USING (event_type)
WHERE n >= 2 AND n * sxx - sx * sx > 0
""",
    views=[],
)
def events_anomaly_zscore(m: Model) -> DataFrame:
    """Volume-anomaly detector: each (event_type, day) count scored
    against that type's daily distribution — sample mean, sample
    standard deviation, z-score, and an ``anomalous`` flag at |z| >
    {2.0} — the alerting primitive over ingest telemetry (the
    reference's report family flags the same shape over queue depths,
    reports/CompactionQueuesReport.java).

    Float discipline without any Python: the z-score is a pure function
    of EXACT integer sums (n, Σc, Σc² — day counts are ints), composed
    as an identical IEEE double op sequence in both engines (cast →
    divide → sqrt), so even the raw unrounded flag comparison agrees.
    Plan: two-phase count to (type, day) grain — map-side partials do
    the heavy lifting — then a per-type rollup of THAT relation (one
    row per type) broadcast back.  Degenerate distributions (a single
    day, zero variance) are excluded by the same integer predicate in
    both engines."""
    dc = (
        m.events.select(
            "event_type",
            (F.floor(F.unix_timestamp("ts") / 86400)).cast("bigint").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    st = dc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sx"),
        F.sum(F.col("c") * F.col("c")).alias("sxx"),
    )
    n, sx, sxx, c = F.col("n"), F.col("sx"), F.col("sxx"), F.col("c")
    mean = sx.cast("double") / n
    var = (n * sxx - sx * sx).cast("double") / (n * (n - 1))
    z = (c.cast("double") - mean) / F.sqrt(var)
    return (
        dc.join(F.broadcast(st), "event_type")
        .where((n >= 2) & (n * sxx - sx * sx > 0))
        .select(
            "event_type",
            "day",
            c.cast("bigint").alias("n_events"),
            fround(mean, 6).alias("mean_events"),
            fround(F.sqrt(var), 6).alias("std_events"),
            fround(z, 6).alias("zscore"),
            (F.abs(z) > _ANOMALY_Z).alias("anomalous"),
        )
    )


# ---------------------------------------------------------------------------
# Conversion attribution — the last-touch model: every purchase is
# credited to the user's most recent preceding click (else view)
# within the lookback window, else counted organic.  The as-of
# resolution is a running-max WINDOW over the user's own event
# stream — no self-join, no point-in-range join: the standard
# "decorate facts with the latest preceding dimension event" shape.
# ---------------------------------------------------------------------------

_ATTR_LOOKBACK_US = 7 * 24 * 3600 * 1_000_000  # 7 days, integer µs


@query(
    "events_attribution",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
dec AS (
  SELECT user_id, event_type, tus,
         max(CASE WHEN event_type = 'click' THEN tus END)
           OVER (PARTITION BY user_id ORDER BY tus, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_click,
         max(CASE WHEN event_type = 'view' THEN tus END)
           OVER (PARTITION BY user_id ORDER BY tus, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS last_view
  FROM ev
),
attr AS (
  SELECT CASE
           WHEN last_click IS NOT NULL
                AND tus - last_click <= {_ATTR_LOOKBACK_US} THEN 'click'
           WHEN last_view IS NOT NULL
                AND tus - last_view <= {_ATTR_LOOKBACK_US} THEN 'view'
           ELSE 'organic'
         END AS attributed_to,
         CASE
           WHEN last_click IS NOT NULL
                AND tus - last_click <= {_ATTR_LOOKBACK_US}
             THEN tus - last_click
           WHEN last_view IS NOT NULL
                AND tus - last_view <= {_ATTR_LOOKBACK_US}
             THEN tus - last_view
         END AS latency_us
  FROM dec WHERE event_type = 'purchase'
)
SELECT attributed_to,
       CAST(count(*) AS BIGINT) AS n_purchases,
       CAST(avg(CAST(latency_us AS DOUBLE) / 1000000.0) AS DOUBLE)
         IS NOT NULL AS has_latency,
       {fround_sql('coalesce(avg(CAST(latency_us AS DOUBLE)), 0) / 1000000.0', 6)}
         AS avg_latency_sec
FROM attr
GROUP BY attributed_to
""",
    views=[],
)
def events_attribution(m: Model) -> DataFrame:
    """Last-touch conversion attribution: each purchase credits the
    same user's most recent PRECEDING click — else view — within a
    {7}-day lookback, else 'organic'; per attribution source the
    purchase count and mean click/view→purchase latency.

    Plan: ONE window pass decorates every event with the running max
    of prior click/view timestamps over the user's stream (integer-µs,
    strictly-preceding frame with event_id tie-break), then purchases
    filter out and aggregate — no self-join, no per-purchase probe;
    the user-partitioned window is the exact shape the J7 as-of joins
    use, here with zero shuffle beyond the user partitioning.  The
    mean divides an exact integer-µs average only at the end (IEEE-
    identical both engines)."""
    from pyspark.sql.window import Window

    ev = m.events.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("tus"),
        "event_id",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_click = F.max(
        F.when(F.col("event_type") == "click", F.col("tus"))
    ).over(w)
    last_view = F.max(
        F.when(F.col("event_type") == "view", F.col("tus"))
    ).over(w)
    dec = ev.select(
        "event_type",
        "tus",
        last_click.alias("last_click"),
        last_view.alias("last_view"),
    ).where(F.col("event_type") == "purchase")
    click_ok = F.col("last_click").isNotNull() & (
        F.col("tus") - F.col("last_click") <= _ATTR_LOOKBACK_US
    )
    view_ok = F.col("last_view").isNotNull() & (
        F.col("tus") - F.col("last_view") <= _ATTR_LOOKBACK_US
    )
    attr = dec.select(
        F.when(click_ok, "click")
        .when(view_ok, "view")
        .otherwise("organic")
        .alias("attributed_to"),
        F.when(click_ok, F.col("tus") - F.col("last_click"))
        .when(view_ok, F.col("tus") - F.col("last_view"))
        .alias("latency_us"),
    )
    avg_lat = F.avg(F.col("latency_us").cast("double"))
    return attr.groupBy("attributed_to").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        avg_lat.isNotNull().alias("has_latency"),
        fround(F.coalesce(avg_lat, F.lit(0.0)) / 1000000.0, 6).alias(
            "avg_latency_sec"
        ),
    )


# ---------------------------------------------------------------------------
# Event-transition matrix — the Markov view of user journeys: from
# each event to the SAME user's next event, the transition count and
# row-normalized probability.  One lead() window + one aggregate.
# ---------------------------------------------------------------------------


@query(
    "events_transition_matrix",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events
),
tr AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY tus, event_id
         ) AS to_type
  FROM ev
)
SELECT from_type, to_type,
       CAST(count(*) AS BIGINT) AS n_transitions,
       {fround_sql('count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY from_type)', 6)}
         AS probability
FROM tr WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
""",
    views=[],
)
def events_transition_matrix(m: Model) -> DataFrame:
    """User-journey Markov matrix: P(next event type | current event
    type) over each user's time-ordered stream, with the raw
    transition counts — the input to journey simulation, anomaly
    scoring, and funnel design.

    Plan: one lead() window over user partitions (integer-µs order,
    event_id tie-break) pairs each event with its successor; the
    (from, to) aggregate is at most |types|² rows, and the row
    normalization is a window over THAT tiny relation — the heavy
    shuffle is the single user partitioning."""
    from pyspark.sql.window import Window

    ev = m.events.select(
        "user_id", "event_type", F.unix_micros("ts").alias("tus"), "event_id"
    )
    to_type = F.lead("event_type").over(
        Window.partitionBy("user_id").orderBy("tus", "event_id")
    )
    tr = ev.select(
        F.col("event_type").alias("from_type"), to_type.alias("to_type")
    ).where(F.col("to_type").isNotNull())
    counts = tr.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy("from_type"))
    return counts.select(
        "from_type",
        "to_type",
        F.col("n").cast("bigint").alias("n_transitions"),
        fround(F.col("n") * 1.0 / total, 6).alias("probability"),
    )


# ---------------------------------------------------------------------------
# First-touch attribution — the complement of events_attribution: each
# purchase credits the user's EARLIEST touch (click or view) inside the
# lookback, not the latest.  "Earliest inside the lookback" cannot be a
# running min over an unbounded-preceding frame (an out-of-window touch
# would win), so the frame is a value-based RANGE window bounded by the
# lookback itself — min over exactly the eligible set.  Channel + time
# ride in ONE encoded bigint (tus*2 + type bit) so the argmin needs no
# struct ordering: min(code) is the earliest touch, click beating view
# on exact timestamp ties.
# ---------------------------------------------------------------------------


@query(
    "events_attribution_first",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
dec AS (
  SELECT event_type, tus,
         min(CASE WHEN event_type IN ('view', 'click')
                  THEN tus * 2 + CASE WHEN event_type = 'click' THEN 0 ELSE 1 END
             END)
           OVER (PARTITION BY user_id ORDER BY tus
                 RANGE BETWEEN {_ATTR_LOOKBACK_US} PRECEDING AND 1 PRECEDING)
           AS fc
  FROM ev
),
attr AS (
  SELECT CASE WHEN fc IS NULL THEN 'organic'
              WHEN fc % 2 = 0 THEN 'click' ELSE 'view' END AS attributed_to,
         CASE WHEN fc IS NOT NULL THEN tus - fc // 2 END   AS latency_us
  FROM dec WHERE event_type = 'purchase'
)
SELECT attributed_to,
       CAST(count(*) AS BIGINT) AS n_purchases,
       {fround_sql('coalesce(avg(CAST(latency_us AS DOUBLE)), 0) / 1000000.0', 6)}
         AS avg_latency_sec
FROM attr
GROUP BY attributed_to
""",
    views=[],
)
def events_attribution_first(m: Model) -> DataFrame:
    """First-touch conversion attribution: each purchase credits the
    same user's EARLIEST click-or-view within the 7-day lookback
    (click wins exact-timestamp ties), else 'organic'; per channel the
    purchase count and mean touch->purchase latency.

    Plan: one value-bounded RANGE window (ORDER BY integer-µs,
    lookback µs PRECEDING .. 1 PRECEDING) takes min over exactly the
    eligible touches — no self-join, no per-purchase probe, and unlike
    a running min the lookback bound is part of the frame, so expired
    touches can never win.  Channel and timestamp share one encoded
    bigint (tus*2 + bit), making the argmin a plain min().  Single
    shuffle on user_id."""
    ev = m.events.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", F.unix_micros("ts").alias("tus"))
    code = F.when(
        F.col("event_type").isin("view", "click"),
        F.col("tus") * 2
        + F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-_ATTR_LOOKBACK_US, -1)
    )
    dec = ev.select(
        "event_type", "tus", F.min(code).over(w).alias("fc")
    ).where(F.col("event_type") == "purchase")
    attr = dec.select(
        F.when(F.col("fc").isNull(), "organic")
        .when(F.col("fc") % 2 == 0, "click")
        .otherwise("view")
        .alias("attributed_to"),
        F.when(
            F.col("fc").isNotNull(), F.col("tus") - F.expr("fc div 2")
        ).alias("latency_us"),
    )
    avg_lat = F.avg(F.col("latency_us").cast("double"))
    return attr.groupBy("attributed_to").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        fround(F.coalesce(avg_lat, F.lit(0.0)) / 1000000.0, 6).alias(
            "avg_latency_sec"
        ),
    )


# ---------------------------------------------------------------------------
# Position-based (U-shaped) attribution — 40% first touch, 40% last
# touch, 20% split over the middle touches.  Credits are INTEGER
# millionths of a purchase (first = 400000 + the integer-division
# remainder of the middle split, so every purchase distributes exactly
# 1_000_000 units), which makes the channel sums exact bigints —
# order-independent across engines with no FP accumulation anywhere.
# Degenerate cases: 1 touch -> 1_000_000; 2 touches -> 500000/500000;
# 0 touches -> organic.
# ---------------------------------------------------------------------------


@query(
    "events_attribution_position",
    oracle=f"""
WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
dec AS (
  SELECT event_type,
         min(CASE WHEN event_type IN ('view', 'click')
                  THEN tus * 2 + CASE WHEN event_type = 'click' THEN 0 ELSE 1 END END)
           OVER w AS fc,
         max(CASE WHEN event_type IN ('view', 'click')
                  THEN tus * 2 + CASE WHEN event_type = 'click' THEN 0 ELSE 1 END END)
           OVER w AS lc,
         count(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_click,
         count(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS n_view
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY tus
               RANGE BETWEEN {_ATTR_LOOKBACK_US} PRECEDING AND 1 PRECEDING)
),
per AS (
  SELECT n_click + n_view AS n_touch,
         CASE WHEN fc % 2 = 0 THEN 1 ELSE 0 END AS f_click,
         CASE WHEN lc % 2 = 0 THEN 1 ELSE 0 END AS l_click,
         n_click, n_view
  FROM dec WHERE event_type = 'purchase'
),
units AS (
  SELECT n_touch,
         CASE WHEN n_touch >= 3 THEN 200000 // (n_touch - 2) ELSE 0 END AS mid_each,
         CASE WHEN n_touch >= 3
              THEN 200000 - (200000 // (n_touch - 2)) * (n_touch - 2) ELSE 0 END AS rem,
         f_click, l_click, n_click, n_view
  FROM per
),
credits AS (
  SELECT CASE WHEN n_touch = 0 THEN 0
              WHEN n_touch = 1 THEN 1000000 * f_click
              WHEN n_touch = 2 THEN 500000 * (f_click + l_click)
              ELSE (400000 + rem) * f_click + 400000 * l_click
                   + mid_each * (n_click - f_click - l_click)
         END AS click_units,
         CASE WHEN n_touch = 0 THEN 0
              WHEN n_touch = 1 THEN 1000000 * (1 - f_click)
              WHEN n_touch = 2 THEN 500000 * ((1 - f_click) + (1 - l_click))
              ELSE (400000 + rem) * (1 - f_click) + 400000 * (1 - l_click)
                   + mid_each * (n_view - (1 - f_click) - (1 - l_click))
         END AS view_units,
         CASE WHEN n_touch = 0 THEN 1000000 ELSE 0 END AS organic_units
  FROM units
)
SELECT CAST(count(*) AS BIGINT)          AS n_purchases,
       CAST(sum(click_units) AS BIGINT)  AS click_units,
       CAST(sum(view_units) AS BIGINT)   AS view_units,
       CAST(sum(organic_units) AS BIGINT) AS organic_units,
       {fround_sql('sum(click_units) / 1000000.0', 6)}   AS click_credit,
       {fround_sql('sum(view_units) / 1000000.0', 6)}    AS view_credit,
       {fround_sql('sum(organic_units) / 1000000.0', 6)} AS organic_credit
FROM credits
""",
    views=[],
)
def events_attribution_position(m: Model) -> DataFrame:
    """Position-based (U-shaped 40/20/40) attribution: per purchase the
    first eligible touch earns 40%, the last 40%, the middle touches
    split 20% — fractional credit summed per channel over all
    purchases.

    Credits are integer MILLIONTHS (first touch also absorbs the
    integer-division remainder of the middle split, so each purchase
    distributes exactly 1e6 units): the channel totals are exact bigint
    sums — no floating-point accumulation, hence order-independent and
    bit-identical across engines; doubles appear only in the final
    display division.  Same single RANGE-window pass as first-touch
    (min/max/two counts over one frame), one shuffle on user_id."""
    ev = m.events.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", F.unix_micros("ts").alias("tus"))
    code = F.when(
        F.col("event_type").isin("view", "click"),
        F.col("tus") * 2
        + F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-_ATTR_LOOKBACK_US, -1)
    )
    dec = ev.select(
        "event_type",
        F.min(code).over(w).alias("fc"),
        F.max(code).over(w).alias("lc"),
        F.count(F.when(F.col("event_type") == "click", 1)).over(w).alias("n_click"),
        F.count(F.when(F.col("event_type") == "view", 1)).over(w).alias("n_view"),
    ).where(F.col("event_type") == "purchase")
    per = dec.select(
        (F.col("n_click") + F.col("n_view")).alias("n_touch"),
        F.when(F.col("fc") % 2 == 0, 1).otherwise(0).alias("f_click"),
        F.when(F.col("lc") % 2 == 0, 1).otherwise(0).alias("l_click"),
        "n_click",
        "n_view",
    )
    units = per.select(
        "n_touch",
        F.when(F.col("n_touch") >= 3, F.expr("200000 div (n_touch - 2)"))
        .otherwise(0)
        .alias("mid_each"),
        F.when(
            F.col("n_touch") >= 3,
            200000 - F.expr("(200000 div (n_touch - 2)) * (n_touch - 2)"),
        )
        .otherwise(0)
        .alias("rem"),
        "f_click",
        "l_click",
        "n_click",
        "n_view",
    )
    f_view = 1 - F.col("f_click")
    l_view = 1 - F.col("l_click")
    credits = units.select(
        F.when(F.col("n_touch") == 0, 0)
        .when(F.col("n_touch") == 1, 1000000 * F.col("f_click"))
        .when(F.col("n_touch") == 2, 500000 * (F.col("f_click") + F.col("l_click")))
        .otherwise(
            (400000 + F.col("rem")) * F.col("f_click")
            + 400000 * F.col("l_click")
            + F.col("mid_each")
            * (F.col("n_click") - F.col("f_click") - F.col("l_click"))
        )
        .alias("click_units"),
        F.when(F.col("n_touch") == 0, 0)
        .when(F.col("n_touch") == 1, 1000000 * f_view)
        .when(F.col("n_touch") == 2, 500000 * (f_view + l_view))
        .otherwise(
            (400000 + F.col("rem")) * f_view
            + 400000 * l_view
            + F.col("mid_each") * (F.col("n_view") - f_view - l_view)
        )
        .alias("view_units"),
        F.when(F.col("n_touch") == 0, 1000000).otherwise(0).alias("organic_units"),
    )
    return credits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.sum("click_units").cast("bigint").alias("click_units"),
        F.sum("view_units").cast("bigint").alias("view_units"),
        F.sum("organic_units").cast("bigint").alias("organic_units"),
        fround(F.sum("click_units") / 1000000.0, 6).alias("click_credit"),
        fround(F.sum("view_units") / 1000000.0, 6).alias("view_credit"),
        fround(F.sum("organic_units") / 1000000.0, 6).alias("organic_credit"),
    )


# ---------------------------------------------------------------------------
# Data-driven (Markov removal-effect) attribution — the fourth member
# of the attribution family: model user journeys as a first-order
# Markov chain (start -> {view, click} -> purchase/end with absorbing
# ends), compute the K-step conversion probability from 'start', then
# re-compute it with each channel REMOVED (its incoming transitions
# redirected to the null absorber, per Anderl et al. 2016); a
# channel's credit share is its normalized removal effect.
#
# The corpus-scale work (the user-window pass and the transition
# probabilities) is IN-ENGINE; the K-step chain then runs driver-side
# over the COLLECTED ≤states²-row transition relation in exact
# Decimal arithmetic (round 11 — the relation is type-vocabulary
# bounded at any corpus size, so this is a bounded-driver codebook,
# not a corpus collect; contrast neardup_pagerank, whose state IS
# corpus-sized and therefore keeps the next-state-is-a-RELATION
# shape).  All probabilities live in DECIMAL(11,7), re-quantized
# after every step (HALF_UP in both engines and in Python Decimal),
# so K chained matrix-vector products stay bit-identical with no FP
# accumulation.
# ---------------------------------------------------------------------------

_MK_STEPS = 8
_MK_CHANNELS = ("view", "click")


def _markov_tr_sql() -> str:
    """Transition relations for the full chain and each removed-channel
    variant, as a DuckDB CTE body (shared by the unrolled oracle)."""
    variants = ["SELECT 'full' AS variant, from_type, to_type, p FROM pq"]
    for ch in _MK_CHANNELS:
        variants.append(f"""
SELECT 'rm_{ch}' AS variant, from_type,
       CASE WHEN to_type = '{ch}' THEN 'end' ELSE to_type END AS to_type,
       CAST(sum(p) AS DECIMAL(11,7)) AS p
FROM pq WHERE from_type <> '{ch}'
GROUP BY from_type, CASE WHEN to_type = '{ch}' THEN 'end' ELSE to_type END
""")
    variant_sql = " UNION ALL ".join(variants)
    return f"""
ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS tus, event_id FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
),
seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY tus, event_id)
           AS nxt,
         row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id)
           AS rn
  FROM ev
),
raw AS (
  SELECT event_type AS from_type, coalesce(nxt, 'end') AS to_type
  FROM seq WHERE event_type <> 'purchase'
  UNION ALL
  SELECT 'start', event_type FROM seq WHERE rn = 1
),
cnts AS (SELECT from_type, to_type, count(*) AS c FROM raw GROUP BY 1, 2),
pq AS (
  SELECT from_type, to_type,
         CAST(floor((c * 1.0 / sum(c) OVER (PARTITION BY from_type))
                    * 10000000.0 + 0.5) / 10000000.0 AS DECIMAL(11,7)) AS p
  FROM cnts
),
tr AS (
  SELECT * FROM ({variant_sql}) v
  UNION ALL
  SELECT variant, s, s, CAST(1 AS DECIMAL(11,7))
  FROM (SELECT unnest(['full', 'rm_view', 'rm_click']) AS variant) vs,
       (SELECT unnest(['purchase', 'end']) AS s) ab
)
"""


def _markov_oracle() -> str:
    steps = ""
    prev = "v0"
    for k in range(1, _MK_STEPS + 1):
        steps += f""",
v{k} AS (
  SELECT v.variant, t.to_type AS state,
         CAST(round(sum(t.p * v.p), 7) AS DECIMAL(11,7)) AS p
  FROM {prev} v JOIN tr t
    ON t.variant = v.variant AND t.from_type = v.state
  GROUP BY v.variant, t.to_type
)"""
        prev = f"v{k}"
    chan_rows = " UNION ALL ".join(
        f"SELECT '{ch}' AS channel, 'rm_{ch}' AS variant" for ch in _MK_CHANNELS
    )
    return f"""
WITH {_markov_tr_sql().strip().rstrip()},
v0 AS (
  SELECT variant, 'start' AS state, CAST(1 AS DECIMAL(11,7)) AS p
  FROM (SELECT unnest(['full', 'rm_view', 'rm_click']) AS variant) vs
){steps},
conv AS (
  SELECT variant, coalesce(max(p), CAST(0 AS DECIMAL(11,7))) AS p
  FROM {prev} WHERE state = 'purchase' GROUP BY variant
),
eff AS (
  SELECT c.channel,
         f.p AS p_full,
         r.p AS p_removed,
         f.p - r.p AS re
  FROM ({chan_rows}) c
  JOIN conv f ON f.variant = 'full'
  JOIN conv r ON r.variant = c.variant
)
SELECT channel,
       {fround_sql('CAST(p_full AS DOUBLE)', 6)}    AS p_full,
       {fround_sql('CAST(p_removed AS DOUBLE)', 6)} AS p_removed,
       {fround_sql('CAST(re AS DOUBLE) / CAST(p_full AS DOUBLE)', 6)}
         AS removal_effect,
       {fround_sql('CAST(re AS DOUBLE) / CAST((SELECT sum(re) FROM eff) AS DOUBLE)', 6)}
         AS credit_share
FROM eff
"""


@query("events_markov_attribution", oracle=_markov_oracle(), views=[])
def events_markov_attribution(m: Model) -> DataFrame:
    """Markov removal-effect attribution over {8} chain steps: journeys
    (start -> events -> end, purchase absorbing) define the transition
    matrix; each channel's worth is how much the start->purchase
    K-step probability drops when that channel's incoming edges are
    redirected to the null absorber — credit shares are the normalized
    removal effects.

    The corpus-scale work is ONE user-partitioned window pass;
    everything after is states²-sized — so the {8}-step power
    iteration advances driver-side over the collected transition
    decimals (exact Decimal arithmetic, per-step HALF_UP
    quantization identical to the engine's round-on-decimal), and
    the conversion probabilities re-enter as a 3-row relation for
    the unchanged in-engine readout.  Probabilities are
    DECIMAL(11,7), re-quantized after every matrix-vector product,
    so the chain is exact and order-independent; doubles appear only
    in the final ratio columns, all computed by the engine."""
    ev = m.events.where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select("user_id", "event_type", F.unix_micros("ts").alias("tus"), "event_id")
    w = Window.partitionBy("user_id").orderBy("tus", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type").over(w).alias("nxt"),
        F.row_number().over(w).alias("rn"),
    )
    # ONE window pass: the former unionAll of two filtered branches
    # over `seq` re-computed the user window (shuffle + sort) once per
    # branch — Spark does not dedupe common subplans under a union.
    # Emitting both the transition row and (for rn=1) the start row
    # from the same input row via explode(array_compact(...)) keeps
    # the multiset of (from_type, to_type) rows identical while
    # halving the corpus-scale work (round 11; 2 Exchange+Sort → 1).
    raw = seq.select(
        F.explode(
            F.array_compact(
                F.array(
                    F.when(
                        F.col("event_type") != "purchase",
                        F.struct(
                            F.col("event_type").alias("from_type"),
                            F.coalesce(F.col("nxt"), F.lit("end")).alias(
                                "to_type"
                            ),
                        ),
                    ),
                    F.when(
                        F.col("rn") == 1,
                        F.struct(
                            F.lit("start").alias("from_type"),
                            F.col("event_type").alias("to_type"),
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.from_type", "e.to_type")
    cnts = raw.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("c"))
    tot = Window.partitionBy("from_type")
    pq = cnts.select(
        "from_type",
        "to_type",
        fround(F.col("c") * 1.0 / F.sum("c").over(tot), 7)
        .cast("decimal(11,7)")
        .alias("p"),
    )

    # The transition relation is TYPE-VOCABULARY-bounded (≤ states²
    # rows — here ~25 — at ANY corpus size: the docstring's scale
    # argument), so the chain math is a bounded-driver computation,
    # the same class as the k≤16 kmeans codebooks.  Round 11: collect
    # pq ONCE (its decimals are exact DECIMAL(11,7) — the one
    # corpus-scale window pass stays fully in-engine above) and
    # advance all three variants driver-side in exact Decimal
    # arithmetic — multiplication/addition exact, per-step
    # quantize(1e-7, HALF_UP) = the engine's round(·, 7) on decimal =
    # the oracle's — so `conv` is bit-identical to the former 8
    # chained broadcast-join+groupBy steps, without their 8 tiny
    # shuffles, 2 lazy checkpoints and ~400-line plan (16 Exchanges →
    # 4; measured 3.6 s → ~1.2 s at sf0.1).  The readout below is
    # unchanged: `conv` re-enters as a 3-row relation and every
    # double in the output is still computed by the engine.
    from decimal import ROUND_HALF_UP, Decimal

    q7 = Decimal("1e-7")
    one = Decimal(1).quantize(q7)
    pq_rows = [
        (r["from_type"], r["to_type"], r["p"]) for r in pq.collect()
    ]
    var_names = ["full"] + [f"rm_{ch}" for ch in _MK_CHANNELS]
    tr: dict = {("full", f, t): p for f, t, p in pq_rows}
    for ch in _MK_CHANNELS:
        agg: dict = {}
        for f, t, p in pq_rows:
            if f == ch:
                continue
            t2 = "end" if t == ch else t
            agg[(f, t2)] = agg.get((f, t2), Decimal(0)) + p
        for (f, t2), s in agg.items():
            tr[(f"rm_{ch}", f, t2)] = s  # exact sum (scale stays 7)
    for vn in var_names:
        for s in ("purchase", "end"):
            tr[(vn, s, s)] = one
    vec = {(vn, "start"): one for vn in var_names}
    for _ in range(_MK_STEPS):
        nxt: dict = {}
        for (vn, f), p in vec.items():
            for (tvn, tf, tt), tp in tr.items():
                if tvn == vn and tf == f:
                    nxt[(vn, tt)] = nxt.get((vn, tt), Decimal(0)) + tp * p
        vec = {
            k: s.quantize(q7, ROUND_HALF_UP) for k, s in nxt.items()
        }
    # exactly the engine's groupBy semantics: a variant that never
    # reached 'purchase' has NO conv row (and drops from the inner
    # joins below), it does not get an invented zero
    spark = m.documents.sparkSession
    conv = spark.createDataFrame(
        [
            (vn, vec[(vn, "purchase")])
            for vn in var_names
            if (vn, "purchase") in vec
        ],
        "variant string, p decimal(11,7)",
    )
    chan = spark.createDataFrame(
        [(ch, f"rm_{ch}") for ch in _MK_CHANNELS], "channel string, variant string"
    )
    full = conv.where(F.col("variant") == "full").select(F.col("p").alias("p_full"))
    eff = (
        chan.crossJoin(F.broadcast(full))
        .join(
            conv.select(F.col("variant").alias("rv"), F.col("p").alias("p_removed")),
            F.col("variant") == F.col("rv"),
        )
        .select(
            "channel",
            "p_full",
            "p_removed",
            (F.col("p_full") - F.col("p_removed")).alias("re"),
        )
    )
    tot_re = eff.agg(F.sum("re").alias("sre"))
    return (
        eff.crossJoin(F.broadcast(tot_re))
        .select(
            "channel",
            fround(F.col("p_full").cast("double"), 6).alias("p_full"),
            fround(F.col("p_removed").cast("double"), 6).alias("p_removed"),
            fround(F.col("re").cast("double") / F.col("p_full").cast("double"), 6).alias(
                "removal_effect"
            ),
            fround(F.col("re").cast("double") / F.col("sre").cast("double"), 6).alias(
                "credit_share"
            ),
        )
    )
