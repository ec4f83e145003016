"""Custom stateful streaming operator (S4): cluster-membership change
detection via ``applyInPandasWithState``.

The reference polls live servers every 90 s and spawns work for servers
it has not seen before (compactor/CompactorManager.java:147-164, set
diff against the known map).  The Spark-idiomatic form is a stateful
stream keyed by server: per-server state holds (last_seen, snapshots
seen); a key with no prior state is a new member → emit an IN event.

State is per-key and O(1); keys partition by server, so at any cluster
size the state store scales with #servers, not with traffic.  The same
pattern extends to OUT detection with a GroupStateTimeout — omitted
here because the reference itself only reacts to additions.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..catalog import Model
from ..registry import query

OUTPUT_SCHEMA = "server string, first_ts bigint, event string"
STATE_SCHEMA = "last_ts bigint, seen bigint"


def _detect_new_members(key, pdfs, state: GroupState):
    """Emit an IN event the first time a server key is observed; fold
    every batch's observations into (last_seen, observation count)."""
    (server,) = key
    last_ts, seen = (state.get if state.exists else (None, 0))
    first_batch_ts = None
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        mn = int(pdf["obs_ts"].min())
        mx = int(pdf["obs_ts"].max())
        first_batch_ts = mn if first_batch_ts is None else min(first_batch_ts, mn)
        last_ts = mx if last_ts is None else max(last_ts, mx)
        seen += len(pdf)
    is_new = not state.exists
    state.update((last_ts, seen))
    if is_new and first_batch_ts is not None:
        yield pd.DataFrame(
            {"server": [server], "first_ts": [first_batch_ts], "event": ["IN"]}
        )


def membership_changes(observations: DataFrame) -> DataFrame:
    """S4 — stateful IN-event stream from (server, obs_ts) observations.

    ``observations`` is a *streaming* DataFrame with columns
    ``server: string, obs_ts: bigint`` (epoch seconds)."""
    return observations.groupBy("server").applyInPandasWithState(
        _detect_new_members,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@query(
    "stream_membership_in",
    oracle="""
SELECT concat('s', CAST(user_id % 10 AS VARCHAR)) AS server,
       CAST(floor(epoch(min(ts))) AS BIGINT) AS first_ts,
       'IN' AS event
FROM events
GROUP BY 1
""",
    views=[],
)
def stream_membership_in(m: Model) -> DataFrame:
    """S4 — first-appearance (IN) events per server derived from the
    event stream, computed by the stateful operator run to completion.
    With one AvailableNow batch, first-seen == min observation time, so
    the result is oracle-checkable."""
    from .jobs import events_stream, run_to_table

    ev = events_stream(m.spark, m.sf_dir)
    obs = ev.select(
        F.concat(F.lit("s"), (F.col("user_id") % 10).cast("string")).alias("server"),
        F.unix_timestamp("ts").alias("obs_ts"),
    )
    return run_to_table(
        membership_changes(obs), "stream_membership_in", "append"
    )
