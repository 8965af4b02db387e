# -*- coding: utf-8 -*-
"""Custom stateful streaming operator (SURVEY.md §2.10 extension):
first-seen dedup over a keyed stream via ``applyInPandasWithState``.

Training-pipeline use: a crawl stream re-delivers urls across micro-batches
(recrawls, retries, mirror copies). Exact dedup needs per-key state that
OUTLIVES a micro-batch. Spark's native streaming ``dropDuplicates`` covers
the plain case (key-only state, JVM-side — geocode_stream composes it for
exactly that reason) but offers no processing-time expiry and no hook for
richer per-key state; this operator keeps one boolean per key, emits only
the first arrival, and expires state with a processing-time timeout so a
100 TB key space doesn't accumulate forever — the template for any custom
stateful op (session windows, per-key counters, change detection).

The same call works per-group on a batch frame through ``first_seen_batch``
(window + row_number), which is how the test cross-checks stream == batch.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def first_seen_batch(df: DataFrame, key: str = "url", order: str = "warc_ts") -> DataFrame:
    """Batch twin: earliest row per key (ties -> arbitrary but stable via
    the order column only, matching the stream's arrival-order semantics
    when the input files are ordered)."""
    w = Window.partitionBy(key).orderBy(F.col(order).asc())
    return df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn")


def first_seen_stream(
    stream: DataFrame,
    key: str = "url",
    state_ttl_ms: int | None = 24 * 3600 * 1000,
) -> DataFrame:
    """Stateful first-seen filter on a streaming DataFrame.

    One state cell (seen=True) per key; rows of already-seen keys are
    dropped, the first row per key is emitted verbatim. State expires after
    ``state_ttl_ms`` of processing-time inactivity — bounded state at
    planet-scale key cardinality (after expiry a re-arrival is treated as
    new, the standard TTL trade-off).

    ``state_ttl_ms=None`` disables expiry (GroupStateTimeout.NoTimeout).
    Required for availableNow catch-up runs: with processing-time
    timeouts armed, Structured Streaming keeps scheduling empty
    micro-batches to fire future expirations, so a drain-and-stop trigger
    never terminates; a bounded backfill wants whole-run dedup anyway.
    """
    out_schema: StructType = stream.schema
    state_schema = "seen boolean"
    with_ttl = state_ttl_ms is not None

    def dedup_fn(
        key_tuple: Any, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if with_ttl and state.hasTimedOut:
            state.remove()
            return
        seen = state.exists
        emitted = False
        for pdf in pdfs:
            if not seen and not emitted and len(pdf):
                yield pdf.iloc[:1]
                emitted = True
        if not seen:
            state.update((True,))
        if with_ttl:
            state.setTimeoutDuration(state_ttl_ms)

    return stream.groupBy(key).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if with_ttl
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_first_seen_over_dir(
    spark,
    input_dir: str,
    schema,
    checkpoint_dir: str,
    key: str = "url",
    query_name: str = "first_seen",
):
    """File-source stream -> stateful first-seen dedup -> in-memory sink
    (append mode; the operator emits each key exactly once across ALL
    micro-batches — the resume/checkpoint behavior the S7 story needs).

    NB: with state timeouts configured, Spark keeps scheduling cleanup
    micro-batches, so ``processAllAvailable()`` never returns — poll the
    sink for the expected row count instead (see the test)."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(input_dir)
    )
    deduped = first_seen_stream(stream, key=key)
    return (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
