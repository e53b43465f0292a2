"""Per-host ingest byte quota — custom stateful streaming operator.

A crawl pipeline budgets bytes per host/domain: once a host's cumulative
payload reaches its quota, further pages are dropped at ingest (politeness
/ anti-boilerplate budget; the per-host analogue of ``cap_per_group``'s
row caps). Implemented with ``applyInPandasWithState`` — the custom-
stateful-operator API — with ONE long counter per host as state, so state
size is bounded by the number of hosts, not the stream length.

Admission rule (both modes): a row is admitted iff the cumulative bytes
of all rows of its host SEEN BEFORE it (in ``order_col`` order) are below
the quota — i.e. each host contributes an order-prefix of its rows.
Counting seen (not admitted) bytes makes the rule prefix-monotone and
batch/stream agree exactly whenever per-host arrival order matches
``order_col`` (an in-order source); late stragglers in a stream are
dropped against an already-exhausted counter, which is the conservative
crawl-budget behavior.

Batch mode is a running-sum window over the same ordering. A mega-host
serializes through one reducer in batch mode — inherent to a sequential
per-host budget; the stream form processes incrementally and holds only
the counter.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType


def quota_filter(
    df: DataFrame,
    quota_bytes: int,
    group_col: str = "lang",
    size_col: str = "text",
    order_col: str = "warc_ts",
) -> DataFrame:
    """Keep each ``group_col``'s rows until ``quota_bytes`` of ``size_col``
    bytes have been seen. Output schema equals input schema.

    Streaming frames go through ``applyInPandasWithState`` (state: one
    cumulative-bytes counter per group, no timeout — a crawl budget never
    expires); batch frames use the equivalent running-sum window.
    """
    # octet_length, not length: the quota is a BYTE budget and length()
    # counts characters — multi-byte UTF-8 text would under-count against
    # the crawl byte budget (admitting more bytes than the quota)
    sized = df.withColumn("_sz", F.octet_length(F.col(size_col)).cast("long"))
    if not df.isStreaming:
        from pyspark.sql.window import Window

        w = (
            Window.partitionBy(group_col)
            .orderBy(F.col(order_col))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return (
            sized.withColumn("_used", F.coalesce(F.sum("_sz").over(w), F.lit(0)))
            .where(F.col("_used") < quota_bytes)
            .drop("_sz", "_used")
        )

    out_schema: StructType = sized.schema
    cols = [f.name for f in out_schema.fields]

    def admit(key, pdfs, state) -> "pd.DataFrame":
        used = state.get[0] if state.exists else 0
        # Concatenate the group's chunks BEFORE sorting: a group's
        # micro-batch may span several pandas chunks, and per-chunk sorting
        # would admit out of global order_col order within the batch,
        # breaking the documented batch/stream equality on in-order
        # sources. State is already per-group and the whole batch must fit
        # the executor anyway, so one concat costs nothing extra.
        parts = [pdf for pdf in pdfs if len(pdf)]
        if parts:
            pdf = parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)
            pdf = pdf.sort_values(order_col, kind="stable")
            sizes = pdf["_sz"].to_numpy()
            before = used + sizes.cumsum() - sizes  # bytes seen BEFORE each row
            used += int(sizes.sum())
            kept = pdf[before < quota_bytes]
            if len(kept):
                yield kept[cols]
        state.update((used,))

    return (
        sized.groupBy(group_col)
        .applyInPandasWithState(
            admit,
            outputStructType=out_schema,
            stateStructType="used long",
            outputMode="append",
            timeoutConf="NoTimeout",
        )
        .drop("_sz")
    )
