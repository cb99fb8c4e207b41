"""Custom stateful streaming operator: per-host politeness queue.

``applyInPandasWithState`` over a stream of discovered URLs keyed by host:
each micro-batch admits up to the host's available token budget in FIFO
(seq) order and DEFERS the rest in state, refilling tokens per batch — the
streaming form of the engine's per-host token bucket
(crawl/politeness.py; reference AUTOTHROTTLE/delay semantics,
settings/domain_spider.py:16-18).  Unlike the batch engine's
round-at-a-time cap, deferred URLs survive across micro-batches in the
state store, so a burst against one host drains at the politeness rate
while other hosts flow unimpeded.

Backlogs drain even when the host goes quiet: whenever rows are deferred,
the group arms a ``ProcessingTimeTimeout``; on a later trigger the group is
re-invoked with ``state.hasTimedOut`` (and an empty input iterator) and
flushes another budget's worth, re-arming until the queue is empty.  With
``NoTimeout`` a burst's tail would be stranded in the state store forever
once no new rows arrive for that host.

State per host: (tokens, pending urls, pending seqs) — bounded by the
per-host backlog, partitioned by the groupBy(host) shuffle, checkpointed by
Structured Streaming's state store (resumable, like everything else here).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url_canon", T.StringType()),
        T.StructField("seq", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("tokens", T.DoubleType()),
        T.StructField("pend_urls", T.ArrayType(T.StringType())),
        T.StructField("pend_seqs", T.ArrayType(T.LongType())),
    ]
)


def rate_limited_frontier(
    urls: DataFrame,
    capacity: float = 2.0,
    refill_per_batch: float = 2.0,
    flush_timeout_ms: int = 100,
) -> DataFrame:
    """Streaming per-host FIFO admission under a token bucket.

    ``urls`` is a streaming DataFrame with (host, url_canon, seq); returns
    the admitted stream.  Tokens start at ``capacity``; each admitted URL
    spends one; ``refill_per_batch`` tokens return per micro-batch (capped
    at capacity) — the discrete analog of rate = 1/crawl_delay.  While a
    host has a deferred backlog its group keeps a processing-time timeout
    armed (``flush_timeout_ms``) so the backlog drains on subsequent
    triggers even with no new rows for that host.
    """
    cap = float(capacity)
    refill = float(refill_per_batch)
    timeout_ms = int(flush_timeout_ms)

    def admit(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        (host,) = key
        if state.exists:
            tokens, pend_urls, pend_seqs = state.get
        else:
            tokens, pend_urls, pend_seqs = cap, (), ()
        # Timeout invocations deliver an EMPTY iterator — collect only
        # non-empty frames so pd.concat never sees an empty list.  The
        # r06 rewrite skips the intermediate pend DataFrame and the second
        # concat when a group has no backlog (the steady state): per-group
        # pandas construction is the operator's dominant cost at realistic
        # host cardinality (~100 rows/group).
        frames = [pdf[["url_canon", "seq"]] for pdf in pdfs if len(pdf)]
        if pend_urls:
            frames.insert(0, pd.DataFrame({"url_canon": list(pend_urls), "seq": list(pend_seqs)}))
        if not frames:
            queue = pd.DataFrame({"url_canon": [], "seq": []})
        elif len(frames) == 1:
            queue = frames[0]
        else:
            queue = pd.concat(frames, ignore_index=True)
        queue = queue.sort_values("seq")
        take = min(len(queue), int(tokens))
        if take == len(queue):
            admitted, rest = queue, queue.iloc[0:0]
        else:
            admitted, rest = queue.head(take), queue.iloc[take:]
        tokens = min(cap, tokens - take + refill)
        state.update((float(tokens), rest["url_canon"].tolist(), [int(s) for s in rest["seq"]]))
        if len(rest):
            # Re-arm: the next trigger re-invokes this group (hasTimedOut)
            # even if no new rows arrive, so the backlog always drains.
            state.setTimeoutDuration(timeout_ms)
        out = admitted.assign(host=host)[["host", "url_canon", "seq"]]
        out["seq"] = out["seq"].astype("int64")
        yield out

    return urls.groupBy("host").applyInPandasWithState(
        admit,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
