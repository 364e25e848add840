"""Stream-stream joins: the Structured Streaming capability batch
joins can't fake — correlating TWO live streams (clicks against
purchases, bids against asks, spans against traces) where neither side
is a static table and state must be bounded by WATERMARKS, not table
size.

The shape every production use reduces to:

- both sides declare event-time watermarks (how late data may arrive),
- the join condition is an equi-key PLUS an event-time RANGE, which is
  what lets the engine expire buffered rows: a click can only ever
  match purchases inside its window, so once the purchase watermark
  passes ``click_ts + window``, that click's state is droppable.

Without the range condition, stream-stream state grows forever — the
watermark + range pair IS the scale story (state ∝ key-rate × window,
never corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_purchase_attribution(
    purchases: DataFrame,
    clicks: DataFrame,
    out_dir: str,
    checkpoint: str,
    window_seconds: int = 3600,
    watermark: str = "2 hours",
    user_col: str = "user_id",
):
    """Streaming last-hour click attribution for purchases — the
    stream-stream INNER join with both-side watermarks: each purchase
    row joins every click by the same user in the preceding
    ``window_seconds``. Emits one row per (purchase, click) pair; the
    batch operator ``operators/joins.py::windowed_range_join`` is the
    replay/backfill twin, and the test pins streamed == batch on the
    same data.

    State bound: a click is held only until the purchase-side watermark
    passes ``click_ts + window``; a purchase only until the click-side
    watermark passes ``purchase_ts`` — both sides expire by event time,
    so state ∝ arrival-rate × window regardless of history length.
    """
    p = (
        purchases.withWatermark("ts", watermark)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col(user_col).alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
    )
    c = (
        clicks.withWatermark("click_ts", watermark)
        .select(
            F.col(user_col).alias("c_user"),
            "click_ts",
            "click_value",
        )
    )
    joined = p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr(
            f"INTERVAL {window_seconds} SECONDS"
        ))
        & (F.col("click_ts") < F.col("purchase_ts")),
        "inner",
    ).select(
        "purchase_id",
        F.col("p_user").alias(user_col),
        "purchase_ts",
        "click_ts",
        "click_value",
    )
    return (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
