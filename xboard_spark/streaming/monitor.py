"""Streaming drift monitoring: per-micro-batch PSI against a frozen
reference histogram — the stream twin of ``operators.profiling.
value_drift_psi`` (same bucket algebra, same PSI convention), wired as a
``foreachBatch`` observer so a production stream gets a drift number per
batch without a second pass over the data.

Scale shape: the reference is a FROZEN k-bucket histogram (k rows,
broadcast-trivial, computed once from a trusted window); each batch pays
one bucket-count aggregate (k rows back to the driver — the only
driver-side data, bounded by k forever). The PSI fold over <= k bucket
shares happens driver-side on purpose: it is O(k) arithmetic, and keeping
it in Python makes the per-batch log entry (a plain dict) cheap to append
to any ops sink."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reference_histogram(
    df: DataFrame, value_col: str = "value", n_buckets: int = 10
) -> dict:
    """Freeze a reference histogram from a trusted window: fixed-width
    bucket edges from the reference's exact min/max plus per-bucket
    shares. Returns a plain dict (JSON-serializable — in production this
    is persisted next to the checkpoint)."""
    ev = df.filter(F.col(value_col).isNotNull())
    vmin, vmax = ev.agg(
        F.min(value_col), F.max(value_col)
    ).first()
    counts = (
        ev.select(_bucket_col(value_col, vmin, vmax, n_buckets).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in counts)
    shares = {int(r["b"]): r["count"] / total for r in counts}
    return {
        "vmin": float(vmin),
        "vmax": float(vmax),
        "n_buckets": n_buckets,
        "shares": shares,
    }


def _bucket_col(value_col: str, vmin: float, vmax: float, n_buckets: int):
    if vmax == vmin:
        return F.lit(0)
    width = (vmax - vmin) / float(n_buckets)
    return F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(vmin)) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    )


def batch_psi(batch: DataFrame, ref: dict, value_col: str = "value") -> float:
    """PSI of one batch against the frozen reference. Out-of-range values
    clamp into the edge buckets (a drifting stream escapes the reference's
    range — that mass must count as shift, not vanish). Buckets empty on
    either side are skipped (same convention as value_drift_psi)."""
    ev = batch.filter(F.col(value_col).isNotNull())
    counts = (
        ev.select(
            _bucket_col(value_col, ref["vmin"], ref["vmax"], ref["n_buckets"])
            .alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in counts)
    if total == 0:
        return 0.0
    psi = 0.0
    for r in counts:
        q = r["count"] / total
        p = ref["shares"].get(int(r["b"]), 0.0)
        if p > 0 and q > 0:
            psi += (p - q) * math.log(p / q)
    # buckets present in the reference but EMPTY in the batch also skip
    # (q = 0) — symmetric with value_drift_psi
    return round(psi, 6)


def start_drift_monitor(
    stream: DataFrame,
    ref: dict,
    checkpoint_path: str,
    drift_log: list,
    value_col: str = "value",
    trigger_available_now: bool = True,
):
    """foreachBatch drift observer: appends one
    ``{batch_id, n_values, psi}`` entry per micro-batch to ``drift_log``
    (in production: an ops table / metrics sink). Pure observer — the
    batch data itself is not written anywhere by this query."""

    def process(batch: DataFrame, batch_id: int) -> None:
        n = batch.filter(F.col(value_col).isNotNull()).count()
        drift_log.append(
            {
                "batch_id": batch_id,
                "n_values": n,
                "psi": batch_psi(batch, ref, value_col),
            }
        )

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
