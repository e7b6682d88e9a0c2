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
    shares. Returns a plain dict that survives a JSON round-trip — bucket
    keys are STRINGS because json.dumps stringifies int keys, and a
    reloaded reference with drifted key types would silently zero every
    PSI (in production this dict is persisted next to the checkpoint).

    Degenerate references are rejected loudly: with no non-null values
    there is nothing to freeze, and with vmin == vmax (a constant metric)
    every later value clamps into the single occupied bucket, so PSI is
    structurally 0 no matter how far the stream moves — a monitor that
    can never fire must refuse to arm, not report calm."""
    ev = df.filter(F.col(value_col).isNotNull())
    vmin, vmax = ev.agg(
        F.min(value_col), F.max(value_col)
    ).first()
    if vmin is None:
        raise ValueError(
            f"reference_histogram: no non-null {value_col!r} values in the "
            "reference window"
        )
    if vmax == vmin:
        raise ValueError(
            f"reference_histogram: degenerate reference ({value_col!r} is "
            f"constant at {vmin!r}) — a zero-width histogram cannot detect "
            "drift; widen the reference window"
        )
    counts = (
        ev.select(_bucket_col(value_col, vmin, vmax, n_buckets).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in counts)
    shares = {str(int(r["b"])): r["count"] / total for r in counts}
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


def _bucket_counts(batch: DataFrame, ref: dict, value_col: str) -> list:
    """One aggregate over the batch: per-bucket non-null value counts
    against the frozen reference edges (<= n_buckets rows to the driver)."""
    return (
        batch.filter(F.col(value_col).isNotNull())
        .select(
            _bucket_col(value_col, ref["vmin"], ref["vmax"], ref["n_buckets"])
            .alias("b")
        )
        .groupBy("b")
        .count()
        .collect()
    )


def _psi_from_counts(counts: list, ref: dict) -> tuple[float, int]:
    """Driver-side PSI fold over the bucket counts -> (psi, n_values).
    Reference shares are keyed by STRING (the JSON-round-trip form); int
    keys from a same-process dict are accepted too."""
    total = sum(r["count"] for r in counts)
    if total == 0:
        return 0.0, 0
    shares = ref["shares"]
    psi = 0.0
    for r in counts:
        q = r["count"] / total
        b = int(r["b"])
        p = shares.get(str(b), shares.get(b, 0.0))
        if p > 0 and q > 0:
            psi += (p - q) * math.log(p / q)
    # buckets present in the reference but EMPTY in the batch also skip
    # (q = 0) — symmetric with value_drift_psi
    return round(psi, 6), total


def batch_psi(batch: DataFrame, ref: dict, value_col: str = "value") -> float:
    """PSI of one batch against the frozen reference. Out-of-range values
    clamp into the edge buckets (a drifting stream escapes the reference's
    range — that mass must count as shift, not vanish). Buckets empty on
    either side are skipped (same convention as value_drift_psi)."""
    psi, _n = _psi_from_counts(_bucket_counts(batch, ref, value_col), ref)
    return psi


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
        # ONE aggregate per batch: the bucket counts yield both the PSI
        # and n_values (a separate count() would scan the uncached
        # micro-batch a second time for a number the fold already has)
        psi, n = _psi_from_counts(
            _bucket_counts(batch, ref, value_col), ref
        )
        drift_log.append({"batch_id": batch_id, "n_values": n, "psi": psi})

    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
