"""Pipeline observability via Spark's Observation API: named metrics
computed DURING a query's own action — no second scan, no extra job — the
way a production pipeline records row counts, null rates, and value
bounds for every batch it writes (the lake-side analog of the reference's
per-request logging middleware).

At 100 TB this is the only affordable shape for per-run data-quality
metrics: a separate validation query would double the scan cost, while
observed metrics ride the partial aggregates of the action that already
ran.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, name: str, *metrics: Column):
    """Attach an Observation computing ``metrics`` alongside ``df``'s next
    action. Returns (observed_df, observation); read
    ``observation.get`` AFTER an action has run."""
    obs = Observation(name)
    return df.observe(obs, *metrics), obs
