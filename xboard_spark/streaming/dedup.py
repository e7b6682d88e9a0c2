"""Incremental near-duplicate detection over a GROWING corpus — the
streaming form of ``operators.dedup``: each micro-batch of new documents is
checked against the accumulated band-bucket index, duplicate pairs are
emitted, and the index grows by the batch.

State design (the part that matters at scale): the index is NOT the raw
corpus — it is (a) the band-bucket table (doc_id, band, bh) and (b) the
shingle index (doc_id, shfp), both compact integer tables partitioned by
their hash keys. A new batch touches only the buckets its own band hashes
land in; per-batch cost is proportional to batch size + collisions, never
corpus size. The same foreachBatch runs unchanged under Structured
Streaming (file/Kafka source) — exercised here through its batch core so
the semantics are testable deterministically.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from xboard_spark.operators.dedup import (
    N_BANDS,
    N_PERMS,
    filtered_index,
    minhash_signatures,
    shingle_index,
)
from xboard_spark.functions.portable_hash import fingerprint64


class IncrementalDedupIndex:
    """Parquet-backed LSH index with an ``add_batch`` incremental step.

    At warehouse scale both tables live partitioned by hash key and the
    appends are partition appends; here they are plain parquet dirs.
    """

    def __init__(self, spark: SparkSession, path: str, tau: float = 0.5,
                 max_df: int = 100):
        self.spark = spark
        self.path = path
        self.tau = tau
        self.max_df = max_df
        self._live: list[DataFrame] = []  # persisted frames of the last batch

    def _read(self, name: str) -> DataFrame | None:
        """Read the index SNAPSHOTTED to the concrete part files present now.

        Reading the directory would make the plan re-list files on any
        recompute — and this class appends to that directory mid-batch, so a
        cascade-unpersist recompute would see its own batch in the "old"
        index and anti-join the batch's documents away. Explicit file paths
        pin the input set; recompute is deterministic no matter when it runs.
        """
        p = os.path.join(self.path, name)
        if os.path.exists(p):
            files = sorted(
                os.path.join(p, f)
                for f in os.listdir(p)
                if f.endswith(".parquet")
            )
            if files:
                return self.spark.read.parquet(*files)
        return None

    def _append(self, df: DataFrame, name: str) -> None:
        df.write.mode("append").parquet(os.path.join(self.path, name))

    def _bands(self, sigs: DataFrame) -> DataFrame:
        rows_per_band = N_PERMS // N_BANDS
        band_cols = []
        for bi in range(N_BANDS):
            parts = [
                F.col(f"sig_{bi * rows_per_band + r}").cast("string")
                for r in range(rows_per_band)
            ]
            band_cols.append(
                F.struct(
                    F.lit(bi).alias("band"),
                    fingerprint64(F.concat_ws(",", *parts)).alias("bh"),
                )
            )
        return sigs.select(
            "doc_id", F.explode(F.array(*band_cols)).alias("b")
        ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

    def add_batch(self, documents: DataFrame) -> DataFrame:
        """Index a batch; return duplicate pairs (new doc vs any indexed doc
        OR another doc of this batch) with exact filtered-set Jaccard.

        The df-cap is applied batch-locally (a true global cap would need
        re-reading global dfs — the standard approximation for streaming
        dedup; exact dfs arrive with periodic compaction).

        Exactly-once on doc identity: documents whose doc_id is already in
        the index are dropped up front (anti join), so a replayed batch —
        checkpoint loss, at-least-once source — is a no-op instead of
        double-counting its shingles in every future Jaccard."""
        # Release the previous batch's persisted frames now (NOT at the end
        # of this call): Spark cascade-unpersists dependent cached plans, so
        # unpersisting inv_new before the caller consumes `pairs` would
        # silently drop the pairs cache too.
        for df in self._live:
            df.unpersist()
        self._live = []
        inv_old = self._read("inv")
        if inv_old is not None:
            documents = documents.join(
                inv_old.select("doc_id").distinct(), "doc_id", "left_anti"
            )
        inv_new = filtered_index(shingle_index(documents), self.max_df).persist()
        sigs_new = minhash_signatures(inv_new)
        bands_new = self._bands(sigs_new).persist()

        bands_old = self._read("bands")
        all_bands = (
            bands_new if bands_old is None else bands_old.unionByName(bands_new)
        )
        all_inv = inv_new if inv_old is None else inv_old.unionByName(inv_new)

        # candidates: new docs colliding with ANY doc in (old + new)
        left = bands_new.select("band", "bh", F.col("doc_id").alias("doc_b"))
        right = all_bands.select("band", "bh", F.col("doc_id").alias("doc_a"))
        candidates = (
            right.join(left, ["band", "bh"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        # exact verify on the combined shingle index
        sizes = all_inv.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
        a = candidates.join(
            all_inv.select(F.col("doc_id").alias("doc_a"), "shfp"), "doc_a"
        )
        shared = (
            a.join(
                all_inv.select(F.col("doc_id").alias("doc_b"), "shfp"),
                ["doc_b", "shfp"],
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("shared"))
        )
        pairs = (
            shared.join(
                sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")),
                "doc_a",
            )
            .join(
                sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")),
                "doc_b",
            )
            .withColumn(
                "jaccard",
                F.round(
                    F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                    6,
                ),
            )
            .filter(F.col("jaccard") >= self.tau)
            .select(
                F.col("doc_a").cast("long").alias("doc_a"),
                F.col("doc_b").cast("long").alias("doc_b"),
                F.col("jaccard").cast("double").alias("jaccard"),
            )
            .persist()
        )
        # Materialize pairs (count barrier, no row transfer to the driver)
        # BEFORE growing the index, so an idempotent re-run of a failed batch
        # re-derives the same pairs before re-appending. The sink then writes
        # straight from this persisted plan — pair rows never visit the
        # driver, which is what keeps a hot (many-collision) batch from
        # OOM-ing the coordinator at scale.
        pairs.count()
        self._append(bands_new, "bands")
        self._append(inv_new, "inv")
        self._live = [bands_new, inv_new, pairs]
        return pairs


def start_dedup_stream(
    spark: SparkSession,
    source_dir: str,
    index_path: str,
    pairs_out: str,
    tau: float = 0.5,
):
    """Structured Streaming wrapper: each micro-batch of document JSON runs
    through the incremental index; emitted pairs append to ``pairs_out``."""
    index = IncrementalDedupIndex(spark, index_path, tau)
    schema = "doc_id long, text string, lang string, source string"

    def process(batch: DataFrame, batch_id: int) -> None:
        pairs = index.add_batch(batch)  # persisted, already materialized
        if not pairs.isEmpty():
            pairs.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(pairs_out)

    return (
        spark.readStream.schema(schema)
        .json(source_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", index_path + "_ckpt")
        .trigger(availableNow=True)
        .start()
    )
