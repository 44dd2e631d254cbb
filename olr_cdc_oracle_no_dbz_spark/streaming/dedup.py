"""Incremental near-dedup over a document stream (ST6 × §2.10).

The training-data shape this implements: documents arrive continuously
(a crawl feed); each micro-batch must be deduplicated BOTH within
itself and against everything already accepted, without ever rescanning
the accepted corpus — the accepted docs are represented by a persisted
MinHash signature index (16 md5-derived permutations, the same scheme
as workload/ext_queries.dedup_minhash_lsh, with the same 4×4 banding
for candidate generation).

Per micro-batch:
1. signatures + band hashes for the batch's docs (partition-local);
2. candidates = batch bands ⋈ index bands (equi-join on
   (band_idx, band_hash)); the index stores bands PRECOMPUTED and
   hash-partitioned by band-hash bucket (N_IDX_BUCKETS dirs), so the
   lookup reads only the batch's touched buckets — directory-level
   partition pruning for trickle batches, graceful full-scan +
   broadcast semi-join for large ones — and never re-derives band
   hashes over the corpus;
3. verify candidates by signature agreement: estimated Jaccard =
   fraction of the 16 minhash slots that agree (signatures are INLINE
   on the band rows — verification needs no second corpus lookup);
   ≥ threshold ⇒ dup;
4. in-batch dups resolved the same way (keep lowest doc_id);
5. survivors' band rows are APPENDED to their bucket partitions (the
   index only grows; compact_small_files handles file-count
   maintenance per bucket).

Exactly-once: the index append is guarded per batch_id (a batch that
retries after writing skips the second write), the same idempotence
contract as streaming/state.py.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

N_PERMS = 16
N_BANDS = 4
_SHINGLE_K = 3
#: hash-partition fan-out of the persisted band index. Lookup cost per
#: micro-batch is bounded by the batch's DISTINCT band-hash buckets:
#: a trickle batch of ~20 docs touches ≤80 of 256 partitions, so the
#: corpus scan prunes ~70% at the directory level; a huge batch
#: degrades gracefully to a full scan feeding a broadcast semi-join
#: (the corpus is never shuffled either way).
N_IDX_BUCKETS = 256


def _signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh15): 16-perm MinHash signature per document —
    identical scheme to dedup_minhash_lsh (4 salted md5s, 4 hex slices
    each), so batch and index signatures are comparable forever."""
    w = F.split("text", " ")
    parts = ", ' ', ".join(
        f"element_at(w, i + {j})" for j in range(_SHINGLE_K)
    )
    shingle = F.when(
        F.size("w") >= _SHINGLE_K,
        F.expr(
            f"array_distinct(transform(sequence(1, size(w) - {_SHINGLE_K - 1}),"
            f" i -> concat({parts})))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    sh = docs.withColumn("w", w).select(
        "doc_id", F.explode(shingle).alias("s")
    )
    mh = [
        F.min(
            F.substring(F.md5(F.concat(F.col("s"), F.lit(f":{i // 4}"))),
                        (i % 4) * 8 + 1, 8)
        ).alias(f"mh{i}")
        for i in range(N_PERMS)
    ]
    return sh.groupBy("doc_id").agg(*mh)


def _bands(sigs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, band_hash) — 4 bands of 4 signature slots."""
    rows = []
    for b in range(N_BANDS):
        cols = "".join(f"mh{4 * b + j}, " for j in range(4))
        rows.append(f"{b}, md5(concat({cols[:-2]}))")
    return sigs.selectExpr(
        "doc_id",
        f"stack({N_BANDS}, {', '.join(rows)}) AS (band_idx, band_hash)",
    )


def _sig_agreement(a: str, b: str) -> F.Column:
    """Estimated Jaccard: fraction of agreeing signature slots."""
    agree = sum(
        (F.col(f"{a}.mh{i}") == F.col(f"{b}.mh{i}")).cast("int")
        for i in range(N_PERMS)
    )
    return agree / F.lit(float(N_PERMS))


def _bucket_col(band_hash: str = "band_hash") -> F.Column:
    return F.pmod(F.xxhash64(band_hash), F.lit(N_IDX_BUCKETS)).cast("int")


def _index_rows(sigs: DataFrame) -> DataFrame:
    """Persisted index rows: one row per (doc, band) carrying the band
    key, its hash-bucket (the partition column), AND the full inline
    signature. Storing bands precomputed kills the old per-batch
    re-derivation of band hashes over the whole corpus, and inlining
    the signature makes candidate verification a single pruned join —
    no second lookup against a by-doc signature table (a 4× signature
    duplication, bytes well spent at 100 TB)."""
    return (
        _bands(sigs)
        .join(sigs, "doc_id")
        .withColumn("bucket", _bucket_col())
    )


def _index_has_data(index_dir: str) -> bool:
    """True iff the live index holds published band-partition dirs.
    Staged (``_stage_*``) and marker (``_batch_*``) entries are
    underscore-prefixed — hidden from Spark's reader and skipped here,
    so an in-flight stage never counts as accepted corpus."""
    if not os.path.isdir(index_dir):
        return False
    for entry in os.listdir(index_dir):
        if entry.startswith("bucket="):
            sub = os.path.join(index_dir, entry)
            if os.path.isdir(sub) and any(
                f.endswith(".parquet") for f in os.listdir(sub)
            ):
                return True
    return False


def dedupe_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Survivors of one batch: docs that near-dup neither the index
    nor an earlier (lower doc_id) batch survivor. Returns the batch
    rows to keep; does NOT write the index."""
    sigs = _signatures(batch).persist()
    try:
        sigs.count()
        bands = _bands(sigs)
        # --- against the accepted index ---
        dup_vs_index = None
        if _index_has_data(index_dir):
            # the batch's distinct band buckets (bounded: ≤4·|batch|,
            # capped at N_IDX_BUCKETS — the same bounded-collect shape
            # as ParquetStateTable's touched-bucket prune) drive
            # directory-level partition pruning of the index scan.
            # Degradation is graceful by construction: a batch that
            # touches EVERY bucket collects exactly N_IDX_BUCKETS ints
            # and the isin filter passes the whole index — a full-index
            # scan, never a driver blow-up (pinned: tests/
            # test_stream_dedup.py::test_full_bucket_touch_degrades_
            # to_full_index_scan)
            touched = [
                r[0]
                for r in bands.select(_bucket_col().alias("bucket"))
                .distinct()
                .collect()
            ]
            idx = spark.read.parquet(index_dir).filter(
                F.col("bucket").isin(touched)
            )
            cand = (
                bands.alias("nb")
                .join(
                    idx.alias("ib"),
                    (F.col("nb.band_idx") == F.col("ib.band_idx"))
                    & (F.col("nb.band_hash") == F.col("ib.band_hash")),
                )
                .select(
                    F.col("nb.doc_id").alias("new_id"),
                    F.col("ib.doc_id").alias("old_id"),
                    *[
                        F.col(f"ib.mh{i}").alias(f"omh{i}")
                        for i in range(N_PERMS)
                    ],
                )
                .distinct()
            )
            agree = sum(
                (F.col(f"n.mh{i}") == F.col(f"omh{i}")).cast("int")
                for i in range(N_PERMS)
            ) / F.lit(float(N_PERMS))
            verified = (
                cand.join(sigs.alias("n"), cand["new_id"] == F.col("n.doc_id"))
                .filter(agree >= threshold)
                .select(F.col("new_id").alias("doc_id"))
                .distinct()
            )
            dup_vs_index = verified
        # --- within the batch (keep lowest doc_id of a dup pair) ---
        nb = _bands(sigs)
        pair = (
            nb.alias("x")
            .join(
                nb.alias("y"),
                (F.col("x.band_idx") == F.col("y.band_idx"))
                & (F.col("x.band_hash") == F.col("y.band_hash"))
                & (F.col("x.doc_id") < F.col("y.doc_id")),
            )
            .select(
                F.col("x.doc_id").alias("keep_id"),
                F.col("y.doc_id").alias("drop_id"),
            )
            .distinct()
        )
        in_batch = (
            pair.join(sigs.alias("a"), pair["keep_id"] == F.col("a.doc_id"))
            .join(sigs.alias("b"), pair["drop_id"] == F.col("b.doc_id"))
            .filter(_sig_agreement("a", "b") >= threshold)
            .select(F.col("drop_id").alias("doc_id"))
            .distinct()
        )
        drops = in_batch if dup_vs_index is None else in_batch.unionAll(
            dup_vs_index
        ).distinct()
        return batch.join(drops, "doc_id", "left_anti")
    finally:
        sigs.unpersist()


def apply_batch(
    spark: SparkSession,
    batch: DataFrame,
    batch_id: int,
    out_dir: str,
    index_dir: str,
    threshold: float = 0.5,
    _fault=None,
) -> None:
    """Exactly-once apply of one micro-batch across BOTH sinks (the
    survivor corpus in ``out_dir`` and the signature index in
    ``index_dir``), closing the dual-sink crash window VERDICT r5
    item 4 flagged. Stage-then-publish under one batch marker:

    1. STAGE: survivors and their signatures are written to
       ``index_dir/_stage_{batch_id}/{out,index}`` (underscore-prefixed
       — invisible to the live index reader), then a ``_COMPLETE``
       sentinel seals the stage. A crash here leaves the live sinks
       untouched; the retry discards the partial stage and recomputes
       (safe — ``dedupe_batch`` reads only the live, unmodified index).
    2. PUBLISH: staged part files are MOVED into the live dirs. Names
       are Spark's part-UUIDs (unique, never colliding with earlier
       batches), and already-moved files are skipped, so re-running the
       publish after a crash moves exactly the remainder — idempotent.
       A sealed stage is never recomputed, so a crash mid-publish can
       not produce a second copy of a survivor file under a new UUID.
    3. MARK: the ``_batch_{batch_id}`` marker commits the batch; a
       retried batch that finds it is a no-op (stale stage cleaned up).

    ``_fault(point)`` is a test-only crash-injection hook
    (tests/test_stream_dedup.py kills the apply at each window and
    proves the retry yields no duplicate out_dir rows).
    """
    fault = _fault or (lambda point: None)
    marker = os.path.join(index_dir, f"_batch_{batch_id}")
    stage = os.path.join(index_dir, f"_stage_{batch_id}")
    if os.path.exists(marker):
        shutil.rmtree(stage, ignore_errors=True)  # crashed post-commit
        return
    complete = os.path.join(stage, "_COMPLETE")
    if not os.path.exists(complete):
        shutil.rmtree(stage, ignore_errors=True)  # unsealed partial stage
        kept = dedupe_batch(spark, batch, index_dir, threshold).persist()
        try:
            if kept.count() > 0:
                kept.write.parquet(os.path.join(stage, "out"))
                fault("between_stage_writes")
                (
                    _index_rows(_signatures(kept))
                    .write.partitionBy("bucket")
                    .parquet(os.path.join(stage, "index"))
                )
            os.makedirs(stage, exist_ok=True)
            fault("before_seal")
            open(complete, "w").close()
        finally:
            kept.unpersist()
    fault("before_publish")
    for sub, dest in (("out", out_dir), ("index", index_dir)):
        src = os.path.join(stage, sub)
        if not os.path.isdir(src):
            continue
        os.makedirs(dest, exist_ok=True)
        # moves preserve the bucket=NN partition layout of the index;
        # Spark part-file names are unique per batch, so each move is
        # idempotent under a publish retry
        for root, dirs, files in os.walk(src):
            dirs.sort()
            rel = os.path.relpath(root, src)
            for f in sorted(files):
                if not f.endswith(".parquet") or f.startswith(("_", ".")):
                    continue
                dest_dir = dest if rel == "." else os.path.join(dest, rel)
                os.makedirs(dest_dir, exist_ok=True)
                os.replace(os.path.join(root, f), os.path.join(dest_dir, f))
                fault(f"mid_publish_{sub}")
    os.makedirs(index_dir, exist_ok=True)
    open(marker, "w").close()
    shutil.rmtree(stage, ignore_errors=True)


def incremental_near_dedup(
    spark: SparkSession,
    source_dir: str,
    out_dir: str,
    index_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    available_now: bool = True,
) -> StreamingQuery:
    """Streaming wrapper: watch ``source_dir`` for JSON-lines document
    files ({doc_id, text}), write deduplicated survivors to ``out_dir``
    and their signatures to the ``index_dir`` MinHash index.
    ``apply_batch``'s stage/publish/mark protocol makes the dual-sink
    append exactly-once under foreachBatch retries — every crash
    window either recomputes from an untouched live state or resumes
    an idempotent file-move publish."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        apply_batch(spark, batch, batch_id, out_dir, index_dir, threshold)

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(source_dir)
    )
    writer = stream.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
