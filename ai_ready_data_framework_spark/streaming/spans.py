"""Streaming exact-substring (ExactSubstr) scrubbing: micro-batches of
new documents probe a PERSISTED gram-postings index — "does any run of
>= min_run consecutive tokens in this incoming doc already exist in the
corpus?" — emit the matching spans, then fold their own grams into the
index. The always-on ingestion twin of q_dedup_spans /
q_decontam_spans (operators/ai.py), completing the third persisted
index's lifecycle alongside the band index (streaming/dedup.py) and
the IVF index (streaming/ivf.py).

Grounding: the reference's Factor 3 mandates stream-incremental
propagation (/root/reference/factors/3-current.md:13); the north star
makes dedup a first-class pipeline stage. Published pipelines run this
pass offline over suffix arrays (Lee et al. 2022, public paper); the
Spark-native index is the gram-hash posting set bucketed by hash, so
the corpus-sized probe side joins with NO exchange once compacted.
Per micro-batch the work is (batch grams) semi-join (index) — steady-
state cost follows ingest RATE, never corpus size.

Contract per epoch: spans are CROSS-corpus only — tokens of a new doc
covered by grams present in the index or in earlier epochs' deltas.
Two copies arriving in the SAME micro-batch do not flag each other
(compose ``duplicated_spans(batch, keep='first')`` on the batch for
that); they are corpus from the next epoch on.

Replay safety: the epoch-keyed OVERWRITE protocol shared with the
band/IVF twins — spans land in ``spans_out/epoch=N``, the batch's
grams in ``delta_dir/epoch=N``; the probe set for epoch N is the
bucketed base plus deltas from epochs < N only, so a failed attempt's
half delta never leaks into its own retry. Compaction folds deltas
into the base through the staged generation publish
(sources/maintenance.py::publish_bucketed_generation): the folded
epoch ids land in the table manifest atomically with the folded data,
so a crash between publish and delta cleanup cannot double rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_ready_data_framework_spark.functions.cache import stage_pin
from ai_ready_data_framework_spark.operators.ai import (
    SPAN_MIN_RUN,
    _merge_gram_intervals,
    gram_postings,
)
from ai_ready_data_framework_spark.sources.maintenance import (
    _delta_epochs_present,
    _fs_delete,
    _table_location,
    folded_epochs_of,
    publish_bucketed_generation,
    read_epoch_deltas as _delta_grams,
    read_epoch_deltas_pinned,
)
from ai_ready_data_framework_spark.streaming.dedup import DOCS_SCHEMA

GRAM_INDEX_BUCKETS = 32


def write_gram_index(
    grams: DataFrame,
    table_name: str,
    path: str,
    n_buckets: int = GRAM_INDEX_BUCKETS,
) -> None:
    """Materialize gram postings (operators/ai.py::gram_postings
    output: doc_id, pos, h) bucketed and sorted by hash — the probe
    semi-join's corpus side then reports HashPartitioning(h) and joins
    with no exchange and no sort. Repartition-before-bucketBy so each
    task writes exactly one bucket file (the band/IVF writer rule)."""
    (
        grams.repartition(n_buckets, "h")
        .write.mode("overwrite")
        .bucketBy(n_buckets, "h")
        .sortBy("h")
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )


# _delta_grams is the shared epoch-delta reader from
# sources/maintenance.py (r13 consolidation).


def probe_and_fold_spans(
    spark: SparkSession,
    batch_docs: DataFrame,
    index_table: str,
    delta_dir: str,
    spans_out: str,
    epoch_id: int,
    min_run: int = SPAN_MIN_RUN,
    scrubbed_out: str | None = None,
) -> None:
    """One micro-batch step: semi-join the batch's grams against
    (base index ∪ earlier deltas), merge the hits into maximal spans
    per new doc, overwrite this epoch's spans partition, then
    overwrite this epoch's gram delta so the NEXT epoch sees these
    docs as corpus. Both writes are epoch-keyed overwrites — replays
    are no-ops in effect.

    The probe EXCLUDES the batch's own doc_ids from the index side
    (ADVICE r10, the replay/compaction race): if this epoch's delta
    lands but the stream checkpoint does not commit, and a maintenance
    pass folds that delta into the base before restart, the replay's
    epoch filter removes the delta but the BASE now carries the
    batch's own grams — without the exclusion every doc would
    semi-join against itself and the replay would overwrite
    ``spans_out/epoch=N`` with full-doc self-match spans. The id set
    is batch-sized and broadcasts; provenance exclusion also makes
    re-ingesting an updated document safe (it never matches its own
    older grams)."""
    # two actions consume the batch's grams (the spans write probes
    # with them, the delta write lands them) — pin so the HOF shingle
    # build runs once per epoch, not once per action
    batch_grams = stage_pin(gram_postings(batch_docs, min_run=min_run))
    earlier = _delta_grams(
        spark,
        delta_dir,
        epoch_id,
        exclude_epochs=folded_epochs_of(spark, index_table),
    )
    spans = probe_spans(
        spark,
        batch_grams,
        index_table,
        earlier=earlier,
        min_run=min_run,
        exclude_ids=batch_docs.select("doc_id").distinct(),
    )
    if scrubbed_out is not None:
        # the WRITE side of the always-on scrub (r11): the spans feed
        # two consumers (the report write and the strip), so pin the
        # epoch-sized frame — the probe semi-join runs once per epoch
        spans = stage_pin(spans)
    spans.write.mode("overwrite").parquet(f"{spans_out}/epoch={epoch_id}")
    if scrubbed_out is not None:
        from ai_ready_data_framework_spark.operators.ai import (
            strip_duplicated_spans,
        )

        strip_duplicated_spans(batch_docs, spans).write.mode(
            "overwrite"
        ).parquet(f"{scrubbed_out}/epoch={epoch_id}")
    batch_grams.write.mode("overwrite").parquet(
        f"{delta_dir}/epoch={epoch_id}"
    )


def probe_spans(
    spark: SparkSession,
    batch_grams: DataFrame,
    index_table: str,
    earlier: DataFrame | None = None,
    min_run: int = SPAN_MIN_RUN,
    exclude_ids: DataFrame | None = None,
) -> DataFrame:
    """The probe plan itself (pure, so tests can pin its physical
    shape): batch grams LEFT SEMI join the hash-bucketed index (the
    corpus-sized side claims HashPartitioning(h) from its buckets and
    never reshuffles; only the rate-sized batch side moves), then the
    per-doc interval merge. ``exclude_ids`` (a doc_id frame) drops
    those documents' postings from BOTH index sides before the hash
    projection — a broadcast anti-join, so the bucketed side's
    partitioning survives (plan-pinned). Callers pass the batch's own
    ids: self-provenance must never count as corpus (ADVICE r10
    replay/compaction race; see probe_and_fold_spans)."""

    def _without_own(postings: DataFrame) -> DataFrame:
        if exclude_ids is None:
            return postings
        return postings.join(F.broadcast(exclude_ids), "doc_id", "left_anti")

    probe = _without_own(spark.table(index_table)).select("h")
    if earlier is not None:
        probe = probe.unionByName(_without_own(earlier).select("h"))
    hits = batch_grams.join(probe, "h", "left_semi")
    ints = hits.select(
        "doc_id",
        F.col("pos").alias("s"),
        (F.col("pos") + F.lit(min_run - 1)).alias("e"),
    )
    return _merge_gram_intervals(ints, "doc_id")


def compact_gram_index(
    spark: SparkSession, index_table: str, index_path: str, delta_dir: str
) -> None:
    """Fold all un-folded epoch deltas into the bucketed base and drop
    their delta partitions — probes of the folded data return to the
    exchange-free path. Crash-idempotent via the staged generation
    publish (folded epoch ids swap atomically with the folded data;
    readers skip manifest-listed partitions; re-runs converge)."""
    folded_prev = folded_epochs_of(spark, index_table)
    present = _delta_epochs_present(spark, delta_dir)
    to_fold = sorted(present - folded_prev)
    if to_fold:
        base = spark.read.parquet(_table_location(spark, index_table))
        # pinned to the listed epochs — a root-dir read would fold an
        # epoch landed after the listing without recording it as
        # folded: served doubled, then re-folded (code-review r13)
        deltas = read_epoch_deltas_pinned(spark, delta_dir, to_fold)
        merged = base if deltas is None else base.unionByName(deltas)
        publish_bucketed_generation(
            spark,
            merged,
            index_table,
            index_path,
            ("h",),
            GRAM_INDEX_BUCKETS,
            folded_epochs=sorted((folded_prev & present) | set(to_fold)),
        )
    for e in sorted(folded_prev | set(to_fold)):
        _fs_delete(spark, f"{delta_dir}/epoch={e}")


def run_span_scrub_stream(
    spark: SparkSession,
    stream_docs_dir: str,
    index_table: str,
    delta_dir: str,
    spans_out: str,
    checkpoint_dir: str,
    min_run: int = SPAN_MIN_RUN,
    max_files_per_trigger: int = 1,
    scrubbed_out: str | None = None,
    tombstone_dir: str | None = None,
) -> None:
    """Drive the ExactSubstr scrub over a file stream of document
    parquet drops — the gram-index twin of
    streaming/dedup.py::run_incremental_dedup_stream. availableNow +
    maxFilesPerTrigger=1 gives one micro-batch per dropped file:
    deterministic for tests, and the exact shape of a production
    landing-zone listener. Compaction is NOT in the loop — call
    ``maintain_gram_index`` on its own cadence.

    ``scrubbed_out`` (r11) completes the WRITE side: each epoch also
    lands the batch rewritten by ``strip_duplicated_spans`` — the
    document set with every already-in-corpus passage removed — under
    ``scrubbed_out/epoch=N``, the same replay-safe epoch-keyed
    overwrite as the span report. Training-shard builders consume the
    scrubbed partitions directly instead of re-deriving the strip.

    ``tombstone_dir`` (r12) is the landing-zone half of erasure: each
    micro-batch is broadcast-anti-joined against the takedown
    tombstone set BEFORE probing or landing, so a checkpoint-loss
    replay of a pre-forget epoch — or a fresh re-drop of the same
    file — can never re-land a forgotten document's grams, spans, or
    scrubbed text. forget_documents_gram writes the set when given
    the same dir."""
    from ai_ready_data_framework_spark.sources.maintenance import (
        apply_forget_tombstones,
        read_forget_tombstones,
    )

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_docs_dir)
    )

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = apply_forget_tombstones(
            batch_df, read_forget_tombstones(spark, tombstone_dir)
        )
        probe_and_fold_spans(
            spark,
            batch_df,
            index_table,
            delta_dir,
            spans_out,
            epoch_id,
            min_run=min_run,
            scrubbed_out=scrubbed_out,
        )

    (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def run_decontam_stream(
    spark: SparkSession,
    stream_docs_dir: str,
    benchmark_table: str,
    spans_out: str,
    checkpoint_dir: str,
    min_run: int = SPAN_MIN_RUN,
    max_files_per_trigger: int = 1,
    scrubbed_out: str | None = None,
    tombstone_dir: str | None = None,
) -> None:
    """Streaming exact-substring DECONTAMINATION — the stream-static
    sibling of ``run_span_scrub_stream``: each micro-batch of TRAINING
    documents probes a FIXED benchmark gram index (``write_gram_index``
    over the held-out/eval set) and lands the overlapping spans — and,
    with ``scrubbed_out``, the stripped rewrite — per epoch. There is
    deliberately NO fold step: the benchmark is static, training docs
    must never become probe corpus, and two training docs sharing text
    must NOT flag each other here (that is ``run_span_scrub_stream``'s
    job). Matches ``cross_duplicated_spans``' batch semantics epoch by
    epoch (parity-tested); the epoch-keyed overwrites make replays
    no-ops in effect. Per-epoch cost follows ingest rate; the
    benchmark index side probes exchange-free off its buckets."""
    from ai_ready_data_framework_spark.operators.ai import (
        strip_duplicated_spans,
    )
    from ai_ready_data_framework_spark.sources.maintenance import (
        apply_forget_tombstones,
        read_forget_tombstones,
    )

    stream = (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stream_docs_dir)
    )

    def step(batch_df: DataFrame, epoch_id: int) -> None:
        batch_df = apply_forget_tombstones(
            batch_df, read_forget_tombstones(spark, tombstone_dir)
        )
        grams = gram_postings(batch_df, min_run=min_run)
        spans = probe_spans(spark, grams, benchmark_table, min_run=min_run)
        if scrubbed_out is not None:
            spans = stage_pin(spans)
        spans.write.mode("overwrite").parquet(f"{spans_out}/epoch={epoch_id}")
        if scrubbed_out is not None:
            strip_duplicated_spans(batch_df, spans).write.mode(
                "overwrite"
            ).parquet(f"{scrubbed_out}/epoch={epoch_id}")

    (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def maintain_gram_index(
    spark: SparkSession,
    index_table: str,
    index_path: str,
    delta_dir: str,
    compact_after: int = 4,
) -> dict:
    """One scheduled maintenance pass — the compact-after-N planner as
    a single idempotent callable, completing the three-index symmetry
    (streaming/ivf.py::maintain_ivf_index,
    streaming/dedup.py::maintain_band_index). No refit branch: gram
    postings are a pure function of text, nothing fitted can drift."""
    folded = folded_epochs_of(spark, index_table)
    pending = sorted(_delta_epochs_present(spark, delta_dir) - folded)
    if len(pending) >= compact_after:
        compact_gram_index(spark, index_table, index_path, delta_dir)
        return {"action": "compact", "folded_epochs": pending}
    return {"action": "none", "pending_epochs": pending}


def forget_documents_gram(
    spark: SparkSession,
    doc_ids: DataFrame,
    index_table: str,
    index_path: str,
    delta_dir: str,
    tombstone_dir: str | None = None,
) -> dict:
    """Takedown for the gram index: fold pending deltas first (so the
    forgotten docs' postings cannot survive in an un-folded epoch),
    then republish the base without them
    (sources/maintenance.py::forget_keys — crash-safe, audited,
    idempotent). Run after the scrub stream's checkpoint has committed
    past the epochs that carried these docs. ``tombstone_dir`` (r12)
    closes the landing-zone half: the keys are appended to the
    tombstone set FIRST (before any index work, so even a crash
    mid-forget leaves the zone protected), and a scrub stream given
    the same dir drops them from every future micro-batch — including
    checkpoint-loss replays of pre-forget epochs."""
    from ai_ready_data_framework_spark.sources.maintenance import (
        forget_keys,
        write_forget_tombstones,
    )

    if tombstone_dir is not None:
        write_forget_tombstones(spark, doc_ids, tombstone_dir)
    compact_gram_index(spark, index_table, index_path, delta_dir)
    return forget_keys(
        spark,
        doc_ids,
        index_table,
        index_path,
        ("h",),
        GRAM_INDEX_BUCKETS,
        key_col="doc_id",
    )
