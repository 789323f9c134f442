"""LLM-training-data workflow CLI — run_all.py's twin for the extension
surface.

Chains the corpus pipeline end-to-end over the documents table, with
run_all.py's stage discipline (each stage materialized, verified
non-empty via _SUCCESS + count, and lineage-tracked):

  1. curate   — exact dedup → MinHash-LSH near-dup removal → quality
                gate → language policy (operators.curation)
  2. semantic — SemDeDup embedding-level near-dup gate over the
                survivors (operators.similarity.semantic_dedup):
                cluster-then-within-cell cosine, keep-the-minimum; the
                embeddings table's vec_id is the corpus doc_id
  3. scrub    — cross-document verbatim-span removal over the
                SURVIVORS (operators.dedup.span_scrub): doc-level dedup
                first, embedding-level second, then substring-level;
                all later stages consume the scrubbed text
  4. fingerprint — winnowing fingerprints of the scrubbed docs
                (operators.fingerprint) — the downstream copy-detection
                index a serving system keeps
  5. split    — deterministic train/val/test assignment
                (operators.curation.train_split), written partitioned
                by split so consumers prune
  6. chunk    — overlapping token-window chunks of the TRAIN split only
                (operators.text.chunk_documents) — the tensor-feed stage
  7. pack     — concat-and-chop sequence packing of the train split
                (operators.packing.sequence_packing)
  8. shard    — balanced export shards + order-independent integrity
                checksums (operators.packing.shard_manifest)
  9. tokenize — BPE merge table learned on the train split
                (operators.tokenizer.bpe_merges)

    python run_curation.py [--sf-dir DIR] [--work-dir DIR] [--job-id ID]

Scale notes: every stage is one of the registered oracle-checked
operators — the CLI adds orchestration, not new semantics; stage
boundaries are parquet materializations exactly like the reference's
job1→job2 handoff, so any stage can restart from the previous
artifact.
"""

from __future__ import annotations

import argparse
import datetime as dt
import os
import sys
import uuid

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _stage(n: int, msg: str) -> None:
    print(f"\n=== Stage {n}: {msg} ===", flush=True)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--work-dir", default="/tmp/demo_etl_spark_curation")
    ap.add_argument("--job-id", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from demo_etl_spark import io
    from demo_etl_spark.context import RunContext
    from demo_etl_spark.lineage import LineageTracker
    from demo_etl_spark.operators import (
        curation,
        dedup,
        fingerprint,
        packing,
        similarity,
        text,
        tokenizer,
    )
    from demo_etl_spark.session import get_spark

    job_id = args.job_id or str(uuid.uuid4())
    ctx = RunContext(job_id=job_id, job_timestamp=dt.datetime.now())
    work = args.work_dir.rstrip("/")
    spark = get_spark(f"curation-{job_id[:8]}")
    spark.sparkContext.setLogLevel("ERROR")
    tracker = LineageTracker(ctx)
    src = args.sf_dir
    print(f"workflow id: {job_id}\ncorpus:      {src}\nwork dir:    {work}")

    def checked_write(df, name: str) -> tuple[str, int]:
        path = f"{work}/{name}"
        df.write.mode("overwrite").parquet(path)
        n = io.verify_output(spark, path)
        print(f"  {name}: {n} rows at {path}")
        return path, n

    # ---- Stage 1: curation --------------------------------------------
    _stage(1, "curate corpus (dedup -> near-dup -> quality -> language)")
    docs = io.read_star_table(spark, src, "documents")
    n_raw = docs.count()
    curated = curation.curate_corpus(
        docs, ctx, minhash_index=dedup._cached_index(
            spark, src, dedup.MAX_SHINGLE_DF)
    )
    curated_path, n_curated = checked_write(curated, "curated")
    tracker.log("corpus curation", [f"{src}/documents.parquet"],
                   curated_path, n_curated)
    print(f"  kept {n_curated}/{n_raw} docs")

    # ---- Stage 2: embedding-level semantic dedup gate ------------------
    _stage(2, "SemDeDup embedding near-dup gate over the survivors")
    # Restrict the gate to the stage-1 SURVIVORS before clustering: running
    # it over the full corpus would let an already-removed near-dup act as
    # a cluster representative and drop every surviving copy of that
    # content (keep-the-minimum must pick the smallest SURVIVING vec_id).
    # vec_id IS the corpus doc_id (TESTDATA contract).
    survivor_ids = (
        spark.read.parquet(curated_path)
        .select(F.col("doc_id").alias("vec_id"))
    )
    emb = similarity.valid_embeddings(
        io.read_star_table(spark, src, "embeddings")
    ).join(survivor_ids, "vec_id")  # survivor set scales with the corpus — no broadcast hint, AQE decides
    verdicts = similarity.semantic_dedup(emb, ctx)
    sem_path, n_sem = checked_write(verdicts, "semantic_verdicts")
    tracker.log("semantic dedup verdicts",
                [f"{src}/embeddings.parquet"], sem_path, n_sem)
    # vec_id IS the corpus doc_id (TESTDATA contract); docs without an
    # embedding row pass the gate — the gate only DROPS known near-dups
    sem_drop = (
        spark.read.parquet(sem_path)
        .filter(~F.col("is_kept"))
        .select(F.col("vec_id").alias("doc_id"))
    )
    n_sem_drop = sem_drop.count()
    print(f"  semantic near-dup drops: {n_sem_drop}")

    # ---- Stage 3: verbatim-span scrub of the survivors ----------------
    _stage(3, "cross-document verbatim-span scrub of survivors")
    kept = docs.join(
        spark.read.parquet(curated_path).select("doc_id"), "doc_id"
    ).join(sem_drop, "doc_id", "left_anti")
    scrubbed = dedup.span_scrub(kept, ctx=ctx)
    scrub_path, n_scrub = checked_write(scrubbed, "scrubbed")
    tracker.log("verbatim span scrub", [curated_path, sem_path],
                scrub_path, n_scrub)
    # downstream consumes the scrubbed text; a doc whose every token was
    # repeated elsewhere drops out entirely
    kept = (
        spark.read.parquet(scrub_path)
        .filter(F.col("n_kept") > 0)
        .select("doc_id", F.col("scrubbed_text").alias("text"))
        .join(kept.select("doc_id", "lang", "source"), "doc_id")
        .withColumn("n_chars", F.length("text"))
    )

    # ---- Stage 4: fingerprints ----------------------------------------
    _stage(4, "winnowing fingerprints of scrubbed survivors")
    fps = fingerprint.winnow_fingerprints(kept, ctx)
    fp_path, n_fps = checked_write(fps, "fingerprints")
    tracker.log("winnowing fingerprints", [scrub_path], fp_path, n_fps)

    # ---- Stage 5: train/val/test split --------------------------------
    _stage(5, "deterministic train/val/test split (partitioned)")
    split = curation.train_split(kept, ctx)
    split_path = f"{work}/splits"
    split.write.mode("overwrite").partitionBy("split").parquet(split_path)
    n_split = io.verify_output(spark, split_path)
    print(f"  splits: {n_split} rows at {split_path}")
    tracker.log("train split", [scrub_path], split_path, n_split)

    # ---- Stage 6: chunk the train split -------------------------------
    _stage(6, "token-window chunks of the train split")
    train_ids = spark.read.parquet(split_path).filter(
        F.col("split") == "train").select("doc_id")
    chunks = text.chunk_documents(kept.join(train_ids, "doc_id"), ctx)
    chunk_path, n_chunks = checked_write(chunks, "train_chunks")
    tracker.log("train chunking", [split_path], chunk_path, n_chunks)

    # ---- Stage 7: pack the train split into training sequences --------
    _stage(7, "concat-and-chop sequence packing of the train split")
    train_docs = kept.join(train_ids, "doc_id")
    packed = packing.sequence_packing(train_docs, ctx)
    pack_path, n_seqs = checked_write(packed, "train_sequences")
    tracker.log("sequence packing", [split_path], pack_path, n_seqs)

    # ---- Stage 8: balanced export-shard manifest ----------------------
    _stage(8, "snake-dealt export shards + integrity manifest")
    manifest = packing.shard_manifest(train_docs, ctx)
    man_path, n_shards = checked_write(manifest, "shard_manifest")
    tracker.log("shard manifest", [split_path], man_path, n_shards)

    # ---- Stage 9: tokenizer merge table over the train split ----------
    _stage(9, "BPE merge training on the train split")
    merges = tokenizer.bpe_merges(train_docs, ctx)
    tok_path, n_merges = checked_write(merges, "bpe_merges")
    tracker.log("bpe merge training", [split_path], tok_path, n_merges)

    dot = tracker.write_dot(f"{work}/curation_lineage_{job_id}.dot")
    print(f"\nlineage events ({len(tracker.events)}):")
    for ev in tracker.events:
        print(f"  LINEAGE: {ev.description}: "
              f"{', '.join(ev.inputs)} -> {ev.output}")
    print(f"DOT graph: {dot}")
    print(f"\nworkflow {job_id} complete: curated={n_curated} "
          f"semantic_drops={n_sem_drop} scrub_survivors={n_scrub} "
          f"fingerprints={n_fps} chunks={n_chunks} "
          f"sequences={n_seqs} shards={n_shards} merges={n_merges}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
