package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** PACKED TRAINING SHARDS — the last mile of the training-data pipeline:
  * the actual fixed-width binary token files a trainer mmaps, written in
  * the q158 shuffle-manifest order (reference correspondence: the
  * pipeline's file-writer side effect, participants/implementations.kt:
  * 334-341, upgraded to the training-shard contract; container/checksum
  * discipline follows pipeline/BinaryDocs.scala).
  *
  * Layout (deliberately trivial so any trainer and any engine can replay
  * it): each shard is a flat stream of BIG-ENDIAN uint32 token ids —
  * fixed width, mmap-able, offset = 4·index. Per document, in shard
  * order: the ids of its whitespace tokens (id = portableHash60(word)
  * mod 1,000,003 — the portable-md5 discipline, so the DuckDB oracle
  * replays every id), then ONE separator id 1,000,003 (one beyond the
  * vocab range, the <|endoftext|> convention). Big-endian because the
  * read-back parse is columnar `conv(hex(substring(...)))` — the same
  * idiom as the GRFT container.
  *
  * Document order within a shard is EXACTLY q158's permutation
  * ([[TrainingPrep.shuffleHash]]: h = md5(seed‖':'‖doc_id), shard =
  * h mod nShards, position = rank of (h, doc_id) within the shard), so
  * the shard files ARE the manifest's materialization — resume
  * mid-epoch, re-materialize one lost shard, audit batch k.
  *
  * Scale posture: one exchange (repartition by shard) + an in-partition
  * sort, then each shard streams to its file through a
  * foreachPartition writer — no driver collect, no global sort. At
  * 100 TB the shard COUNT scales (fixed target shard size, ~1-4 GiB
  * each), never the per-file size; the read-back census below assumes
  * a whole shard fits an executor (true by that sizing rule).
  */
object TokenShards {

  /** Vocab modulus — token ids are 0 .. Vocab-1. */
  val Vocab = 1000003L
  /** Document separator id (== Vocab, one beyond the id range). */
  val Sep = 1000003L
  /** Order-sensitive checksum modulus (Σ position·id mod this). */
  val ChecksumMod = 1000000007L

  /** Whitespace-token ids + trailing separator, portable across engines. */
  def tokenIds(text: Column): Column =
    concat(
      transform(split(text, " "),
        w => pmod(TextFunctions.portableHash60(w), lit(Vocab))),
      array(lit(Sep)))

  /** Write `nShards` fixed-width shard files under `outDir`
    * (shard-0000.bin …) in the q158 permutation order. Idempotent only
    * at the file level (rewrites in place); callers wanting
    * build-once semantics use a marker (see PrepQueries.ensureShards). */
  /** The pre-write deal: tokenize → permutation hash → ONE exchange
    * (repartition by shard) → in-partition sort. Exposed for the plan
    * audit (a second exchange or a global sort here is exactly the
    * 100 TB regression the shard writer must never grow). */
  private[graft] def dealtFrame(docs: DataFrame, idCol: String,
      textCol: String, nShards: Int, seed: String): DataFrame =
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        tokenIds(col(textCol)).as("tids"),
        TrainingPrep.shuffleHash(col(idCol), seed).as("h"))
      .withColumn("shard", pmod(col("h"), lit(nShards.toLong)).cast("int"))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("h"), col("doc_id"))
      .select(col("shard"), col("tids"))

  def writeShards(docs: DataFrame, idCol: String, textCol: String,
      outDir: String, nShards: Int = 16, seed: String = "epoch1"): Unit = {
    new java.io.File(outDir).mkdirs()
    val dealt = dealtFrame(docs, idCol, textCol, nShards, seed)
    dealt.foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
      // TASK-COMMIT protocol: write to an attempt-unique dot-temp and
      // rename into place only after the whole partition streamed —
      // without it, a speculative or zombie attempt racing its retry
      // would interleave truncating writes into the same shard file
      // while the job (and the build-once marker) still reported
      // success. The atomic move makes the LAST completed attempt win
      // with a complete file; abandoned temps are dot-files the
      // `shard-*.bin` read glob never matches.
      val attempt = Option(org.apache.spark.TaskContext.get())
        .map(_.taskAttemptId()).getOrElse(0L)
      var shard = -1
      var out: java.io.DataOutputStream = null
      val pending = scala.collection.mutable.ListBuffer.empty[(java.io.File, java.io.File)]
      def close(): Unit = if (out != null) { out.close(); out = null }
      try {
        rows.foreach { r =>
          val s = r.getInt(0)
          if (s != shard) { // partitions are shard-sorted: each opens once
            close()
            shard = s
            val dst = new java.io.File(outDir, f"shard-$s%04d.bin")
            val tmp = new java.io.File(outDir, f".shard-$s%04d.bin.attempt-$attempt")
            pending += ((tmp, dst))
            out = new java.io.DataOutputStream(new java.io.BufferedOutputStream(
              new java.io.FileOutputStream(tmp)))
          }
          r.getSeq[Long](1).foreach(t => out.writeInt(t.toInt)) // big-endian
        }
        close()
        pending.foreach { case (tmp, dst) =>
          java.nio.file.Files.move(tmp.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      } finally close()
    }
  }

  /** READ-BACK census over the written shard FILES (not the tables): per
    * shard, token count, document count (separators), and the
    * order-sensitive checksum Σ (1-based global position · id) mod
    * [[ChecksumMod]] — any transposition, drop, or bit-flip anywhere in
    * the binary stream changes it. The oracle recomputes the same census
    * from the DOCUMENTS table + the q158 permutation, so the comparison
    * IS the proof the files encode exactly the manifest order. */
  def shardCensus(spark: SparkSession, outDir: String): DataFrame =
    spark.read.format("binaryFile").load(s"$outDir/shard-*.bin")
      .select(
        regexp_extract(col("path"), "shard-(\\d+)\\.bin", 1)
          .cast("long").as("shard"),
        expr("transform(sequence(1, cast(length(content) / 4 as int)), " +
          "i -> cast(conv(hex(substring(content, (i - 1) * 4 + 1, 4)), 16, 10) as bigint))")
          .as("tids"))
      .select(col("shard"),
        size(col("tids")).cast("long").as("n_tokens"),
        expr(s"cast(size(filter(tids, t -> t = ${Sep}L)) as long)").as("n_docs"),
        expr(s"aggregate(tids, named_struct('i', 0L, 's', 0L), " +
          s"(acc, t) -> named_struct('i', acc.i + 1L, " +
          s"'s', pmod(acc.s + pmod((acc.i + 1L) * t, ${ChecksumMod}L), ${ChecksumMod}L)), " +
          "acc -> acc.s)").as("checksum"))
      .orderBy(col("shard"))
}
