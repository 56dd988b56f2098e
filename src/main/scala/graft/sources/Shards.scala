package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Write-side shard management — the output half of a 100 TB training-data
  * pipeline. Two failure modes dominate at scale: unbounded shard sizes
  * (one skewed partition writes a 50 GB file no reader can split on row
  * groups it can't skip) and the small-files problem (a 10k-task job
  * writes 10k tiny files whose metadata overwhelms the namenode/driver).
  *
  * `writeSized` bounds the first without an extra pass over the data:
  * `maxRecordsPerFile` makes every task roll to a new file at the cap, so
  * shard size is bounded by schema width × cap regardless of partition
  * skew. `compact` fixes the second after the fact: it sizes the rewrite
  * from the ACTUAL on-disk bytes (file-status metadata only — no data scan
  * before the single rewrite shuffle).
  */
object Shards {

  /** Write `df` as size-bounded parquet shards. No count pass: the cap is
    * enforced per-task by the writer itself. `partitionCols` adds hive-style
    * directory partitioning (the layout that gives readers partition
    * pruning); `sortCols` sorts WITHIN each task's output (row-group
    * locality / better column compression) without a global sort. */
  def writeSized(df: DataFrame, path: String, maxRecordsPerFile: Long,
      partitionCols: Seq[String] = Nil, sortCols: Seq[String] = Nil): Unit = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    val sorted =
      if (sortCols.nonEmpty) df.sortWithinPartitions(sortCols.map(col): _*)
      else df
    val w = sorted.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }

  /** Compact a fragmented parquet directory into ~`targetBytes` files.
    * The output partition count comes from the actual input byte size
    * (one `listStatus` per input DIRECTORY — never a per-file RPC, which
    * on an object store with 50k small files would stall the driver for
    * minutes before the rewrite starts; no data read), so the rewrite is
    * ONE round-robin shuffle into right-sized shards. Returns the
    * partition count used.
    *
    * `partitionCols` must name the input's hive partition columns (if
    * any): the rewrite re-applies `partitionBy` so compaction preserves
    * the pruning layout `writeSized` created — omitting it on partitioned
    * input would silently flatten the directory tree and cost every
    * downstream reader its partition pruning.
    *
    * Compression ratios mean output files land near targetBytes ×
    * (parquet-recompression factor ≈ 1); callers tune targetBytes to
    * their reader's preferred split size (e.g. 128 MB). */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long, partitionCols: Seq[String] = Nil): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val df = spark.read.parquet(inPath)
    val conf = spark.sparkContext.hadoopConfiguration
    val dirs = df.inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).getParent)
      .distinct
    val totalBytes = dirs.flatMap { dir =>
      dir.getFileSystem(conf).listStatus(dir)
        .filter(_.isFile).map(_.getLen)
    }.sum
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    val w = df.repartition(n).write.mode("overwrite")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(outPath)
    n
  }
}
