package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Table access + numeric-determinism helpers shared by every operator.
  *
  * The engine reads the same parquet layout the reference serves from blob
  * storage (one file per logical table — see reference `duckdb_util.py:340-344`
  * for the naming scheme; here a table is simply `<sfDir>/<name>.parquet`).
  */
object Tables {

  /** Read one logical table. Scans returned here (like any other scan of
    * the same directory) participate in plan-level file skipping once a
    * footer-stats index is registered for that directory via
    * [[graft.plans.StatsPruneRule.registerIndex]] — the optimizer rule
    * rewrites filtered scans to list only files whose min/max range can
    * match, fail-open, with no per-call opt-in here. */
  /** Schema cache: parquet schema inference costs one footer-read JOB per
    * `spark.read.parquet` call — a pure fixed tax on every query
    * CONSTRUCTION (benched: ~0.03-0.2 s each). Testdata and artifact
    * datasets are immutable within a JVM, so the first read's inferred
    * schema is reused; the key carries the dataset's mtime so a rewritten
    * path (fixture overwrite in tests) re-infers instead of serving a
    * stale layout. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String,
      org.apache.spark.sql.types.StructType]()

  def t(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else {
      val p = s"$sfDir/$name.parquet"
      val key = s"$p:${new java.io.File(p).lastModified}"
      val sch = schemaCache.computeIfAbsent(key,
        _ => spark.read.parquet(p).schema)
      spark.read.schema(sch).parquet(p)
    }

  /** Like [[t]], but with a KERNEL-PARALLELISM FLOOR for CPU-heavy per-row
    * work (shingling, tokenization, n-gram explodes): a small table is one
    * parquet file with one row group, so the scan arrives as ONE input
    * split — and every downstream map-side kernel serializes on a single
    * task no matter how many cores the executor has (profiled at sf0.1:
    * the 5k-document shingle pass ran 0.3-0.8 s single-threaded, twice per
    * dedup-pair build, on a 32-core box). When the split count is below
    * the default parallelism, one round-robin exchange of the (small by
    * construction — few splits ⇔ few bytes) table spreads the kernel
    * across the executor; the shuffle moves the table once and the kernel
    * gain repays it ~cores-fold. At scale the gate is the identity: a
    * 100 TB table scans as tens of thousands of splits, so `parts >=
    * target` and NO reshuffle is ever planned. Filters/pruning still reach
    * the scan — Catalyst pushes predicates and column pruning through
    * Repartition. */
  def tWide(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = t(spark, sfDir, name)
    // Gate on on-disk bytes, not split count: a small parquet file holds
    // ONE row group, and byte-range splitting cannot parallelize inside a
    // row group (extra splits would simply be empty) — so "small bytes" IS
    // "serial kernel". File/dir status is a local stat call; the plan-side
    // alternative (toRdd.getNumPartitions) costs a full physical planning
    // pass per query construction.
    val f = new java.io.File(s"$sfDir/$name.parquet")
    val parts =
      if (f.isDirectory) f.listFiles.count(_.getName.endsWith(".parquet"))
      else 1
    val bytes =
      if (f.isDirectory)
        f.listFiles.iterator.filter(_.getName.endsWith(".parquet")).map(_.length).sum
      else f.length
    val target = spark.sparkContext.defaultParallelism
    // Engage ONLY for a truly serial scan (one file, one row group): that
    // is the profiled failure mode. A multi-part dataset is already
    // kernel-parallel, and measured at 4 parts the residual widening gain
    // did not repay the exchanges it costs — column pruning specializes
    // each consumer's subtree, so the repartition materializes once PER
    // CONSUMER (bigram-LM family at x4: three ~10 MB text exchanges,
    // +1.1 s) while the serial-scan case it cures no longer exists.
    if (bytes > 0 && bytes < 64L * 1024 * 1024 && parts == 1 && target > 2)
      df.repartition(target)
    else df
  }

  /** The events table's `ts` column has shipped in two on-disk layouts:
    * int64 TIMESTAMP(NANOS) — which Spark's parquet reader rejects
    * (PARQUET_TYPE_ILLEGAL) unless read as raw longs — and plain
    * TIMESTAMP_MICROS. Branch on the type the reader actually produces:
    * a LongType means nanos (truncate to µs with exact integer division —
    * `div`, not `/`, because ns-since-epoch exceeds double's 2^53 exact
    * range); a timestamp reads directly, with NTZ normalized to the
    * session-zone TimestampType every downstream operator and oracle
    * comparison expects (sessions run UTC, so the instant is unchanged).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // same footer-read-per-construction tax as t(); cache under the same
    // (path, mtime) key (nanosAsLong is set before either branch, so the
    // inferred schema is stable across calls)
    val p = s"$sfDir/events.parquet"
    val key = s"$p:${new java.io.File(p).lastModified}"
    val sch = schemaCache.computeIfAbsent(key,
      _ => spark.read.parquet(p).schema)
    val raw = spark.read.schema(sch).parquet(p)
    val ts = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("timestamp_micros(ts div 1000)")
      case org.apache.spark.sql.types.TimestampNTZType => col("ts").cast("timestamp")
      case org.apache.spark.sql.types.TimestampType => col("ts")
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other (expected int64 nanos or timestamp)")
    }
    raw.withColumn("ts", ts)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  /** Order-independent sum over a double column: cast each value to an exact
    * DECIMAL first, sum exactly, return DOUBLE. Double summation is
    * reduction-order dependent (Spark merges partition partials in
    * nondeterministic order), which would make hash-comparison against a
    * single-threaded oracle flaky; decimal summation is associative and
    * exact, so both engines produce bit-identical results.
    */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic average built from the exact decimal sum. */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(c)

  /** Cosine similarity between two array<float> columns, computed in double
    * precision via codegen-friendly higher-order functions (no UDF).
    * Mirrors the reference's cosine space (`chroma_ingestion_util.py:278-282`,
    * score = 1 - distance at `chroma_retrieval_util.py:128-129` — here we
    * return the similarity directly).
    */
  def cosine(a: Column, b: Column): Column = {
    val ad  = transform(a, x => x.cast("double"))
    val bd  = transform(b, x => x.cast("double"))
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val na  = aggregate(ad, lit(0.0), (s, x) => s + x * x)
    val nb  = aggregate(bd, lit(0.0), (s, x) => s + x * x)
    dot / (sqrt(na) * sqrt(nb))
  }

  /** Codegen'd fused cosine — bit-identical results to `cosine` (same
    * sequential double accumulation), ~10× faster in the hot path. */
  def cosineFast(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }
}
