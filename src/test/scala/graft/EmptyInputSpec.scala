package graft

/** Edge-input robustness: EVERY registered query must degrade gracefully on
  * empty-but-schema-correct tables — zero rows out or a sane empty report,
  * never a throw. At 100 TB empty inputs are routine (a new collection on
  * day one, an events partition with no traffic, a filtered-out source),
  * and the operators that train artifacts (IVF/PQ), build Bloom filters,
  * or round-trip through schema inference are exactly the ones that break
  * first: a null max(vec_id) read, a null-buffer Bloom probe, an
  * unreadable empty-schema JSON dir. Each of those failure modes was
  * observed once and is now guarded; this spec sweeps the full registry so
  * no future operator regresses the property.
  */
class EmptyInputSpec extends SparkTestBase {

  test("every registered query runs against fully empty tables") {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    tables.foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, dir).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
        }
    }
    assert(failures.isEmpty,
      s"queries throw on empty inputs:\n${failures.mkString("\n")}")
  }
}
