package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc profiling main (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    import graft.ops._
    val docs = Tables.t(spark, sf, "documents")
    val shingled = time("withShingles count")(DedupOps.withShingles(docs)).cache()
    time("shingled materialize")(shingled.count())
    val sigs = DedupOps.minhashSignatures(shingled, 32).cache()
    time("sigs materialize")(sigs.count())
    val cands = DedupOps.minhashCandidates(sigs, 32, 8)
    time("candidates")(println("n_cands=" + cands.count()))
    val jac = DedupOps.jaccardForPairs(shingled, cands.cache())
    time("jaccard")(jac.count())
    spark.stop()
  }
}
