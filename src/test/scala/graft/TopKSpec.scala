package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{LabeledScore, ScoredRow, TopKByScore}

/** The bounded-heap TopKByScore aggregator must be row-identical to the
  * window row_number formulation, including tie handling. */
class TopKSpec extends SparkTestBase {

  test("heap aggregator equals window rank on random data with ties") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val rows = (1 to 5000).map(i =>
      LabeledScore(rnd.nextInt(20), i.toLong, (rnd.nextInt(50) / 10.0)))
    val ds = rows.toDS()

    val viaHeap = ds.groupByKey(_.label)
      .agg(new TopKByScore(5).toColumn.name("hits"))
      .toDF("label", "hits")
      .select(col("label"), explode(col("hits")).as("h"))
      .select(col("label"), col("h.id"), col("h.score"))
      .orderBy("label", "id").collect().toSeq

    val w = Window.partitionBy("label").orderBy(col("score").desc, col("id").asc)
    val viaWindow = ds.toDF()
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("label"), col("id"), col("score"))
      .orderBy("label", "id").collect().toSeq

    assert(viaHeap == viaWindow)
    assert(viaHeap.nonEmpty)
  }

  test("partial buffers stay bounded at k under merge") {
    val agg = new TopKByScore(3)
    val big = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, LabeledScore(0, i.toLong, i.toDouble)))
    assert(big.size == 3)
    assert(big.map(_.id) == List(100L, 99L, 98L))
    val merged = agg.merge(big,
      List(ScoredRow(200, 1000.0), ScoredRow(201, 0.5)))
    assert(merged.size == 3)
    assert(merged.head == ScoredRow(200, 1000.0))
  }
}
