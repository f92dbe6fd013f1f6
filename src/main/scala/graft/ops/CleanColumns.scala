package graft.ops

import org.apache.spark.sql.DataFrame
import scala.collection.mutable

/** Column-name normalization — same observable semantics as the reference's
  * `clean_column_names` (`duckdb_util.py:29-61`): strip, newlines→`_`,
  * non-word/non-space→space, lowercase, whitespace-runs→`_`, trim `_`,
  * dedup with `_1, _2, …` suffixes. Queries run against the cleaned names.
  */
object CleanColumns {

  def cleanName(raw: String): String = {
    val stripped = raw.trim.replace("\n", "_").replace("\r", "_")
    val spaced   = stripped.replaceAll("(?U)[^\\w\\s]", " ").toLowerCase
    val unders   = spaced.replaceAll("(?U)\\s+", "_")
    unders.replaceAll("^_+", "").replaceAll("_+$", "")
  }

  /** Clean a full name list, suffixing duplicates `_1, _2, …` in first-seen
    * order (reference dedup loop `duckdb_util.py:50-56`). */
  def cleanColumnNames(names: Seq[String]): Seq[String] = {
    val seen = mutable.HashSet.empty[String]
    names.map { n =>
      val base  = cleanName(n)
      var fin   = base
      var sufix = 1
      while (seen.contains(fin)) { fin = s"${base}_$sufix"; sufix += 1 }
      seen += fin
      fin
    }
  }

  def apply(df: DataFrame): DataFrame =
    df.toDF(cleanColumnNames(df.columns.toSeq): _*)
}
