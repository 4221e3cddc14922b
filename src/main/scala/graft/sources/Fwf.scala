package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-width file reader (SURVEY.md §2.1 family; the legacy-feed
  * format FAO-era exports and mainframe extracts still arrive in —
  * the same standardize-on-ingest role as `src_csv`/`src_zip`).
  *
  * Spark-first shape: `spark.read.text` is a SPLITTABLE distributed
  * scan (unlike xlsx/zip one-task-per-file sources), and the column
  * carving is a narrow codegen'd projection of `substring` + `trim` +
  * `cast` — no custom partitioning, no UDF, no driver involvement at
  * any file count. Predicate pushdown on the parsed columns happens
  * after the projection, which is the best any fwf reader can do (the
  * format has no column statistics to prune on).
  *
  * NULL CONTRACT (r15, ADVICE-pinned r16): an all-blank field IS the
  * fixed-width encoding of NULL — the format has no other way to say
  * "missing". Consequence: an empty-but-non-null string value ('')
  * and a whitespace-only value are UNREPRESENTABLE in a round-trip;
  * they read back as NULL and merge into the NULL group downstream.
  * Writers must therefore coalesce(null → blanks) and must never rely
  * on '' being distinct from NULL (no shipped corpus carries '' in a
  * string field; a writer feeding one should pre-map it to a real
  * sentinel of its own choosing before encoding).
  */
object Fwf {

  /** One column: name, 1-based start position, width, and the Spark
    * SQL type to cast the trimmed slice to ("string", "int", "long",
    * "double", "date", …).
    */
  final case class Col(name: String, start: Int, width: Int,
                       dataType: String = "string") {
    require(start >= 1, s"fwf positions are 1-based (got $start for $name)")
    require(width >= 1, s"width must be >= 1 (got $width for $name)")
    require(dataType.matches("[A-Za-z0-9_(), ]+"),
      s"suspicious type string for $name: $dataType")
  }

  /** Read every text file under `path` as fixed-width rows. Blank
    * lines skip (trailing newline artifacts); short lines yield ""
    * slices which parse to null for non-string types — the usual
    * ragged-tail tolerance. Empty trimmed slices become NULL, not "",
    * for non-string columns (cast of '' is null already) and stay ""
    * for strings.
    */
  def read(spark: SparkSession, path: String, cols: Seq[Col]): DataFrame = {
    require(cols.nonEmpty, "at least one column spec required")
    val names = cols.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate column names: ${names.diff(names.distinct).mkString(",")}")
    // try_cast, not cast: under ANSI mode (the Spark 4 default) a
    // plain cast of '' or a mangled slice THROWS and kills the whole
    // scan — one bad line in a billion-row feed must yield one null,
    // not a dead job
    // r15 null contract: an all-blank field IS the fixed-width
    // encoding of NULL (the format has no other way to say missing) —
    // string fields read blank -> NULL, matching try_cast('') -> NULL
    // on the typed fields; writers render null fields as blanks
    val carved: Seq[Column] = cols.map { c =>
      if (c.dataType == "string")
        nullif(trim(substring(col("value"), c.start, c.width)), lit(""))
          .as(c.name)
      else expr(s"try_cast(trim(substring(value, ${c.start}, ${c.width}))" +
        s" AS ${c.dataType})").as(c.name)
    }
    spark.read.textFile(path).toDF("value")
      .filter(length(col("value")) > 0)
      .select(carved: _*)
  }
}
