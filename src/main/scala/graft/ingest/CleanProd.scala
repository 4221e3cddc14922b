package graft.ingest

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Cols

/** The reference's `clean_prod` standardization pipeline
  * (`assess_changes.qmd:279-325`), re-expressed as one declarative chain
  * of narrow transforms — fully pipelined, no shuffle, codegen'd; Catalyst
  * pushes the not-in filters and pruned columns into the scan.
  */
object CleanProd {

  /** Column keep-list (`assess_changes.qmd:281-284`) pre-rename. */
  val ColsKeep: Seq[String] = Seq(
    "country", "country_iso3_code", "prod_method", "species_name_en",
    "species_scientific_name", "species_major_group", "yearbook_group_en")

  /** FAO→standard renames (`assess_changes.qmd:289-293`). */
  val Renames: Seq[(String, String)] = Seq(
    "species_name_en" -> "CommonName",
    "species_scientific_name" -> "SciName",
    "country_iso3_code" -> "country_iso3_alpha",
    "country" -> "country_iso3_numeric")

  /** Excluded species major groups (`assess_changes.qmd:300-313`). */
  val ExcludedGroups: Seq[String] = Seq(
    "PLANTAE AQUATICAE", "MAMMALIA", "AMPHIBIA, REPTILIA",
    "Amphibia, reptilia", "Plantae aquaticae", "Mammalia",
    "amphibia, reptilia", "plantae aquaticae", "mammalia")

  /** Excluded yearbook group (`assess_changes.qmd:315`). */
  val ExcludedYearbook = "Other aq. animals & products"

  /** Full chain: project(any_of) → rename → lower → trim-all →
    * R-semantics not-in filters → strip synonym suffix.
    * R-null fidelity: `!x %in% set` keeps NA rows (Cols.notInRSemantics);
    * `yearbook != y` drops NA rows (plain `=!=`), both per SURVEY.md §2.2.
    */
  def clean(df: DataFrame): DataFrame = {
    val projected = Cols.selectAnyOf(df, ColsKeep)
    val renamed = Renames.foldLeft(projected) { case (d, (from, to)) =>
      if (d.columns.contains(from)) d.withColumnRenamed(from, to) else d
    }
    val lowered = renamed
      .withColumn("CommonName", Cols.lowerCast(col("CommonName")))
      .withColumn("SciName", Cols.lowerCast(col("SciName")))
    val trimmed = Cols.trimAll(lowered)
    trimmed
      .filter(Cols.notInRSemantics(col("species_major_group"), ExcludedGroups))
      .filter(col("yearbook_group_en") =!= lit(ExcludedYearbook))
      .withColumn("SciName", Cols.cleanSci(col("SciName")))
  }
}
