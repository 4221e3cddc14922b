package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core column-expression helpers re-expressing the reference's scalar
  * semantics (see SURVEY.md §2.2/§2.7) as pure Catalyst expressions —
  * zero UDFs, so every helper stays inside whole-stage codegen and is
  * eligible for pushdown/pruning at 100 TB scale.
  *
  * Reference citations are into /root/reference (read-only).
  */
object Cols {

  /** Filename standardization key chain — `assess_changes.qmd:87-94`:
    * strip `^filtered_` prefix, strip `_V\d{6,7}[a-z]*` version suffix,
    * strip the trailing extension, map non-alphanumerics to `_`, lowercase.
    * Composable on any string column; deterministic, codegen'd.
    */
  def stdKey(c: Column): Column =
    lower(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(c, "^filtered_", ""),
            "_V\\d{6,7}[a-z]*", ""),
          "\\.[a-zA-Z0-9]+$", ""),
        "[^a-zA-Z0-9]", "_"))

  /** Strip parenthetical synonym suffix from scientific names —
    * `assess_changes.qmd:318-321`: `gsub(" \\(\\=.*", "", SciName)`.
    */
  def cleanSci(c: Column): Column =
    regexp_replace(c, " \\(=.*", "")

  /** `tolower(as.character(x))` — `assess_changes.qmd:294-295`. */
  def lowerCast(c: Column): Column = lower(c.cast("string"))

  /** R-faithful `!x %in% set`: R keeps NA rows (NA %in% s is FALSE, so
    * !FALSE = TRUE); Spark's `!isin` yields null which a filter drops.
    * See SURVEY.md §2.2 `filt_notin`. SQL form: `c IS NULL OR c NOT IN (…)`.
    */
  def notInRSemantics(c: Column, values: Seq[Any]): Column =
    c.isNull || !c.isin(values: _*)

  /** `basename(path)` — `scrape_newest_baci_data.R:58`. */
  def basename(c: Column): Column =
    element_at(split(c, "/"), -1)

  /** Byte→MB scaling used for size deltas — `assess_changes.qmd:107-113`. */
  def sizeMb(bytes: Column): Column = bytes / 1e6

  /** URL absolutization — `scrape_newest_baci_data.R:38`:
    * `ifelse(grepl("^http", u), u, paste0(prefix, u))`.
    */
  def absolutize(url: Column, prefix: String): Column =
    when(url.rlike("^http"), url).otherwise(concat(lit(prefix), url))

  /** Truncate a timestamp column to millisecond precision. The driver test
    * data carries nanosecond timestamps which Spark reads at microsecond
    * precision while DuckDB keeps nanoseconds — any cross-engine comparison
    * or emission of raw timestamps must go through this (or coarser).
    */
  def toMillis(ts: Column): Column = date_trunc("MILLISECOND", ts)

  /** `mutate_all(str_trim)` — `assess_changes.qmd:297`: trim every column,
    * schema-generically (non-string columns are cast to string first, which
    * is what R's str_trim does via as.character coercion).
    */
  def trimAll(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => trim(col(c).cast("string")).as(c)): _*)

  /** Order-free exact money sum: sum 2-decimal values as integer CENTS
    * (long) and take ONE final IEEE division. A plain `sum(double)` is
    * reassociated freely by parallel aggregation, so its last-ulp value
    * depends on partition count and thread scheduling — DuckDB's
    * parallel sum is even nondeterministic RUN-TO-RUN — and past ~10⁶
    * summands per cell the drift crosses the round(2) boundary and the
    * cross-engine gate hash diverges (the 30× sweep caught q1_agg /
    * filt_conj / agg_cube exactly this way; join_overlap hit it at 10×
    * in round 10). Long addition is associative: any plan, any engine,
    * any scale produces the identical bit pattern. The SQL twin is
    * `sum(CAST(floor(x * 100 + 0.5) AS BIGINT)) / 100.0` — but in SPARK SQL
    * text write `100.0D`: a bare `100.0` literal is DECIMAL there, the
    * division result becomes DECIMAL(p,6), and once the scaled int128
    * mantissa passes 2^53 a reader's decimal→double cast is no longer
    * nearest-even (the 30× agg_cube hash diverged exactly there).
    * DuckDB's own integer-/-decimal division returns DOUBLE, so the
    * oracle text is fine as written.
    *
    * PRECONDITION: inputs are money-like, i.e. exactly representable
    * at 2 decimals. For such inputs the per-value snap is the
    * identity and this equals the exact sum. For a source with
    * SUB-CENT precision (events.value is the one such source in the
    * registry) the per-value snap is a real quantization, so the
    * query's defined result is "the sum of values snapped to cents" —
    * NOT round(sum(x), 2). Any call site feeding sub-cent data must
    * state that choice (join_overlap does) or pre-snap explicitly;
    * the SQL oracle twin must always carry the identical per-value
    * snap so both engines quantize the same multiset.
    */
  def sumCents(c: Column): Column = sum(cents(c)) / 100.0

  /** Portable cent snap: `floor(x·100 + 0.5)` — round-half-UP (toward
    * +inf) computed entirely in IEEE doubles, so it is bit-identical
    * in Spark, DuckDB (any version), and plain JVM math
    * (EventStreams.toCents is the scalar mirror). Engine-native
    * `round()` is a FAULT LINE here: Spark rounds the shortest decimal
    * string via BigDecimal HALF_UP while DuckDB rounds the binary
    * double in libm, and DuckDB's tie convention has CHANGED across
    * releases — a sub-cent input landing exactly on a half-cent (e.g.
    * 0.125·100 = 12.5, exact in binary) quantizes differently per
    * engine/version. r15's win_moving_avg driver-gate hash regression
    * was exactly this (green under local duckdb 1.0.0, red under the
    * driver's build). floor() has no tie case and no version history.
    * For money-like exact-2-decimal inputs (|x·100 − k| ≤ ~1e-10, k
    * integer, including NEGATIVE acctbals) floor-snap equals round()
    * exactly; they differ only on true sub-cent halves, where the
    * defined semantics is now half-up on BOTH engines. The SQL twin is
    * `CAST(floor(x * 100 + 0.5) AS BIGINT)`.
    */
  def cents(c: Column): Column = floor(c * 100 + lit(0.5)).cast("long")

  /** Projection tolerant of absent columns — `select(any_of(cols))`,
    * `assess_changes.qmd:281-287`.
    */
  def selectAnyOf(df: DataFrame, cols: Seq[String]): DataFrame = {
    val present = df.columns.toSet
    df.select(cols.filter(present.contains).map(col): _*)
  }
}
