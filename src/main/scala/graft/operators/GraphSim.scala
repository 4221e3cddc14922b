package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Neighbor-set Jaccard similarity between graph nodes — the classic
  * link-prediction / entity-resolution signal ("how much do two
  * suppliers' customer sets overlap?").
  *
  * For an undirected graph given as distinct `a < b` edge pairs,
  * emits every node pair sharing at least one neighbor with
  * `J = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|  >=  minJac`.
  *
  * Plan shape at scale (the same discipline as [[Triangles]]):
  * candidate pairs are generated ONLY through shared neighbors — a
  * wedge self-join of the mirrored adjacency list keyed on the shared
  * endpoint — never an all-pairs product. Common-neighbor counts are
  * exactly wedge counts (one groupBy), degrees one more groupBy, and
  * `|N(a) ∪ N(b)| = deg(a) + deg(b) − common` closes the formula with
  * pure integer arithmetic — the final division is the only float op,
  * so the score is bit-identical on any engine replaying the integer
  * counts. Per-hub wedge cost is deg(hub)² — bounded for the
  * dimension-keyed graphs this engine builds (co-purchase projections
  * cap lines per order); a pathological hub is the same skew the
  * triangle counter documents (salt or cap the hub's adjacency).
  */
object GraphSim {

  def neighborJaccard(edges: DataFrame, aCol: String, bCol: String,
                      minJac: Double): DataFrame = {
    val e = edges.select(col(aCol).as("a"), col(bCol).as("b")).distinct()
    // the mirrored adjacency feeds FOUR plan branches (both wedge
    // sides + both degree lookups) — stage it once or every branch
    // re-derives the full edge lineage (a 16-scan plan at gate, a
    // 16× re-read of the source at 100 TB)
    val adj = Stage.materialize(
      e.select(col("a").as("node"), col("b").as("nb"))
        .unionAll(e.select(col("b").as("node"), col("a").as("nb"))),
      "graphsim_adj")
    val deg = adj.groupBy("node").agg(count(lit(1)).as("deg"))
    val common = adj.as("x")
      .join(adj.as("y"),
        col("x.nb") === col("y.nb") && col("x.node") < col("y.node"))
      .groupBy(col("x.node").as("a"), col("y.node").as("b"))
      .agg(count(lit(1)).as("common"))
    val jac = col("common").cast("double") /
      (col("da") + col("db") - col("common")).cast("double")
    common
      .join(deg.withColumnRenamed("node", "a")
        .withColumnRenamed("deg", "da"), "a")
      .join(deg.withColumnRenamed("node", "b")
        .withColumnRenamed("deg", "db"), "b")
      .withColumn("jac", jac)
      .filter(col("jac") >= minJac)
      .select(col("a"), col("b"), col("common"), col("da"), col("db"),
        col("jac"))
  }
}
