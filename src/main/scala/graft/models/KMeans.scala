package graft.models

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deterministic fixed-iteration Lloyd k-means — the codebook trainer
  * behind the ANN tier (s03 IVF cells, s05 PQ subspaces, s06/IVF-PQ
  * coarse + residual codebooks, `runner.AnnIndexPipeline`). Replaces the
  * earlier lowest-vec_id codebook stand-in with real trained centroids
  * while keeping the property the stand-in existed for: BOTH engines
  * (Spark and the DuckDB oracle) can replay training bit-for-bit.
  *
  * Determinism contract (every step is engine-agnostic):
  *  - init: the k lowest point ids per group are the seed centroids
  *    (cid = id) — the standard "seed from data points" init, fixed
  *    instead of sampled so there is no RNG to disagree on;
  *  - assignment: nearest centroid under the metric ROUNDED to 6dp,
  *    ties by centroid id — identical rank order on identical doubles;
  *  - update: per-dimension MEANS would be double summations whose
  *    value depends on shuffle order, so coordinates are first fixed to
  *    integer units `round((x + Offset)·Scale)` (exact BIGINT, offset
  *    keeps them positive — Spark `div` truncates toward zero while
  *    DuckDB `//` is also truncating, and positive operands make every
  *    rounding convention agree) and summed EXACTLY; the new coordinate
  *    is `(Σu div n)/Scale − Offset`, the same double on both engines;
  *  - empty clusters keep their previous centroid (left-join coalesce).
  *
  * Two metrics: `cosine = true` assigns by rounded cosine similarity
  * (descending — the spherical-k-means shape used for IVF cells, means
  * left unnormalized since cosine is scale-invariant), `cosine = false`
  * by rounded squared L2 (ascending — the classic PQ codebook metric).
  *
  * Scale: training runs over a FIXED-PREFIX SAMPLE of the corpus
  * (callers pass the sample), which is how production ANN indexes train
  * at 100 TB — FAISS's train-on-sample, add-after-train contract. Each
  * iteration is one broadcast of the ≤k·groups centroid rows against
  * the constant-size sample plus one (group, cid, dim)-keyed exact
  * aggregate; nothing corpus-sized ever enters the trainer.
  */
object KMeans {
  /** Coordinate-to-integer-unit fixing: `u = round((x + Offset)·Scale)`.
    * Offset must exceed any |coordinate| (embeddings live in (−1, 1),
    * residuals in (−2, 2)); Scale fixes 7 decimal places — unit
    * magnitudes ≤ ~3.2e8, so sums over any realistic sample stay well
    * inside BIGINT. */
  val Offset = 16.0
  val Scale = 1.0e7

  /** `points`: (grp: int-like, id: long, v: array<double>). Returns the
    * trained codebook (grp, cid, cv: array<double>, cnorm) after
    * `iters` assign+update rounds from the k-lowest-id seeds. */
  def lloyd(points: DataFrame, k: Int, iters: Int, cosine: Boolean): DataFrame = {
    import points.sparkSession.implicits._
    val pts = points.select($"grp", $"id", $"v",
      sqrt(SimilarityModels.dotArr($"v", $"v")).as("pnorm"))
    val units = pts.select($"grp", $"id",
      transform($"v",
        x => round((x + lit(Offset)) * lit(Scale)).cast(LongType)).as("u"))
    var cents = pts.filter($"id" < k)
      .select($"grp", $"id".as("cid"), $"v".as("cv"))
    for (_ <- 1 to iters) {
      val cb = broadcast(cents.withColumn("cnorm",
        sqrt(SimilarityModels.dotArr($"cv", $"cv"))))
      val scoredBase = pts.join(cb, Seq("grp"))
      val (scored, ord) =
        if (cosine)
          (scoredBase.withColumn("sim", round(
            SimilarityModels.dotArr($"v", $"cv") / ($"pnorm" * $"cnorm"), 6)),
            Seq($"sim".desc, $"cid".asc))
        else
          (scoredBase.withColumn("sim", round(
            SimilarityModels.l2Arr($"v", $"cv"), 6)),
            Seq($"sim".asc, $"cid".asc))
      val asn = scored
        .withColumn("rk", row_number().over(
          Window.partitionBy($"grp", $"id").orderBy(ord: _*)))
        .filter($"rk" === 1)
        .select($"grp", $"id", $"cid")
      val sums = asn.join(units, Seq("grp", "id"))
        .select($"grp", $"cid", posexplode($"u").as(Seq("d", "ud")))
        .groupBy($"grp", $"cid", $"d")
        .agg(sum($"ud").as("s"), count(lit(1)).as("n"))
      // exact integer mean in units, reassembled in dimension order
      val means = sums
        .withColumn("cd",
          expr("s div n").cast(DoubleType) / lit(Scale) - lit(Offset))
        .groupBy($"grp", $"cid")
        .agg(transform(array_sort(collect_list(struct($"d", $"cd"))),
          s => s.getField("cd")).as("cv_new"))
      cents = cents.join(means, Seq("grp", "cid"), "left")
        .select($"grp", $"cid", coalesce($"cv_new", $"cv").as("cv"))
    }
    cents.withColumn("cnorm", sqrt(SimilarityModels.dotArr($"cv", $"cv")))
  }

  /** The DuckDB twin of [[lloyd]]: emits a comma-terminated chain of CTE
    * definitions (splice into a WITH list) that, given an existing CTE
    * `train`(grp, id, v DOUBLE[]), defines `{p}_cents`(grp, cid, cv,
    * cnorm) — the same seeds, rounded-metric assignments, exact
    * integer-unit means, and empty-cluster carry-forward, unrolled
    * `iters` times. */
  def oracleCtes(p: String, train: String, k: Int, iters: Int,
      dims: Int, cosine: Boolean): String = {
    def dot(a: String, b: String) =
      s"list_sum(list_transform(range($dims), i -> $a[i+1] * $b[i+1]))"
    def l2(a: String, b: String) =
      s"list_sum(list_transform(range($dims), i -> ($a[i+1] - $b[i+1]) * ($a[i+1] - $b[i+1])))"
    val sb = new StringBuilder
    sb ++= s"""${p}_units AS (
  SELECT grp, id,
         list_transform(v, x -> cast(round((x + 16.0) * 10000000.0) AS BIGINT)) AS u
  FROM $train),
${p}_cents0 AS (SELECT grp, id AS cid, v AS cv FROM $train WHERE id < $k),
"""
    for (i <- 1 to iters) {
      val prev = s"${p}_cents${i - 1}"
      val simExpr =
        if (cosine)
          s"round(${dot("t.v", "c.cv")} / (sqrt(${dot("t.v", "t.v")}) * sqrt(${dot("c.cv", "c.cv")})), 6)"
        else s"round(${l2("t.v", "c.cv")}, 6)"
      val dir = if (cosine) "DESC" else "ASC"
      sb ++= s"""${p}_asn$i AS (
  SELECT grp, id, cid FROM (
    SELECT t.grp, t.id, c.cid,
           row_number() OVER (PARTITION BY t.grp, t.id
             ORDER BY $simExpr $dir, c.cid) AS rk
    FROM $train t JOIN $prev c ON t.grp = c.grp)
  WHERE rk = 1),
${p}_sum$i AS (
  SELECT a.grp, a.cid, dd.d, sum(u.u[dd.d+1]) AS s, count(*) AS n
  FROM ${p}_asn$i a
  JOIN ${p}_units u ON a.grp = u.grp AND a.id = u.id
  CROSS JOIN (SELECT unnest(range($dims)) AS d) dd
  GROUP BY 1, 2, 3),
${p}_mean$i AS (
  SELECT grp, cid,
         list(cast(s // n AS DOUBLE) / 10000000.0 - 16.0 ORDER BY d) AS cv
  FROM ${p}_sum$i GROUP BY 1, 2),
${p}_cents$i AS (
  SELECT c.grp, c.cid, coalesce(m.cv, c.cv) AS cv
  FROM $prev c LEFT JOIN ${p}_mean$i m ON c.grp = m.grp AND c.cid = m.cid),
"""
    }
    sb ++= s"""${p}_cents AS (
  SELECT grp, cid, cv, sqrt(${dot("cv", "cv")}) AS cnorm
  FROM ${p}_cents$iters),
"""
    sb.toString
  }
}
