package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k with pure built-in expressions
  * (`zip_with`+`aggregate` → whole-stage codegen, no UDF in the hot
  * path). Scale path: IVF — k-means-style coarse centroids, partition
  * probe — implemented as a bucketed pre-partitioning so a query only
  * scans nprobe buckets instead of the full corpus.
  */
object Similarity {

  /** dot(a, b) with built-in higher-order functions (codegen'd). */
  def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def normCol(a: Column): Column =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, x) => acc + x))

  def cosineCol(a: Column, b: Column): Column =
    dotCol(a, b) / (normCol(a) * normCol(b))

  /** Brute-force top-k by cosine against one query vector. One scan +
    * one top-k sort (TakeOrderedAndProject — no full shuffle). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Array[Float], k: Int): DataFrame = {
    val qlit = typedLit(query.toSeq)
    df.select(col(idCol), cosineCol(col(vecCol).cast("array<double>"), qlit.cast("array<double>")).as("cosine"))
      .orderBy(desc("cosine"), col(idCol))
      .limit(k)
  }

  /** Batch top-k: for every query row (small dim table), the k nearest
    * corpus rows. Broadcast the queries; per-partition top-k via window. */
  def batchTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                queries: DataFrame, queryId: String, queryVec: String,
                k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = corpus.select(col(corpusId).as("cid"), col(corpusVec).cast("array<double>").as("cv"))
      .crossJoin(broadcast(queries.select(col(queryId).as("qid"), col(queryVec).cast("array<double>").as("qv"))))
      .withColumn("cosine", cosineCol(col("cv"), col("qv")))
    val w = Window.partitionBy(col("qid")).orderBy(desc("cosine"), col("cid"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }

  /** IVF index: assign each vector to its nearest of `nlist` coarse
    * centroids (deterministically seeded sample as centroids — a cheap
    * stand-in for k-means that keeps the partition-probe structure).
    * Returns the corpus augmented with a `ivf_cell` column; store
    * partitioned by it so a query scans only `nprobe` cells. */
  def ivfAssign(df: DataFrame, idCol: String, vecCol: String,
                nlist: Int = 64, seed: Long = 42L): (DataFrame, Array[Array[Double]]) = {
    val spark = df.sparkSession
    val centroids = df.select(col(vecCol).cast("array<double>"))
      .orderBy(abs(hash(col(vecCol).cast("array<string>"))))
      .limit(nlist)
      .collect().map(_.getSeq[Double](0).toArray)
    val b = spark.sparkContext.broadcast(centroids)
    val assignUdf = udf((v: Seq[Double]) => {
      val cs = b.value
      var best = 0
      var bestDot = Double.MinValue
      var c = 0
      while (c < cs.length) {
        var dot = 0.0; var i = 0
        while (i < v.length) { dot += v(i) * cs(c)(i); i += 1 }
        if (dot > bestDot) { bestDot = dot; best = c }
        c += 1
      }
      best
    })
    (df.withColumn("ivf_cell", assignUdf(col(vecCol).cast("array<double>"))), centroids)
  }

  /** IVF query: probe the `nprobe` cells nearest the query vector. */
  def ivfTopK(indexed: DataFrame, centroids: Array[Array[Double]],
              idCol: String, vecCol: String,
              query: Array[Float], k: Int, nprobe: Int = 8): DataFrame = {
    val qd = query.map(_.toDouble)
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    val cells = centroids.zipWithIndex
      .sortBy { case (c, i) => (-dot(c, qd), i) }
      .take(nprobe).map(_._2)
    bruteForceTopK(indexed.filter(col("ivf_cell").isin(cells.toSeq: _*)), idCol, vecCol, query, k)
  }
}
