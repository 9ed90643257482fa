package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ANN operators: k-means quantizer quality + IVF recall/exactness. */
class SimilaritySpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  /** Deterministic clustered corpus: `nClusters` unit anchors, `per`
    * noisy members each (members stay close to their anchor in angle). */
  private def clustered(nClusters: Int, per: Int, dim: Int = 16) = {
    val rnd = new scala.util.Random(7L)
    val anchors = Array.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian().toFloat))
    val rows = for {
      c <- 0 until nClusters
      i <- 0 until per
    } yield {
      val jitter = Array.fill(dim)((rnd.nextGaussian() * 0.05).toFloat)
      val v = anchors(c).zip(jitter).map { case (a, j) => a + j }
      (c.toLong * per + i, v.toSeq)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("kmeansCentroids: Lloyd rounds reduce spherical inertia vs hash-sample seeding") {
    val df = clustered(8, 40)
    def inertia(cs: Array[Array[Double]]): Double = {
      val vecs = df.select($"embedding".cast("array<double>")).as[Seq[Double]].collect()
      vecs.map { sv =>
        val v = sv.toArray
        val n = math.sqrt(v.map(x => x * x).sum)
        cs.map { c =>
          var dot = 0.0; var i = 0
          while (i < v.length) { dot += v(i) * c(i); i += 1 }
          dot / n // cosine to unit centroid; higher = closer
        }.max
      }.map(1.0 - _).sum
    }
    val seeded = Similarity.kmeansCentroids(df, "embedding", nlist = 8, iters = 0)
    val trained = Similarity.kmeansCentroids(df, "embedding", nlist = 8, iters = 5)
    assert(inertia(trained) <= inertia(seeded) + 1e-9)
    // unit-norm invariant
    trained.foreach(c => assert(math.abs(math.sqrt(c.map(x => x * x).sum) - 1.0) < 1e-9))
  }

  test("IVF with k-means centroids: nprobe=2 of 8 recovers the true top-k on a clustered corpus") {
    val df = clustered(8, 40)
    val q = df.filter($"vec_id" === 0).select($"embedding").head().getSeq[Float](0).toArray
    val corpus = df.filter($"vec_id" =!= 0)
    val exact = Similarity.bruteForceTopK(
      corpus.select($"vec_id", $"embedding".cast("array<double>").as("embedding")),
      "vec_id", "embedding", q, k = 10).select("vec_id").as[Long].collect().toSet
    val (indexed, cents) = Similarity.ivfAssign(corpus, "vec_id", "embedding", nlist = 8)
    val approx = Similarity.ivfTopK(indexed, cents, "vec_id", "embedding", q, k = 10, nprobe = 2)
      .select("vec_id").as[Long].collect().toSet
    // query's cluster + one neighbor probed: all true neighbors live there
    assert((exact intersect approx).size >= 9, s"recall too low: $approx vs $exact")
  }

  test("IVF full probe (nprobe = nlist) is exactly brute force") {
    val df = clustered(4, 25)
    val q = df.filter($"vec_id" === 1).select($"embedding").head().getSeq[Float](0).toArray
    val corpus = df.filter($"vec_id" =!= 1)
    val exact = Similarity.bruteForceTopK(
      corpus.select($"vec_id", $"embedding".cast("array<double>").as("embedding")),
      "vec_id", "embedding", q, k = 7).select("vec_id").as[Long].collect().toSeq
    val (indexed, cents) = Similarity.ivfAssign(corpus, "vec_id", "embedding", nlist = 4)
    val full = Similarity.ivfTopK(indexed, cents, "vec_id", "embedding", q, k = 7, nprobe = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(full == exact)
  }
}
