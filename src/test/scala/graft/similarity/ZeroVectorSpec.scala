package graft.similarity

import java.nio.file.Files

import graft.SparkSpec

/** Zero-norm embedding robustness: cosine(q, zero-vector) divides by a
  * zero norm. Under Spark 4 ANSI, DOUBLE division by zero THROWS (unlike
  * IEEE) — so the similarity family must not crash when a degenerate
  * vector appears (models do emit all-zero embeddings for empty inputs). */
class ZeroVectorSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-zerovec").toString
    val dim = 8
    val rows = (0L until 30L).map { i =>
      val v = if (i == 7L) Array.fill(dim)(0.0f) // the degenerate vector
              else Array.tabulate(dim)(j => (((i * 31 + j * 17) % 13) - 6).toFloat / 7f)
      (i, v.toSeq, (i % 3).toInt)
    }
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  Seq("q39_cosine_dup_pairs", "q40_ann_topk", "q41_ann_lsh", "q42b_ann_ivf",
    "q56_vector_centroid").foreach { q =>
    test(s"$q survives a zero-norm vector") {
      graft.SparkEntry.queries(q)(spark, dir).collect() // must not throw
    }
  }
}
