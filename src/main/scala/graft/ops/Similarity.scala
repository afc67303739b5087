package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import TextFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (array<float>): brute-force cosine top-k as the exactness baseline, and
  * an LSH-bucketed variant (sign random projections + multi-probe) as the
  * scale path — bucket sizes shrink geometrically with bits, so the join
  * fan-in stays bounded as the corpus grows.
  */
object Similarity {

  /** Exact top-k by cosine: queries × corpus → window rank. The corpus side
    * of the cross join is broadcast when small; at scale, partition the
    * queries and let AQE size the exchange. */
  def bruteForceTopK(
      queries: DataFrame, qid: String, qvec: String,
      corpus: DataFrame, cid: String, cvec: String,
      k: Int): DataFrame = {
    val w = Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(cid))
    queries.crossJoin(corpus)
      .withColumn("cosine", vec_cosine(col(qvec), col(cvec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(qid), col(cid), col("cosine"), col("rank"))
  }

  /** LSH top-k: corpus bucketed by hyperplane signature; each query probes
    * its own bucket plus all 1-bit-flip neighbors (multi-probe) — candidate
    * set ≈ (bits+1)/2^bits of the corpus. Returns top-k of the candidates
    * (approximate; recall measured in OpsSpec). */
  def lshTopK(
      queries: DataFrame, qid: String, qvec: String,
      corpus: DataFrame, cid: String, cvec: String,
      k: Int, bits: Int = 12, seed: Long = 42L): DataFrame = {
    val bucketed = corpus.withColumn("__sig", hyperplane_sig(col(cvec), lit(bits), lit(seed)))
    val probes = queries
      .withColumn("__qsig", hyperplane_sig(col(qvec), lit(bits), lit(seed)))
      .withColumn("__probe", explode(concat(
        array(col("__qsig")),
        transform(sequence(lit(0), lit(bits - 1)),
          b => col("__qsig").bitwiseXOR(pow(lit(2.0), b).cast("long")))))) // 2^b exact for b<=52
    val w = Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(cid))
    probes.join(bucketed, col("__probe") === col("__sig"))
      .withColumn("cosine", vec_cosine(col(qvec), col(cvec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(qid), col(cid), col("cosine"), col("rank"))
  }

  /** IVF (inverted-file) top-k — the other scale path: a deterministic
    * coarse quantizer (nlist centroids drawn from the corpus by id hash)
    * partitions the corpus into lists; each query probes its `nprobe`
    * nearest lists only. The centroid table is tiny and BROADCAST; corpus
    * assignment is one narrow map; candidate fan-in per query is
    * ~ corpus x nprobe/nlist. With nprobe = nlist this is exactly brute
    * force (tested).
    */
  def ivfTopK(
      queries: DataFrame, qid: String, qvec: String,
      corpus: DataFrame, cid: String, cvec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // deterministic centroid draw: the nlist corpus vectors with the
    // smallest xxhash64(id) — stable across runs and partitionings
    val centroids = corpus
      .select(col(cid).cast("string").as("__k"), col(cvec).as("__v"))
      .withColumn("__h", xxhash64(col("__k")))
      .orderBy("__h").limit(nlist)
      .select("__v").as[Array[Float]].collect()
    val centDf = broadcast(
      centroids.zipWithIndex.map { case (v, i) => (i, v) }.toSeq.toDF("__list", "__cent"))

    // corpus side: each vector assigned to its single nearest centroid
    val w0 = Window.partitionBy(col(cid)).orderBy(col("__csim").desc, col("__list"))
    val assigned = corpus.crossJoin(centDf)
      .withColumn("__csim", vec_cosine(col(cvec), col("__cent")))
      .withColumn("__r", row_number().over(w0)).where(col("__r") === 1)
      .drop("__cent", "__csim", "__r")

    // query side: probe the nprobe nearest lists
    val wq = Window.partitionBy(col(qid)).orderBy(col("__qsim").desc, col("__list"))
    val probes = queries.crossJoin(centDf)
      .withColumn("__qsim", vec_cosine(col(qvec), col("__cent")))
      .withColumn("__r", row_number().over(wq)).where(col("__r") <= nprobe)
      .drop("__cent", "__qsim", "__r")

    val w = Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(cid))
    probes.join(assigned, Seq("__list"))
      .withColumn("cosine", vec_cosine(col(qvec), col(cvec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(qid), col(cid), col("cosine"), col("rank"))
  }
}
