package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
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
    val nl      = centroids.length
    // the centroid table rides into every task as a LITERAL array (it IS the
    // broadcast — nlist rows of data, no exchange, no join)
    val centArr = typedlit(centroids.map(_.toSeq).toSeq)

    // corpus side: nearest-centroid assignment as a narrow argmax over the
    // literal centroid array — zero shuffle of the corpus (the previous
    // crossJoin + Window.partitionBy(cid) formulation exchanged
    // corpus × nlist rows on the corpus id: a full-corpus shuffle, the
    // scale-killer at 10^12 rows). Strict > keeps the smallest list index
    // on cosine ties, matching the window's (desc sim, asc list) order.
    def bestList(vec: Column): Column = aggregate(
      sequence(lit(0), lit(nl - 1)),
      struct(lit(-2.0).as("s"), lit(0).as("i")),
      (acc, i) => {
        val sim = vec_cosine(vec, element_at(centArr, i + 1))
        when(sim > acc.getField("s"), struct(sim.as("s"), i.as("i"))).otherwise(acc)
      }).getField("i")
    val assigned = corpus.withColumn("__list", bestList(col(cvec)))

    // query side: top-nprobe lists, also narrow — score every centroid,
    // sort (desc sim, asc list), take nprobe, explode
    val scored = transform(sequence(lit(0), lit(nl - 1)),
      i => struct(vec_cosine(col(qvec), element_at(centArr, i + 1)).as("s"), i.as("i")))
    val ordered = array_sort(scored, (a, b) =>
      when(a.getField("s") > b.getField("s"), -1)
        .when(a.getField("s") < b.getField("s"), 1)
        .otherwise(a.getField("i") - b.getField("i")))
    val probes = queries.withColumn("__list",
      explode(transform(slice(ordered, 1, math.min(nprobe, nl)), _.getField("i"))))

    val w = Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(cid))
    probes.join(assigned, Seq("__list"))
      .withColumn("cosine", vec_cosine(col(qvec), col(cvec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(qid), col(cid), col("cosine"), col("rank"))
  }
}
