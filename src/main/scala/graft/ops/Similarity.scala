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

  // -------------------------------------------------------------------- IVF

  /** The nlist corpus vectors with the smallest xxhash64(id) — the
    * deterministic (partitioning-independent) centroid draw used both as
    * the ad-hoc quantizer and as k-means initialization. */
  private def hashDrawCentroids(corpus: DataFrame, cid: String, cvec: String,
                                nlist: Int): Array[Array[Float]] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    corpus.select(col(cid).cast("string").as("__k"), col(cvec).as("__v"))
      .withColumn("__h", xxhash64(col("__k")))
      .orderBy("__h").limit(nlist)
      .select("__v").as[Array[Float]].collect()
  }

  /** Nearest-centroid argmax over a LITERAL centroid array — a narrow map,
    * zero shuffle of the corpus (the centroid table rides into every task as
    * the literal; no exchange, no join). Strict > keeps the smallest list
    * index on cosine ties, matching the probe order below. */
  private def bestList(centArr: Column, nl: Int, vec: Column): Column = aggregate(
    sequence(lit(0), lit(nl - 1)),
    struct(lit(-2.0).as("s"), lit(0).as("i")),
    (acc, i) => {
      val sim = vec_cosine(vec, element_at(centArr, i + 1))
      when(sim > acc.getField("s"), struct(sim.as("s"), i.as("i"))).otherwise(acc)
    }).getField("i")

  /** Top-nprobe nearest lists of a query vector (desc sim, asc list) as an
    * int array — also a narrow map. */
  private def probeLists(centArr: Column, nl: Int, vec: Column, nprobe: Int): Column = {
    val scored = transform(sequence(lit(0), lit(nl - 1)),
      i => struct(vec_cosine(vec, element_at(centArr, i + 1)).as("s"), i.as("i")))
    val ordered = array_sort(scored, (a, b) =>
      when(a.getField("s") > b.getField("s"), -1)
        .when(a.getField("s") < b.getField("s"), 1)
        .otherwise(a.getField("i") - b.getField("i")))
    transform(slice(ordered, 1, math.min(nprobe, nl)), _.getField("i"))
  }

  private def centroidLit(cents: Array[Array[Float]]): Column =
    typedlit(cents.map(_.toSeq).toSeq)

  /** IVF (inverted-file) top-k — the other scale path: a deterministic
    * coarse quantizer (nlist centroids drawn from the corpus by id hash)
    * partitions the corpus into lists; each query probes its `nprobe`
    * nearest lists only. The centroid table is tiny and rides as a literal;
    * corpus assignment is one narrow map; candidate fan-in per query is
    * ~ corpus x nprobe/nlist. With nprobe = nlist this is exactly brute
    * force (tested). Hash-drawn centroids give UNBALANCED lists on
    * clustered data (the common embedding distribution) — [[trainIvf]] +
    * [[ivfTopKWith]] is the production path.
    */
  def ivfTopK(
      queries: DataFrame, qid: String, qvec: String,
      corpus: DataFrame, cid: String, cvec: String,
      k: Int, nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centroids = hashDrawCentroids(corpus, cid, cvec, nlist)
    val nl      = centroids.length
    val centArr = centroidLit(centroids)
    val assigned = corpus.withColumn("__list", bestList(centArr, nl, col(cvec)))
    val probes = queries.withColumn("__list",
      explode(probeLists(centArr, nl, col(qvec), nprobe)))
    val w = Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(cid))
    probes.join(assigned, Seq("__list"))
      .withColumn("cosine", vec_cosine(col(qvec), col(cvec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(qid), col(cid), col("cosine"), col("rank"))
  }

  /** TRAIN an IVF index (Lloyd's k-means) and persist it for reuse across
    * query batches — real IVF trains once, queries many times, instead of
    * re-drawing centroids per call. Per round: nearest-centroid assignment
    * is the same narrow literal-argmax as [[ivfTopK]] (zero corpus
    * exchange); the per-dimension means shuffle only (list, dim) partial
    * sums — nlist x dim cells of map-side-combined aggregate, independent
    * of corpus size; the driver materializes nlist x dim doubles per round
    * (the convergence check, inherently iterative). Stops early when no
    * centroid moves more than `tol` (L2). Layout under `indexPath`:
    *   - `centroids`  (list int, centroid array<float>)
    *   - `lists`      the corpus with a `list` column, partitioned by list —
    *                  the inverted file itself, so [[ivfTopKWith]] never
    *                  touches the raw corpus again
    * Train on a sample for very large corpora (assignments are still written
    * for the full `corpus`). Returns the final list sizes (diagnostics). */
  def trainIvf(
      corpus: DataFrame, cid: String, cvec: String,
      indexPath: String, nlist: Int = 16, maxIter: Int = 10,
      tol: Double = 1e-4): Map[Int, Long] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // lazy checkpoint: materialized by lloyd's init-draw job
    val src = corpus.select(col(cid), col(cvec)).localCheckpoint(eager = false)
    val cents   = lloydCentroids(src, cid, cvec, nlist, maxIter, tol)
    val nl      = cents.length
    val centArr = centroidLit(cents)
    // centroids and lists are independent writes — overlap them (guide §2.6)
    graft.Par.run(
      () => cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("list", "centroid")
        .select(col("list"), col("centroid").cast("array<float>"))
        .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/centroids"),
      () => corpus.withColumn("list", bestList(centArr, nl, col(cvec)))
        .write.mode("overwrite").partitionBy("list").parquet(s"$indexPath/lists"))
    spark.read.parquet(s"$indexPath/lists").groupBy("list").count()
      .as[(Int, Long)].collect().toMap
  }

  /** The Lloyd's-k-means loop shared by [[trainIvf]] and [[trainIvfPq]]'s
    * coarse stage: hash-draw init, narrow literal-argmax assignment (zero
    * corpus exchange), (list, dim)-keyed partial-sum means, empty-list
    * reseed with the farthest vector, early stop at `tol` L2 movement. */
  private def lloydCentroids(
      src: DataFrame, cid: String, cvec: String,
      nlist: Int, maxIter: Int, tol: Double,
      init: Array[Array[Float]] = null): Array[Array[Float]] = {
    val spark = src.sparkSession
    import spark.implicits._
    // callers that already drew the init (to read dim off it without a
    // separate job) pass it in; else draw here
    var cents = if (init != null) init else hashDrawCentroids(src, cid, cvec, nlist)
    val nl = cents.length
    var iter = 0
    var moved = Double.MaxValue
    while (iter < maxIter && moved > tol) {
      val centArr = centroidLit(cents)
      val assigned = src.withColumn("__list", bestList(centArr, nl, col(cvec)))
      // per-dim means: (list, dim) keyed partial agg — nlist x dim cells
      val means = assigned
        .select(col("__list"), posexplode(col(cvec)))
        .groupBy(col("__list"), col("pos"))
        .agg(avg(col("col")).as("m"))
        .collect()
      val next = cents.map(_.clone())
      val captured = Array.fill(nl)(false)
      means.foreach { r =>
        next(r.getAs[Int]("__list"))(r.getAs[Int]("pos")) = r.getAs[Double]("m").toFloat
        captured(r.getAs[Int]("__list")) = true
      }
      // EMPTY-LIST RESEED (the faiss discipline): a list that captured no
      // vectors stagnates forever under plain Lloyd (measured: two clusters
      // merge into one 2x list while a centroid starves). Reseed each empty
      // list with the corpus vector FARTHEST from its assigned centroid
      // (lowest cosine; min-id tie-break ⇒ deterministic) — a member of an
      // under-covered cluster — and keep iterating.
      val emptyLists = (0 until nl).filterNot(captured)
      if (emptyLists.nonEmpty && iter < maxIter - 1) {
        val far = assigned
          .withColumn("__sim", vec_cosine(col(cvec), element_at(centArr, col("__list") + 1)))
          .orderBy(col("__sim").asc, col(cid))
          .limit(emptyLists.size)
          .select(col(cvec)).as[Array[Float]].collect()
        emptyLists.zip(far).foreach { case (e, v) => next(e) = v.clone() }
        moved = Double.MaxValue // reseeded: force another round
      } else {
        moved = cents.zip(next).map { case (a, b) =>
          math.sqrt(a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
        }.max
      }
      cents = next
      iter += 1
    }
    cents
  }

  /** IVF TUNING report: measured top-k recall of [[ivfTopKWith]] against
    * the exact [[bruteForceTopK]] for each candidate `nprobe`, on a bounded
    * query sample — how nprobe is chosen for a corpus before a full run
    * (the [[graft.ops.Dedup.minhashRecallReport]] discipline for the ANN
    * side). The brute pass is O(sampleN × corpus) BY CONSTRUCTION — a
    * parameter-sweep tool over a sample, never a corpus-scale operator.
    * Output per level: nprobe, n_pairs (brute top-k pairs), n_found,
    * recall; recall at nprobe = nlist is exactly 1.0 (IVF ≡ brute force).
    */
  def ivfRecallReport(
      querySample: DataFrame, qid: String, qvec: String,
      indexPath: String, cid: String, cvec: String,
      k: Int, nprobes: Seq[Int]): DataFrame = {
    val spark = querySample.sparkSession
    val sample = querySample.localCheckpoint()
    val corpus = spark.read.parquet(s"$indexPath/lists").drop("list")
    val brute = bruteForceTopK(sample, qid, qvec, corpus, cid, cvec, k)
      .select(col(qid), col(cid)).localCheckpoint()
    nprobes.map { np =>
      val found = ivfTopKWith(sample, qid, qvec, indexPath, cid, cvec, k, np)
        .select(col(qid), col(cid), lit(1L).as("__f"))
      brute.join(found, Seq(qid, cid), "left")
        .agg(count(lit(1)).as("n_pairs"), sum(coalesce(col("__f"), lit(0L))).as("n_found"))
        .select(lit(np).as("nprobe"), col("n_pairs"), col("n_found"),
          (col("n_found").cast("double") / col("n_pairs")).as("recall"))
    }.reduce(_ unionByName _).orderBy("nprobe")
  }

  // ------------------------------------------------------------- IVF-PQ

  /** Pad a subspace codebook to the fixed 256 stride by repeating entry 0
    * (a padded duplicate can never win the strict argmin — inert). */
  private def pad256(bk: Array[Array[Float]], dsub: Int): Array[Array[Float]] =
    Array.tabulate(256)(c => if (c < bk.length) bk(c) else bk(0))

  private def flatten(books: Array[Array[Array[Float]]], dsub: Int): Array[Float] = {
    val out = new Array[Float](books.length * 256 * dsub)
    var j = 0
    while (j < books.length) {
      val padded = pad256(books(j), dsub)
      var c = 0
      while (c < 256) {
        System.arraycopy(padded(c), 0, out, (j * 256 + c) * dsub, dsub)
        c += 1
      }
      j += 1
    }
    out
  }

  /** Element-wise `vec − cents[list]` as float — the RESIDUAL a list member
    * quantizes under residual encoding. Narrow (centroids ride as the
    * literal `centArr`). */
  private def residualCol(centArr: Column, vec: Column, list: Column): Column =
    zip_with(vec, element_at(centArr, list + 1), (a, b) => (a - b).cast("float"))

  /** dot(q, cents[list]) in double — the coarse term an ADC score adds back
    * under residual encoding. Narrow; computed on the (small) probe side. */
  private def coarseDot(centArr: Column, qvec: Column, list: Column): Column =
    aggregate(
      zip_with(qvec, element_at(centArr, list + 1),
        (a, b) => a.cast("double") * b.cast("double")),
      lit(0.0), (s, x) => s + x)

  /** TRAIN an IVF-PQ index: [[trainIvf]]'s coarse quantizer plus
    * per-subspace PRODUCT-QUANTIZATION codebooks (m subspaces x <=256
    * centroids); the inverted file stores m-byte codes + one reconstruction
    * norm — NEVER the raw vectors, cutting the persisted index from
    * dim x 4 bytes to m + 4 per vector (the 100 TB memory wall of
    * [[trainIvf]]'s raw float lists).
    *
    * With `residual = true` (the default, faiss's IndexIVFPQ layout) each
    * vector quantizes its RESIDUAL v − c_list rather than v itself:
    * residual spread per list is far tighter than corpus spread, so the
    * same m-byte budget buys less reconstruction error and higher recall.
    * Queries then score as dot(q, c_list) + ADC(residual code) — the coarse
    * term is per (query, probed list), never per candidate. Set
    * `residual = false` for the q61-style closed-form-oracle construction:
    * exact small-alphabet reconstruction of v itself reproduces brute-force
    * cosine BIT-exactly, while the residual float rounding (fl(v−c)) is
    * ~1e-7 off on exact cosine ties (e.g. scalar-multiple vectors).
    * The flag persists in `pq_books.res`; [[pqTopKWith]] reads it back —
    * queries never pass it.
    *
    * Codebook training per subspace:
    *   - SMALL-ALPHABET fast path: when a subspace has <= 256 distinct
    *     subvectors, the codebook IS the sorted distinct set — encoding is
    *     zero-error reconstruction (the q61 closed-form-oracle case; the
    *     faiss int8-data shortcut)
    *   - otherwise L2 Lloyd's: hash-draw 256 subvectors, assign through the
    *     [[PqKernels.encode]] argmin itself (narrow map), re-center with a
    *     (code, dim)-keyed partial-sum aggregate — 256 x dsub cells per
    *     round, corpus never shuffles
    * Layout under `indexPath`: `centroids` (coarse), `pq_books`
    * (j, c, centroid — m and dsub are inferred from it at load), `lists`
    * (corpus columns minus the vector + code + rnorm, partitioned by
    * list). */
  def trainIvfPq(
      corpus: DataFrame, cid: String, cvec: String,
      indexPath: String, nlist: Int = 16, m: Int = 8,
      maxIter: Int = 10, pqIter: Int = 8, tol: Double = 1e-4,
      residual: Boolean = true): Map[Int, Long] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    TextFunctions.register(spark)
    // lazy checkpoint: materialized by the init-draw job right below
    val raw  = corpus.select(col(cid), col(cvec)).localCheckpoint(eager = false)
    val init = hashDrawCentroids(raw, cid, cvec, nlist)
    require(init.nonEmpty, "trainIvfPq: empty corpus")
    // dim read off the drawn vectors — no separate head() job
    val dim = init(0).length
    require(dim % m == 0, s"dim $dim must be divisible by m = $m")
    val dsub = dim / m
    val cents   = lloydCentroids(raw, cid, cvec, nlist, maxIter, tol, init)
    val nl      = cents.length
    val centArr = centroidLit(cents)
    // codebooks train on the ENCODE INPUT: the raw vector, or (residual
    // mode) v − c_list — list assignment and subtraction are both narrow
    // maps over the checkpointed source, no extra materialization
    val src =
      if (!residual) raw
      else raw
        .withColumn("__l", bestList(centArr, nl, col(cvec)))
        .withColumn(cvec, residualCol(centArr, col(cvec), col("__l")))
        .drop("__l")
    // ALL subspaces' distinct subvectors in ONE job (explode -> distinct ->
    // per-j row_number capped at 257): a per-subspace loop of distinct jobs
    // costs m x fixed job overhead — measured 16 s for m = 8 at bench scale.
    // GATED by approx_count_distinct per subspace first: on a CONTINUOUS
    // embedding corpus distinct ≈ corpus, and the exact pre-cap distinct
    // would shuffle all n subvectors once — the approximate pass exchanges
    // only m HLL partials, and only subspaces that might actually be
    // small-alphabet (estimate ≤ 400: the 257 cutoff with ample margin for
    // the ~5% HLL rsd — a false "small" verdict only costs that subspace
    // the exact check, never correctness) reach the exact distinct.
    val exploded = src.select(explode(transform(sequence(lit(0), lit(m - 1)),
        j => struct(j.cast("int").as("j"),
          slice(col(cvec), j * dsub + 1, lit(dsub)).as("sv")))).as("x"))
      .select(col("x.j").as("j"), col("x.sv").as("sv"))
    val approxAlphabet = exploded.groupBy(col("j"))
      .agg(approx_count_distinct(col("sv")).as("acd"))
      .as[(Int, Long)].collect().toMap
    val smallJs = (0 until m).filter(j => approxAlphabet.getOrElse(j, 0L) <= 400)
    val w257 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("j")).orderBy(col("sv"))
    val drawn: Map[Int, Array[Array[Float]]] =
      if (smallJs.isEmpty) Map.empty
      else {
        // job-description marker: the spec pins that a continuous corpus
        // never reaches this exact-distinct job
        spark.sparkContext.setJobDescription("pq-exact-alphabet")
        try exploded.where(col("j").isin(smallJs: _*)).distinct()
          .withColumn("rn", row_number().over(w257)).where(col("rn") <= 257)
          .select(col("j"), col("sv"), col("rn")).as[(Int, Array[Float], Int)].collect()
          .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(_._2)).toMap // rn = Spark's array asc order
        finally spark.sparkContext.setJobDescription(null)
      }
    val books: Array[Array[Array[Float]]] = (0 until m).map { j =>
      val distinctCapped = drawn.getOrElse(j, Array.empty[Array[Float]])
      if (distinctCapped.nonEmpty && distinctCapped.length <= 256)
        distinctCapped // the alphabet IS the codebook
      else {
        // continuous subspace: L2 Lloyd's, assignment through the encode
        // kernel itself (narrow map + (code, dim)-keyed partial sums)
        val sub = src.select(col(cid), slice(col(cvec), j * dsub + 1, dsub).as("__sv"))
          .localCheckpoint()
        var bk = hashDrawCentroids(sub, cid, "__sv", 256)
        var it = 0
        while (it < pqIter) {
          val bkLit = typedlit(flatten(Array(bk), dsub).toSeq)
          val means = sub
            .withColumn("__c", pq_code_at(
              pq_encode(col("__sv"), bkLit, lit(1), lit(dsub)).getField("code"), lit(0)))
            .select(col("__c"), posexplode(col("__sv")))
            .groupBy(col("__c"), col("pos"))
            .agg(avg(col("col")).as("mn"))
            .collect()
          val next = bk.map(_.clone())
          means.foreach { r =>
            next(r.getAs[Int]("__c"))(r.getAs[Int]("pos")) = r.getAs[Double]("mn").toFloat
          }
          bk = next // codes nobody used keep their draw (inert under argmin)
          it += 1
        }
        bk
      }
    }.toArray
    // persist — m and dsub are INFERRED from pq_books at load (max j + 1,
    // centroid length), so the index is two small tables + the lists, not
    // three: every extra parquet dir costs a write + a read per pipeline
    // run through the shell-forking RawLocalFileSystem
    val booksLit = typedlit(flatten(books, dsub).toSeq)
    // the three index tables have no data dependency on EACH OTHER's
    // parquet (lists encodes from the in-memory codebooks) — submit the
    // writes concurrently so the two tiny table commits hide under the
    // lists write (guide §2.6)
    graft.Par.run(
      () => books.zipWithIndex.flatMap { case (bk, j) =>
          bk.zipWithIndex.map { case (c, ci) => (j, ci, c.toSeq) }
        }.toSeq.toDF("j", "c", "centroid")
        .select(col("j"), col("c"), col("centroid").cast("array<float>"),
          lit(residual).as("res"))
        .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/pq_books"),
      () => cents.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("list", "centroid")
        .select(col("list"), col("centroid").cast("array<float>"))
        .coalesce(1).write.mode("overwrite").parquet(s"$indexPath/centroids"),
      () => corpus.withColumn("list", bestList(centArr, nl, col(cvec)))
        .withColumn("__e",
          if (residual)
            pq_encode(residualCol(centArr, col(cvec), col("list")), booksLit,
              lit(m), lit(dsub), element_at(centArr, col("list") + 1))
          else pq_encode(col(cvec), booksLit, lit(m), lit(dsub)))
        .withColumn("code", col("__e").getField("code"))
        .withColumn("rnorm", col("__e").getField("rnorm"))
        .drop("__e", cvec) // the vector never reaches the inverted file
        .write.mode("overwrite").partitionBy("list").parquet(s"$indexPath/lists"))
    spark.read.parquet(s"$indexPath/lists").groupBy("list").count()
      .as[(Int, Long)].collect().toMap
  }

  /** Query a trained IVF-PQ index by ASYMMETRIC DISTANCE: one m x 256
    * dot-product LUT per query ([[PqKernels.lut]]), then every candidate in
    * the probed lists scores as m table lookups over its stored code
    * (codegen [[PqAdc]]) — cosine = adc / (|q| * rnorm). The candidate side
    * carries only (id, code, rnorm): no vector ever re-attaches before the
    * top-k window (plan-pinned in SessionIvfSpec). With the small-alphabet
    * codebooks reconstruction is exact, so nprobe = nlist reproduces brute
    * force EXACTLY (q61's oracle); with trained codebooks recall follows
    * the PQ error (spec-measured). A residual-encoded index (the
    * `pq_books.res` flag, see [[trainIvfPq]]) scores as
    * (dot(q, c_list) + ADC) / (|q| * rnorm) — the coarse term rides on the
    * probe rows. */
  def pqTopKWith(
      queries: DataFrame, qid: String, qvec: String,
      indexPath: String, cid: String,
      k: Int, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    TextFunctions.register(spark)
    val bookDf = spark.read.parquet(s"$indexPath/pq_books")
    // indexes written before the residual option carry no `res` column —
    // they encoded raw vectors. The flag rides the ONE book collect (a
    // separate head() was a whole extra job through the shell-forking
    // local FS).
    val hasRes = bookDf.schema.fieldNames.contains("res")
    val bookRows = bookDf
      .orderBy("j", "c")
      .select(col("j"), col("c"), col("centroid"),
        (if (hasRes) col("res") else lit(false)).as("res"))
      .as[(Int, Int, Array[Float], Boolean)].collect()
    val resFlag = bookRows.headOption.exists(_._4)
    val m    = bookRows.map(_._1).max + 1
    val dsub = bookRows.head._3.length
    val books = Array.tabulate(m)(j => bookRows.filter(_._1 == j).sortBy(_._2).map(_._3))
    val cents = spark.read.parquet(s"$indexPath/centroids")
      .orderBy("list").select("centroid").as[Array[Float]].collect()
    val nl       = cents.length
    val centArr  = centroidLit(cents)
    val booksLit = typedlit(flatten(books, dsub).toSeq)
    val lists = spark.read.parquet(s"$indexPath/lists")
      .withColumnRenamed("list", "__list")
    val qn = sqrt(aggregate(transform(col(qvec), x => x.cast("double") * x),
      lit(0.0), (a, x) => a + x))
    val probes = queries
      .withColumn("__list", explode(probeLists(centArr, nl, col(qvec), nprobe)))
      .withColumn("__lut", pq_lut(col(qvec), booksLit, lit(m), lit(dsub)))
      .withColumn("__qn", qn)
      // residual index: the coarse term dot(q, c_list) is per (query,
      // probed list) — computed here on the small probe side, NEVER per
      // candidate; each candidate adds it to its residual ADC
      .withColumn("__qc",
        if (resFlag) coarseDot(centArr, col(qvec), col("__list")) else lit(0.0))
    val w = Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(cid))
    probes.join(lists, Seq("__list"))
      .withColumn("cosine",
        when(col("rnorm") === 0.0 || col("__qn") === 0.0, lit(0.0))
          .otherwise((pq_adc(col("__lut"), col("code")) + col("__qc")) /
            (col("__qn") * col("rnorm"))))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(qid), col(cid), col("cosine"), col("rank"))
  }

  /** Query a trained, persisted IVF index: probes join the inverted-file
    * parquet directly (partition-pruned by `list` when nprobe is small) —
    * the corpus never re-shuffles and centroids are nlist stored rows.
    * `cid`/`cvec` name the corpus columns as written by [[trainIvf]].
    * nprobe = nlist ≡ brute force, independent of training quality. */
  def ivfTopKWith(
      queries: DataFrame, qid: String, qvec: String,
      indexPath: String, cid: String, cvec: String,
      k: Int, nprobe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = spark.read.parquet(s"$indexPath/centroids")
      .orderBy("list").select("centroid").as[Array[Float]].collect()
    val nl      = cents.length
    val centArr = centroidLit(cents)
    val lists   = spark.read.parquet(s"$indexPath/lists")
      .withColumnRenamed("list", "__list")
    val probes = queries.withColumn("__list",
      explode(probeLists(centArr, nl, col(qvec), nprobe)))
    val w = Window.partitionBy(col(qid)).orderBy(col("cosine").desc, col(cid))
    probes.join(lists, Seq("__list"))
      .withColumn("cosine", vec_cosine(col(qvec), col(cvec)))
      .withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(qid), col(cid), col("cosine"), col("rank"))
  }
}
