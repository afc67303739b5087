package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import TextFunctions._

/** Deduplication operators for training-data pipelines, each a declarative
  * DataFrame plan over the `documents`-shaped table:
  *
  *  - exact          hash-groupBy canonicalization (one shuffle on the text)
  *  - MinHash + LSH  shingle → minhash → band → bucket equi-join → verified
  *                   n-gram Jaccard (the banding bounds candidate pairs, so
  *                   no quadratic blow-up at scale)
  *  - SimHash        64-bit signature, 16-bit band buckets, hamming verify
  *  - n-gram Jaccard verification kernel (exact, pairwise)
  *  - embedding cosine near-dup via sign-random-projection buckets
  */
object Dedup {

  /** Exact dedup: every row tagged with the canonical (minimum) id of its
    * identical-text group. Output: idCol, canonical_id, is_dup.
    *
    * Scale-safe plan: groups on the NARROW `(xxhash64(text), length(text))`
    * key — 16 fixed bytes through the agg exchange instead of the full
    * document text — then verifies candidates by comparing the actual text
    * against the group minimum's text (`min_by` carries exactly one text
    * per group through map-side partial agg). Rows that hash-collide with a
    * different text (vanishingly rare at 64 bits + length, but exactness is
    * the contract) fall to a full-text re-group among themselves only.
    * `hashFn` is injectable so the collision path is testable with a weak
    * hash (DedupExactSpec proves equality under a 1-bit hash).
    */
  def exact(df: DataFrame, idCol: String, textCol: String,
            hashFn: Column => Column = xxhash64(_)): DataFrame = {
    val d = df.select(col(idCol), col(textCol))
      .withColumn("__h", hashFn(col(textCol)))
      .withColumn("__l", length(col(textCol)))
    val canon = d.groupBy(col("__h"), col("__l"))
      .agg(min(col(idCol)).as("__cand"), min_by(col(textCol), col(idCol)).as("__ct"))
    val joined = d.join(canon, Seq("__h", "__l"))
    val matched = joined.where(col(textCol) === col("__ct"))
      .select(col(idCol), col("__cand").as("canonical_id"))
    // collision stragglers: every row of a colliding text lands here (none
    // matches the group-min text), so a per-text min over just these rows
    // yields the correct canonical id
    val stragglers = joined.where(col(textCol) =!= col("__ct"))
    val fixed = stragglers
      .join(stragglers.groupBy(col(textCol)).agg(min(col(idCol)).as("canonical_id")),
        Seq(textCol))
      .select(col(idCol), col("canonical_id"))
    matched.unionByName(fixed)
      .withColumn("is_dup", col(idCol) =!= col("canonical_id"))
      .select(col(idCol), col("canonical_id"), col("is_dup"))
  }

  /** Streaming twin of [[exact]]: one surviving row per distinct text over
    * an unbounded stream, keyed by the narrow `(xxhash64(text), length)`
    * pair. Across micro-batches the first-arriving group wins; WITHIN a
    * batch (or on a batch frame) the surviving row of a group is an
    * arbitrary engine pick, not a deterministic canonical — use [[exact]]
    * when the canonical id matters.
    *
    * HASH-distinct, not text-exact: streaming state cannot run the batch
    * verify + straggler re-group, so two DISTINCT texts that collide on
    * (64-bit hash, length) conflate with probability ~2^-64 per pair — use
    * the batch [[exact]] when absolute exactness is the contract. With
    * `eventTime = Some((col, delay))` a watermark is applied and state is
    * GC'd once a group's window passes (`dropDuplicatesWithinWatermark`);
    * without it state grows with the number of distinct documents. Works
    * identically on batch frames (proven in SessionIvfSpec).
    */
  def exactStreaming(df: DataFrame, idCol: String, textCol: String,
                     eventTime: Option[(String, String)] = None): DataFrame = {
    val keyed = df.withColumn("__h", xxhash64(col(textCol)))
      .withColumn("__l", length(col(textCol)))
    val out = eventTime match {
      case Some((c, delay)) =>
        keyed.withWatermark(c, delay).dropDuplicatesWithinWatermark("__h", "__l")
      case None => keyed.dropDuplicates("__h", "__l")
    }
    out.drop("__h", "__l")
  }

  /** MinHash-LSH candidate pairs, Jaccard-verified.
    * Probability a pair with Jaccard j collides: 1-(1-j^r)^b with
    * r = numHashes/bands rows per band.
    *
    * Default r=8, b=16 (128 hashes): tuned for NEAR-dup detection — a pair
    * at j=0.9 is caught with p≈0.9999, at j=0.8 with p≈0.95, while a
    * corpus-typical pair at j=0.3 collides with p≈1e-3 so band buckets stay
    * tiny and the candidate set stays linear. (Wider bands, e.g. r=4, look
    * more sensitive but DEGENERATE on homogeneous corpora: when every
    * document shares the globally-minimal shingles, 4-row buckets grow to
    * thousands of members and the candidate join goes quadratic — measured
    * as a multi-minute hang at just 10k docs.)
    *
    * Candidates are deduped on (id_a, id_b) BEFORE texts are re-attached, so
    * the wide text column never rides through the shuffle.
    * Output: id_a < id_b, jaccard (>= threshold).
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 16, shingle: Int = 5,
      threshold: Double = 0.6): DataFrame = {
    val r = numHashes / bands
    val sig = df.select(col(idCol).as("__id"),
      minhash_sig(col(textCol), lit(numHashes), lit(shingle)).as("__sig"))
    // band hash = xxhash64 over the band's slice of the signature
    val banded = sig
      .withColumn("__band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("__bh", xxhash64(col("__band"), slice(col("__sig"), col("__band") * r + 1, lit(r))))
      .select("__id", "__band", "__bh")
    val a = banded.select(col("__band").as("ba"), col("__bh").as("ha"), col("__id").as("id_a"))
    val b = banded.select(col("__band").as("bb"), col("__bh").as("hb"), col("__id").as("id_b"))
    val cand = a.join(b, col("ba") === col("bb") && col("ha") === col("hb") && col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val ta = df.select(col(idCol).as("id_a"), col(textCol).as("ta"))
    val tb = df.select(col(idCol).as("id_b"), col(textCol).as("tb"))
    cand.join(ta, Seq("id_a")).join(tb, Seq("id_b"))
      .withColumn("jaccard", ngram_jaccard(col("ta"), col("tb"), lit(shingle)))
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup pairs: 4×16-bit band buckets guarantee recall for
    * hamming distance <= 3 (pigeonhole: any 3 flipped bits leave one band
    * intact); verified with bit_count(a^b). Output: id_a < id_b, hamming. */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingle: Int = 5, maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("__id"), simhash64(col(textCol), lit(shingle)).as("__sh"))
    val banded = sig.withColumn("__band", explode(sequence(lit(0), lit(3))))
      .withColumn("__bh", expr("shiftrightunsigned(__sh, __band * 16) & 65535"))
    val a = banded.select(col("__band").as("ba"), col("__bh").as("ha"),
      col("__id").as("id_a"), col("__sh").as("sha"))
    val b = banded.select(col("__band").as("bb"), col("__bh").as("hb"),
      col("__id").as("id_b"), col("__sh").as("shb"))
    a.join(b, col("ba") === col("bb") && col("ha") === col("hb") && col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sha").bitwiseXOR(col("shb"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming").distinct()
  }

  /** Embedding cosine near-dups: sign-random-projection signature buckets
    * (exact-duplicate-oriented: high thresholds → few bits differ), verified
    * with exact cosine. Output: id_a < id_b, cosine. */
  def embeddingPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, bits: Int = 16, seed: Long = 42L): DataFrame = {
    val sig = df.select(col(idCol).as("__id"), col(vecCol).as("__v"),
      hyperplane_sig(col(vecCol), lit(bits), lit(seed)).as("__sig"))
    val a = sig.select(col("__sig").as("sa"), col("__id").as("id_a"), col("__v").as("va"))
    val b = sig.select(col("__sig").as("sb"), col("__id").as("id_b"), col("__v").as("vb"))
    a.join(b, col("sa") === col("sb") && col("id_a") < col("id_b"))
      .withColumn("cosine", vec_cosine(col("va"), col("vb")))
      .where(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
