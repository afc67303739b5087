package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-LEVEL statistics — the vocabulary / heavy-hitter pass a
  * tokenizer-training or corpus-audit pipeline runs before anything else:
  * which n-grams dominate, how widely they spread (document frequency),
  * and what the frequency head looks like.
  *
  * Everything here is built for the 100 TB shape: tokenization and n-gram
  * assembly are narrow maps, aggregation is two-phase so hot grams never
  * arrive anywhere as one-row-per-occurrence, and top-k is a TakeOrdered
  * (per-partition heaps merged on the driver), never a global sort.
  */
object CorpusStats {

  /** Lower-cased whitespace tokens of one document. Tokenization is
    * deliberately engine-reproducible (split on `\s+`, empties dropped,
    * ASCII-stable lower) so corpus statistics can be cross-checked against
    * any ANSI engine. */
  def wordTokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Word n-grams from an ALREADY-MATERIALIZED token array column.
    *
    * The token argument must be a bound column, not the tokenization
    * expression itself: higher-order functions are CodegenFallback, and an
    * expression tree referenced at each `element_at` site inside the lambda
    * re-evaluates PER ELEMENT — lower+split+filter per n-gram turned the
    * per-document cost O(tokens²) (measured: 10 s for a 5k-doc bigram
    * count that takes 0.5 s with a materialized column). */
  def ngramsFromTokens(toks: Column, n: Int): Column = {
    require(n >= 1, s"n-gram order must be >= 1, got $n")
    if (n == 1) toks
    else {
      val m = size(toks) - (n - 1)
      // CaseWhen evaluates lazily, so sequence(1, m) only runs when m >= 1
      // (Spark's sequence DESCENDS for start > stop instead of returning [])
      when(m >= 1,
        transform(sequence(lit(1), m),
          i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
        .otherwise(array().cast("array<string>"))
    }
  }

  /** [[ngramsFromTokens]] ∘ [[wordTokens]] — convenience for SINGLE-use
    * sites (tests, ad-hoc selects). Corpus-scale flows materialize the
    * tokens first; see [[ngramsFromTokens]]. */
  def wordNgrams(text: Column, n: Int): Column =
    ngramsFromTokens(wordTokens(text), n)

  /** One (doc, gram) row per n-gram occurrence, via the one-pass
    * [[TextFunctions.word_ngrams]] codegen kernel — NOT the
    * transform/sequence/element_at lambda chain ([[ngramsFromTokens]]),
    * which is CodegenFallback and costs ~µs per gram interpreted (measured
    * 5x the whole downstream aggregation); kernel ≡ lambda is spec-pinned. */
  private def gramRows(df: DataFrame, docCol: String, textCol: String,
                       n: Int): DataFrame =
    df.select(col(docCol).as("__doc"),
      explode(TextFunctions.word_ngrams(col(textCol), lit(n))).as("gram"))

  /** PUBLIC (doc, gram) occurrence stream — the materialization point for
    * flows that need BOTH corpus statistics and featurization over the same
    * corpus: compute the O(tokens) explode once, `localCheckpoint` it, and
    * feed [[vocabularyOfRows]] + [[bowRowsOfGrams]] (Spark shares identical
    * exchanges, never identical subtrees, so two operator calls over the
    * same df would otherwise each run the n-gram kernel). Columns:
    * `__doc`, `gram`. */
  def gramRowsOf(df: DataFrame, docCol: String, textCol: String,
                 n: Int): DataFrame = gramRows(df, docCol, textCol, n)

  /** Corpus-wide n-gram frequency table: one row per distinct gram with its
    * total occurrence count and document frequency.
    *
    * TWO-PHASE aggregation, deliberately not one `groupBy(gram)`:
    * phase 1 reduces to per-(doc, gram) counts — map-side partial combine
    * bounds the first exchange by each document's DISTINCT grams — and
    * phase 2 aggregates those pre-reduced rows per gram, where partial
    * aggregation again collapses a hot gram ("of the" at web scale) to one
    * row per task before the final exchange. Document frequency falls out
    * free as `count(*)` of phase-1 rows, with no `countDistinct` (which
    * would force an extra exchange keyed on the doc column). */
  def ngramStats(df: DataFrame, docCol: String, textCol: String,
                 n: Int): DataFrame =
    ngramStatsOfRows(gramRows(df, docCol, textCol, n))

  /** [[ngramStats]] over a pre-exploded [[gramRowsOf]] stream. */
  def ngramStatsOfRows(grams: DataFrame): DataFrame =
    grams
      .groupBy("__doc", "gram").agg(count(lit(1)).as("__c"))
      .groupBy("gram")
      .agg(sum("__c").as("total"), count(lit(1)).as("doc_freq"))

  /** Top-k corpus n-grams by total count, DETERMINISTICALLY ordered
    * (total DESC, then gram ASC — a total order, so the selected k-set is
    * engine-independent even with count ties at the boundary). `minCount`
    * prunes the long tail before the limit; the plan stays a TakeOrdered,
    * never a full sort. */
  def topNgrams(df: DataFrame, docCol: String, textCol: String, n: Int,
                k: Int, minCount: Long = 1L): DataFrame =
    ngramStats(df, docCol, textCol, n)
      .where(col("total") >= minCount)
      .orderBy(col("total").desc, col("gram"))
      .limit(k)

  /** [[topNgrams]] with a dense 1-based `vocab_id` in the same total order.
    * The single-partition window is fine HERE and only here: its input is
    * the already-limited k-row vocabulary, not the corpus. */
  def vocabulary(df: DataFrame, docCol: String, textCol: String, n: Int,
                 k: Int, minCount: Long = 1L): DataFrame =
    vocabularyOfRows(ngramStatsOfRows(gramRowsOf(df, docCol, textCol, n)),
      k, minCount)

  /** [[vocabulary]] over pre-computed [[ngramStatsOfRows]] output. */
  def vocabularyOfRows(stats: DataFrame, k: Int,
                       minCount: Long = 1L): DataFrame =
    stats
      .where(col("total") >= minCount)
      .orderBy(col("total").desc, col("gram"))
      .limit(k)
      .withColumn("vocab_id", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("total").desc, col("gram"))))

  /** Bag-of-words featurization: one (doc, vocab_id, tf) row per document
    * × vocabulary gram it contains — the sparse doc-term matrix in
    * relational form.
    *
    * The vocabulary is BROADCAST and joined BEFORE any aggregation, so the
    * exploded gram stream is filtered down to vocabulary hits while still
    * narrow — the only exchange is the final (doc, vocab_id) count, over
    * hits only. Joining after a per-doc pre-aggregation would instead
    * shuffle every distinct gram of every document. */
  def bowRows(df: DataFrame, docCol: String, textCol: String,
              vocab: DataFrame, n: Int): DataFrame =
    bowRowsOfGrams(gramRows(df, docCol, textCol, n), docCol, vocab)

  /** [[bowRows]] over a pre-exploded [[gramRowsOf]] stream. */
  def bowRowsOfGrams(grams: DataFrame, docCol: String,
                     vocab: DataFrame): DataFrame =
    grams
      .join(broadcast(vocab.select("gram", "vocab_id")), "gram")
      .groupBy("__doc", "vocab_id").agg(count(lit(1)).as("tf"))
      .select(col("__doc").as(docCol), col("vocab_id"), col("tf"))

  /** Integer-exact tf-idf retrieval over the corpus: score(doc) =
    * Σ_term tf(term, doc) · (N·1000 div df(term)) over the query's distinct
    * lower-cased terms, top-k by (score DESC, doc ASC) — a TOTAL order, so
    * the k-boundary set is engine-exact (the q68 discipline) — with a
    * log-free floor-scaled integer idf (rarer term ⇒ larger weight) that
    * any engine reproduces bit-for-bit.
    *
    * Plan: the exploded token stream filters to the query's literal term
    * set BEFORE any exchange, so only query-term hits shuffle; document
    * frequency is derived from those hits and BROADCAST back with the
    * corpus count (computed in-plan — no eager job); the top-k is a
    * TakeOrdered, never a global sort. At 10^12 docs the shuffled volume
    * is the hit rows of a handful of terms, not the corpus. */
  def tfidfSearch(df: DataFrame, docCol: String, textCol: String,
                  query: String, k: Int): DataFrame = {
    val terms = query.toLowerCase.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "query must contain at least one term")
    val hits = df.select(col(docCol).as("__doc"),
        explode(TextFunctions.word_ngrams(col(textCol), lit(1))).as("t"))
      .where(col("t").isin(terms: _*))
    val tf    = hits.groupBy("__doc", "t").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("t").agg(count(lit(1)).as("df"))
    val nDf   = df.agg(count(lit(1)).as("__n"))
    val idf   = dfreq.crossJoin(nDf).withColumn("idf", expr("(__n * 1000) div df"))
    tf.join(broadcast(idf.select("t", "idf")), "t")
      .groupBy("__doc").agg(sum(col("tf") * col("idf")).as("score"))
      .orderBy(col("score").desc, col("__doc"))
      .limit(k)
      .select(col("__doc").as(docCol), col("score"))
  }

  /** Incremental corpus statistics — the per-crawl accumulation pattern:
    * each arriving shard writes its OWN n-gram partials (one subdirectory
    * per shard id; re-running a shard overwrites idempotently), and readers
    * merge by re-aggregating. total is additive unconditionally; doc_freq
    * is additive as long as each document lives in exactly one shard (the
    * crawl-shard invariant). Chained streaming aggregations are unsupported
    * in Structured Streaming, so this foreachBatch-shaped design IS the
    * streaming story for corpus stats — and it doubles as the resumable
    * batch one. */
  def appendNgramShard(df: DataFrame, docCol: String, textCol: String,
                       n: Int, dir: String, shardId: String): Unit =
    ngramStats(df, docCol, textCol, n)
      .write.mode("overwrite").parquet(s"$dir/shard=$shardId")

  /** Merged view over every shard's partials (sum of partial sums — exact
    * under the one-shard-per-document invariant). */
  def ngramStatsFrom(spark: org.apache.spark.sql.SparkSession,
                     dir: String): DataFrame =
    spark.read.parquet(dir).groupBy("gram")
      .agg(sum("total").as("total"), sum("doc_freq").as("doc_freq"))

  /** [[topNgrams]] over the accumulated shards. */
  def topNgramsFrom(spark: org.apache.spark.sql.SparkSession, dir: String,
                    k: Int, minCount: Long = 1L): DataFrame =
    ngramStatsFrom(spark, dir)
      .where(col("total") >= minCount)
      .orderBy(col("total").desc, col("gram"))
      .limit(k)

  /** One-row corpus audit profile: document/char/token totals, empty-doc
    * and distinct-text counts, and DISCRETE token-count percentiles
    * (`percentile_disc` semantics: smallest value whose cumulative
    * distribution reaches p — an actual data value, integer-exact across
    * engines).
    *
    * The percentiles deliberately do NOT use Spark's `percentile_disc`
    * aggregate, which buffers every input value in one reducer — at corpus
    * scale that single group holds one entry per document. Instead the
    * token counts first collapse to a VALUE HISTOGRAM (bounded by the max
    * token count, not the corpus size; two-phase partial aggregation), and
    * the percentile scan runs over that small table — the only
    * single-partition work is a window over distinct token-count values.
    * Equivalence to `percentile_disc` is differentially spec-pinned.
    *
    * Scale note: `n_distinct_texts` counts distinct over the exact-dedup
    * key discipline ([[Dedup.exact]]'s narrow `(xxhash64(text),
    * length(text))` pair) — the partial-distinct exchange carries 16
    * bytes/row instead of distinct FULL documents. Semantics are
    * hash-distinct: equal to the true distinct count unless two distinct
    * equal-length texts collide in 64 bits (~2^-64 per pair — the
    * [[Dedup.exactStreaming]] caveat), which is why the q71 oracle's
    * `count(DISTINCT text)` remains a valid twin. */
  def corpusProfile(df: DataFrame, docCol: String, textCol: String,
                    ps: Seq[Double] = Seq(0.1, 0.5, 0.9, 0.99)): DataFrame = {
    val nt = TextOps.tokenCountWs(col(textCol)).cast("long")
    val base = df.select(col(docCol).as("__doc"), col(textCol).as("__text"), nt.as("__nt"))
    val simple = base.agg(
      count(lit(1)).as("n_docs"),
      sum(length(col("__text"))).as("n_chars"),
      sum(col("__nt")).as("n_tokens"),
      min(col("__nt")).as("tok_min"),
      max(col("__nt")).as("tok_max"),
      count(when(col("__nt") === 0, 1)).as("n_empty"),
      countDistinct(xxhash64(col("__text")), length(col("__text")))
        .as("n_distinct_texts"))
    val hist = base.groupBy(col("__nt").as("v")).agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum("cnt").over(org.apache.spark.sql.expressions.Window.orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    // cume_dist >= p, with the ratio computed in double exactly as the
    // built-in does (pinned differentially in the spec)
    val pctCols = ps.map(p =>
      min(when(col("cum").cast("double") / col("__n") >= p, col("v")))
        .as(s"tok_p${(p * 100).round}"))
    val pcts = cum.crossJoin(simple.select(col("n_docs").as("__n")))
      .agg(pctCols.head, pctCols.tail: _*)
    simple.crossJoin(pcts)
  }
}
