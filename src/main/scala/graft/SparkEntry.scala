package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.geo.join.SpatialJoins
import graft.geo.sql.GeoFunctions
import graft.geo.sql.GeoFunctions._
import graft.ops.{CorpusStats, Dedup, Multimodal, Similarity, Sketches, TextFunctions, TextOps}
import graft.ops.TextFunctions._
import graft.pipeline.{GeoImagePipeline, ImageGen}

/** Driver contract (SURVEY.md §7): every implemented operator surfaces as a
  * `queries` entry over the driver testdata; `oracleSql` holds the DuckDB
  * equivalent where ANSI-SQL-expressible (geometry synthesized from key
  * columns with pure integer arithmetic so the oracle reproduces it exactly;
  * FIXTURES.md "Engine-side synthetic inputs").
  */
object SparkEntry {

  private def registerAll(s: SparkSession): Unit = {
    GeoFunctions.register(s); TextFunctions.register(s); Multimodal.register(s)
    Sketches.register(s)
  }

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** Redistribute a DENSE but single-split scan across the session's cores
    * (guide §2.5 "input skew … repartition immediately after the read"):
    * one compact parquet file under `maxPartitionBytes` plans ONE scan task
    * regardless of row count, serializing all downstream per-row work on a
    * many-core session (measured: q07's 600k-row partial aggregate ran
    * 0.73 s single-task). SCALE-ADAPTIVE, not a constant: fires only when
    * the planned scan parallelism is a small fraction of the session's
    * cores AND the input is big enough for the shuffle to pay for itself —
    * a production table whose files already split into ≥ cores tasks
    * passes through untouched, so no shuffle is ever added at scale. */
  private def spread(df: DataFrame, keys: Seq[Column] = Seq.empty,
                     minBytes: Long = 1L << 20): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    val parts = df.queryExecution.toRdd.getNumPartitions // planning only — no job
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (parts * 2 <= cores && bytes > minBytes) {
      // hash-repartition on a caller-supplied high-cardinality key when one
      // exists — a keyless round-robin repartition first pays a local sort
      // of its input (spark.sql.execution.sortBeforeRepartition, guide
      // §2.5), which measured as a net LOSS on the dense aggs here
      if (keys.nonEmpty) df.repartition(cores, keys: _*) else df.repartition(cores)
    } else df
  }

  /** Deterministic world-wide point per customer (same formula in SQL). */
  private def customerPoints(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "customer"))
      .withColumn("lng", (col("c_custkey") * 7919L % 36000L) / 100.0 - 180.0)
      .withColumn("lat", (col("c_custkey") * 104729L % 16800L) / 100.0 - 84.0)
  private val customerPointsSql =
    """SELECT *, (c_custkey * 7919 % 36000)/100.0 - 180.0 AS lng,
      |          (c_custkey * 104729 % 16800)/100.0 - 84.0 AS lat FROM customer""".stripMargin

  /** Five axis-aligned region boxes with .005 offsets (no point ever on a
    * boundary: points live on the .01 grid). */
  private def regionBoxes(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(t(dir, "region"))
      .withColumn("w", lit(-170.005) + col("r_regionkey") * 66.0)
      .withColumn("e", col("w") + 40.0)
      .withColumn("sS", lit(-60.005) + col("r_regionkey") * 25.0)
      .withColumn("n", col("sS") + 35.0)
  private val regionBoxesSql =
    """SELECT *, -170.005 + r_regionkey * 66.0 AS w,
      |          -170.005 + r_regionkey * 66.0 + 40.0 AS e,
      |          -60.005 + r_regionkey * 25.0 AS s,
      |          -60.005 + r_regionkey * 25.0 + 35.0 AS n FROM region""".stripMargin

  /** Region boxes as GeoJSON Polygon text → packed geometry (exercises the
    * parse path inside the join pipeline). */
  private def regionPolys(s: SparkSession, dir: String): DataFrame = {
    val b = regionBoxes(s, dir)
    val json = concat(lit("""{"type":"Polygon","coordinates":[[["""),
      col("w").cast("string"), lit(","), col("sS").cast("string"), lit("],["),
      col("e").cast("string"), lit(","), col("sS").cast("string"), lit("],["),
      col("e").cast("string"), lit(","), col("n").cast("string"), lit("],["),
      col("w").cast("string"), lit(","), col("n").cast("string"), lit("],["),
      col("w").cast("string"), lit(","), col("sS").cast("string"), lit("]]]}"))
    b.select(col("r_regionkey"), from_geojson_geom(json).as("geom"))
  }

  /** Images table lng/lat formula in SQL over DuckDB's range(). */
  private def imagesSqlCte(n: Int) =
    s"""WITH img AS (
       |  SELECT range AS id, (range * 48271 % 2147483647) AS h FROM range($n)
       |), pts AS (
       |  SELECT id, (h % 36000)/100.0 - 180.0 AS lng,
       |         ((h // 36000) % 16800)/100.0 - 84.0 AS lat FROM img
       |)""".stripMargin

  private val haversineSql =
    """2.0 * 6371008.8 * asin(least(1.0, sqrt(
      |  pow(sin(radians(lat - qlat) / 2), 2) +
      |  cos(radians(qlat)) * cos(radians(lat)) * pow(sin(radians(lng - qlng) / 2), 2)
      |)))""".stripMargin

  /** q69's GRB1 xorshift64 pixel-stream replay, extended one step to a
    * per-PIXEL integer luma CTE `px(id, p, luma)` (luma = 299r+587g+114b;
    * `img(id, w, h, …)` stays visible). Shared by the q77/q78 oracles. */
  private def grb1LumaSql(n: Int) =
    s"""WITH RECURSIVE img AS (
       |  SELECT range AS id, CAST(8 + range % 9 AS BIGINT) AS w,
       |         CAST(8 + range % 7 AS BIGINT) AS h, (range % 3 = 0) AS lossy,
       |         CAST(8 + range % 9 AS BIGINT) * (8 + range % 7) * 3 AS nb
       |  FROM range($n)),
       |cfg AS (SELECT id, lossy, nb, (nb - 8) // 8 + 1 AS nchunks,
       |         nb - ((nb - 8) // 8 + 1) * 8 AS nrem FROM img),
       |steps AS (
       |  SELECT id, CAST(0 AS BIGINT) AS k,
       |         CAST(id * 2654435761 + 1442695040888963407 AS UBIGINT) AS x,
       |         nchunks, nrem
       |  FROM cfg
       |  UNION ALL
       |  SELECT id, k + 1,
       |         CAST(xor(CAST(b AS HUGEINT), (CAST(b AS HUGEINT) * 131072) % CAST('18446744073709551616' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT) AS x,
       |         nchunks, nrem
       |  FROM (
       |    SELECT id, k, xor(a, a >> 7) AS b, nchunks, nrem
       |    FROM (
       |      SELECT id, k, CAST(xor(CAST(x AS HUGEINT), (CAST(x AS HUGEINT) * 8192) % CAST('18446744073709551616' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT) AS a,
       |             nchunks, nrem
       |      FROM steps WHERE k < nchunks + nrem))),
       |bytes_ AS (
       |  SELECT s.id, (s.k - 1) * 8 + b.j AS pos,
       |         CAST((s.x >> CAST(b.j * 8 AS INT)) % 256 AS BIGINT) AS v
       |  FROM steps s, (SELECT range AS j FROM range(8)) b
       |  WHERE s.k >= 1 AND s.k <= s.nchunks
       |  UNION ALL
       |  SELECT s.id, s.nchunks * 8 + (s.k - s.nchunks - 1) AS pos,
       |         CAST(s.x % 256 AS BIGINT) AS v
       |  FROM steps s WHERE s.k > s.nchunks),
       |q AS (
       |  SELECT b.id, b.pos,
       |         CASE WHEN c.lossy THEN least(252, (b.v + 2) // 4 * 4) ELSE b.v END AS v
       |  FROM bytes_ b JOIN cfg c USING (id)
       |  WHERE b.pos < c.nb),
       |px AS (
       |  SELECT id, pos // 3 AS p,
       |         CAST(sum(CASE pos % 3 WHEN 0 THEN 299 * v WHEN 1 THEN 587 * v ELSE 114 * v END) AS BIGINT) AS luma
       |  FROM q GROUP BY id, pos // 3)""".stripMargin

  /** DuckDB mix64 replay (q66's 32-bit-split HUGEINT multiplies mod 2^64):
    * emits six chained CTEs `${tag}0..${tag}5` over `src`, carrying `cols`
    * through and hashing the UBIGINT expression `in` into column `h` of
    * `${tag}5`. Shared by the q86/q87/q88 oracles. */
  private def mix64Sql(tag: String, src: String, cols: String, in: String): String = {
    def mul(c: String) =
      s"""CAST((
         |    (CAST('$c' AS HUGEINT) * (x % 4294967296)) % CAST('18446744073709551616' AS HUGEINT)
         |    + ((CAST('$c' AS HUGEINT) % 4294967296) * (x >> 32)) % 4294967296 * 4294967296
         |  ) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)""".stripMargin
    s"""${tag}0 AS (SELECT $cols,
       |    CAST((CAST($in AS HUGEINT) + 11400714819323198485) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT) AS x
       |  FROM $src),
       |${tag}1 AS (SELECT $cols, xor(x, x >> 30) AS x FROM ${tag}0),
       |${tag}2 AS (SELECT $cols, ${mul("13787848793156543929")} AS x FROM ${tag}1),
       |${tag}3 AS (SELECT $cols, xor(x, x >> 27) AS x FROM ${tag}2),
       |${tag}4 AS (SELECT $cols, ${mul("10723151780598845931")} AS x FROM ${tag}3),
       |${tag}5 AS (SELECT $cols, xor(x, x >> 31) AS h FROM ${tag}4)""".stripMargin
  }

  /** VID1 per-(video, frame) xorshift64 raster replay through the byte CTE
    * `bb(id, fr, pos, v)` (q69's machinery keyed on (id, fr), seed WRAPS
    * mod 2^64; `vids(id, w, h, nf)` stays visible). Shared by q75/q84. */
  private def vid1BytesSql(n: Int) =
    s"""WITH RECURSIVE vids AS (
       |  SELECT range AS id, CAST(8 + range % 5 AS BIGINT) AS w,
       |         CAST(6 + range % 4 AS BIGINT) AS h, CAST(4 + range % 3 AS BIGINT) AS nf
       |  FROM range($n)),
       |fr AS (SELECT v.id, f.range AS fr, v.w * v.h * 3 AS nb
       |  FROM vids v, range(6) f WHERE f.range < v.nf),
       |cfg AS (SELECT id, fr, nb, (nb - 8) // 8 + 1 AS nchunks,
       |         nb - ((nb - 8) // 8 + 1) * 8 AS nrem,
       |         CAST((CAST(id * 131 + fr * 2654435761 AS HUGEINT) * 2654435761
       |               + 1442695040888963407) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT) AS seed
       |  FROM fr),
       |steps AS (
       |  SELECT id, fr, CAST(0 AS BIGINT) AS k, seed AS x, nchunks, nrem FROM cfg
       |  UNION ALL
       |  SELECT id, fr, k + 1,
       |         CAST(xor(CAST(b AS HUGEINT), (CAST(b AS HUGEINT) * 131072) % CAST('18446744073709551616' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT),
       |         nchunks, nrem
       |  FROM (
       |    SELECT id, fr, k, xor(a, a >> 7) AS b, nchunks, nrem
       |    FROM (
       |      SELECT id, fr, k, CAST(xor(CAST(x AS HUGEINT), (CAST(x AS HUGEINT) * 8192) % CAST('18446744073709551616' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT) AS a,
       |             nchunks, nrem
       |      FROM steps WHERE k < nchunks + nrem))),
       |bytes_ AS (
       |  SELECT s.id, s.fr, (s.k - 1) * 8 + b.j AS pos,
       |         CAST((s.x >> CAST(b.j * 8 AS INT)) % 256 AS BIGINT) AS v
       |  FROM steps s, (SELECT range AS j FROM range(8)) b
       |  WHERE s.k >= 1 AND s.k <= s.nchunks
       |  UNION ALL
       |  SELECT s.id, s.fr, s.nchunks * 8 + (s.k - s.nchunks - 1) AS pos, CAST(s.x % 256 AS BIGINT) AS v
       |  FROM steps s WHERE s.k > s.nchunks),
       |bb AS (SELECT b.id, b.fr, b.pos, b.v
       |  FROM bytes_ b JOIN cfg c USING (id, fr) WHERE b.pos < c.nb)""".stripMargin

  /** [[grb1LumaSql]] extended to the per-image 64-bit average hash: CTE
    * `hashes(id, ahash)` — per-block luma sums, HUGEINT cross-multiplication
    * threshold, hash re-assembled as a sum of distinct powers of two (bit 63
    * contributes the sign-bit value, so the signed BIGINT matches Spark's
    * long bit-for-bit). Shared by the q77/q80 oracles. */
  private def grb1AhashSql(n: Int) =
    grb1LumaSql(n) +
      """,
        |blk AS (
        |  SELECT px.id,
        |         CAST((px.p // i.w) * 8 // i.h * 8 + (px.p % i.w) * 8 // i.w AS INT) AS b,
        |         sum(px.luma) AS bsum, count(*) AS bcnt
        |  FROM px JOIN img i USING (id)
        |  GROUP BY 1, 2),
        |tot AS (SELECT id, sum(bsum) AS tsum, sum(bcnt) AS n FROM blk GROUP BY id),
        |bits AS (
        |  SELECT blk.id, blk.b
        |  FROM blk JOIN tot USING (id)
        |  WHERE CAST(blk.bsum AS HUGEINT) * tot.n > CAST(tot.tsum AS HUGEINT) * blk.bcnt),
        |hashes AS (
        |  SELECT i.id,
        |    CAST(coalesce(sum(CASE WHEN t.b = 63 THEN -9223372036854775807 - 1
        |                           ELSE CAST(1 AS BIGINT) << t.b END), 0) AS BIGINT) AS ahash
        |  FROM img i LEFT JOIN bits t ON t.id = i.id
        |  GROUP BY i.id)""".stripMargin

  // ------------------------------------------------------------- flagship

  /** Flagship query on sf=0.001: the north-rule job — PIP join of the
    * image+caption table against the GeoJSON fixture polygons, tiled. */
  def entry(spark: SparkSession): DataFrame = {
    registerAll(spark)
    val dir = java.nio.file.Files.createTempDirectory("graft_entry").toString
    GeoImagePipeline.run(spark, nImages = 2000, workDir = dir, z = 8, res = 4).joined
  }

  // --------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- GeoJSON parse/serialize surface (SURVEY.md §2.1/§2.2)
    "q01_parse_extract" -> ((s, dir) => {
      registerAll(s)
      val pts  = customerPoints(s, dir)
      val json = concat(lit("""{"type":"Point","coordinates":["""),
        col("lng").cast("string"), lit(","), col("lat").cast("string"), lit("]}"))
      val g = from_geojson_geom(json)
      pts.select(col("c_custkey"),
        st_geometry_type(g).as("gtype"),
        element_at(g.getField("coords"), 1).as("lng"),
        element_at(g.getField("coords"), 2).as("lat"))
    }),
    "q02_roundtrip" -> ((s, dir) => {
      registerAll(s)
      val pts  = customerPoints(s, dir)
      val json = concat(lit("""{"type":"Point","coordinates":["""),
        col("lng").cast("string"), lit(","), col("lat").cast("string"), lit("]}"))
      val back = from_geojson_geom(to_geojson_geom(from_geojson_geom(json)))
      // rounded to 2dp: the reference serializes floats with %.16g
      // (jsone.ml:818) which is NOT always ulp-exact on re-parse, and we
      // mirror that faithfully — the 2-decimal grid survives it exactly
      pts.select(col("c_custkey"),
        round(element_at(back.getField("coords"), 1), 2).as("lng"),
        round(element_at(back.getField("coords"), 2), 2).as("lat"))
    }),
    "q03_pip_join" -> ((s, dir) => {
      registerAll(s)
      SpatialJoins.pipJoin(customerPoints(s, dir), "lng", "lat",
          regionPolys(s, dir), "geom", res = 2)
        .select(col("c_custkey"), col("r_regionkey"))
    }),
    "q04_knn" -> ((s, dir) => {
      registerAll(s)
      val qs = s.read.parquet(t(dir, "nation"))
        .withColumn("qlng", (col("n_nationkey") * 104729L % 36000L) / 100.0 - 180.0)
        .withColumn("qlat", (col("n_nationkey") * 7919L % 16800L) / 100.0 - 84.0)
        .select("n_nationkey", "qlng", "qlat")
      SpatialJoins.knnJoin(qs, "n_nationkey", "qlng", "qlat",
          customerPoints(s, dir).select("c_custkey", "lng", "lat"), "lng", "lat",
          k = 3, res = 2)
        .select(col("n_nationkey"), col("c_custkey"), col("rank"))
    }),
    "q05_tiles" -> ((s, dir) => {
      registerAll(s)
      SpatialJoins.assignTiles(customerPoints(s, dir), "lng", "lat", z = 10)
        .select(col("c_custkey"), col("tile_x").as("tx"), col("tile_y").as("ty"))
    }),
    "q06_tile_rollup" -> ((s, dir) => {
      registerAll(s)
      SpatialJoins.assignTiles(customerPoints(s, dir), "lng", "lat", z = 6)
        .groupBy(col("tile_x").as("tx"), col("tile_y").as("ty"))
        .agg(count(lit(1)).as("n"))
    }),
    "q26_parse_errors" -> ((s, dir) => {
      // geojson_error is struct<msg,line,col> (decode errors located at the
      // end of the decoded value — both docs are single-line, so col=len+1)
      registerAll(s)
      val docs = s.read.parquet(t(dir, "documents"))
      val bad = when(col("doc_id") % 2 === 0,
          lit("""{"type":"Wibble","coordinates":[]}"""))
        .otherwise(lit("""{"notype":1}"""))
      val e = geojson_error(bad)
      docs.select(col("doc_id"), e.getField("msg").as("err"),
        e.getField("line").as("eline"), e.getField("col").as("ecol"))
    }),
    "q27_fold_props" -> ((s, dir) => {
      // fold_props equivalent (geojsone.ml:244-257): collect distinct names
      registerAll(s)
      val nation = s.read.parquet(t(dir, "nation"))
      val fjson = concat(lit("""{"type":"Feature","properties":{"name":""""),
        col("n_name"), lit(""""}}"""))
      nation.select(get_json_object(
          from_geojson(fjson).getField("feature").getField("properties"), "$.name").as("name"))
        .distinct()
    }),
    "q28_map_props" -> ((s, dir) => {
      // map_props equivalent (geojsone.ml:198-221): uppercase the name via
      // the GeoStreams operator (staged projections — parse once, small
      // codegen units), then re-parse the rewritten text to prove the loop
      registerAll(s)
      val nation = s.read.parquet(t(dir, "nation"))
      val fjson = concat(lit("""{"type":"Feature","properties":{"name":""""),
        col("n_name"), lit(""""}}"""))
      val mapped = graft.streaming.GeoStreams.mapProps(
        nation.withColumn("json", fjson), "json",
        p => concat(lit("""{"name":""""), upper(get_json_object(p, "$.name")), lit(""""}""")))
      mapped
        .withColumn("__back", from_geojson(col("json")))
        .select(col("n_nationkey"),
          get_json_object(col("__back.feature.properties"), "$.name").as("name"))
    }),

    // ---- relational baseline (Spark built-ins; SURVEY.md §2.4/§2.8)
    "q07_agg" -> ((s, dir) => {
      spread(s.read.parquet(t(dir, "lineitem")), Seq(col("l_orderkey")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(col("l_quantity")).cast("long").as("sum_qty"),
          count(lit(1)).as("n"),
          countDistinct(col("l_orderkey")).as("n_orders"))
    }),
    "q08_join_agg" -> ((s, dir) => {
      val o = spread(s.read.parquet(t(dir, "orders")), Seq(col("o_custkey")))
      val c = s.read.parquet(t(dir, "customer"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("o_totalprice") * 100.0, 0).cast("long")).as("revenue_cents"))
    }),
    "q09_window" -> ((s, dir) => {
      // keyed on the window's own partition key: the same one exchange both
      // spreads the scan and pre-satisfies the window's required
      // distribution (guide 2.4 - two operations keyed the same way share
      // one exchange)
      val o = spread(s.read.parquet(t(dir, "orders")), Seq(col("o_custkey")))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      o.withColumn("rank", row_number().over(w)).where(col("rank") <= 2)
        .select(col("o_custkey"), col("o_orderkey"), col("rank"))
    }),
    "q10_events" -> ((s, dir) => {
      spread(s.read.parquet(t(dir, "events")), Seq(col("user_id")))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("users"),
          sum(regexp_extract(col("props"), "(\\d+)", 1).cast("long")).as("sum_k"))
    }),

    // ---- training-data ops (dedup / similarity / text)
    "q11_dedup_exact" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents")).select("doc_id", "text")
      val corpus = docs.unionByName(
        docs.select((col("doc_id") + 10000L).as("doc_id"), col("text")))
      Dedup.exact(corpus, "doc_id", "text")
    }),
    "q12_tokens" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      docs.select(col("doc_id"),
        (length(col("text")) - length(replace(col("text"), lit(" "), lit(""))) + 1).as("n_tokens"),
        length(col("text")).as("n_chars_check"))
    }),
    "q13_quality_counts" -> ((s, dir) => {
      val docs = s.read.parquet(t(dir, "documents"))
      docs.select(col("doc_id"),
        (length(col("text")) - length(regexp_replace(col("text"), "[0-9]", ""))).as("n_digits"),
        (length(col("text")) - length(replace(col("text"), lit(" "), lit("")))).as("n_spaces"))
    }),
    "q14_lang_dist" -> ((s, dir) => {
      s.read.parquet(t(dir, "documents"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
    }),
    // Planted-pair contracts (q15/q16/q19): the corpus is the table plus an
    // EXACT copy of every row at id+10000. Identical text/vector ⇒ identical
    // signature ⇒ same band bucket, so LSH recall on the planted pairs is
    // provably 1.0 and the output (restricted to the planted (a, a+10000)
    // shape to exclude any natural near-dup pairs, whose recall is
    // probabilistic) is deterministic and SQL-oracle-checkable. Full
    // near-dup behavior (mutated texts, thresholds, recall) is spec-proven
    // in OpsSpec.
    "q15_minhash_dups" -> ((s, dir) => {
      registerAll(s)
      // NO spread here: parallelizing the signature pass re-partitions the
      // checkpointed band stream 32-way and inflates the candidate
      // self-join's AQE stages — measured flat-to-worse (1.15 -> 1.17 s,
      // 10 -> 231 tasks). The single-task kernel pass is cheaper than the
      // extra exchanges at any core count because the stream feeds an
      // exchange-bound join, unlike the narrow-map legs (q33/q64).
      val docs = s.read.parquet(t(dir, "documents")).select("doc_id", "text")
      val corpus = docs.unionByName(
        docs.select((col("doc_id") + 10000L).as("doc_id"), col("text")))
      Dedup.minhashPairs(corpus, "doc_id", "text", threshold = 0.6)
        .where(col("id_b") === col("id_a") + 10000L && col("id_a") < 10000L)
        .select(col("id_a"), col("id_b")) // jaccard (=1.0 here) excluded: fp-sensitive
    }),
    "q16_simhash_dups" -> ((s, dir) => {
      registerAll(s)
      val docs = s.read.parquet(t(dir, "documents")).select("doc_id", "text") // no spread: see q15
      val corpus = docs.unionByName(
        docs.select((col("doc_id") + 10000L).as("doc_id"), col("text")))
      Dedup.simhashPairs(corpus, "doc_id", "text").where(col("hamming") === 0)
        .where(col("id_b") === col("id_a") + 10000L && col("id_a") < 10000L)
        .select(col("id_a"), col("id_b"))
    }),
    "q17_ann_brute" -> ((s, dir) => {
      registerAll(s)
      val embs = s.read.parquet(t(dir, "embeddings"))
      val qs = embs.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.bruteForceTopK(qs, "qid", "qvec",
          embs.select(col("vec_id"), col("embedding")), "vec_id", "embedding", k = 3)
        .select(col("qid"), col("vec_id"), col("rank"))
    }),
    "q18_ann_lsh" -> ((s, dir) => {
      // deterministic LSH contract: a corpus-member query's own bucket
      // contains itself and cosine(self,self) is the unique maximum, so
      // rank 1 must be the query itself — this exercises signature,
      // multi-probe, bucket join, cosine and ranking end-to-end. Top-k
      // recall on near-neighbors (probabilistic) is spec-proven in OpsSpec.
      registerAll(s)
      val embs = s.read.parquet(t(dir, "embeddings"))
      val qs = embs.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.lshTopK(qs, "qid", "qvec",
        embs.select(col("vec_id"), col("embedding")), "vec_id", "embedding", k = 3, bits = 8)
        .where(col("rank") === 1)
        .select(col("qid"), col("vec_id"), col("rank"))
    }),
    "q19_embedding_dups" -> ((s, dir) => {
      registerAll(s)
      val embs = s.read.parquet(t(dir, "embeddings")).select("vec_id", "embedding") // no spread: see q15
      val corpus = embs.unionByName(
        embs.select((col("vec_id") + 10000L).as("vec_id"), col("embedding")))
      Dedup.embeddingPairs(corpus, "vec_id", "embedding", threshold = 0.999, bits = 12)
        .where(col("id_b") === col("id_a") + 10000L && col("id_a") < 10000L)
        .select(col("id_a"), col("id_b"))
    }),
    "q20_text_analysis" -> ((s, dir) => {
      // the SQL-expressible counting/quality columns (integer-valued, so the
      // oracle is exact); the custom-kernel columns live in q33 (rows-only)
      registerAll(s)
      val docs = s.read.parquet(t(dir, "documents"))
      val stop = size(filter(split(lower(col("text")), "\\s+"),
        w => w.isin("the", "and", "of", "to", "a", "in", "is", "that", "it", "for")))
      TextOps.withTokenCountWs(docs, "text")
        .select(col("doc_id"), col("n_tokens_ws"), stop.as("n_stopwords"),
          length(col("text")).as("n_chars_out"))
    }),
    "q33_text_fingerprints" -> ((s, dir) => {
      // the one IRREDUCIBLE custom text kernel: the lang-ID stopword vote
      // breaks score ties by Scala collection iteration order — dictionary
      // logic with no engine-reproducible ANSI-SQL twin → rows-only driver
      // check; semantics are spec-proven in OpsSpec (script detection,
      // planted stopword corpora). Winnowing is fully oracled as q66 and
      // the BPE-ish token count as q67.
      registerAll(s)
      TextOps.withLangId(
          spread(s.read.parquet(t(dir, "documents")), Seq(col("doc_id")), minBytes = 64 * 1024), "text")
        .select(col("doc_id"), col("lang_pred"))
    }),
    "q78_image_histogram" -> ((s, dir) => {
      // exposure audit: exact integer luma histogram (8 bins) per image,
      // exploded to (image_id, bin, n_px) rows — zero bins included, so the
      // oracle right-joins the full image × bin grid
      registerAll(s)
      ImageGen.table(s, 2000)
        .select(col("image_id"),
          posexplode(Multimodal.image_histogram(col("bytes"), lit(8))))
        .select(col("image_id"), col("pos").as("bin"), col("col").as("n_px"))
    }),
    "q95_validity" -> ((s, dir) => {
      // geometry-QA audit under the gate: valid boxes, bowtie
      // self-intersections, and stray holes in a deterministic rotation —
      // the reason strings are closed-form per residue class
      registerAll(s)
      val n = col("n_nationkey")
      val x = (n * 11 % 40 - 20).cast("double"); val y = (n * 13 % 30 - 15).cast("double")
      def s2(c: Column) = c.cast("string")
      def pt(a: Column, b: Column) = concat(lit("["), s2(a), lit(","), s2(b), lit("]"))
      val validBox = concat(lit("""{"type":"Polygon","coordinates":[["""),
        pt(x, y), lit(","), pt(x + 6, y), lit(","), pt(x + 6, y + 4), lit(","),
        pt(x, y + 4), lit(","), pt(x, y), lit("]]}"))
      val bowtie = concat(lit("""{"type":"Polygon","coordinates":[["""),
        pt(x, y), lit(","), pt(x + 7, y + 5), lit(","), pt(x + 7, y), lit(","),
        pt(x, y + 5), lit(","), pt(x, y), lit("]]}"))
      val strayHole = concat(lit("""{"type":"Polygon","coordinates":[["""),
        pt(x, y), lit(","), pt(x + 6, y), lit(","), pt(x + 6, y + 4), lit(","),
        pt(x, y + 4), lit(","), pt(x, y), lit("],["),
        pt(x + 20, y + 20), lit(","), pt(x + 20, y + 22), lit(","),
        pt(x + 22, y + 22), lit(","), pt(x + 22, y + 20), lit(","),
        pt(x + 20, y + 20), lit("]]}"))
      val json = when(n % 3 === 0, validBox).when(n % 3 === 1, bowtie)
        .otherwise(strayHole)
      s.read.parquet(t(dir, "nation"))
        .select(n, st_is_valid(from_geojson_geom(json)).as("ok"),
          st_valid_reason(from_geojson_geom(json)).as("reason"))
    }),
    "q94_dissolve" -> ((s, dir) => {
      // N-ary DISSOLVE under the gate: per nation, three integer boxes
      // (two overlapping + one island) collapse through st_rings →
      // collect → st_union_rings in ONE winding-union pass; the area is
      // inclusion-exclusion-exact and the part count is always 2
      registerAll(s)
      val n  = col("n_nationkey")
      val ax = (n * 3 % 50 - 25).cast("double"); val ay = (n * 7 % 40 - 20).cast("double")
      val dx = (n % 8).cast("double");           val dy = (n % 6).cast("double")
      def s2(c: Column) = c.cast("string")
      def box(w: Column, so: Column, e: Column, no: Column) =
        concat(lit("""{"type":"Polygon","coordinates":[[["""),
          s2(w), lit(","), s2(so), lit("],["), s2(e), lit(","), s2(so), lit("],["),
          s2(e), lit(","), s2(no), lit("],["), s2(w), lit(","), s2(no), lit("],["),
          s2(w), lit(","), s2(so), lit("]]]}"))
      val boxes = s.read.parquet(t(dir, "nation"))
        .select(n, explode(array(
          box(ax, ay, ax + 10, ay + 8),
          box(ax + dx, ay + dy, ax + dx + 10, ay + dy + 8),
          box(ax + 30, ay, ax + 34, ay + 4))).as("json"))
        .select(n, from_geojson_geom(col("json")).as("geom"))
      GeoFunctions.dissolve(boxes, "geom", "n_nationkey")
        .select(n, round(st_area(col("geom"))).cast("long").as("area_i"),
          size(st_parts(col("geom"))).as("n_parts"))
    }),
    "q93_buffer" -> ((s, dir) => {
      // planar-degree buffer under the gate: per-nation disc (point
      // dilation — inscribed 32-gon, closed-form (k/2)·sin(2π/k)·d²),
      // capsule (segment dilation: 2dL + disc), and a RECTILINEAR box
      // erosion whose inner box is arc-free and exactly (8−2dd)(6−2dd).
      // Trig-derived areas are emitted as scaled integers (fp noise
      // ~1e-15·area vs a 5e-5 tie distance; the q62 discipline)
      registerAll(s)
      val n  = col("n_nationkey")
      val x  = (n * 7 % 30 - 15).cast("double")
      val y  = (n * 5 % 20 - 10).cast("double")
      val d  = (n % 4 + 1) / lit(2.0)
      val dd = (n % 3 + 1).cast("double") * 0.5
      val eL = (n % 5 + 3).cast("double")
      def s2(c: Column) = c.cast("string")
      val ptJson  = concat(lit("""{"type":"Point","coordinates":["""),
        s2(x), lit(","), s2(y), lit("]}"))
      val segJson = concat(lit("""{"type":"LineString","coordinates":[["""),
        s2(x), lit(","), s2(y), lit("],["), s2(x + eL), lit(","), s2(y), lit("]]}"))
      val boxJson = concat(lit("""{"type":"Polygon","coordinates":[[["""),
        s2(x), lit(","), s2(y), lit("],["), s2(x + 8), lit(","), s2(y), lit("],["),
        s2(x + 8), lit(","), s2(y + 6), lit("],["), s2(x), lit(","), s2(y + 6),
        lit("],["), s2(x), lit(","), s2(y), lit("]]]}"))
      s.read.parquet(t(dir, "nation"))
        .select(n,
          round(st_area(st_buffer_deg(from_geojson_geom(ptJson), d)) * 1e4)
            .cast("long").as("disc_u4"),
          round(st_area(st_buffer_deg(from_geojson_geom(segJson), d)) * 1e4)
            .cast("long").as("capsule_u4"),
          round(st_area(st_buffer_deg(from_geojson_geom(boxJson), -dd)) * 100)
            .cast("long").as("erode_c"))
    }),
    "q92_ingest_flow" -> ((s, dir) => {
      // the END-TO-END incremental ingest flow under one gate: signature-
      // catalog dedup → Bloom decontamination → Gopher repetition filters →
      // quality-weighted sampling → n-gram shard append, composed as
      // checkpoint-resumable Stages into a fresh working dir (resume
      // semantics are spec-pinned in PipelineSpec; the driver query proves
      // the VALUES). Every stage decision is deterministic hash/integer
      // math, so the oracle replays all five predicates in SQL.
      registerAll(s)
      val root = java.nio.file.Files.createTempDirectory("graft_ingest").toString
      // synthesizeLines = true: the driver documents are single-line, and
      // the q92 oracle replays the " the " → newline rewrite — the flag
      // keeps the demonstrated values identical while real corpora default
      // to verbatim text (round-7 de-shim)
      graft.pipeline.Ingest.run(s, s.read.parquet(t(dir, "documents")), root,
        synthesizeLines = true)
    }),
    "q91_kll_quantiles" -> ((s, dir) => {
      // KLL quantile sketch under the gate: per-language document byte-
      // length percentiles through the full two-phase path — per-shard
      // kll_sketch partials, then kll_merge per language. k=4096 keeps
      // every group in EXACT mode at all driver SFs (max group 2059), where
      // the sketch is a sorted multiset union: byte-identical across any
      // merge order, and kll_quantile is exactly percentile_disc — which
      // the oracle replays. (Compacted-mode error bounds + the planted-
      // distribution property tests live in OpsSpec; approximate answers
      // are inherently not hash-oracleable.)
      registerAll(s)
      import graft.ops.Sketches
      val docs = s.read.parquet(t(dir, "documents"))
      val shards = docs
        .select(col("lang"), (col("doc_id") % 4).as("shard"),
          octet_length(col("text")).cast("long").as("v"))
        .groupBy("lang", "shard")
        .agg(Sketches.kll_sketch(col("v"), k = 4096).as("s"))
        .select(col("lang"), col("s.v").as("blob"))
      shards.groupBy("lang")
        .agg(Sketches.kll_merge(col("blob"), k = 4096).as("m"))
        .select(col("lang"), Sketches.kll_n(col("m.v")).as("n_docs"),
          Sketches.kll_quantile(col("m.v"), lit(0.1)).as("q10"),
          Sketches.kll_quantile(col("m.v"), lit(0.25)).as("q25"),
          Sketches.kll_quantile(col("m.v"), lit(0.5)).as("q50"),
          Sketches.kll_quantile(col("m.v"), lit(0.9)).as("q90"),
          Sketches.kll_quantile(col("m.v"), lit(0.99)).as("q99"))
    }),
    "q90_overlay" -> ((s, dir) => {
      // GENERAL polygon overlay under the gate: per-nation INTEGER-cornered
      // concave L-shaped pairs (each L = two interior-disjoint rectangles),
      // so intersection/union/difference areas have exact rectangle-
      // decomposition closed forms: area(A∩B) = Σᵢⱼ area(Aᵢ∩Bⱼ), union and
      // both differences by inclusion-exclusion — all integer arithmetic
      // the oracle replays verbatim. The slab overlay reproduces the same
      // integers through the full decompose→stitch pipeline (shared edges
      // and vertex-on-edge contacts included, by construction of the
      // lattice offsets).
      registerAll(s)
      val n  = col("n_nationkey")
      val ax = (n * 7 % 40 - 20).cast("int"); val ay = (n * 5 % 30 - 15).cast("int")
      val bx = (ax + n * 3 % 9 - 2).cast("int"); val by = (ay + n % 7 - 2).cast("int")
      def pt(x: Column, y: Column) =
        concat(lit("["), x.cast("string"), lit(","), y.cast("string"), lit("]"))
      def ring(pts: (Column, Column)*) =
        concat(lit("""{"type":"Polygon","coordinates":[["""),
          concat_ws(",", (pts :+ pts.head).map { case (x, y) => pt(x, y) }: _*), lit("]]}"))
      // A: ⌐-shaped L — base 10x4 + upright 4x6 (area 64)
      val aJson = ring((ax, ay), (ax + 10, ay), (ax + 10, ay + 4), (ax + 4, ay + 4),
        (ax + 4, ay + 10), (ax, ay + 10))
      // B: mirrored L — base 9x3 + east upright 4x6 (area 51)
      val bJson = ring((bx, by), (bx + 9, by), (bx + 9, by + 9), (bx + 5, by + 9),
        (bx + 5, by + 3), (bx, by + 3))
      s.read.parquet(t(dir, "nation"))
        .select(n, from_geojson_geom(aJson).as("ga"), from_geojson_geom(bJson).as("gb"))
        .select(n,
          coalesce(round(st_area(st_intersection(col("ga"), col("gb")))).cast("long"), lit(0L)).as("inter_a"),
          coalesce(round(st_area(st_union(col("ga"), col("gb")))).cast("long"), lit(0L)).as("union_a"),
          coalesce(round(st_area(st_difference(col("ga"), col("gb")))).cast("long"), lit(0L)).as("diff_ab"),
          coalesce(round(st_area(st_difference(col("gb"), col("ga")))).cast("long"), lit(0L)).as("diff_ba"))
    }),
    "q89_cms_counters" -> ((s, dir) => {
      // CountMin frequency sketch under the gate: the doc-length (ws token
      // count) frequency table sketched into 4 x 512 counters — merge is
      // element-wise SUM so shard partials reproduce the one-shot blob;
      // the oracle recomputes every counter from the replayed double-hash
      registerAll(s)
      val docs = s.read.parquet(t(dir, "documents"))
      docs.select(mix64_col(TextOps.tokenCountWs(col("text")).cast("long")).as("hh"))
        .agg(Sketches.cms_sketch(col("hh"), w = 512, d = 4).as("cms"))
        .select(posexplode(col("cms.v")))
        .select(expr("shiftright(pos, 9)").cast("int").as("d_row"),
          expr("pos & 511").cast("int").as("bucket"),
          col("col").as("counter"))
    }),
    "q88_bloom_filter" -> ((s, dir) => {
      // Bloom-filter decontamination plumbing under the gate: the benchmark
      // slice (doc_id % 10 == 0) builds one 4096-bit / 4-probe filter over
      // mix64(doc_id); every doc probes it via the broadcast blob. No false
      // negatives, and the false POSITIVES are deterministic double-hash
      // collisions the oracle replays bit-for-bit
      registerAll(s)
      val docs = s.read.parquet(t(dir, "documents"))
      val bench = docs.where(col("doc_id") % 10 === 0)
        .agg(Sketches.bloom_sketch(mix64_col(col("doc_id")), mBits = 4096, k = 4).as("bf"))
      docs.crossJoin(broadcast(bench))
        .select(col("doc_id"),
          Sketches.bloom_contains(col("bf"), mix64_col(col("doc_id")), lit(4)).as("hit"))
    }),
    "q87_fixed_k_sample" -> ((s, dir) => {
      // exact fixed-size deterministic sampling: the 20 smallest
      // (mix64(doc_id), doc_id) ranks per language — the bounded top-k
      // aggregator caps exchange traffic at k pairs per (group, partition)
      // instead of serializing the corpus through a few-group window
      registerAll(s)
      TextOps.fixedKSample(s.read.parquet(t(dir, "documents")),
        "lang", "doc_id", k = 20)
    }),
    "q86_hll_registers" -> ((s, dir) => {
      // mergeable cardinality sketches under the gate: per-lang HyperLogLog
      // REGISTERS over mix64(doc_id) — bucket = top 8 bits, rho = leading
      // zeros of the remaining 56 bits + 1 — replayed exactly in DuckDB
      // (the q66 HUGEINT mix64 plus a bin()-length leading-zero count).
      // The float ESTIMATE is spec-tested instead; max-merge makes shard
      // partials byte-identical to the one-shot sketch (OpsSpec)
      registerAll(s)
      s.read.parquet(t(dir, "documents"))
        .groupBy("lang")
        .agg(Sketches.hll_sketch(mix64_col(col("doc_id")), p = 8).as("sk"))
        .select(col("lang"), posexplode(Sketches.hll_registers(col("sk"))))
        .select(col("lang"), col("pos").as("bucket"), col("col").as("register"))
    }),
    "q85_tfidf_search" -> ((s, dir) => {
      // corpus retrieval under the gate: integer-exact tf-idf (floor-scaled
      // idf, no logs) with a TOTAL-order top-k boundary — hits filter before
      // any exchange, idf broadcasts, TakeOrdered instead of a global sort
      registerAll(s)
      CorpusStats.tfidfSearch(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", "spark window join", k = 20)
    }),
    "q84_video_cuts" -> ((s, dir) => {
      // shot segmentation plumbing: count frame transitions whose mean |Δ|
      // per byte strictly exceeds 85/1000 of a luma unit... threshold 85000
      // milli ≈ the uniform-noise expectation E|X−Y| = 85, so counts split
      // non-trivially; the comparison is an exact integer cross-product
      registerAll(s)
      graft.pipeline.VideoGen.table(s, 1500)
        .select(col("video_id"),
          Multimodal.video_cuts(col("bytes"), lit(85000)).as("n_cuts"))
    }),
    "q83_audio_quality" -> ((s, dir) => {
      // audio curation features: strict-rise local-maxima count (peak
      // density / transient screening) and zero-crossing count (silence /
      // noisiness) — both exact integers the oracle recomputes from the
      // synthesis formula with lag/lead windows
      registerAll(s)
      graft.pipeline.AudioGen.table(s, 2000)
        .select(col("audio_id"),
          Multimodal.audio_peaks(col("bytes")).as("n_peaks"),
          Multimodal.audio_zero_crossings(col("bytes")).as("n_zc"))
    }),
    "q82_tile_exposure" -> ((s, dir) => {
      // corpus curation at the TILE level: the exact per-image luma
      // histogram (q78) rolled up per map tile (q21) — the per-region
      // exposure audit for balancing geographic training mixes. Zero bins
      // ride the explode so every (tile, bin) cell is present; counts stay
      // exact integers end to end
      registerAll(s)
      val imgs = ImageGen.withLngLat(ImageGen.table(s, 2000))
      SpatialJoins.assignTiles(imgs, "lng", "lat", z = 8)
        .select(col("tile_x").as("tx"), col("tile_y").as("ty"),
          posexplode(Multimodal.image_histogram(col("bytes"), lit(8))))
        .select(col("tx"), col("ty"), col("pos").as("bin"), col("col").as("c"))
        .groupBy("tx", "ty", "bin")
        .agg(sum(col("c")).as("n_px"))
    }),
    "q81_erase_box" -> ((s, dir) => {
      // the set-DIFFERENCE construction op under the gate: region boxes
      // MINUS nation-keyed probe windows. The slab decomposition gives a
      // closed-form part count — 1 when disjoint (identity), else
      // (pw>w)+(pe<e)+(ps>s)+(pn<n) — and area = subject − intersection,
      // emitted as exact integer micro-square-degrees (q62's scaled-integer
      // grid trick; the probe box is smaller than every region box in both
      // dimensions, so full coverage / NULL never arises)
      registerAll(s)
      val probes = s.read.parquet(t(dir, "nation"))
        .withColumn("pw", (col("n_nationkey") * 29 % 300 - 160).cast("double"))
        .withColumn("ps", (col("n_nationkey") * 17 % 120 - 65).cast("double"))
        .select(col("n_nationkey"), col("pw"), col("ps"),
          (col("pw") + 33.0).as("pe"), (col("ps") + 27.0).as("pn"))
      regionPolys(s, dir).crossJoin(probes)
        .withColumn("g", st_erase_box(col("geom"), col("pw"), col("ps"), col("pe"), col("pn")))
        .where(col("g").isNotNull)
        .select(col("r_regionkey"), col("n_nationkey"),
          (size(col("g").getField("part_offsets")) - 1).as("n_parts"),
          round(st_area(col("g")) * 1e6).cast("long").as("area_u6"))
    }),
    "q80_perceptual_catalog" -> ((s, dir) => {
      // incremental PERCEPTUAL dedup: the accepted corpus (ids 0..1999)
      // catalogs its pixel-COMPUTED ahash banded 4×16; a new shard mixing a
      // re-crawl (500..999, byte-identical payloads → hamming 0) with fresh
      // images (2000..2499) dedups against the catalog — signatures only,
      // catalog never shuffles. The oracle replays every hash from pixels
      // and applies the same band + hamming ≤ 3 definition.
      registerAll(s)
      val base = ImageGen.table(s, 2500)
        .withColumn("iid", expr("CAST(substring(image_id, 5) AS BIGINT)"))
        .select(col("image_id"), col("iid"),
          Multimodal.image_ahash(col("bytes")).as("ahash"))
      val cat = java.nio.file.Files.createTempDirectory("graft_q80").toString + "/catalog"
      Dedup.writePerceptualCatalog(base.where(col("iid") < 2000), "iid", "ahash", cat)
      val shard = base.where(col("iid").between(500, 999) || col("iid") >= 2000)
      Dedup.dedupAgainstPerceptual(shard, "iid", "ahash", cat)
        .select(col("image_id"), col("ahash"))
    }),
    "q77_image_ahash" -> ((s, dir) => {
      // perceptual hash COMPUTED from decoded pixels (not trusted from the
      // table): 8×8 block mean-luma bits with an exact integer
      // cross-multiplication threshold, so DuckDB replays it bit-for-bit
      // from the same pixel stream
      registerAll(s)
      ImageGen.table(s, 2000)
        .select(col("image_id"), Multimodal.image_ahash(col("bytes")).as("ahash"))
    }),
    "q76_weighted_sample" -> ((s, dir) => {
      // quality-weighted data mixing: each doc keeps with its own per-mille
      // rate (here a token-count proxy, capped) — exact integer arithmetic
      // on both engines, and the kept set is monotone in the weight
      val docs = TextOps.withTokenCountWs(s.read.parquet(t(dir, "documents")), "text")
      TextOps.weightedSample(docs, "doc_id",
          least(col("n_tokens_ws") * 25L, lit(900L)))
        .select(col("doc_id"), col("n_tokens_ws"))
    }),
    "q75_video_motion" -> ((s, dir) => {
      // inter-frame motion under the pixel gate: video_motion's |Δ| sum is
      // an exact integer (motion · comparedBytes), and the oracle replays
      // every frame's xorshift64 raster with the per-(id, frame) seed —
      // including the 64-bit WRAP in seed·2654435761 that q69's image ids
      // never reach
      registerAll(s)
      graft.pipeline.VideoGen.table(s, 1500)
        .select(col("video_id"),
          round(Multimodal.video_motion(col("bytes")) *
            ((col("n_frames") - 1) * col("w") * col("h") * 3))
            .cast("long").as("motion_sum_abs"))
    }),
    "q74_ngram_shards" -> ((s, dir) => {
      // the INCREMENTAL corpus-stats path under the gate: three disjoint
      // doc_id%3 shards accumulate n-gram partials (one re-run to prove
      // idempotence), merged stats feed the same deterministic top-k —
      // must equal the one-shot q68 closed form exactly
      registerAll(s)
      val docs = s.read.parquet(t(dir, "documents"))
      val base = java.nio.file.Files.createTempDirectory("graft_q74").toString + "/ng"
      // the three shard writes are independent actions over disjoint
      // subdirectories — overlap them (guide §2.6); the s1 RE-crawl must
      // stay after its own first write (same subdir, proves idempotence)
      Par.run((0 to 2).map(sh => () =>
        CorpusStats.appendNgramShard(docs.where(pmod(col("doc_id"), lit(3)) === sh),
          "doc_id", "text", n = 2, base, s"s$sh")): _*)
      CorpusStats.appendNgramShard(docs.where(pmod(col("doc_id"), lit(3)) === 1),
        "doc_id", "text", n = 2, base, "s1") // idempotent re-crawl
      CorpusStats.topNgramsFrom(s, base, k = 100)
    }),
    "q73_audio_downsample" -> ((s, dir) => {
      // the resampling kernel under the gate: keep every k-th sample
      // (varying k exercises the ceil count and integer rate division);
      // samples are closed-form, so the downsampled energy is exact SQL
      registerAll(s)
      val id = substring(col("audio_id"), 5, 20).cast("long")
      val k = (lit(2) + id % 3L).cast("int")
      graft.pipeline.AudioGen.table(s, 2000)
        .withColumn("ds", Multimodal.audio_downsample(col("bytes"), k))
        .select(col("audio_id"),
          Multimodal.audio_meta(col("ds")).getField("rate").as("rate"),
          Multimodal.audio_meta(col("ds")).getField("n_samples").as("n_samples"),
          Multimodal.audio_energy(col("ds")).as("energy"))
    }),
    "q72_image_crop" -> ((s, dir) => {
      // the augmentation kernel under the pixel gate: per-image modular
      // crop windows (partially out of range for wide ids ⇒ the clamping
      // path is exercised), output dims from the cropped payload's own
      // header, gray sum over exactly the window's pixels (q69's stream
      // replay with an (x, y) filter)
      registerAll(s)
      val id = substring(col("image_id"), 5, 20).cast("long")
      val x0 = (id % 5L).cast("int"); val y0 = (id % 4L).cast("int")
      val cw = (lit(4) + id % 3L).cast("int"); val ch = (lit(3) + id % 2L).cast("int")
      ImageGen.table(s, 2000)
        .withColumn("crop", Multimodal.image_crop(col("bytes"), x0, y0, cw, ch))
        .select(col("image_id"),
          Multimodal.image_meta(col("crop")).getField("w").as("cw"),
          Multimodal.image_meta(col("crop")).getField("h").as("ch"),
          round(Multimodal.image_gray_mean(col("crop")) *
            Multimodal.image_meta(col("crop")).getField("w") *
            Multimodal.image_meta(col("crop")).getField("h") * 1000.0)
            .cast("long").as("gray_milli_sum"))
    }),
    "q71_corpus_profile" -> ((s, dir) => {
      // one-row corpus audit: totals + DISCRETE token-count percentiles
      // computed from a bounded value-histogram (never a buffer-everything
      // percentile aggregate — that single group would hold one entry per
      // document at corpus scale); percentile_disc equivalence spec-pinned
      registerAll(s)
      CorpusStats.corpusProfile(s.read.parquet(t(dir, "documents")),
        "doc_id", "text")
    }),
    "q70_bow_features" -> ((s, dir) => {
      // sparse doc-term matrix against the top-100 bigram vocabulary: the
      // vocabulary (tiny, deterministic order → dense vocab_id) broadcasts
      // into the exploded gram stream BEFORE aggregation, so the only
      // corpus-sized exchange is the (doc, vocab_id) count over hits
      registerAll(s)
      val docs = s.read.parquet(t(dir, "documents"))
      // measured: sharing the gram explode via localCheckpoint LOST here —
      // the codegen word_ngrams kernel re-runs cheaper than materializing
      // the (doc, gram) stream (unlike the minhash/winnow signatures)
      val vocab = CorpusStats.vocabulary(docs, "doc_id", "text", n = 2, k = 100)
      CorpusStats.bowRows(docs, "doc_id", "text", vocab, n = 2)
    }),
    "q69_gray_pixels" -> ((s, dir) => {
      // a PIXEL-LEVEL image kernel under the full gate: the oracle replays
      // the GRB1 xorshift64 pixel stream in DuckDB (recursive CTE over PRNG
      // steps; wrapping shifts as HUGEINT multiplies mod 2^64), applies the
      // lossy 6-bit quantization, and sums 299r+587g+114b per pixel — an
      // EXACT integer. The kernel's float gray mean times npix*1000 lands
      // within ~1e-8 of it, so the rounded long is collision-free (emitting
      // round(mean*K) directly would tie on the rational grid ~1/1000 per
      // image — the q62 grid trap).
      registerAll(s)
      ImageGen.table(s, 2000)
        .select(col("image_id"),
          round(graft.ops.Multimodal.image_gray_mean(col("bytes")) *
            col("w") * col("h") * 1000.0).cast("long").as("gray_milli_sum"))
    }),
    "q68_top_ngrams" -> ((s, dir) => {
      // corpus-level vocabulary statistics: top-100 bigrams by total count
      // with document frequency — two-phase aggregation (per-(doc,gram)
      // partial combine first, so a hot gram reaches the per-gram exchange
      // as ≤ one row per document), TakeOrdered top-k, deterministic
      // (total DESC, gram ASC) tie-breaks so both engines pick the same
      // boundary set
      registerAll(s)
      CorpusStats.topNgrams(s.read.parquet(t(dir, "documents")),
        "doc_id", "text", n = 2, k = 100)
    }),
    "q67_bpe_tokens" -> ((s, dir) => {
      // the BPE-ish tokenizer under the FULL gate: the token regex's three
      // alternatives match DISJOINT character classes, so Java's leftmost-
      // first and any other engine's tokenization coincide, and the
      // ceil(len/4) long-word charge is integer arithmetic — RE2 replays it
      // exactly (the corpus has no \x0B, the one Java-\s/RE2-\s divergence)
      registerAll(s)
      TextOps.withTokenCounts(s.read.parquet(t(dir, "documents")), "text")
        .select(col("doc_id"), col("n_tokens_bpe"))
    }),
    "q66_winnow_fp" -> ((s, dir) => {
      // winnowing document fingerprints under the FULL gate: the corpus is
      // ASCII (checked at every SF), so DuckDB can replay shingleHash +
      // mix64 exactly — wrapping 64-bit arithmetic via HUGEINT mod 2^64,
      // logical shifts/xor on UBIGINT, constant multiplies split into
      // 32-bit halves so no product overflows int128. Emitting the whole
      // sorted signed fingerprint set as CSV pins VALUES, not just counts.
      registerAll(s)
      s.read.parquet(t(dir, "documents"))
        .withColumn("fp", winnow_fp(col("text"), lit(8), lit(4)))
        .select(col("doc_id"),
          size(col("fp")).as("n_fingerprints"),
          concat_ws(",", col("fp").cast("array<string>")).as("fps"))
    }),
    "q32_ann_ivf" -> ((s, dir) => {
      // the TRAINED IVF path: k-means centroids + inverted file persisted,
      // then queried. nprobe = nlist is exactly brute force INDEPENDENT of
      // training quality (every list probed), so the oracle is q17's SQL —
      // this exercises train → persist → reuse end-to-end under the gate
      registerAll(s)
      val embs = s.read.parquet(t(dir, "embeddings"))
      val idx = java.nio.file.Files.createTempDirectory("graft_q32").toString + "/ivf"
      Similarity.trainIvf(embs.select(col("vec_id"), col("embedding")),
        "vec_id", "embedding", idx, nlist = 8, maxIter = 3)
      val qs = embs.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.ivfTopKWith(qs, "qid", "qvec", idx, "vec_id", "embedding",
          k = 3, nprobe = 8)
        .select(col("qid"), col("vec_id"), col("rank"))
    }),
    "q34_random_roundtrip" -> ((s, dir) => {
      // Random generator API (reference Random.random, geojson.ml:625-678):
      // generated text is canonical, so serialize∘parse must be the identity
      // byte-for-byte; the skeleton rotation (id % 7) is SQL-predictable
      registerAll(s)
      val docs = s.read.parquet(t(dir, "documents")).select("doc_id")
      docs.withColumn("json", random_geojson(col("doc_id"), lit(42L)))
        .withColumn("back", to_geojson(from_geojson(col("json"))))
        .select(col("doc_id"),
          get_json_object(col("json"), "$.type").as("kind"),
          (col("back") === col("json")).as("ok"))
    }),

    // ---- image+caption table (north rule)
    "q21_image_tiles" -> ((s, dir) => {
      registerAll(s)
      val imgs = ImageGen.withLngLat(ImageGen.table(s, 2000))
      SpatialJoins.assignTiles(imgs, "lng", "lat", z = 8)
        .groupBy(col("tile_x").as("tx"), col("tile_y").as("ty"))
        .agg(count(lit(1)).as("n"))
    }),
    "q22_image_pip" -> ((s, dir) => {
      registerAll(s)
      val imgs = ImageGen.withLngLat(ImageGen.table(s, 2000))
      SpatialJoins.pipJoin(imgs, "lng", "lat", regionPolys(s, dir), "geom", res = 2)
        .select(col("image_id"), col("r_regionkey"))
    }),
    "q23_image_meta" -> ((s, dir) => {
      registerAll(s)
      val imgs = ImageGen.table(s, 2000)
      imgs.select(col("image_id"), col("w"), col("h"), col("fmt"), col("caption"))
    }),
    "q24_flagship" -> ((s, dir) => {
      // full pipeline output (fixture polygons are not SQL-expressible after
      // translation → rows-only check; exactness proven vs brute force in
      // PipelineSpec)
      registerAll(s)
      val imgs  = ImageGen.withLngLat(ImageGen.table(s, 5000))
      val polys = GeoImagePipeline.fixturePolygons(s)
      SpatialJoins.pipJoin(imgs, "lng", "lat", polys, "geom", res = 5)
        .select(col("image_id"), col("poly_id"))
    }),
    "q29_sessions" -> ((s, dir) => {
      // gap-based sessionization (batch formulation; the streaming
      // flatMapGroupsWithState twin is proven equal in SessionIvfSpec)
      val ev = spread(s.read.parquet(t(dir, "events")), Seq(col("user_id")))
        .select(col("user_id"),
          (unix_micros(col("ts").cast("timestamp")) / 1000L).cast("long").as("ts_ms"),
          round(col("value") * 100.0, 0).as("value")) // cents as double => exact sums
      graft.ops.Sessionize.sessionsBatch(ev, gapMinutes = 120)
        .select(col("user_id"), col("start_ms"), col("end_ms"), col("n_events"),
          col("total_value").cast("long").as("cents"))
    }),
    "q30_geojson_source" -> ((s, dir) => {
      // full source/sink loop: build FeatureCollection documents from nation,
      // write via GeoJsonWriter, re-read via the DataSourceV2 `geojson`
      // format, parse back with from_geojson
      registerAll(s)
      val tmp = java.nio.file.Files.createTempDirectory("graft_q30").toString + "/docs"
      val fjson = concat(
        lit("""{"type":"Feature","properties":{"name":""""), col("n_name"),
        lit(""""},"geometry":{"type":"Point","coordinates":["""),
        col("n_nationkey").cast("string"), lit(","),
        (col("n_nationkey") * 2L).cast("string"), lit("]}}"))
      graft.geo.sources.GeoJsonWriter.writeFeatureCollections(
        s.read.parquet(t(dir, "nation")).select(fjson.as("json")), "json", tmp, partitions = 2)
      val f = from_geojson(col("feature_json")).getField("feature")
      s.read.format("geojson").load(s"$tmp/part-*")
        .select(get_json_object(f.getField("properties"), "$.name").as("name"),
          element_at(f.getField("geometry").getField("coords"), 1).as("lng"))
    }),
    "q31_measures" -> ((s, dir) => {
      registerAll(s)
      val p = regionPolys(s, dir)
      p.select(col("r_regionkey"),
        round(st_area(col("geom")), 6).as("area_deg2"),
        round(element_at(st_centroid(col("geom")), 1), 6).as("clng"),
        round(element_at(st_centroid(col("geom")), 2), 6).as("clat"))
    }),
    "q35_knn_s2" -> ((s, dir) => {
      // pole-safe S2 kNN: every 5th query sits at lat 83.9..89.9 where the
      // planar hex grid distorts; oracled against brute-force haversine
      registerAll(s)
      val qs = s.read.parquet(t(dir, "nation"))
        .withColumn("qlng", (col("n_nationkey") * 104729L % 36000L) / 100.0 - 180.0)
        .withColumn("qlat", when(col("n_nationkey") % 5 === 0,
            lit(89.9) - (col("n_nationkey") % 7).cast("double"))
          .otherwise((col("n_nationkey") * 7919L % 16000L) / 100.0 - 80.0))
        .select("n_nationkey", "qlng", "qlat")
      // default auto radius: sized from point density so most queries
      // certify in round 1 instead of burning fixed-cost rounds
      SpatialJoins.knnJoinS2(qs, "n_nationkey", "qlng", "qlat",
          customerPoints(s, dir).select("c_custkey", "lng", "lat"), "lng", "lat",
          k = 3, minLevel = 4, maxLevel = 9)
        .select(col("n_nationkey"), col("c_custkey"), col("rank"))
    }),
    "q36_intersects" -> ((s, dir) => {
      // polygon-polygon intersects join (beyond the reference's surface):
      // region boxes vs a second synthesized box set; offsets .005 vs .003
      // guarantee strict overlap-or-disjoint (never exact touching), so the
      // SQL interval-overlap oracle is exact
      registerAll(s)
      val a = regionPolys(s, dir)
      val b0 = s.read.parquet(t(dir, "nation"))
        .withColumn("w2", (col("n_nationkey") * 37 % 300).cast("double") - 160.003)
        .withColumn("e2", col("w2") + 25.0)
        .withColumn("s2", (col("n_nationkey") * 17 % 110).cast("double") - 55.003)
        .withColumn("n2", col("s2") + 20.0)
      val bjson = concat(lit("""{"type":"Polygon","coordinates":[[["""),
        col("w2").cast("string"), lit(","), col("s2").cast("string"), lit("],["),
        col("e2").cast("string"), lit(","), col("s2").cast("string"), lit("],["),
        col("e2").cast("string"), lit(","), col("n2").cast("string"), lit("],["),
        col("w2").cast("string"), lit(","), col("n2").cast("string"), lit("],["),
        col("w2").cast("string"), lit(","), col("s2").cast("string"), lit("]]]}"))
      val b = b0.select(col("n_nationkey"), from_geojson_geom(bjson).as("geom"))
      SpatialJoins.intersectsJoin(a, "r_regionkey", "geom", b, "n_nationkey", "geom",
        minLevel = 2, maxLevel = 8)
    }),
    "q37_distance" -> ((s, dir) => {
      // planar point-to-polygon distance (JTS semantics): for axis-aligned
      // boxes it reduces to the clamped-point closed form, which the oracle
      // reproduces exactly; rounded to 6dp (both engines round the same
      // double); one row per (customer, region) pair.
      registerAll(s)
      val pts = customerPoints(s, dir).where(col("c_custkey") <= 200)
      pts.crossJoin(regionPolys(s, dir))
        .select(col("c_custkey"), col("r_regionkey"),
          round(st_distance_deg(col("geom"), col("lng"), col("lat")), 6).as("dist_deg"))
    }),
    "q47_geo_phash_dups" -> ((s, dir) => {
      // geo-aware perceptual dedup: copies carry the SAME phash at a
      // location ~100 m east — found with certainty (hamming 0, adjacency
      // guaranteed at res 6); restricted to the planted shape (natural
      // hamming<=3 collisions between random 64-bit phashes are ~1e-14)
      registerAll(s)
      val base = ImageGen.withLngLat(ImageGen.table(s, 2000))
        .withColumn("iid", expr("CAST(substring(image_id, 5) AS BIGINT)"))
        .select("iid", "phash", "lng", "lat")
      val copies = base.select((col("iid") + 100000L).as("iid"), col("phash"),
        (col("lng") + 0.001).as("lng"), col("lat"))
      Dedup.geoPhashPairs(base.unionByName(copies), "iid", "phash", "lng", "lat")
        .where(col("id_b") === col("id_a") + 100000L && col("id_a") < 100000L)
        .select(col("id_a"), col("id_b"))
    }),
    "q46_video" -> ((s, dir) => {
      // video modality: VID1 container decoded by Catalyst expressions;
      // meta + payload size are closed-form in the id
      registerAll(s)
      val v = graft.pipeline.VideoGen.table(s, 1500)
      val m = Multimodal.video_meta(col("bytes"))
      v.select(col("video_id"),
        m.getField("w").as("w"), m.getField("h").as("h"),
        m.getField("n_frames").as("n_frames"),
        length(col("bytes")).as("n_bytes"))
    }),
    "q49_redact_pii" -> ((s, dir) => {
      // PII scrubbing: emails / IPv4 / +international phones planted into
      // every doc; BOTH engines run the same RE2-compatible regex chain, so
      // the oracle is a direct cross-engine regexp_replace equivalence
      val docs = s.read.parquet(t(dir, "documents"))
      val planted = concat(col("text"), lit(" contact user"),
        col("doc_id").cast("string"), lit("@mail.example.com from 10.0."),
        (col("doc_id") % 250).cast("string"), lit(".7 or call +1 555 000 "),
        (col("doc_id") % 9000 + 1000).cast("string"), lit(" now"))
      TextOps.redactPii(docs.withColumn("text", planted), "text")
        .select(col("doc_id"), col("text"))
    }),
    "q48_stratified_sample" -> ((s, dir) => {
      // data mixing: per-language keep rates over the same deterministic
      // hash bucket as q42 — SQL reproduces the CASE rate table exactly
      val docs = s.read.parquet(t(dir, "documents"))
      TextOps.stratifiedSample(docs, "doc_id", "lang",
          Map("en" -> 500, "de" -> 250, "fr" -> 100, "zh" -> 50))
        .select(col("doc_id"), col("lang"))
    }),
    "q45_audio" -> ((s, dir) => {
      // audio modality: PCA1 binary payloads decoded by Catalyst expressions;
      // energy is an exact integer the oracle recomputes from the synthesis
      // formula with a range() cross join
      registerAll(s)
      val a = graft.pipeline.AudioGen.table(s, 2000)
      a.select(col("audio_id"),
        Multimodal.audio_meta(col("bytes")).getField("rate").as("rate"),
        Multimodal.audio_meta(col("bytes")).getField("n_samples").as("n_samples"),
        Multimodal.audio_energy(col("bytes")).as("energy"))
    }),
    "q42_sample" -> ((s, dir) => {
      // deterministic data-mixing sampler: Knuth multiplicative hash bucket
      // < rate — reproducible across engines (exact integer arithmetic) and
      // monotone in the rate (the 10% sample contains the 5% sample)
      val docs = s.read.parquet(t(dir, "documents"))
      TextOps.deterministicSample(docs, "doc_id", perMille = 250)
        .select(col("doc_id"))
    }),
    "q43_pack_plan" -> ((s, dir) => {
      // sequence-packing plan: per-language running token sum -> bin ids
      val docs = TextOps.withTokenCountWs(s.read.parquet(t(dir, "documents")), "text")
      TextOps.packSequences(docs, "n_tokens_ws", "doc_id", "lang", budgetTokens = 512L)
        .select(col("doc_id"), col("lang"), col("bin"), col("bin_offset"))
    }),
    "q44_contamination" -> ((s, dir) => {
      // train/test decontamination: synthetic benchmark docs quote 40 chars
      // of every 10th corpus doc; the planted (d, d+50000) pair is found
      // with recall 1.0 (winnowing guarantee at >= 11 shared chars) and the
      // char-exact verify admits no hash-collision false positives
      registerAll(s)
      val docs = spread(s.read.parquet(t(dir, "documents")).select("doc_id", "text"),
        Seq(col("doc_id")), minBytes = 64 * 1024) // kernel-heavy narrow map: spread WINS here (0.50 -> 0.43 s) — the stream feeds a broadcast join, not a banded self-join (contrast q15)
      // length >= 44 precondition: substring(text,5,40) must carry a full
      // >= k+w-1 = 11-char passage for the winnowing recall guarantee; a
      // shorter doc at another scale factor would silently break oracle
      // parity (holds trivially at current fixtures, min length 48)
      val bench = docs.where(col("doc_id") % 10 === 0 && length(col("text")) >= 44)
        .select((col("doc_id") + 50000L).as("bench_id"),
          concat(lit("eval question quoting: "), substring(col("text"), 5, 40),
            lit(" [end]")).as("text"))
      Dedup.contaminationPairs(docs, "doc_id", "text", bench, "bench_id", "text")
        .where(col("corpus_id") === col("bench_id") - 50000L)
        .select(col("corpus_id"), col("bench_id"))
    }),
    "q41_shared_passages" -> ((s, dir) => {
      // substring-level dedup contract: the +10000 copy is fresh text (id
      // digits make its gibberish distinct) CARRYING the first 40 chars of
      // its base doc — the pair shares exactly that passage. Winnowing
      // guarantees recall 1.0 for shares >= k+w-1 = 11 chars, so restricted
      // to the planted shape (natural cross-doc boilerplate shares are
      // correct output but not closed-form) the result is every base id.
      registerAll(s)
      val docs = s.read.parquet(t(dir, "documents")).select("doc_id", "text") // no spread: see q15
      // same >= 44 precondition as q44: the carried 40-char prefix must hold
      // a full winnowing-guaranteed passage at every scale factor
      val carriers = docs.where(length(col("text")) >= 44)
        .select((col("doc_id") + 10000L).as("doc_id"),
          concat(lit("zz"), col("doc_id").cast("string"), lit("q "),
            substring(col("text"), 1, 40)).as("text"))
      Dedup.sharedPassagePairs(docs.unionByName(carriers), "doc_id", "text")
        .where(col("id_b") === col("id_a") + 10000L && col("id_a") < 10000L)
        .select(col("id_a"), col("id_b"))
    }),
    "q40_json_update" -> ((s, dir) => {
      // generic JSON path update (Ezjsone.update twin): replace a nested
      // member in place, append a missing leaf, remove a member — output is
      // the canonical minified text, reproducible by SQL string concat
      registerAll(s)
      val nation = s.read.parquet(t(dir, "nation"))
      val doc = concat(lit("""{"type":"Feature","properties":{"name":""""),
        col("n_name"), lit("""","rank":0},"note":"tmp"}"""))
      val upd = json_update(json_update(doc, lit("$.properties.rank"),
          (col("n_nationkey") * 2L).cast("string")),
        lit("$.extra"), lit("""{"v":1}"""))
      nation.select(col("n_nationkey"), json_remove(upd, lit("$.note")).as("doc"))
    }),
    "q39_translate_pip_tile" -> ((s, dir) => {
      // the FLAGSHIP plan shape (cover → equi-join → st_contains refine →
      // tile assignment) with every stage SQL-oracleable: region boxes run
      // through the translate_geom path (q24's fixture polygons are not
      // SQL-expressible after translation; axis-aligned boxes are — exact
      // interval arithmetic). Offsets are multiples of 0.5, so box edges
      // keep their .005 fractional part and never touch the .01 point grid.
      registerAll(s)
      val imgs = ImageGen.withLngLat(ImageGen.table(s, 2000))
      val polys = regionPolys(s, dir).withColumn("geom",
        GeoImagePipeline.translate_geom(col("geom"),
          col("r_regionkey") * 3.0 + 2.5, col("r_regionkey") * 1.5 - 3.0))
      val joined = SpatialJoins.pipJoin(imgs, "lng", "lat", polys, "geom", res = 2)
      SpatialJoins.assignTiles(joined, "lng", "lat", z = 8)
        .select(col("image_id"), col("r_regionkey"),
          col("tile_x").as("tx"), col("tile_y").as("ty"))
    }),
    "q38_dup_clusters" -> ((s, dir) => {
      // connected-component canonicalization over a planted TRANSITIVE chain:
      // three copies of every doc (d, d+10000, d+20000) linked d—d+10000 and
      // d+10000—d+20000 (d and d+20000 never directly paired), plus base-id
      // chains d—d+1 within groups of 5 — so each cluster is 15 ids whose
      // transitive closure (diameter 6) the oracle computes in closed form:
      // canonical = (id % 10000) // 5 * 5
      val base = s.read.parquet(t(dir, "documents")).select(col("doc_id"))
      val ids = base.select(col("doc_id").as("id"))
        .unionByName(base.select((col("doc_id") + 10000L).as("id")))
        .unionByName(base.select((col("doc_id") + 20000L).as("id")))
      val e1 = base.select(col("doc_id").as("id_a"), (col("doc_id") + 10000L).as("id_b"))
      val e2 = base.select((col("doc_id") + 10000L).as("id_a"), (col("doc_id") + 20000L).as("id_b"))
      val e3 = base.where(col("doc_id") % 5 =!= 4)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1L).as("id_b"))
      Dedup.clusters(e1.unionByName(e2).unionByName(e3), "id", universe = Some(ids))
    }),
    "q63_tile_clip" -> ((s, dir) => {
      // exact-geometry polygon tiling (tilePolygons = tile_cover_box ->
      // tile_bounds -> st_clip_box): nation-keyed axis-aligned boxes tiled
      // at z=3. Tile lng bounds are exact multiples of 45; lat bounds are
      // transcendental (atan∘sinh), which DuckDB rebuilds from exp (no
      // sinh) — libm ulp drift is absorbed by emitting areas as MILLI-unit
      // integers (error ~1e-6 milli-units vs the 0.5 tie distance).
      registerAll(s)
      val b = s.read.parquet(t(dir, "nation"))
        .withColumn("bw", (col("n_nationkey") * 31 % 280 - 150).cast("double") + 0.003)
        .withColumn("bs", (col("n_nationkey") * 23 % 100 - 55).cast("double") + 0.003)
        .withColumn("be", col("bw") + 37.0).withColumn("bn", col("bs") + 23.0)
      val json = concat(lit("""{"type":"Polygon","coordinates":[[["""),
        col("bw").cast("string"), lit(","), col("bs").cast("string"), lit("],["),
        col("be").cast("string"), lit(","), col("bs").cast("string"), lit("],["),
        col("be").cast("string"), lit(","), col("bn").cast("string"), lit("],["),
        col("bw").cast("string"), lit(","), col("bn").cast("string"), lit("],["),
        col("bw").cast("string"), lit(","), col("bs").cast("string"), lit("]]]}"))
      val polys = b.select(col("n_nationkey"), from_geojson_geom(json).as("geom"))
      SpatialJoins.tilePolygons(polys, "geom", z = 3)
        .select(col("n_nationkey"),
          tile_x(col("tile_key")).as("tx"), tile_y(col("tile_key")).as("ty"),
          round(st_area(col("tile_geom")) * 1000.0).cast("long").as("area_u3"))
    }),
    "q61_pq_ann" -> ((s, dir) => {
      // IVF-PQ under the gate: m = dim (1-D subspaces) over per-dim integer
      // alphabets of <= 12 values -> the small-alphabet codebooks ARE the
      // distinct value sets, reconstruction is exact, and ADC ranking ==
      // exact cosine ranking; at nprobe = nlist probing is exhaustive, so
      // DuckDB's brute-force cosine top-k is a closed-form oracle (rank
      // output only — cosine doubles differ by engine rounding). Vectors
      // are pure arithmetic ((id*(d+2)+d*d) % (5+d) + 1), reproducible in
      // both engines; duplicate vectors tie-break on vec_id in both.
      registerAll(s)
      // 4 slices, NOT default parallelism: the train pipeline is ~18 tiny
      // jobs and a 500-row corpus over 32 partitions pays 32-task
      // scheduling per job (measured 3x the whole leg)
      val corpus = s.range(0, 500, 1, 4).select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(7)), d =>
          ((col("id") * (d + 2) + d * d) % (d + 5) + 1).cast("float")).as("embedding"))
      val idxDir = java.nio.file.Files.createTempDirectory("graft_q61").toString + "/pq"
      // maxIter 3: at nprobe = nlist the result is training-quality-
      // independent (every list probed); the leg measures the train+persist+
      // query PIPELINE, whose cost is fixed job count, not data size
      // residual = false: the closed-form oracle needs exact reconstruction
      // of v ITSELF (fl(v - c) is ~1e-7 off on exact cosine ties)
      Similarity.trainIvfPq(corpus, "vec_id", "embedding", idxDir,
        nlist = 8, m = 8, maxIter = 3, residual = false)
      val qs = corpus.where(col("vec_id") % 25 === 0)
        .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      Similarity.pqTopKWith(qs, "qid", "qvec", idxDir, "vec_id", k = 5, nprobe = 8)
        .select(col("qid"), col("vec_id"), col("rank"))
    }),
    "q62_clip_box" -> ((s, dir) => {
      // geometry CONSTRUCTION under the gate: region boxes clipped to
      // nation-keyed probe windows. Axis-aligned subjects clip to exact
      // interval arithmetic (shPass pins synthesized crossings to the clip
      // bounds VERBATIM), so the bbox is greatest/least of identically-
      // computed doubles in both engines and the area is emitted as exact
      // integer micro-square-degrees (the grid-exact-double round trap:
      // these areas land exactly ON the 6-decimal grid, where round(x, 6)
      // is engine-divergent but round(x * 1e6) to a BIGINT is not — the
      // float error is ~1e-11, far below the 0.5 tie distance)
      registerAll(s)
      val probes = s.read.parquet(t(dir, "nation"))
        .withColumn("pw", (col("n_nationkey") * 29 % 300 - 160).cast("double"))
        .withColumn("ps", (col("n_nationkey") * 17 % 120 - 65).cast("double"))
        .select(col("n_nationkey"), col("pw"), col("ps"),
          (col("pw") + 33.0).as("pe"), (col("ps") + 27.0).as("pn"))
      regionPolys(s, dir).crossJoin(probes) // 5 regions x ~25 nations: constant
        .withColumn("clip", st_clip_box(col("geom"), col("pw"), col("ps"), col("pe"), col("pn")))
        .where(col("clip").isNotNull)
        .select(col("r_regionkey"), col("n_nationkey"),
          element_at(st_bbox(col("clip")), 1).as("cw"),
          element_at(st_bbox(col("clip")), 2).as("cs"),
          element_at(st_bbox(col("clip")), 3).as("ce"),
          element_at(st_bbox(col("clip")), 4).as("cn"),
          round(st_area(col("clip")) * 1e6).cast("long").as("area_u6"))
    }),
    "q65_clip_convex" -> ((s, dir) => {
      // the GENERAL convex clip window under the gate: q62's interval-
      // arithmetic closed form, but the window arrives as a CW-wound
      // rectangle POLYGON through st_clip_convex — exercises convexShell's
      // reorientation plus the generic half-plane passes (axis-aligned
      // edges pin crossings verbatim, so the bbox doubles are engine-
      // reproducible; the shoelace runs from a rotated start corner, a
      // ~1-ulp effect the scaled-integer area absorbs)
      registerAll(s)
      val pw = col("n_nationkey") * 31 % 280 - 150
      val ps = col("n_nationkey") * 13 % 110 - 60
      val pe = pw + 38
      val pn = ps + 24
      def pt(x: Column, y: Column) =
        concat(lit("["), x.cast("string"), lit(","), y.cast("string"), lit("]"))
      val clipJson = concat(lit("""{"type":"Polygon","coordinates":[["""),
        pt(pe, pn), lit(","), pt(pe, ps), lit(","), pt(pw, ps), lit(","),
        pt(pw, pn), lit(","), pt(pe, pn), lit("]]}"))
      val probes = s.read.parquet(t(dir, "nation"))
        .select(col("n_nationkey"), from_geojson_geom(clipJson).as("clip"))
      regionPolys(s, dir).crossJoin(probes) // 5 regions x ~25 nations: constant
        .withColumn("cg", st_clip_convex(col("geom"), col("clip")))
        .where(col("cg").isNotNull)
        .select(col("r_regionkey"), col("n_nationkey"),
          element_at(st_bbox(col("cg")), 1).as("cw"),
          element_at(st_bbox(col("cg")), 2).as("cs"),
          element_at(st_bbox(col("cg")), 3).as("ce"),
          element_at(st_bbox(col("cg")), 4).as("cn"),
          round(st_area(col("cg")) * 1e6).cast("long").as("area_u6"))
    }),
    "q60_st_parts" -> ((s, dir) => {
      // ST_Dump: per-nation MultiPoints of n%3+2 members explode into one
      // Point row per part with its index — every coordinate closed-form
      registerAll(s)
      val npts = (col("n_nationkey") % 3 + 2).cast("int")
      val members = array_join(transform(sequence(lit(0), npts - 1), k =>
        concat(lit("["), (col("n_nationkey") * 5 % 30 + k).cast("string"), lit(","),
          (col("n_nationkey") * 3 % 20 + k * 2).cast("string"), lit("]"))), ",")
      val json = concat(lit("""{"type":"MultiPoint","coordinates":["""), members, lit("]}"))
      s.read.parquet(t(dir, "nation"))
        .select(col("n_nationkey"), posexplode(call_function("st_parts",
          from_geojson_geom(json))).as(Seq("part_idx", "part_geom")))
        .select(col("n_nationkey"), col("part_idx"),
          to_geojson_geom(col("part_geom")).as("part"))
    }),
    "q64_repetition" -> ((s, dir) => {
      // intra-document repetition signals (the Gopher-style quality
      // filters). Documents are single-line word streams, so derive
      // multi-line text by turning the word " the " into a newline (both
      // engines' replace is the same left-to-right non-overlapping scan):
      // line stats get real duplicate mass, and the word n-grams keep
      // crossing the seams (\s+ spans \n). All outputs are integer counts
      // / multiplicities — a float-free oracle by construction.
      registerAll(s)
      val docs = spread(s.read.parquet(t(dir, "documents")), Seq(col("doc_id")), minBytes = 64 * 1024)
        .withColumn("t2", replace(col("text"), lit(" the "), lit("\n")))
      TextOps.withRepetition(docs, "t2")
        .select(col("doc_id"), col("rep_lines"), col("rep_dup_lines"),
          col("rep_dup_line_chars"), col("rep_words"), col("rep_dup_words"),
          col("rep_top_word"), col("rep_dup_2grams"), col("rep_top_2gram"),
          col("rep_dup_3grams"), col("rep_top_3gram"))
    }),
    "q59_catalog_near" -> ((s, dir) => {
      // the catalog's NEAR (minhash-band) mode under the gate: corpus texts
      // are md5-hex token runs — deterministic and mutually shingle-DISJOINT
      // (random hex shares ~1e-4 jaccard between distinct seeds; a GeoJSON
      // or prose corpus shares scaffolding shingles and would band-collide),
      // so identical text ⇒ certain collision, fresh seed ⇒ none, and the
      // survivor set is the closed-form id%3!=0 slice. (q50 covers exact
      // mode on the documents table.)
      registerAll(s)
      def gib(seed: Column): Column = concat_ws(" ",
        (0 to 5).map(k => md5(concat(lit(s"tok$k-"), seed.cast("string")))): _*)
      val corpus = s.range(2000).select(col("id").as("doc_id"), gib(col("id")).as("text"))
      val cat = java.nio.file.Files.createTempDirectory("graft_q59").toString + "/catalog"
      Dedup.writeCatalog(corpus, "doc_id", "text", cat)
      val shard = s.range(2000).select((col("id") + 40000L).as("doc_id"),
        gib(when(col("id") % 3 === 0, col("id")).otherwise(col("id") + 90000L)).as("text"))
      Dedup.dedupAgainst(shard, "doc_id", "text", cat, mode = "near")
        .select(col("doc_id"))
    }),
    "q58_pip_indexed" -> ((s, dir) => {
      // the PERSISTED spatial index path: polygons cover-indexed once to
      // parquet, the point batch joins the stored (cell, geometry) rows —
      // identical result to q03's inline pipJoin, same oracle
      registerAll(s)
      val idx = java.nio.file.Files.createTempDirectory("graft_q58").toString + "/spidx"
      SpatialJoins.writeCoverIndex(regionPolys(s, dir), "r_regionkey", "geom", idx, res = 2)
      SpatialJoins.pipJoinWithIndex(customerPoints(s, dir), "lng", "lat", idx)
        .select(col("c_custkey"), col("r_regionkey"))
    }),
    "q57_convex_hull" -> ((s, dir) => {
      // convex hull end-to-end: a scrambled 4x3 MultiPoint grid per nation —
      // the minimal hull is the 4 grid corners in canonical CCW order from
      // the smallest vertex, which is exactly the box-ring builder's order
      registerAll(s)
      val x0 = (col("n_nationkey") * 3 % 40).cast("long")
      val y0 = (col("n_nationkey") * 2 % 30).cast("long")
      // scramble insertion order with k*5 mod 12 (order must not matter)
      val pts = (0 until 12).map(j => (j * 5) % 12).map { k =>
        concat(lit("["), (x0 + (k % 4) * 2).cast("string"), lit(","),
          (y0 + (k / 4) * 2).cast("string"), lit("]"))
      }
      val json = concat(
        lit("""{"type":"MultiPoint","coordinates":[""") +:
          pts.zipWithIndex.map { case (p, i) =>
            if (i == 0) p else concat(lit(","), p) } :+ lit("]}"): _*)
      s.read.parquet(t(dir, "nation")).select(col("n_nationkey"),
        to_geojson_geom(call_function("st_convex_hull",
          from_geojson_geom(json))).as("hull"))
    }),
    "q56_simplify" -> ((s, dir) => {
      // Douglas-Peucker end-to-end (parse → simplify → serialize): a 6-point
      // zigzag whose survivor set is closed-form at tol 0.8 — the three
      // near-chord points (max deviation 3/√17 ≈ 0.73) drop, the unit peak
      // (deviation 1) survives; integer coordinates render canonically
      registerAll(s)
      val x0 = (col("n_nationkey") * 7 % 50).cast("long")
      def xs(k: Int) = (x0 + k).cast("string")
      val json = concat(lit("""{"type":"LineString","coordinates":[["""),
        xs(0), lit(",0],["), xs(1), lit(",0],["), xs(2), lit(",0],["),
        xs(3), lit(",0],["), xs(4), lit(",1],["), xs(5), lit(",0]]}"))
      s.read.parquet(t(dir, "nation")).select(col("n_nationkey"),
        to_geojson_geom(call_function("st_simplify",
          from_geojson_geom(json), lit(0.8))).as("simplified"))
    }),
    "q55_asof_join" -> ((s, dir) => {
      // backward as-of join: every event enriched with the latest per-user
      // "config version" mark at or before it; marks are synthesized with
      // UNIQUE (user, ts) and per-user jitter, and the oracle is DuckDB's
      // NATIVE ASOF JOIN — a cross-engine semantic check of the operator
      // NO spread here: asofJoinSharded exchanges on (user_id, shard), so a
      // user_id pre-repartition cannot be reused and just adds a shuffle
      // (measured 0.86 -> 1.11 s)
      val ev = s.read.parquet(t(dir, "events"))
        .select(col("event_id"), col("user_id"),
          (unix_micros(col("ts").cast("timestamp")) / 1000L).cast("long").as("ts_ms"))
      val marks = s.read.parquet(t(dir, "events")).select("user_id").distinct()
        .withColumn("k", explode(sequence(lit(0), lit(9))))
        .select(col("user_id"),
          (lit(1704067200000L) + col("k") * 259200000L + (col("user_id") % 1000L) * 1000L)
            .as("mark_ms"),
          col("k").cast("long").as("version"))
      // the SHARDED (hot-key-safe) path under the cross-engine oracle: one
      // week per time shard, output identical to the unsharded asofJoin
      // (equality spec-pinned in OpsSpec on a planted one-hot-key corpus)
      graft.ops.TemporalJoins.asofJoinSharded(ev, marks, "user_id", "ts_ms", "mark_ms",
          Seq("version"), shardWidth = 7L * 86400000L)
        .select(col("event_id"), col("user_id"), col("version"))
    }),
    "q54_distance_join" -> ((s, dir) => {
      // within-distance join (the set-returning sibling of kNN): q35's query
      // set (every 5th query polar) vs the customer points at 300 km — the
      // oracle is the brute-force haversine filter
      registerAll(s)
      val qs = s.read.parquet(t(dir, "nation"))
        .withColumn("qlng", (col("n_nationkey") * 104729L % 36000L) / 100.0 - 180.0)
        .withColumn("qlat", when(col("n_nationkey") % 5 === 0,
            lit(89.9) - (col("n_nationkey") % 7).cast("double"))
          .otherwise((col("n_nationkey") * 7919L % 16000L) / 100.0 - 80.0))
        .select("n_nationkey", "qlng", "qlat")
      SpatialJoins.distanceJoin(qs, "qlng", "qlat",
          customerPoints(s, dir).select("c_custkey", "lng", "lat"), "lng", "lat",
          maxDistM = 300000.0, minLevel = 4, maxLevel = 9)
        .select(col("n_nationkey"), col("c_custkey"))
    }),
    "q53_tile_mosaic" -> ((s, dir) => {
      // pyramid rollup: z=8 tiles collapse into one 16x16 mosaic per z=7
      // parent; dims are constant, member/quadrant counts are closed-form
      // from the deterministic image positions (pixel content is pinned
      // byte-exactly in OpsSpec — averages aren't ANSI-SQL-reproducible)
      registerAll(s)
      val imgs  = ImageGen.withLngLat(ImageGen.table(s, 2000))
      val tiled = SpatialJoins.assignTiles(imgs, "lng", "lat", z = 8)
      val m = Multimodal.mosaicTiles(tiled, "tile_key", "bytes")
      m.select(tile_x(col("tile_key")).as("ptx"), tile_y(col("tile_key")).as("pty"),
        Multimodal.image_meta(col("mosaic")).getField("w").as("w"),
        Multimodal.image_meta(col("mosaic")).getField("h").as("h"),
        col("n_images").as("n"), col("n_quadrants").as("nq"))
    }),
    "q52_line_intersects" -> ((s, dir) => {
      // LINE-polygon intersects join: axis-aligned segments (horizontal for
      // even keys, vertical for odd) vs the region boxes — both reduce to
      // exact interval arithmetic in SQL. Fractional parts .997/.003 vs the
      // boxes' .995/.005 guarantee strict crossing-or-disjoint (no touches).
      registerAll(s)
      val a = regionPolys(s, dir)
      val l0 = s.read.parquet(t(dir, "nation"))
        .withColumn("x1", (col("n_nationkey") * 41 % 320).cast("double") - 170.003)
        .withColumn("y1", (col("n_nationkey") * 13 % 130).cast("double") - 65.003)
        .withColumn("horiz", col("n_nationkey") % 2 === 0)
        .withColumn("x2", when(col("horiz"), col("x1") + 30.0).otherwise(col("x1")))
        .withColumn("y2", when(col("horiz"), col("y1")).otherwise(col("y1") + 25.0))
      val ljson = concat(lit("""{"type":"LineString","coordinates":[["""),
        col("x1").cast("string"), lit(","), col("y1").cast("string"), lit("],["),
        col("x2").cast("string"), lit(","), col("y2").cast("string"), lit("]]}"))
      val lines = l0.select(col("n_nationkey"), from_geojson_geom(ljson).as("geom"))
      SpatialJoins.intersectsJoin(a, "r_regionkey", "geom",
        lines, "n_nationkey", "geom", minLevel = 2, maxLevel = 8)
    }),
    "q51_area_m2" -> ((s, dir) => {
      // geodesic area: for axis-aligned boxes the linear-edge spherical
      // integral reduces EXACTLY to the spherical zone R²·Δλ·(sinφn − sinφs),
      // which the oracle computes in closed form; rounded at 2dp of km² so
      // libm ulp differences between engines cannot flip the hash
      registerAll(s)
      regionPolys(s, dir).select(col("r_regionkey"),
        round(st_area_m2(col("geom")) / 1e6, 2).as("area_km2"))
    }),
    "q50_catalog_dedup" -> ((s, dir) => {
      // incremental dedup vs a persisted signature catalog: the corpus is
      // cataloged once, then a NEW shard (fresh ids) re-contains every
      // d%3==0 document verbatim while the rest carry fresh text — exact
      // (hash,len) matching is deterministic, so the survivor set is the
      // closed-form d%3!=0 slice; the catalog side never shuffles (plan
      // pinned in OpsSpec)
      registerAll(s)
      val docs = s.read.parquet(t(dir, "documents")).select("doc_id", "text")
      val cat = java.nio.file.Files.createTempDirectory("graft_q50").toString + "/catalog"
      Dedup.writeCatalog(docs, "doc_id", "text", cat)
      val shard = docs.select((col("doc_id") + 40000L).as("doc_id"),
        when(col("doc_id") % 3 === 0, col("text"))
          .otherwise(concat(lit("fresh shard doc "), col("doc_id").cast("string"),
            lit(" "), col("text"))).as("text"))
      Dedup.dedupAgainst(shard, "doc_id", "text", cat, mode = "exact")
    }),
    "q25_s2_cells" -> ((s, dir) => {
      registerAll(s)
      // S2 cell ids under the gate: the oracle replays the whole derivation
      // in SQL — radians (Java's deg/180*π op order), xyz, face dispatch,
      // gnomonic u/v, the quadratic s/t transform, the level-12 grid snap,
      // a 12-step recursive-CTE Hilbert walk, and HUGEINT id packing with
      // the signed wrap (the q66/q86 replay discipline)
      customerPoints(s, dir)
        .withColumn("cell", s2_cell(col("lng"), col("lat"), lit(12)))
        .withColumn("parent8", s2_range_min(col("cell"))) // touch helpers
        .groupBy(col("cell")).agg(count(lit(1)).as("n"))
    }))

  // -------------------------------------------------------------- oracles

  private val bruteTopKSql =
    """WITH qs AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < 20),
      |d AS (SELECT q.qid, c.vec_id,
      |  list_cosine_similarity(q.qvec, c.embedding) AS cosine
      |  FROM qs q CROSS JOIN embeddings c)
      |SELECT qid, vec_id, rank FROM (
      |  SELECT qid, vec_id,
      |    row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rank
      |  FROM d) WHERE rank <= 3""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "q01_parse_extract" ->
      s"""WITH pts AS ($customerPointsSql)
         |SELECT c_custkey, 'Point' AS gtype, lng, lat FROM pts""".stripMargin,
    "q02_roundtrip" ->
      s"""WITH pts AS ($customerPointsSql)
         |SELECT c_custkey, round(lng, 2) AS lng, round(lat, 2) AS lat FROM pts""".stripMargin,
    "q03_pip_join" ->
      s"""WITH pts AS ($customerPointsSql), box AS ($regionBoxesSql)
         |SELECT p.c_custkey, b.r_regionkey FROM pts p, box b
         |WHERE p.lng > b.w AND p.lng < b.e AND p.lat > b.s AND p.lat < b.n""".stripMargin,
    "q04_knn" ->
      s"""WITH pts AS ($customerPointsSql),
         |qs AS (SELECT n_nationkey,
         |  (n_nationkey * 104729 % 36000)/100.0 - 180.0 AS qlng,
         |  (n_nationkey * 7919 % 16800)/100.0 - 84.0 AS qlat FROM nation),
         |d AS (SELECT q.n_nationkey, p.c_custkey, p.lng, p.lat,
         |  $haversineSql AS dist_m FROM qs q CROSS JOIN pts p)
         |SELECT n_nationkey, c_custkey, rank FROM (
         |  SELECT n_nationkey, c_custkey,
         |    row_number() OVER (PARTITION BY n_nationkey ORDER BY dist_m, lng, lat) AS rank
         |  FROM d) WHERE rank <= 3""".stripMargin,
    "q35_knn_s2" ->
      s"""WITH pts AS ($customerPointsSql),
         |qs AS (SELECT n_nationkey,
         |  (n_nationkey * 104729 % 36000)/100.0 - 180.0 AS qlng,
         |  CASE WHEN n_nationkey % 5 = 0 THEN 89.9 - CAST(n_nationkey % 7 AS DOUBLE)
         |       ELSE (n_nationkey * 7919 % 16000)/100.0 - 80.0 END AS qlat FROM nation),
         |d AS (SELECT q.n_nationkey, p.c_custkey, p.lng, p.lat,
         |  $haversineSql AS dist_m FROM qs q CROSS JOIN pts p)
         |SELECT n_nationkey, c_custkey, rank FROM (
         |  SELECT n_nationkey, c_custkey,
         |    row_number() OVER (PARTITION BY n_nationkey ORDER BY dist_m, lng, lat) AS rank
         |  FROM d) WHERE rank <= 3""".stripMargin,
    "q05_tiles" ->
      s"""WITH pts AS ($customerPointsSql)
         |SELECT c_custkey,
         |  CAST(floor((lng + 180.0) / 360.0 * 1024) AS BIGINT) AS tx,
         |  CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * 1024) AS BIGINT) AS ty
         |FROM pts""".stripMargin,
    "q06_tile_rollup" ->
      s"""WITH pts AS ($customerPointsSql)
         |SELECT CAST(floor((lng + 180.0) / 360.0 * 64) AS BIGINT) AS tx,
         |  CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * 64) AS BIGINT) AS ty,
         |  count(*) AS n
         |FROM pts GROUP BY 1, 2""".stripMargin,
    "q24_flagship" ->
      // the flagship PIP join, fully replayed: the 3 bundled fixture
      // geometries as literal vertices (part/ring/idx structure mirrors
      // packGeometry), the 40 translated copies via the engine's exact
      // pmod-wrap translate, then GeoAlgo.contains re-derived — per-ring
      // even-odd ray-cast (identical xint op order), the antimeridian
      // winding fallback on rings with a consecutive lng jump > 180°
      // (recursive-CTE unwrap reproducing the sequential cur+=delta
      // rounding, wn at x and x±360), ring parity per part, OR over parts
      """WITH RECURSIVE imgs AS (
        |  SELECT 'img_' || range AS image_id, (range * 48271) % 2147483647 AS h FROM range(5000)),
        |pts AS (SELECT image_id, (h % 36000)/100.0 - 180.0 AS px,
        |               ((h // 36000) % 16800)/100.0 - 84.0 AS py FROM imgs),
        |verts(f, part, ring, idx, vx, vy) AS (VALUES
        |  ('polygon', 0, 0, 0, 100.0, 0.0), ('polygon', 0, 0, 1, 101.0, 0.0),
        |  ('polygon', 0, 0, 2, 101.0, 1.0), ('polygon', 0, 0, 3, 100.0, 1.0),
        |  ('polygon', 0, 0, 4, 100.0, 0.0),
        |  ('multi_polygon', 0, 0, 0, 102.0, 2.0), ('multi_polygon', 0, 0, 1, 103.0, 2.0),
        |  ('multi_polygon', 0, 0, 2, 103.0, 3.0), ('multi_polygon', 0, 0, 3, 102.0, 3.0),
        |  ('multi_polygon', 0, 0, 4, 102.0, 2.0),
        |  ('multi_polygon', 1, 0, 0, 100.0, 0.0), ('multi_polygon', 1, 0, 1, 101.0, 0.0),
        |  ('multi_polygon', 1, 0, 2, 101.0, 1.0), ('multi_polygon', 1, 0, 3, 100.0, 1.0),
        |  ('multi_polygon', 1, 0, 4, 100.0, 0.0),
        |  ('multi_polygon', 1, 1, 0, 100.2, 0.2), ('multi_polygon', 1, 1, 1, 100.2, 0.8),
        |  ('multi_polygon', 1, 1, 2, 100.8, 0.8), ('multi_polygon', 1, 1, 3, 100.8, 0.2),
        |  ('multi_polygon', 1, 1, 4, 100.2, 0.2),
        |  ('geo_with_bbox', 0, 0, 0, 100.0, 0.0), ('geo_with_bbox', 0, 0, 1, 101.0, 0.0),
        |  ('geo_with_bbox', 0, 0, 2, 101.0, 1.0), ('geo_with_bbox', 0, 0, 3, 100.0, 1.0),
        |  ('geo_with_bbox', 0, 0, 4, 100.0, 0.0)),
        |copies AS (SELECT range AS copy,
        |    ((range * 7.3 + 13.0) % 340.0) - 170.0 AS dlng,
        |    ((range * 3.1) % 140.0) - 70.0 AS dlat
        |  FROM range(40)),
        |tv AS (SELECT f, copy, part, ring, idx,
        |    (CASE WHEN m < 0 THEN m + 360.0 ELSE m END) - 180.0 AS vx, vy + dlat AS vy
        |  FROM (SELECT f, copy, part, ring, idx,
        |          (vx + dlng + 180.0) % 360.0 AS m, vy, dlat
        |        FROM verts, copies) q),
        |edges AS (SELECT f, copy, part, ring, idx,
        |    lag(vx) OVER w AS x1, lag(vy) OVER w AS y1, vx AS x2, vy AS y2
        |  FROM tv WINDOW w AS (PARTITION BY f, copy, part, ring ORDER BY idx)),
        |rings AS (SELECT f, copy, part, ring,
        |    max(CASE WHEN abs(x2 - x1) > 180.0 THEN 1 ELSE 0 END) AS crosses
        |  FROM edges WHERE x1 IS NOT NULL GROUP BY 1, 2, 3, 4),
        |unw AS (
        |  SELECT f, copy, part, ring, idx, vx AS ux, vy FROM tv WHERE idx = 0
        |  UNION ALL
        |  SELECT t.f, t.copy, t.part, t.ring, t.idx,
        |    u.ux + (CASE WHEN t.vx - u.ux > 180.0 THEN t.vx - u.ux - 360.0
        |                 WHEN t.vx - u.ux < -180.0 THEN t.vx - u.ux + 360.0
        |                 ELSE t.vx - u.ux END), t.vy
        |  FROM tv t JOIN unw u ON t.f = u.f AND t.copy = u.copy
        |    AND t.part = u.part AND t.ring = u.ring AND t.idx = u.idx + 1),
        |uedges AS (SELECT f, copy, part, ring, idx,
        |    lag(ux) OVER w2 AS x1, lag(vy) OVER w2 AS y1, ux AS x2, vy AS y2
        |  FROM unw WINDOW w2 AS (PARTITION BY f, copy, part, ring ORDER BY idx)),
        |cr AS (SELECT p.image_id, e.f, e.copy, e.part, e.ring,
        |    sum(CASE WHEN (e.y2 > p.py) <> (e.y1 > p.py)
        |             AND p.px < (e.x1 - e.x2) * (p.py - e.y2) / (e.y1 - e.y2) + e.x2
        |             THEN 1 ELSE 0 END) AS crossings
        |  FROM pts p, edges e WHERE e.x1 IS NOT NULL GROUP BY 1, 2, 3, 4, 5),
        |wn AS (SELECT t.image_id, t.f, t.copy, t.part, t.ring,
        |    max(CASE WHEN wsum <> 0 THEN 1 ELSE 0 END) AS wany
        |  FROM (SELECT p2.image_id AS image_id, e2.f, e2.copy, e2.part, e2.ring, sh.s AS sh,
        |          sum(CASE WHEN e2.y1 <= p2.py AND e2.y2 > p2.py
        |                   AND (e2.x2 - e2.x1) * (p2.py - e2.y1) - (p2.px + sh.s - e2.x1) * (e2.y2 - e2.y1) > 0
        |                   THEN 1
        |                   WHEN e2.y1 > p2.py AND e2.y2 <= p2.py
        |                   AND (e2.x2 - e2.x1) * (p2.py - e2.y1) - (p2.px + sh.s - e2.x1) * (e2.y2 - e2.y1) < 0
        |                   THEN -1 ELSE 0 END) AS wsum
        |        FROM pts p2, uedges e2, (VALUES (0.0), (360.0), (-360.0)) sh(s)
        |        JOIN rings r2 ON r2.f = e2.f AND r2.copy = e2.copy
        |          AND r2.part = e2.part AND r2.ring = e2.ring AND r2.crosses = 1
        |        WHERE e2.x1 IS NOT NULL
        |        GROUP BY 1, 2, 3, 4, 5, 6) t
        |  GROUP BY 1, 2, 3, 4, 5),
        |ring_in AS (SELECT c.image_id, c.f, c.copy, c.part, c.ring,
        |    CASE WHEN r.crosses = 1 THEN coalesce(w.wany, 0) = 1
        |         ELSE c.crossings % 2 = 1 END AS inside
        |  FROM cr c
        |  JOIN rings r ON r.f = c.f AND r.copy = c.copy AND r.part = c.part AND r.ring = c.ring
        |  LEFT JOIN wn w ON w.image_id = c.image_id AND w.f = c.f AND w.copy = c.copy
        |    AND w.part = c.part AND w.ring = c.ring),
        |part_in AS (SELECT image_id, f, copy, part,
        |    sum(CASE WHEN inside THEN 1 ELSE 0 END) % 2 = 1 AS inside
        |  FROM ring_in GROUP BY 1, 2, 3, 4)
        |SELECT image_id, f || '#' || copy AS poly_id
        |FROM part_in WHERE inside GROUP BY 1, 2""".stripMargin,
    "q25_s2_cells" ->
      // full S2 cell-id replay: Java toRadians is deg/180*π (NOT deg*(π/180)
      // — last-ulp different), xyz with cos(lat) factored exactly as the
      // engine computes it, face dispatch with the same tie order, gnomonic
      // u/v per face, quadratic s/t, floor to the 4096 grid, then a 12-step
      // Hilbert walk (recursive CTE, one row per point per step) and
      // [face:3][pos<<37][1<<36] packing via HUGEINT with the signed wrap
      s"""WITH RECURSIVE pts AS ($customerPointsSql),
         |rad AS (SELECT c_custkey, lng/180.0*pi() AS lngr, lat/180.0*pi() AS latr FROM pts),
         |xyz AS (SELECT c_custkey, cos(latr)*cos(lngr) AS x, cos(latr)*sin(lngr) AS y,
         |               sin(latr) AS z FROM rad),
         |fc AS (SELECT c_custkey, x, y, z,
         |  CASE WHEN abs(x) >= abs(y) AND abs(x) >= abs(z) THEN (CASE WHEN x >= 0 THEN 0 ELSE 3 END)
         |       WHEN abs(y) >= abs(x) AND abs(y) >= abs(z) THEN (CASE WHEN y >= 0 THEN 1 ELSE 4 END)
         |       ELSE (CASE WHEN z >= 0 THEN 2 ELSE 5 END) END AS f FROM xyz),
         |uv AS (SELECT c_custkey, f,
         |  CASE f WHEN 0 THEN y/x WHEN 1 THEN -x/y WHEN 2 THEN -x/z
         |         WHEN 3 THEN z/x WHEN 4 THEN z/y ELSE -y/z END AS u,
         |  CASE f WHEN 0 THEN z/x WHEN 1 THEN z/y WHEN 2 THEN -y/z
         |         WHEN 3 THEN y/x WHEN 4 THEN -x/y ELSE x/z END AS v FROM fc),
         |st AS (SELECT c_custkey, f,
         |  CASE WHEN u >= 0 THEN 0.5*sqrt(1.0 + 3.0*u) ELSE 1.0 - 0.5*sqrt(1.0 - 3.0*u) END AS ss,
         |  CASE WHEN v >= 0 THEN 0.5*sqrt(1.0 + 3.0*v) ELSE 1.0 - 0.5*sqrt(1.0 - 3.0*v) END AS tt
         |  FROM uv),
         |ij AS (SELECT c_custkey, f,
         |  least(CAST(4095 AS BIGINT), greatest(CAST(0 AS BIGINT), CAST(floor(ss * 4096) AS BIGINT))) AS i,
         |  least(CAST(4095 AS BIGINT), greatest(CAST(0 AS BIGINT), CAST(floor(tt * 4096) AS BIGINT))) AS j
         |  FROM st),
         |hil AS (
         |  SELECT c_custkey, f, i AS hx, j AS hy, CAST(0 AS BIGINT) AS d, CAST(2048 AS BIGINT) AS s
         |  FROM ij
         |  UNION ALL
         |  SELECT c_custkey, f,
         |    CASE WHEN ry = 0 AND rx = 1 THEN s - 1 - hy WHEN ry = 0 THEN hy ELSE hx END,
         |    CASE WHEN ry = 0 AND rx = 1 THEN s - 1 - hx WHEN ry = 0 THEN hx ELSE hy END,
         |    d + s * s * xor(3 * rx, ry),
         |    s // 2
         |  FROM (SELECT c_custkey, f, hx, hy, d, s,
         |          CASE WHEN (hx & s) > 0 THEN 1 ELSE 0 END AS rx,
         |          CASE WHEN (hy & s) > 0 THEN 1 ELSE 0 END AS ry
         |        FROM hil WHERE s > 0) t),
         |packed AS (SELECT c_custkey,
         |    CAST(f AS HUGEINT) * CAST('2305843009213693952' AS HUGEINT)
         |    + CAST(d AS HUGEINT) * 137438953472 + 68719476736 AS idu
         |  FROM hil WHERE s = 0)
         |SELECT CAST(idu - CASE WHEN idu >= CAST('9223372036854775808' AS HUGEINT)
         |                       THEN CAST('18446744073709551616' AS HUGEINT) ELSE 0 END AS BIGINT) AS cell,
         |  count(*) AS n
         |FROM packed GROUP BY 1""".stripMargin,
    "q26_parse_errors" ->
      """SELECT doc_id, CASE WHEN doc_id % 2 = 0
        |  THEN 'Unknown type of geometry Wibble'
        |  ELSE 'A Geojson text should contain one object with a member `type`.'
        |  END AS err,
        |  1 AS eline,
        |  CASE WHEN doc_id % 2 = 0 THEN 35 ELSE 13 END AS ecol
        |FROM documents""".stripMargin,
    "q27_fold_props" -> "SELECT DISTINCT n_name AS name FROM nation",
    "q37_distance" ->
      s"""WITH pts AS ($customerPointsSql), box AS ($regionBoxesSql)
         |SELECT p.c_custkey, b.r_regionkey,
         |  round(sqrt(
         |    pow(greatest(b.w - p.lng, p.lng - b.e, 0), 2) +
         |    pow(greatest(b.s - p.lat, p.lat - b.n, 0), 2)), 6) AS dist_deg
         |FROM pts p CROSS JOIN box b WHERE p.c_custkey <= 200""".stripMargin,
    "q36_intersects" ->
      s"""WITH box AS ($regionBoxesSql),
         |b AS (SELECT n_nationkey,
         |  (n_nationkey * 37 % 300) - 160.003 AS w2,
         |  (n_nationkey * 37 % 300) - 160.003 + 25.0 AS e2,
         |  (n_nationkey * 17 % 110) - 55.003 AS s2,
         |  (n_nationkey * 17 % 110) - 55.003 + 20.0 AS n2 FROM nation)
         |SELECT r.r_regionkey, b.n_nationkey FROM box r, b
         |WHERE r.w < b.e2 AND b.w2 < r.e AND r.s < b.n2 AND b.s2 < r.n""".stripMargin,
    "q30_geojson_source" ->
      "SELECT n_name AS name, CAST(n_nationkey AS DOUBLE) AS lng FROM nation",
    "q28_map_props" -> "SELECT n_nationkey, upper(n_name) AS name FROM nation",
    "q31_measures" ->
      s"""WITH box AS ($regionBoxesSql)
         |SELECT r_regionkey, round((e - w) * (n - s), 6) AS area_deg2,
         |       round((w + e) / 2, 6) AS clng, round((s + n) / 2, 6) AS clat
         |FROM box""".stripMargin,
    "q07_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  count(*) AS n, count(DISTINCT l_orderkey) AS n_orders
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "q08_join_agg" ->
      """SELECT c_mktsegment, count(*) AS n,
        |  CAST(sum(CAST(round(o_totalprice * 100.0, 0) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1""".stripMargin,
    "q09_window" ->
      """SELECT o_custkey, o_orderkey, rank FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rank
        |  FROM orders) WHERE rank <= 2""".stripMargin,
    "q10_events" ->
      """SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS users,
        |  CAST(sum(CAST(regexp_extract(props, '(\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
        |FROM events GROUP BY 1""".stripMargin,
    "q11_dedup_exact" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL SELECT doc_id + 10000, text FROM documents)
        |SELECT c.doc_id, m.canonical_id, c.doc_id <> m.canonical_id AS is_dup
        |FROM corpus c JOIN (
        |  SELECT text, min(doc_id) AS canonical_id FROM corpus GROUP BY text) m
        |USING (text)""".stripMargin,
    "q12_tokens" ->
      """SELECT doc_id,
        |  length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
        |  length(text) AS n_chars_check FROM documents""".stripMargin,
    "q13_quality_counts" ->
      """SELECT doc_id,
        |  length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
        |  length(text) - length(replace(text, ' ', '')) AS n_spaces FROM documents""".stripMargin,
    "q14_lang_dist" ->
      "SELECT lang, count(*) AS n, CAST(sum(n_chars) AS BIGINT) AS chars FROM documents GROUP BY 1",
    "q17_ann_brute" -> bruteTopKSql,
    "q32_ann_ivf"   -> bruteTopKSql, // nprobe = nlist ⇒ IVF ≡ brute force
    "q18_ann_lsh" ->
      "SELECT vec_id AS qid, vec_id, 1 AS rank FROM embeddings WHERE vec_id < 20",
    "q15_minhash_dups" ->
      "SELECT doc_id AS id_a, doc_id + 10000 AS id_b FROM documents",
    "q16_simhash_dups" ->
      "SELECT doc_id AS id_a, doc_id + 10000 AS id_b FROM documents",
    "q19_embedding_dups" ->
      "SELECT vec_id AS id_a, vec_id + 10000 AS id_b FROM embeddings",
    "q41_shared_passages" ->
      "SELECT doc_id AS id_a, doc_id + 10000 AS id_b FROM documents WHERE length(text) >= 44",
    "q47_geo_phash_dups" ->
      "SELECT range AS id_a, range + 100000 AS id_b FROM range(2000)",
    "q46_video" ->
      """SELECT 'vid_' || range AS video_id,
        |  CAST(8 + range % 5 AS INT) AS w, CAST(6 + range % 4 AS INT) AS h,
        |  CAST(4 + range % 3 AS INT) AS n_frames,
        |  CAST(10 + (4 + range % 3) * (8 + range % 5) * (6 + range % 4) * 3 AS INT) AS n_bytes
        |FROM range(1500)""".stripMargin,
    "q49_redact_pii" ->
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(
        |    text || ' contact user' || doc_id || '@mail.example.com from 10.0.' ||
        |      (doc_id % 250) || '.7 or call +1 555 000 ' || (doc_id % 9000 + 1000) || ' now',
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\+\d[\d .-]{7,}\d', '<PHONE>', 'g') AS text
        |FROM documents""".stripMargin,
    "q48_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE (doc_id * 2654435761 % 4294967296) * 1000 // 4294967296 <
        |  CASE lang WHEN 'en' THEN 500 WHEN 'de' THEN 250
        |            WHEN 'fr' THEN 100 WHEN 'zh' THEN 50 ELSE 0 END""".stripMargin,
    "q45_audio" ->
      """WITH s AS (
        |  SELECT a.range AS id, ((a.range * 7919 + r.range * 31) % 256 - 128) AS v
        |  FROM range(2000) a, range(800) r)
        |SELECT 'aud_' || id AS audio_id,
        |  CAST(8000 + id % 3 * 4000 AS INT) AS rate,
        |  CAST(800 AS INT) AS n_samples,
        |  CAST(sum(v * v) AS BIGINT) AS energy
        |FROM s GROUP BY id""".stripMargin,
    "q42_sample" ->
      """SELECT doc_id FROM documents
        |WHERE (doc_id * 2654435761 % 4294967296) * 1000 // 4294967296 < 250""".stripMargin,
    "q43_pack_plan" ->
      """SELECT doc_id, lang, CAST((cum - n) // 512 AS BIGINT) AS bin,
        |  CAST(cum - n AS BIGINT) AS bin_offset
        |FROM (
        |  SELECT doc_id, lang, n,
        |    sum(n) OVER (PARTITION BY lang ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM (SELECT doc_id, lang,
        |          CASE WHEN length(trim(text)) = 0 THEN 0
        |               ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n
        |        FROM documents))""".stripMargin,
    "q44_contamination" ->
      "SELECT doc_id AS corpus_id, doc_id + 50000 AS bench_id FROM documents WHERE doc_id % 10 = 0 AND length(text) >= 44",
    "q40_json_update" ->
      """SELECT n_nationkey,
        |  '{"type":"Feature","properties":{"name":"' || n_name ||
        |  '","rank":' || CAST(n_nationkey * 2 AS BIGINT) ||
        |  '},"extra":{"v":1}}' AS doc
        |FROM nation""".stripMargin,
    "q63_tile_clip" ->
      """WITH b AS (SELECT n_nationkey,
        |    CAST(n_nationkey * 31 % 280 - 150 AS DOUBLE) + CAST(0.003 AS DOUBLE) AS bw,
        |    CAST(n_nationkey * 23 % 100 - 55 AS DOUBLE) + CAST(0.003 AS DOUBLE) AS bs
        |  FROM nation),
        |t AS (SELECT x.range AS tx, y.range AS ty,
        |    x.range * 45.0 - 180.0 AS tw, x.range * 45.0 - 135.0 AS te,
        |    degrees(atan((exp(pi() * (1 - 2*(y.range+1)/8.0))
        |                - exp(-pi() * (1 - 2*(y.range+1)/8.0))) / 2)) AS tb,
        |    degrees(atan((exp(pi() * (1 - 2*y.range/8.0))
        |                - exp(-pi() * (1 - 2*y.range/8.0))) / 2)) AS tt
        |  FROM range(8) x, range(8) y)
        |SELECT b.n_nationkey, t.tx, t.ty,
        |  CAST(round((least(b.bw + 37.0, t.te) - greatest(b.bw, t.tw)) *
        |             (least(b.bs + 23.0, t.tt) - greatest(b.bs, t.tb)) * 1000.0)
        |       AS BIGINT) AS area_u3
        |FROM b, t
        |WHERE least(b.bw + 37.0, t.te) > greatest(b.bw, t.tw)
        |  AND least(b.bs + 23.0, t.tt) > greatest(b.bs, t.tb)""".stripMargin,
    "q61_pq_ann" ->
      """WITH c AS (SELECT id AS vec_id,
        |    list_transform([0,1,2,3,4,5,6,7],
        |      d -> CAST((id * (d + 2) + d * d) % (d + 5) + 1 AS DOUBLE)) AS v
        |  FROM (SELECT range AS id FROM range(500))),
        |q AS (SELECT vec_id AS qid, v AS qv FROM c WHERE vec_id % 25 = 0),
        |d AS (SELECT q.qid, c.vec_id, list_cosine_similarity(q.qv, c.v) AS cos
        |      FROM q CROSS JOIN c)
        |SELECT qid, vec_id, rank FROM (
        |  SELECT qid, vec_id,
        |    row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
        |  FROM d) WHERE rank <= 5""".stripMargin,
    "q64_repetition" ->
      // tokens = whitespace runs (empties filtered: regexp split emits a
      // leading "" when the text starts with non-space whitespace); all
      // outputs integer — no float crosses the engine boundary
      """WITH src AS (
        |  SELECT doc_id, replace(text, ' the ', chr(10)) AS t FROM documents),
        |base AS (
        |  SELECT doc_id,
        |    list_filter(string_split(t, chr(10)), x -> trim(x) <> '') AS lines,
        |    list_filter(regexp_split_to_array(trim(t), '\s+'), x -> x <> '') AS ws
        |  FROM src),
        |g AS (
        |  SELECT doc_id, lines, ws,
        |    list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS g2,
        |    list_transform(range(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
        |  FROM base)
        |SELECT doc_id,
        |  CAST(len(lines) AS INT) AS rep_lines,
        |  CAST(len(lines) - len(list_distinct(lines)) AS INT) AS rep_dup_lines,
        |  CAST(coalesce(list_sum(list_transform(lines, x -> length(x))), 0)
        |     - coalesce(list_sum(list_transform(list_distinct(lines), x -> length(x))), 0)
        |    AS INT) AS rep_dup_line_chars,
        |  CAST(len(ws) AS INT) AS rep_words,
        |  CAST(len(ws) - len(list_distinct(ws)) AS INT) AS rep_dup_words,
        |  CAST(coalesce(list_max(list_transform(list_distinct(ws),
        |    d -> len(list_filter(ws, x -> x = d)))), 0) AS INT) AS rep_top_word,
        |  CAST(len(g2) - len(list_distinct(g2)) AS INT) AS rep_dup_2grams,
        |  CAST(coalesce(list_max(list_transform(list_distinct(g2),
        |    d -> len(list_filter(g2, x -> x = d)))), 0) AS INT) AS rep_top_2gram,
        |  CAST(len(g3) - len(list_distinct(g3)) AS INT) AS rep_dup_3grams,
        |  CAST(coalesce(list_max(list_transform(list_distinct(g3),
        |    d -> len(list_filter(g3, x -> x = d)))), 0) AS INT) AS rep_top_3gram
        |FROM g""".stripMargin,
    "q73_audio_downsample" ->
      // kept sample i of the downsampled stream is source sample i*k:
      // v = (id*7919 + i*k*31) % 256 - 128 (non-negative % operands);
      // count = ceil(800/k), rate = source_rate // k
      """WITH p AS (SELECT range AS id, 2 + range % 3 AS k FROM range(2000)),
        |s AS (SELECT p.id, p.k,
        |        ((p.id * 7919 + (r.range * p.k) * 31) % 256 - 128) AS v
        |      FROM p, range(800) r
        |      WHERE r.range < (800 + p.k - 1) // p.k)
        |SELECT 'aud_' || id AS audio_id,
        |  CAST((8000 + id % 3 * 4000) // k AS INT) AS rate,
        |  CAST((800 + k - 1) // k AS INT) AS n_samples,
        |  CAST(sum(v * v) AS BIGINT) AS energy
        |FROM s GROUP BY id, k""".stripMargin,
    "q72_image_crop" ->
      // q69's pixel-stream replay restricted to the clamped crop window:
      // pixel p = pos//3 sits at (p % w, p // w); the crop keeps
      // [x0, min(w, x0+cw)) × [y0, min(h, y0+ch)) — never empty here since
      // x0 <= 4 < 8 <= w and y0 <= 3 < 8 <= h
      """WITH RECURSIVE img AS (
        |  SELECT range AS id, CAST(8 + range % 9 AS BIGINT) AS w,
        |         CAST(8 + range % 7 AS BIGINT) AS h, (range % 3 = 0) AS lossy,
        |         CAST(8 + range % 9 AS BIGINT) * (8 + range % 7) * 3 AS nb,
        |         range % 5 AS x0, range % 4 AS y0,
        |         4 + range % 3 AS cw, 3 + range % 2 AS ch
        |  FROM range(2000)),
        |cfg AS (SELECT id, w, lossy, nb, (nb - 8) // 8 + 1 AS nchunks,
        |         nb - ((nb - 8) // 8 + 1) * 8 AS nrem,
        |         x0, y0, least(w, x0 + cw) AS xe, least(h, y0 + ch) AS ye FROM img),
        |steps AS (
        |  SELECT id, CAST(0 AS BIGINT) AS k,
        |         CAST(id * 2654435761 + 1442695040888963407 AS UBIGINT) AS x,
        |         nchunks, nrem
        |  FROM cfg
        |  UNION ALL
        |  SELECT id, k + 1,
        |         CAST(xor(CAST(b AS HUGEINT), (CAST(b AS HUGEINT) * 131072) % CAST('18446744073709551616' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT) AS x,
        |         nchunks, nrem
        |  FROM (
        |    SELECT id, k, xor(a, a >> 7) AS b, nchunks, nrem
        |    FROM (
        |      SELECT id, k, CAST(xor(CAST(x AS HUGEINT), (CAST(x AS HUGEINT) * 8192) % CAST('18446744073709551616' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT) AS a,
        |             nchunks, nrem
        |      FROM steps WHERE k < nchunks + nrem))),
        |bytes_ AS (
        |  SELECT s.id, (s.k - 1) * 8 + b.j AS pos,
        |         CAST((s.x >> CAST(b.j * 8 AS INT)) % 256 AS BIGINT) AS v
        |  FROM steps s, (SELECT range AS j FROM range(8)) b
        |  WHERE s.k >= 1 AND s.k <= s.nchunks
        |  UNION ALL
        |  SELECT s.id, s.nchunks * 8 + (s.k - s.nchunks - 1) AS pos,
        |         CAST(s.x % 256 AS BIGINT) AS v
        |  FROM steps s WHERE s.k > s.nchunks),
        |q AS (
        |  SELECT b.id, b.pos % 3 AS chan,
        |         CASE WHEN c.lossy THEN least(252, (b.v + 2) // 4 * 4) ELSE b.v END AS v
        |  FROM bytes_ b JOIN cfg c USING (id)
        |  WHERE b.pos < c.nb
        |    AND (b.pos // 3) % c.w >= c.x0 AND (b.pos // 3) % c.w < c.xe
        |    AND (b.pos // 3) // c.w >= c.y0 AND (b.pos // 3) // c.w < c.ye),
        |g AS (SELECT id, CAST(sum(CASE chan WHEN 0 THEN 299 * v WHEN 1 THEN 587 * v
        |               ELSE 114 * v END) AS BIGINT) AS gray_milli_sum
        |      FROM q GROUP BY id)
        |SELECT 'img_' || c.id AS image_id,
        |       CAST(c.xe - c.x0 AS INT) AS cw, CAST(c.ye - c.y0 AS INT) AS ch,
        |       g.gray_milli_sum
        |FROM cfg c JOIN g USING (id)""".stripMargin,
    "q71_corpus_profile" ->
      // quantile_disc ≡ Spark percentile_disc ≡ the histogram scan
      // (boundary semantics probed on n=4/5/500 and spec-pinned)
      """WITH v AS (SELECT text,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS nt
        |  FROM documents)
        |SELECT count(*) AS n_docs,
        |  CAST(sum(length(text)) AS BIGINT) AS n_chars,
        |  CAST(sum(nt) AS BIGINT) AS n_tokens,
        |  min(nt) AS tok_min, max(nt) AS tok_max,
        |  CAST(count(CASE WHEN nt = 0 THEN 1 END) AS BIGINT) AS n_empty,
        |  CAST(count(DISTINCT text) AS BIGINT) AS n_distinct_texts,
        |  quantile_disc(nt, 0.1) AS tok_p10,
        |  quantile_disc(nt, 0.5) AS tok_p50,
        |  quantile_disc(nt, 0.9) AS tok_p90,
        |  quantile_disc(nt, 0.99) AS tok_p99
        |FROM v""".stripMargin,
    "q70_bow_features" ->
      // row_number over the same total order ⇒ identical dense vocab ids
      """WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
        |                          i -> tk[i] || ' ' || tk[i+1])) AS gram
        |  FROM toks),
        |a AS (SELECT gram, count(*) AS total FROM g GROUP BY gram),
        |v AS (SELECT gram,
        |    CAST(row_number() OVER (ORDER BY total DESC, gram) AS INT) AS vocab_id
        |  FROM a ORDER BY total DESC, gram LIMIT 100)
        |SELECT g.doc_id, v.vocab_id, count(*) AS tf
        |FROM g JOIN v USING (gram)
        |GROUP BY g.doc_id, v.vocab_id""".stripMargin,
    "q69_gray_pixels" ->
      // GRB1 pixel-stream replay: one recursive-CTE row per (image, PRNG
      // step); xorshift64's wrapping left shifts become HUGEINT multiplies
      // mod 2^64 (8192 = 2^13, 131072 = 2^17), logical right shift + xor on
      // UBIGINT. Chunk steps emit 8 little-endian state bytes, remainder
      // steps one low byte (exactly the generator's loop split at nb-7).
      // The seed id*2654435761 + 1442695040888963407 stays below 2^64 for
      // id < 2000, so no wrap is needed there.
      """WITH RECURSIVE img AS (
        |  SELECT range AS id, CAST(8 + range % 9 AS BIGINT) AS w,
        |         CAST(8 + range % 7 AS BIGINT) AS h, (range % 3 = 0) AS lossy,
        |         CAST(8 + range % 9 AS BIGINT) * (8 + range % 7) * 3 AS nb
        |  FROM range(2000)),
        |cfg AS (SELECT id, lossy, nb, (nb - 8) // 8 + 1 AS nchunks,
        |         nb - ((nb - 8) // 8 + 1) * 8 AS nrem FROM img),
        |steps AS (
        |  SELECT id, CAST(0 AS BIGINT) AS k,
        |         CAST(id * 2654435761 + 1442695040888963407 AS UBIGINT) AS x,
        |         nchunks, nrem
        |  FROM cfg
        |  UNION ALL
        |  SELECT id, k + 1,
        |         CAST(xor(CAST(b AS HUGEINT), (CAST(b AS HUGEINT) * 131072) % CAST('18446744073709551616' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT) AS x,
        |         nchunks, nrem
        |  FROM (
        |    SELECT id, k, xor(a, a >> 7) AS b, nchunks, nrem
        |    FROM (
        |      SELECT id, k, CAST(xor(CAST(x AS HUGEINT), (CAST(x AS HUGEINT) * 8192) % CAST('18446744073709551616' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT) AS a,
        |             nchunks, nrem
        |      FROM steps WHERE k < nchunks + nrem))),
        |bytes_ AS (
        |  SELECT s.id, (s.k - 1) * 8 + b.j AS pos,
        |         CAST((s.x >> CAST(b.j * 8 AS INT)) % 256 AS BIGINT) AS v
        |  FROM steps s, (SELECT range AS j FROM range(8)) b
        |  WHERE s.k >= 1 AND s.k <= s.nchunks
        |  UNION ALL
        |  SELECT s.id, s.nchunks * 8 + (s.k - s.nchunks - 1) AS pos,
        |         CAST(s.x % 256 AS BIGINT) AS v
        |  FROM steps s WHERE s.k > s.nchunks),
        |q AS (
        |  SELECT b.id, b.pos,
        |         CASE WHEN c.lossy THEN least(252, (b.v + 2) // 4 * 4) ELSE b.v END AS v
        |  FROM bytes_ b JOIN cfg c USING (id)
        |  WHERE b.pos < c.nb)
        |SELECT 'img_' || id AS image_id,
        |       CAST(sum(CASE pos % 3 WHEN 0 THEN 299 * v WHEN 1 THEN 587 * v
        |                ELSE 114 * v END) AS BIGINT) AS gray_milli_sum
        |FROM q GROUP BY id""".stripMargin,
    "q77_image_ahash" ->
      // per-block luma sums over the replayed pixel stream; bit set iff
      // blockSum·totalPix > totalSum·blockPix (HUGEINT cross-multiplication
      // — the kernel's 128-bit cmpProd). The hash re-assembles as a SUM of
      // distinct powers of two; bit 63 contributes the sign-bit value
      // directly so the signed BIGINT matches Spark's long bit-for-bit.
      (grb1AhashSql(2000) +
        """
          |SELECT 'img_' || id AS image_id, ahash FROM hashes""".stripMargin),
    "q83_audio_quality" ->
      // q45's sample replay with lag/lead: peaks need both neighbors
      // (interior only — CASE nulls at the edges drop out of count),
      // crossings need the previous sample's sign
      """WITH s AS (
        |  SELECT a.range AS id, r.range AS i,
        |         ((a.range * 7919 + r.range * 31) % 256 - 128) AS v
        |  FROM range(2000) a, range(800) r),
        |w AS (SELECT id, v,
        |        lag(v)  OVER (PARTITION BY id ORDER BY i) AS pv,
        |        lead(v) OVER (PARTITION BY id ORDER BY i) AS nv
        |      FROM s)
        |SELECT 'aud_' || id AS audio_id,
        |  CAST(count(CASE WHEN pv < v AND v >= nv THEN 1 END) AS INT) AS n_peaks,
        |  CAST(count(CASE WHEN (pv < 0) <> (v < 0) THEN 1 END) AS INT) AS n_zc
        |FROM w GROUP BY id""".stripMargin,
    "q82_tile_exposure" ->
      // pixel replay (q78) x closed-form lng/lat + Mercator tile (q21),
      // grouped per (tile, bin) with the zero bins kept via the bin grid
      (grb1LumaSql(2000) +
        """,
          |cnt AS (SELECT id, CAST((luma * 8) // 255001 AS INT) AS bin, count(*) AS n
          |        FROM px GROUP BY 1, 2),
          |hsh AS (SELECT id, (id * 48271 % 2147483647) AS h FROM range(2000) t(id)),
          |pts2 AS (SELECT id, (h % 36000)/100.0 - 180.0 AS lng,
          |               ((h // 36000) % 16800)/100.0 - 84.0 AS lat FROM hsh),
          |tiles AS (SELECT id,
          |    CAST(floor((lng + 180.0) / 360.0 * 256) AS BIGINT) AS tx,
          |    CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * 256) AS BIGINT) AS ty
          |  FROM pts2)
          |SELECT tl.tx, tl.ty, CAST(b.range AS INT) AS bin,
          |       CAST(coalesce(sum(c.n), 0) AS BIGINT) AS n_px
          |FROM tiles tl CROSS JOIN range(8) b
          |LEFT JOIN cnt c ON c.id = tl.id AND c.bin = b.range
          |GROUP BY tl.tx, tl.ty, b.range""".stripMargin),
    "q81_erase_box" ->
      // q62's explicit-double re-derivation, negated: part count from the
      // four strict slab conditions, area = subject − intersection, both on
      // the micro-degree integer grid
      s"""WITH box AS (SELECT r_regionkey,
         |  CAST(-170.005 AS DOUBLE) + r_regionkey * CAST(66.0 AS DOUBLE) AS w,
         |  CAST(-170.005 AS DOUBLE) + r_regionkey * CAST(66.0 AS DOUBLE) + CAST(40.0 AS DOUBLE) AS e,
         |  CAST(-60.005 AS DOUBLE) + r_regionkey * CAST(25.0 AS DOUBLE) AS s,
         |  CAST(-60.005 AS DOUBLE) + r_regionkey * CAST(25.0 AS DOUBLE) + CAST(35.0 AS DOUBLE) AS n
         |  FROM region),
         |p AS (SELECT n_nationkey,
         |  CAST(n_nationkey * 29 % 300 - 160 AS DOUBLE) AS pw,
         |  CAST(n_nationkey * 17 % 120 - 65 AS DOUBLE) AS ps FROM nation),
         |j AS (SELECT b.r_regionkey, p.n_nationkey, b.w, b.s, b.e, b.n, p.pw, p.ps,
         |        p.pw + CAST(33.0 AS DOUBLE) AS pe, p.ps + CAST(27.0 AS DOUBLE) AS pn
         |      FROM box b, p)
         |SELECT r_regionkey, n_nationkey,
         |  CAST(CASE WHEN pe <= w OR pw >= e OR pn <= s OR ps >= n THEN 1
         |       ELSE (CASE WHEN pw > w THEN 1 ELSE 0 END) + (CASE WHEN pe < e THEN 1 ELSE 0 END) +
         |            (CASE WHEN ps > s THEN 1 ELSE 0 END) + (CASE WHEN pn < n THEN 1 ELSE 0 END)
         |       END AS INT) AS n_parts,
         |  CAST(round(((e - w) * (n - s) -
         |    CASE WHEN pe <= w OR pw >= e OR pn <= s OR ps >= n THEN CAST(0 AS DOUBLE)
         |         ELSE (least(e, pe) - greatest(w, pw)) * (least(n, pn) - greatest(s, ps)) END
         |    ) * 1000000.0) AS BIGINT) AS area_u6
         |FROM j""".stripMargin,
    "q80_perceptual_catalog" ->
      // the TRUE banded-dedup definition replayed end-to-end: DuckDB
      // re-derives every ahash from pixels, bands both sides 4×16 bits
      // (signed >> then & 65535 ≡ Spark shiftrightunsigned + mask — the
      // mask strips the sign-fill), and anti-joins shard ids within
      // hamming ≤ 3 of a band-sharing catalog hash — no planted closed
      // form, natural collisions agree by construction
      (grb1AhashSql(2500) +
        """,
          |cat AS (SELECT id, ahash FROM hashes WHERE id < 2000),
          |shard AS (SELECT id, ahash FROM hashes
          |          WHERE (id >= 500 AND id < 1000) OR id >= 2000),
          |bnd AS (SELECT range AS band FROM range(4)),
          |catb AS (SELECT c.id, b.band,
          |    (c.ahash >> CAST(b.band * 16 AS INT)) & 65535 AS bh,
          |    c.ahash FROM cat c, bnd b),
          |shb AS (SELECT s.id, b.band,
          |    (s.ahash >> CAST(b.band * 16 AS INT)) & 65535 AS bh,
          |    s.ahash FROM shard s, bnd b),
          |matched AS (SELECT DISTINCT shb.id FROM shb JOIN catb USING (band, bh)
          |  WHERE bit_count(xor(shb.ahash, catb.ahash)) <= 3)
          |SELECT 'img_' || s.id AS image_id, s.ahash
          |FROM shard s ANTI JOIN matched m ON s.id = m.id""".stripMargin),
    "q78_image_histogram" ->
      // exact integer luma histogram: bin = luma·8 // 255001; the full
      // image × bin grid right-joins the counts so zero bins survive
      (grb1LumaSql(2000) +
        """,
          |cnt AS (SELECT id, CAST((luma * 8) // 255001 AS INT) AS bin, count(*) AS n
          |        FROM px GROUP BY 1, 2)
          |SELECT 'img_' || i.id AS image_id, CAST(b.range AS INT) AS bin,
          |       CAST(coalesce(c.n, 0) AS BIGINT) AS n_px
          |FROM img i CROSS JOIN range(8) b
          |LEFT JOIN cnt c ON c.id = i.id AND c.bin = b.range""".stripMargin),
    "q76_weighted_sample" ->
      // q42's Knuth bucket with a per-row threshold (token-count proxy)
      """WITH v AS (SELECT doc_id,
        |    CAST(CASE WHEN length(trim(text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS BIGINT) AS n_tokens_ws
        |  FROM documents)
        |SELECT doc_id, n_tokens_ws FROM v
        |WHERE (doc_id * 2654435761 % 4294967296) * 1000 // 4294967296
        |      < least(n_tokens_ws * 25, 900)""".stripMargin,
    "q75_video_motion" ->
      // per-(video, frame) xorshift64 raster replay (q69's machinery with a
      // recursion keyed on (id, fr) and a seed that WRAPS mod 2^64), then
      // consecutive-frame |Δ| summed by joining frame f with f+1 on pos
      (vid1BytesSql(1500) +
        """
          |SELECT 'vid_' || a.id AS video_id,
          |       CAST(sum(abs(a.v - b.v)) AS BIGINT) AS motion_sum_abs
          |FROM bb a JOIN bb b ON a.id = b.id AND a.pos = b.pos AND b.fr = a.fr + 1
          |GROUP BY a.id""".stripMargin),
    "q95_validity" ->
      """SELECT n_nationkey, n_nationkey % 3 = 0 AS ok,
        |  CASE n_nationkey % 3 WHEN 0 THEN 'valid'
        |       WHEN 1 THEN 'ring self-intersection'
        |       ELSE 'hole outside shell' END AS reason
        |FROM nation""".stripMargin,
    "q94_dissolve" ->
      // inclusion-exclusion over the three integer boxes: the overlapping
      // pair shares (10−dx)(8−dy), the island adds 16, parts always 2
      """WITH p AS (SELECT n_nationkey, n_nationkey % 8 AS dx, n_nationkey % 6 AS dy FROM nation)
        |SELECT n_nationkey,
        |  CAST(80 + 80 - (10 - dx) * (8 - dy) + 16 AS BIGINT) AS area_i,
        |  CAST(2 AS INT) AS n_parts
        |FROM p""".stripMargin,
    "q93_buffer" ->
      // inscribed 32-gon closed forms: disc = 16·sin(2π/32)·d², capsule =
      // 2dL + disc; the box erosion is arc-free (square inner corners) so
      // (8−2dd)(6−2dd) is exact in both engines
      """WITH p AS (SELECT n_nationkey,
        |    (n_nationkey % 4 + 1) / 2.0 AS d,
        |    (n_nationkey % 3 + 1) * 0.5 AS dd,
        |    CAST(n_nationkey % 5 + 3 AS DOUBLE) AS el
        |  FROM nation)
        |SELECT n_nationkey,
        |  CAST(round(16.0 * sin(2 * pi() / 32) * d * d * 10000.0) AS BIGINT) AS disc_u4,
        |  CAST(round((2.0 * d * el + 16.0 * sin(2 * pi() / 32) * d * d) * 10000.0) AS BIGINT) AS capsule_u4,
        |  CAST(round((8 - 2 * dd) * (6 - 2 * dd) * 100.0) AS BIGINT) AS erode_c
        |FROM p""".stripMargin,
    "q92_ingest_flow" ->
      // all five stage predicates replayed: text-equality catalog dedup
      // (exact signatures ≡ text match, the q11 discipline), the q88 Bloom
      // replay (chained mix64 double hash, false positives bit-for-bit),
      // the q64 repetition stats with filterRepetitive's thresholds (the
      // fraction compares in the engine's exact double ops), the q76 Knuth
      // bucket, and Σ max(0, tokens−1) for the stats-store 2-gram total
      ("WITH " + mix64Sql("a", "documents", "doc_id", "CAST(doc_id AS UBIGINT)") +
      """,
        |pre AS (SELECT doc_id, h AS h1 FROM a5),
        |""".stripMargin +
      mix64Sql("b", "pre", "doc_id, h1", "h1") +
      """,
        |pos AS (SELECT doc_id, h1, h AS h2 FROM b5),
        |pp AS (SELECT doc_id,
        |    CAST(((CAST(h1 AS HUGEINT) + i.range * CAST(h2 AS HUGEINT))
        |          % CAST('18446744073709551616' AS HUGEINT)) % 4096 AS INT) AS p
        |  FROM pos, range(4) i),
        |bits AS (SELECT DISTINCT p FROM pp WHERE doc_id % 10 = 0),
        |hits AS (SELECT d.doc_id,
        |    sum(CASE WHEN b.p IS NOT NULL THEN 1 ELSE 0 END) = 4 AS hit
        |  FROM pp d LEFT JOIN bits b ON d.p = b.p GROUP BY d.doc_id),
        |cat AS (SELECT DISTINCT text FROM documents WHERE doc_id % 3 = 0),
        |s2 AS (SELECT d.doc_id, d.text FROM documents d
        |  JOIN hits h ON h.doc_id = d.doc_id
        |  LEFT JOIN cat c ON d.text = c.text
        |  WHERE d.doc_id % 3 <> 0 AND c.text IS NULL AND NOT h.hit),
        |rb AS (SELECT doc_id, text,
        |    list_filter(string_split(replace(text, ' the ', chr(10)), chr(10)),
        |                x -> trim(x) <> '') AS lines,
        |    list_filter(regexp_split_to_array(trim(replace(text, ' the ', chr(10))), '\s+'),
        |                x -> x <> '') AS ws
        |  FROM s2),
        |rg AS (SELECT doc_id, text, lines, ws,
        |    list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS g2,
        |    list_transform(range(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
        |  FROM rb),
        |rs AS (SELECT doc_id, text,
        |    len(lines) AS rl, len(lines) - len(list_distinct(lines)) AS rdl,
        |    len(ws) AS rw,
        |    len(g2) - len(list_distinct(g2)) AS rd2,
        |    coalesce(list_max(list_transform(list_distinct(g2),
        |      d -> len(list_filter(g2, x -> x = d)))), 0) AS rt2,
        |    len(g3) - len(list_distinct(g3)) AS rd3
        |  FROM rg),
        |s3 AS (SELECT doc_id, text FROM rs
        |  WHERE (CASE WHEN rl > 0 THEN CAST(rdl AS DOUBLE)/CAST(rl AS DOUBLE)
        |         ELSE 0 END) <= CAST(0.30 AS DOUBLE)
        |    AND (CASE WHEN greatest(rw - 1, 0) > 0
        |         THEN CAST(rd2 AS DOUBLE)/CAST(greatest(rw - 1, 0) AS DOUBLE)
        |         ELSE 0 END) <= CAST(0.40 AS DOUBLE)
        |    AND (CASE WHEN greatest(rw - 2, 0) > 0
        |         THEN CAST(rd3 AS DOUBLE)/CAST(greatest(rw - 2, 0) AS DOUBLE)
        |         ELSE 0 END) <= CAST(0.30 AS DOUBLE)
        |    AND (CASE WHEN greatest(rw - 1, 0) > 0
        |         THEN CAST(rt2 AS DOUBLE)/CAST(greatest(rw - 1, 0) AS DOUBLE)
        |         ELSE 0 END) <= CAST(0.20 AS DOUBLE)),
        |s4 AS (SELECT s3.doc_id,
        |    CAST(CASE WHEN length(trim(s3.text)) = 0 THEN 0
        |         ELSE len(regexp_split_to_array(trim(s3.text), '\s+')) END AS BIGINT) AS n_tokens_ws
        |  FROM s3
        |  WHERE (s3.doc_id * 2654435761 % 4294967296) * 1000 // 4294967296
        |        < least(CAST(CASE WHEN length(trim(s3.text)) = 0 THEN 0
        |               ELSE len(regexp_split_to_array(trim(s3.text), '\s+')) END AS BIGINT) * 25, 900))
        |SELECT doc_id, n_tokens_ws,
        |  (SELECT CAST(coalesce(sum(greatest(n_tokens_ws - 1, 0)), 0) AS BIGINT) FROM s4)
        |    AS corpus_2gram_total
        |FROM s4""".stripMargin),
    "q91_kll_quantiles" ->
      // exact-mode KLL ≡ percentile_disc (first value with cumulative
      // fraction >= q); byte lengths via octet_length are engine-identical
      """SELECT lang, count(*) AS n_docs,
        |  CAST(percentile_disc(0.1)  WITHIN GROUP (ORDER BY octet_length(CAST(text AS BLOB))) AS BIGINT) AS q10,
        |  CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY octet_length(CAST(text AS BLOB))) AS BIGINT) AS q25,
        |  CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY octet_length(CAST(text AS BLOB))) AS BIGINT) AS q50,
        |  CAST(percentile_disc(0.9)  WITHIN GROUP (ORDER BY octet_length(CAST(text AS BLOB))) AS BIGINT) AS q90,
        |  CAST(percentile_disc(0.99) WITHIN GROUP (ORDER BY octet_length(CAST(text AS BLOB))) AS BIGINT) AS q99
        |FROM documents GROUP BY lang""".stripMargin,
    "q90_overlay" ->
      // each L-shape = two interior-disjoint axis rectangles, so the
      // overlay areas reduce to rectangle-pair interval arithmetic:
      // area(A∩B) = Σᵢⱼ ovl(Aᵢ,Bⱼ); union/differences by inclusion-
      // exclusion over the fixed operand areas (|A| = 64, |B| = 51) —
      // exact INTEGER math in both engines
      """WITH p AS (SELECT n_nationkey,
        |    (n_nationkey * 7 % 40 - 20) AS ax, (n_nationkey * 5 % 30 - 15) AS ay,
        |    (n_nationkey * 7 % 40 - 20 + n_nationkey * 3 % 9 - 2) AS bx,
        |    (n_nationkey * 5 % 30 - 15 + n_nationkey % 7 - 2) AS by
        |  FROM nation),
        |r AS (SELECT n_nationkey,
        |    ax AS a1w, ay AS a1s, ax + 10 AS a1e, ay + 4 AS a1n,
        |    ax AS a2w, ay + 4 AS a2s, ax + 4 AS a2e, ay + 10 AS a2n,
        |    bx AS b1w, by AS b1s, bx + 9 AS b1e, by + 3 AS b1n,
        |    bx + 5 AS b2w, by + 3 AS b2s, bx + 9 AS b2e, by + 9 AS b2n
        |  FROM p),
        |i AS (SELECT n_nationkey,
        |    greatest(0, least(a1e,b1e) - greatest(a1w,b1w)) * greatest(0, least(a1n,b1n) - greatest(a1s,b1s))
        |  + greatest(0, least(a1e,b2e) - greatest(a1w,b2w)) * greatest(0, least(a1n,b2n) - greatest(a1s,b2s))
        |  + greatest(0, least(a2e,b1e) - greatest(a2w,b1w)) * greatest(0, least(a2n,b1n) - greatest(a2s,b1s))
        |  + greatest(0, least(a2e,b2e) - greatest(a2w,b2w)) * greatest(0, least(a2n,b2n) - greatest(a2s,b2s)) AS inter
        |  FROM r)
        |SELECT n_nationkey, CAST(inter AS BIGINT) AS inter_a,
        |  CAST(64 + 51 - inter AS BIGINT) AS union_a,
        |  CAST(64 - inter AS BIGINT) AS diff_ab,
        |  CAST(51 - inter AS BIGINT) AS diff_ba
        |FROM i""".stripMargin,
    "q89_cms_counters" ->
      // ws token count (the q76 formula) → h1 = mix64(n), h2 = mix64(h1),
      // row i's bucket = (h1 + i*h2) mod 2^64 mod 512, counters = counts
      // per (row, bucket), zero counters kept via the 4 x 512 grid
      ("WITH nt AS (SELECT doc_id, CAST(CASE WHEN length(trim(text)) = 0 THEN 0\n" +
       "    ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n FROM documents),\n" +
      mix64Sql("a", "nt", "doc_id", "CAST(n AS UBIGINT)") +
      """,
        |pre AS (SELECT doc_id, h AS h1 FROM a5),
        |""".stripMargin +
      mix64Sql("b", "pre", "doc_id, h1", "h1") +
      """,
        |pp AS (SELECT i.range AS r,
        |    CAST(((CAST(h1 AS HUGEINT) + i.range * CAST(h AS HUGEINT))
        |          % CAST('18446744073709551616' AS HUGEINT)) % 512 AS INT) AS bucket
        |  FROM b5, range(4) i),
        |cnt AS (SELECT r, bucket, count(*) AS c FROM pp GROUP BY 1, 2)
        |SELECT CAST(g.range AS INT) AS d_row, CAST(b.range AS INT) AS bucket,
        |       CAST(coalesce(c.c, 0) AS BIGINT) AS counter
        |FROM range(4) g CROSS JOIN range(512) b
        |LEFT JOIN cnt c ON c.r = g.range AND c.bucket = b.range""".stripMargin),
    "q88_bloom_filter" ->
      // h1 = mix64(doc_id), h2 = mix64(h1) (the chain replays twice);
      // positions i in 0..3 = (h1 + i*h2) mod 2^64 mod 4096; bit set =
      // DISTINCT positions of the benchmark slice; a doc hits iff all 4 of
      // its positions are set (left join + count of matches = 4)
      ("WITH " + mix64Sql("a", "documents", "doc_id", "CAST(doc_id AS UBIGINT)") +
      """,
        |pre AS (SELECT doc_id, h AS h1 FROM a5),
        |""".stripMargin +
      mix64Sql("b", "pre", "doc_id, h1", "h1") +
      """,
        |pos AS (SELECT doc_id, h1, h AS h2 FROM b5),
        |pp AS (SELECT doc_id,
        |    CAST(((CAST(h1 AS HUGEINT) + i.range * CAST(h2 AS HUGEINT))
        |          % CAST('18446744073709551616' AS HUGEINT)) % 4096 AS INT) AS p
        |  FROM pos, range(4) i),
        |bits AS (SELECT DISTINCT p FROM pp WHERE doc_id % 10 = 0)
        |SELECT d.doc_id,
        |       sum(CASE WHEN b.p IS NOT NULL THEN 1 ELSE 0 END) = 4 AS hit
        |FROM pp d LEFT JOIN bits b ON d.p = b.p
        |GROUP BY d.doc_id""".stripMargin),
    "q87_fixed_k_sample" ->
      // mix64 replay (signed reinterpretation — Spark ranks SIGNED longs),
      // then a row_number qualify; (hash, doc_id) is a total order
      ("WITH " + mix64Sql("z", "documents", "lang, doc_id", "CAST(doc_id AS UBIGINT)") +
      """,
        |sg AS (SELECT lang, doc_id,
        |    CAST(CAST(h AS HUGEINT) - (CASE WHEN h >= CAST('9223372036854775808' AS UBIGINT)
        |         THEN CAST('18446744073709551616' AS HUGEINT) ELSE 0 END) AS BIGINT) AS hs
        |  FROM z5),
        |r AS (SELECT lang, doc_id,
        |    row_number() OVER (PARTITION BY lang ORDER BY hs, doc_id) AS rn FROM sg)
        |SELECT lang, doc_id FROM r WHERE rn <= 20""".stripMargin),
    "q86_hll_registers" ->
      // scalar mix64 (q66's 32-bit-split HUGEINT multiplies mod 2^64),
      // bucket = h >> 56, rho = 65 - bin-length of (h << 8) (57 when the
      // low 56 bits are all zero), max per (lang, bucket), zero registers
      // kept via the lang x 256 grid
      ("WITH " + mix64Sql("z", "documents", "lang", "CAST(doc_id AS UBIGINT)") +
      """,
        |br AS (SELECT lang, CAST(h >> 56 AS INT) AS bucket,
        |    CASE WHEN (CAST(h AS HUGEINT) * 256) % CAST('18446744073709551616' AS HUGEINT) = 0 THEN 57
        |         ELSE 65 - length(bin(CAST((CAST(h AS HUGEINT) * 256) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)))
        |    END AS rho
        |  FROM z5),
        |mx AS (SELECT lang, bucket, max(rho) AS r FROM br GROUP BY 1, 2),
        |langs AS (SELECT DISTINCT lang FROM documents)
        |SELECT l.lang, CAST(b.range AS INT) AS bucket,
        |       CAST(coalesce(m.r, 0) AS INT) AS register
        |FROM langs l CROSS JOIN range(256) b
        |LEFT JOIN mx m ON m.lang = l.lang AND m.bucket = b.range""".stripMargin),
    "q85_tfidf_search" ->
      // same integer formula; ORDER BY score DESC, doc_id is a total order
      // so the LIMIT boundary is engine-exact
      """WITH toks AS (SELECT doc_id,
        |    unnest(list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS t
        |  FROM documents),
        |hit AS (SELECT doc_id, t FROM toks WHERE t IN ('spark', 'window', 'join')),
        |tf AS (SELECT doc_id, t, count(*) AS tf FROM hit GROUP BY 1, 2),
        |df AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
        |n AS (SELECT count(*) AS n FROM documents)
        |SELECT tf.doc_id, CAST(sum(tf.tf * ((SELECT n FROM n) * 1000 // df.df)) AS BIGINT) AS score
        |FROM tf JOIN df USING (t)
        |GROUP BY tf.doc_id
        |ORDER BY score DESC, tf.doc_id
        |LIMIT 20""".stripMargin,
    "q84_video_cuts" ->
      // q75's per-pair |Δ| sums compared against the threshold by EXACT
      // integer cross-multiplication: pairSum·1000 > thresholdMilli·nBytes
      (vid1BytesSql(1500) +
        """,
          |pair AS (SELECT a.id, a.fr, sum(abs(a.v - b.v)) AS psum, count(*) AS nb2
          |  FROM bb a JOIN bb b ON a.id = b.id AND a.pos = b.pos AND b.fr = a.fr + 1
          |  GROUP BY a.id, a.fr)
          |SELECT 'vid_' || id AS video_id,
          |  CAST(count(CASE WHEN psum * 1000 > 85000 * nb2 THEN 1 END) AS INT) AS n_cuts
          |FROM pair GROUP BY id""".stripMargin),
    "q74_ngram_shards" ->
      // disjoint shards + idempotent re-crawl merge back to the one-shot
      // statistics, so the oracle is exactly q68's closed form
      """WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
        |                          i -> tk[i] || ' ' || tk[i+1])) AS gram
        |  FROM toks),
        |a AS (SELECT gram, count(*) AS total, count(DISTINCT doc_id) AS doc_freq
        |  FROM g GROUP BY gram)
        |SELECT gram, total, doc_freq FROM a
        |ORDER BY total DESC, gram LIMIT 100""".stripMargin,
    "q68_top_ngrams" ->
      // same two-phase shape; ORDER BY total DESC, gram gives a TOTAL order
      // (gram is unique per row), so the k-boundary set is engine-exact
      """WITH toks AS (SELECT doc_id,
        |    list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS tk
        |  FROM documents),
        |g AS (SELECT doc_id,
        |    unnest(list_transform(range(1, greatest(len(tk) - 1, 0) + 1),
        |                          i -> tk[i] || ' ' || tk[i+1])) AS gram
        |  FROM toks),
        |a AS (SELECT gram, count(*) AS total, count(DISTINCT doc_id) AS doc_freq
        |  FROM g GROUP BY gram)
        |SELECT gram, total, doc_freq FROM a
        |ORDER BY total DESC, gram LIMIT 100""".stripMargin,
    "q67_bpe_tokens" ->
      // disjoint alternative classes ⇒ tokenization is engine-independent;
      // RE2 \s lacks \x0B vs Java, absent from the corpus (checked all SFs)
      """SELECT doc_id, CAST(coalesce(list_sum(list_transform(
        |  regexp_extract_all(text, '\p{L}+|\p{N}+|[^\p{L}\p{N}\s]'),
        |  t -> CASE WHEN length(t) <= 4 THEN 1 ELSE (length(t)+3)//4 END)), 0) AS INT)
        |  AS n_tokens_bpe
        |FROM documents""".stripMargin,
    "q66_winnow_fp" ->
      // exact DuckDB replay of the winnowing kernel (Schleimer et al.):
      // polynomial k-gram hash (base 31, seed 1125899906842597) folded into
      // one H0 + Σ c·31^j form, then the mix64 finalizer with wrapping
      // 64-bit arithmetic emulated as HUGEINT mod 2^64; multiplies by the
      // two 64-bit mix constants are split into 32-bit halves so no
      // intermediate exceeds int128. ASCII corpus ⇒ DuckDB codepoints ≡
      // Java UTF-16 units. Window mins (w=4) over SIGNED hashes, distinct,
      // sorted — byte-identical CSV to the Spark kernel's array.
      s"""WITH cps AS (
         |  SELECT doc_id,
         |    list_transform(range(1, length(text)+1),
         |      i -> CAST(unicode(substr(text, CAST(i AS INT), 1)) AS HUGEINT)) AS cs,
         |    greatest(length(text) - 7, CAST(0 AS BIGINT)) AS m
         |  FROM documents),
         |raw AS (
         |  SELECT doc_id, m,
         |    list_transform(range(1, m + 1), i -> CAST((
         |      CAST('13547930550979283685' AS HUGEINT)
         |      + cs[i]*27512614111 + cs[i+1]*887503681 + cs[i+2]*28629151
         |      + cs[i+3]*923521 + cs[i+4]*29791 + cs[i+5]*961 + cs[i+6]*31 + cs[i+7]
         |    ) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)) AS h
         |  FROM cps),
         |s1 AS (SELECT doc_id, m, list_transform(h, x -> CAST((CAST(x AS HUGEINT) + CAST('11400714819323198485' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)) AS h FROM raw),
         |s2 AS (SELECT doc_id, m, list_transform(h, x -> xor(x, x >> 30)) AS h FROM s1),
         |s3 AS (SELECT doc_id, m, list_transform(h, x -> CAST((
         |    (CAST('13787848793156543929' AS HUGEINT) * (x % 4294967296)) % CAST('18446744073709551616' AS HUGEINT)
         |    + ((CAST('13787848793156543929' AS HUGEINT) % 4294967296) * (x >> 32)) % 4294967296 * 4294967296
         |  ) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)) AS h FROM s2),
         |s4 AS (SELECT doc_id, m, list_transform(h, x -> xor(x, x >> 27)) AS h FROM s3),
         |s5 AS (SELECT doc_id, m, list_transform(h, x -> CAST((
         |    (CAST('10723151780598845931' AS HUGEINT) * (x % 4294967296)) % CAST('18446744073709551616' AS HUGEINT)
         |    + ((CAST('10723151780598845931' AS HUGEINT) % 4294967296) * (x >> 32)) % 4294967296 * 4294967296
         |  ) % CAST('18446744073709551616' AS HUGEINT) AS UBIGINT)) AS h FROM s4),
         |s6 AS (SELECT doc_id, m, list_transform(h, x -> xor(x, x >> 31)) AS h FROM s5),
         |sg AS (SELECT doc_id, m, list_transform(h, x -> CAST(CAST(x AS HUGEINT) - (CASE WHEN x >= CAST('9223372036854775808' AS UBIGINT) THEN CAST('18446744073709551616' AS HUGEINT) ELSE 0 END) AS BIGINT)) AS hs FROM s6),
         |win AS (SELECT doc_id,
         |    CASE WHEN m = 0 THEN CAST([] AS BIGINT[])
         |         WHEN m <= 4 THEN [list_min(hs)]
         |         ELSE list_sort(list_distinct(list_transform(range(1, m - 2), s -> list_min(hs[s:s+3]))))
         |    END AS picked
         |  FROM sg)
         |SELECT doc_id, CAST(len(picked) AS INT) AS n_fingerprints,
         |       array_to_string(picked, ',') AS fps
         |FROM win""".stripMargin,
    "q65_clip_convex" ->
      // the convex-clip twin of q62: the window is an integer-cornered
      // rectangle, so crossings pin to exactly-representable bounds and the
      // clipped bbox/area reduce to the same interval arithmetic
      s"""WITH box AS (SELECT r_regionkey,
         |  CAST(-170.005 AS DOUBLE) + r_regionkey * CAST(66.0 AS DOUBLE) AS w,
         |  CAST(-170.005 AS DOUBLE) + r_regionkey * CAST(66.0 AS DOUBLE) + CAST(40.0 AS DOUBLE) AS e,
         |  CAST(-60.005 AS DOUBLE) + r_regionkey * CAST(25.0 AS DOUBLE) AS s,
         |  CAST(-60.005 AS DOUBLE) + r_regionkey * CAST(25.0 AS DOUBLE) + CAST(35.0 AS DOUBLE) AS n
         |  FROM region),
         |p AS (SELECT n_nationkey,
         |  CAST(n_nationkey * 31 % 280 - 150 AS DOUBLE) AS pw,
         |  CAST(n_nationkey * 13 % 110 - 60 AS DOUBLE) AS ps FROM nation)
         |SELECT b.r_regionkey, p.n_nationkey,
         |  greatest(b.w, p.pw) AS cw, greatest(b.s, p.ps) AS cs,
         |  least(b.e, p.pw + 38.0) AS ce, least(b.n, p.ps + 24.0) AS cn,
         |  CAST(round((least(b.e, p.pw + 38.0) - greatest(b.w, p.pw)) *
         |             (least(b.n, p.ps + 24.0) - greatest(b.s, p.ps)) * 1000000.0)
         |       AS BIGINT) AS area_u6
         |FROM box b, p
         |WHERE least(b.e, p.pw + 38.0) > greatest(b.w, p.pw)
         |  AND least(b.n, p.ps + 24.0) > greatest(b.s, p.ps)""".stripMargin,
    "q62_clip_box" ->
      // box bounds re-derived in EXPLICIT double arithmetic: DuckDB's bare
      // -170.005 + r*66.0 is exact DECIMAL math (1 ulp off Spark's IEEE
      // double sum), which q03-style strict inequalities absorb but q62's
      // raw bbox values would hash-mismatch on
      s"""WITH box AS (SELECT r_regionkey,
         |  CAST(-170.005 AS DOUBLE) + r_regionkey * CAST(66.0 AS DOUBLE) AS w,
         |  CAST(-170.005 AS DOUBLE) + r_regionkey * CAST(66.0 AS DOUBLE) + CAST(40.0 AS DOUBLE) AS e,
         |  CAST(-60.005 AS DOUBLE) + r_regionkey * CAST(25.0 AS DOUBLE) AS s,
         |  CAST(-60.005 AS DOUBLE) + r_regionkey * CAST(25.0 AS DOUBLE) + CAST(35.0 AS DOUBLE) AS n
         |  FROM region),
         |p AS (SELECT n_nationkey,
         |  CAST(n_nationkey * 29 % 300 - 160 AS DOUBLE) AS pw,
         |  CAST(n_nationkey * 17 % 120 - 65 AS DOUBLE) AS ps FROM nation)
         |SELECT b.r_regionkey, p.n_nationkey,
         |  greatest(b.w, p.pw) AS cw, greatest(b.s, p.ps) AS cs,
         |  least(b.e, p.pw + 33.0) AS ce, least(b.n, p.ps + 27.0) AS cn,
         |  CAST(round((least(b.e, p.pw + 33.0) - greatest(b.w, p.pw)) *
         |             (least(b.n, p.ps + 27.0) - greatest(b.s, p.ps)) * 1000000.0)
         |       AS BIGINT) AS area_u6
         |FROM box b, p
         |WHERE least(b.e, p.pw + 33.0) > greatest(b.w, p.pw)
         |  AND least(b.n, p.ps + 27.0) > greatest(b.s, p.ps)""".stripMargin,
    "q60_st_parts" ->
      """SELECT n_nationkey, t.k AS part_idx,
        |  '{"type":"Point","coordinates":[' || (n_nationkey * 5 % 30 + t.k) ||
        |  ',' || (n_nationkey * 3 % 20 + t.k * 2) || ']}' AS part
        |FROM nation, range(5) t(k) WHERE t.k < n_nationkey % 3 + 2""".stripMargin,
    "q59_catalog_near" ->
      "SELECT range + 40000 AS doc_id FROM range(2000) WHERE range % 3 <> 0",
    "q58_pip_indexed" ->
      s"""WITH pts AS ($customerPointsSql), box AS ($regionBoxesSql)
         |SELECT p.c_custkey, b.r_regionkey FROM pts p, box b
         |WHERE p.lng > b.w AND p.lng < b.e AND p.lat > b.s AND p.lat < b.n""".stripMargin,
    "q57_convex_hull" ->
      """SELECT n_nationkey,
        |  '{"type":"Polygon","coordinates":[[[' ||
        |  (n_nationkey * 3 % 40) || ',' || (n_nationkey * 2 % 30) || '],[' ||
        |  (n_nationkey * 3 % 40 + 6) || ',' || (n_nationkey * 2 % 30) || '],[' ||
        |  (n_nationkey * 3 % 40 + 6) || ',' || (n_nationkey * 2 % 30 + 4) || '],[' ||
        |  (n_nationkey * 3 % 40) || ',' || (n_nationkey * 2 % 30 + 4) || '],[' ||
        |  (n_nationkey * 3 % 40) || ',' || (n_nationkey * 2 % 30) || ']]]}' AS hull
        |FROM nation""".stripMargin,
    "q56_simplify" ->
      """SELECT n_nationkey,
        |  '{"type":"LineString","coordinates":[[' || (n_nationkey * 7 % 50) ||
        |  ',0],[' || (n_nationkey * 7 % 50 + 4) || ',1],[' ||
        |  (n_nationkey * 7 % 50 + 5) || ',0]]}' AS simplified
        |FROM nation""".stripMargin,
    "q55_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, epoch_us(ts) // 1000 AS ts_ms FROM events),
        |marks AS (
        |  SELECT u.user_id,
        |    1704067200000 + t.k * 259200000 + (u.user_id % 1000) * 1000 AS mark_ms,
        |    t.k AS version
        |  FROM (SELECT DISTINCT user_id FROM events) u, range(10) t(k))
        |SELECT e.event_id, e.user_id, m.version
        |FROM ev e ASOF JOIN marks m
        |  ON e.user_id = m.user_id AND e.ts_ms >= m.mark_ms""".stripMargin,
    "q54_distance_join" ->
      s"""WITH pts AS ($customerPointsSql),
         |qs AS (SELECT n_nationkey,
         |  (n_nationkey * 104729 % 36000)/100.0 - 180.0 AS qlng,
         |  CASE WHEN n_nationkey % 5 = 0 THEN 89.9 - CAST(n_nationkey % 7 AS DOUBLE)
         |       ELSE (n_nationkey * 7919 % 16000)/100.0 - 80.0 END AS qlat FROM nation)
         |SELECT q.n_nationkey, p.c_custkey
         |FROM qs q CROSS JOIN pts p
         |WHERE $haversineSql <= 300000.0""".stripMargin,
    "q53_tile_mosaic" ->
      s"""${imagesSqlCte(2000)}, t AS (
         |  SELECT CAST(floor((lng + 180.0) / 360.0 * 256) AS BIGINT) AS tx,
         |    CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * 256) AS BIGINT) AS ty
         |  FROM pts)
         |SELECT tx // 2 AS ptx, ty // 2 AS pty,
         |  CAST(16 AS INT) AS w, CAST(16 AS INT) AS h,
         |  count(*) AS n, count(DISTINCT (tx % 2) + 2 * (ty % 2)) AS nq
         |FROM t GROUP BY 1, 2""".stripMargin,
    "q52_line_intersects" ->
      s"""WITH box AS ($regionBoxesSql),
         |l AS (SELECT n_nationkey,
         |  (n_nationkey * 41 % 320) - 170.003 AS x1,
         |  (n_nationkey * 13 % 130) - 65.003 AS y1,
         |  n_nationkey % 2 = 0 AS horiz FROM nation)
         |SELECT b.r_regionkey, l.n_nationkey FROM box b, l
         |WHERE (horiz AND y1 > b.s AND y1 < b.n AND x1 < b.e AND x1 + 30.0 > b.w)
         |   OR ((NOT horiz) AND x1 > b.w AND x1 < b.e AND y1 < b.n AND y1 + 25.0 > b.s)""".stripMargin,
    "q51_area_m2" ->
      s"""WITH box AS ($regionBoxesSql)
         |SELECT r_regionkey,
         |  round(6371008.8 * 6371008.8 * (radians(e) - radians(w)) *
         |        (sin(radians(n)) - sin(radians(s))) / 1e6, 2) AS area_km2
         |FROM box""".stripMargin,
    "q50_catalog_dedup" ->
      """SELECT doc_id + 40000 AS doc_id,
        |  'fresh shard doc ' || doc_id || ' ' || text AS text
        |FROM documents WHERE doc_id % 3 <> 0""".stripMargin,
    "q38_dup_clusters" ->
      """WITH ids AS (
        |  SELECT doc_id AS id FROM documents
        |  UNION ALL SELECT doc_id + 10000 FROM documents
        |  UNION ALL SELECT doc_id + 20000 FROM documents)
        |SELECT id, (id % 10000) // 5 * 5 AS canonical_id,
        |       id <> (id % 10000) // 5 * 5 AS is_dup
        |FROM ids""".stripMargin,
    "q20_text_analysis" ->
      """SELECT doc_id,
        |  CASE WHEN length(trim(text)) = 0 THEN 0
        |       ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens_ws,
        |  len(list_filter(regexp_split_to_array(lower(text), '\s+'),
        |      w -> w IN ('the','and','of','to','a','in','is','that','it','for'))) AS n_stopwords,
        |  length(text) AS n_chars_out
        |FROM documents""".stripMargin,
    "q34_random_roundtrip" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 7 AS INT)
        |    WHEN 0 THEN 'Point' WHEN 1 THEN 'LineString' WHEN 2 THEN 'Polygon'
        |    WHEN 3 THEN 'MultiPoint' WHEN 4 THEN 'MultiPolygon' WHEN 5 THEN 'Feature'
        |    ELSE 'FeatureCollection' END AS kind,
        |  TRUE AS ok
        |FROM documents""".stripMargin,
    "q29_sessions" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) // 1000 AS ts_ms,
        |         round(value * 100.0, 0) AS cents FROM events),
        |m AS (
        |  SELECT *, CASE WHEN lag(ts_ms) OVER w IS NULL
        |                   OR ts_ms - lag(ts_ms) OVER w > 120 * 60000 THEN 1 ELSE 0 END AS newflag
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)),
        |s AS (
        |  SELECT *, sum(newflag) OVER (PARTITION BY user_id ORDER BY ts_ms
        |    ROWS UNBOUNDED PRECEDING) AS sess FROM m)
        |SELECT user_id, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
        |       count(*) AS n_events, CAST(sum(cents) AS BIGINT) AS cents
        |FROM s GROUP BY user_id, sess""".stripMargin,
    "q21_image_tiles" ->
      s"""${imagesSqlCte(2000)}
         |SELECT CAST(floor((lng + 180.0) / 360.0 * 256) AS BIGINT) AS tx,
         |  CAST(floor((1.0 - ln(tan(radians(lat)) + 1.0/cos(radians(lat))) / pi()) / 2.0 * 256) AS BIGINT) AS ty,
         |  count(*) AS n
         |FROM pts GROUP BY 1, 2""".stripMargin,
    "q22_image_pip" ->
      s"""${imagesSqlCte(2000)}, box AS ($regionBoxesSql)
         |SELECT 'img_' || p.id AS image_id, b.r_regionkey FROM pts p, box b
         |WHERE p.lng > b.w AND p.lng < b.e AND p.lat > b.s AND p.lat < b.n""".stripMargin,
    "q39_translate_pip_tile" ->
      s"""${imagesSqlCte(2000)}, box AS ($regionBoxesSql)
         |SELECT 'img_' || p.id AS image_id, b.r_regionkey,
         |  CAST(floor((p.lng + 180.0) / 360.0 * 256) AS BIGINT) AS tx,
         |  CAST(floor((1.0 - ln(tan(radians(p.lat)) + 1.0/cos(radians(p.lat))) / pi()) / 2.0 * 256) AS BIGINT) AS ty
         |FROM pts p, box b
         |WHERE p.lng > b.w + (b.r_regionkey * 3.0 + 2.5)
         |  AND p.lng < b.e + (b.r_regionkey * 3.0 + 2.5)
         |  AND p.lat > b.s + (b.r_regionkey * 1.5 - 3.0)
         |  AND p.lat < b.n + (b.r_regionkey * 1.5 - 3.0)""".stripMargin,
    "q23_image_meta" ->
      """SELECT 'img_' || range AS image_id,
        |  CAST(8 + range % 9 AS INT) AS w, CAST(8 + range % 7 AS INT) AS h,
        |  CASE WHEN range % 3 = 0 THEN 'grb1q' ELSE 'grb1' END AS fmt,
        |  caption FROM (
        |  SELECT range,
        |    ['aerial','view','of','the','coastal','city','mountain','valley','river','delta','urban','grid','farmland','island','harbor','desert'][CAST(range % 16 AS INT) + 1]
        |    || ' ' ||
        |    ['aerial','view','of','the','coastal','city','mountain','valley','river','delta','urban','grid','farmland','island','harbor','desert'][CAST((range // 16) % 16 AS INT) + 1]
        |    || ' ' ||
        |    ['aerial','view','of','the','coastal','city','mountain','valley','river','delta','urban','grid','farmland','island','harbor','desert'][CAST((range // 256) % 16 AS INT) + 1]
        |    || ' tile ' || (range % 1024) AS caption
        |  FROM range(2000))""".stripMargin)
}
