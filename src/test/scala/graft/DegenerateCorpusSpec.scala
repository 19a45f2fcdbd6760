package graft

import java.nio.file.{Files, Path, Paths}

/** Degenerate-corpus robustness sweep — the finder that generalizes the
  * round-9/10 lesson (zero-norm embeddings, single-class AUC): a 100-TB
  * corpus WILL contain empty documents, whitespace-only documents, null
  * texts, all-one-label slices, and single-row shards, and under Spark 4
  * ANSI mode any unguarded ratio over them kills the whole job instead of
  * yielding a NULL statistic.
  *
  * Each scenario clones the sf0.001 table set and replaces
  * `documents.parquet` with an adversarial table, then runs EVERY gated
  * query whose plan reads documents (113 of 272) end to end. The assertion
  * is survival: collect() must not throw. Wrong-but-defined outputs are the
  * oracle gate's job; this spec exists solely to prove no degenerate input
  * can crash the engine.
  */
class DegenerateCorpusSpec extends SparkSpec {

  /** Every gated query whose function reads the documents table. */
  private val documentQueries = Seq(
    "agg_argminmax", "agg_array", "agg_bitwise", "agg_bool", "agg_cms",
    "agg_cube", "agg_filter", "agg_gsets", "agg_kll", "agg_median",
    "agg_pdisc", "agg_rollup", "agg_stragg", "cls_auc", "cls_calibration",
    "cls_confusion", "cls_pr", "cls_quality", "cur_dsir", "cur_funnel",
    "cur_funnel2", "ded_cluster", "ded_contain", "ded_edit", "ded_exact",
    "ded_minhash", "ded_ngram", "ded_phash", "ded_prefix", "ded_semantic",
    "ded_simhash", "ded_spans", "ded_url", "ded_winnow", "dq_benford",
    "dq_dupstats", "dq_iqr", "dq_ks", "dq_profile", "dq_psi",
    "emb_feathash", "emb_norms", "evt_overlap", "evt_range",
    "evt_retention", "evt_srm", "evt_survival", "fn_array2",
    "fn_conditional", "fn_datebin", "fn_datetime", "fn_hash", "fn_math",
    "fn_regex", "fn_regex2", "fn_registry", "fn_string", "fn_string2",
    "fn_struct", "fn_url", "fn_variant", "gen_explode", "graph_pagerank",
    "graph_recip", "mm_decode", "mm_energy", "mm_frames", "pack_tokens",
    "proj_exclude", "set_except", "set_intersect", "set_union",
    "set_union_all", "sim_ivfpq", "sim_kmeans", "sim_lsh", "smp_balanced",
    "smp_bootstrap", "smp_ess", "smp_mixture", "smp_split",
    "smp_stratified", "smp_weighted", "snk_bucketed", "snk_partitioned",
    "sort_distinct_on", "sort_nulls_offset", "src_binary", "src_xml",
    "txt_bm25", "txt_bpe_pairs", "txt_bpe_train", "txt_chunks",
    "txt_collocations", "txt_coverage", "txt_decontaminate",
    "txt_diversity", "txt_entropy", "txt_fertility", "txt_fingerprint",
    "txt_hapax", "txt_heavyhitters", "txt_langid", "txt_lmscore",
    "txt_pii", "txt_quality", "txt_readability", "txt_skipgrams",
    "txt_stats", "txt_tokens", "txt_topterms", "txt_zipf", "udtf_ngrams")

  /** Clone the sf0.001 tables, swap in an adversarial documents table. */
  private def scenarioDir(name: String,
      rows: Seq[(java.lang.Long, String, String, String, java.lang.Long)]): String = {
    val dir = Files.createTempDirectory(s"graft-degen-$name")
    val src = Paths.get(sfDir)
    Files.list(src).forEach { p: Path =>
      if (p.getFileName.toString.endsWith(".parquet") &&
          p.getFileName.toString != "documents.parquet")
        Files.copy(p, dir.resolve(p.getFileName.toString))
    }
    import spark.implicits._
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    dir.toString
  }

  private def survives(dir: String): Seq[(String, String)] =
    documentQueries.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).collect(); None }
      catch { case e: Throwable =>
        val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(_.toString).toSeq.last
        Some(name -> root.take(200))
      }
    }

  private val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta", "the", "and", "of", "data")
  private def doc(id: Long, n: Int, lang: String, src: String, seed: Long) = {
    val rng = new scala.util.Random(seed)
    val text = Vector.fill(n)(words(rng.nextInt(words.size))).mkString(" ")
    (Long.box(id), text, lang, src, Long.box(text.length.toLong))
  }

  test("adversarial rows mixed into a normal corpus crash nothing") {
    val normal = (0L until 30L).map(i =>
      doc(i, 5 + (i % 40).toInt, Seq("en", "zh", "de")((i % 3).toInt), s"s${i % 3}", i))
    val adversarial = Seq(
      (Long.box(100L), "", "en", "s0", Long.box(0L)),             // empty text
      (Long.box(101L), "   ", "zh", "s1", Long.box(3L)),          // whitespace only
      (Long.box(102L), null: String, "de", "s2", Long.box(0L)),   // null text
      (Long.box(103L), "x", "en", "s0", Long.box(1L)),            // single char
      (Long.box(104L), "0123456789", "xx", "s3", Long.box(10L)),  // digits, unseen lang
      (Long.box(105L), ("word " * 2000).trim, "en", "s0", Long.box(9999L))) // long doc
    val failures = survives(scenarioDir("mixed", normal ++ adversarial))
    assert(failures.isEmpty,
      s"${failures.size} queries crashed on the mixed corpus:\n" +
        failures.map { case (q, e) => s"  $q: $e" }.mkString("\n"))
  }

  test("an all-empty-text corpus crashes nothing") {
    val rows = (0L until 40L).map(i =>
      (Long.box(i), "", Seq("en", "zh")((i % 2).toInt), s"s${i % 2}", Long.box(0L)))
    val failures = survives(scenarioDir("allempty", rows))
    assert(failures.isEmpty,
      s"${failures.size} queries crashed on the all-empty corpus:\n" +
        failures.map { case (q, e) => s"  $q: $e" }.mkString("\n"))
  }

  test("a single-document corpus crashes nothing") {
    val failures = survives(scenarioDir("single", Seq(doc(0L, 12, "en", "s0", 7L))))
    assert(failures.isEmpty,
      s"${failures.size} queries crashed on the single-doc corpus:\n" +
        failures.map { case (q, e) => s"  $q: $e" }.mkString("\n"))
  }

  /** Gated queries whose plans read the embeddings table. */
  private val embeddingQueries = Seq(
    "cls_confusion", "cls_pr", "cur_funnel2", "ddl_view", "ded_embed",
    "ded_phash", "ded_semantic", "ded_simhash", "emb_centroid",
    "emb_feathash", "emb_norms", "emb_pq", "emb_quantize", "pack_tokens",
    "sim_hardneg", "sim_ivf", "sim_ivfpq", "sim_kmeans", "sim_knng",
    "sim_lsh", "sim_ndcg", "sim_recall", "sim_topk", "snk_zstd",
    "sql_entry", "txt_coverage", "txt_skipgrams", "udf_surface")

  /** Gated queries whose plans read the events table. */
  private val eventQueries = Seq(
    "agg_bitmap_and", "agg_bloom", "agg_gini", "agg_moments", "agg_ttest",
    "agg_winsor", "agg_wpercentile_udaf", "cdc_scd2", "ded_edit",
    "dq_dupstats", "evt_anomaly", "evt_asof", "evt_asof_near",
    "evt_attrib", "evt_backtest", "evt_cusum", "evt_daumau", "evt_gapfill",
    "evt_gaps", "evt_hop", "evt_interp", "evt_markov", "evt_ohlc",
    "evt_overlap", "evt_pattern", "evt_range", "evt_retention", "evt_rfm",
    "evt_seasonality", "evt_session_window", "evt_sessionize", "evt_srm",
    "evt_streaks", "evt_survival", "fn_datebin", "fn_datetime", "fn_hash",
    "fn_json", "fn_regex", "fn_struct", "fn_variant", "sim_hardneg",
    "sql_entry", "txt_fingerprint", "txt_langid", "txt_tokens",
    "udtf_ngrams", "win_dist", "win_frame", "win_groups", "win_ignulls",
    "win_offset", "win_rank", "win_rdistinct", "win_trange",
    "xch_repartition")

  private def replaceTable(name: String, table: String,
      df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory(s"graft-degen-$name")
    val src = Paths.get(sfDir)
    Files.list(src).forEach { p: Path =>
      if (p.getFileName.toString.endsWith(".parquet") &&
          p.getFileName.toString != s"$table.parquet")
        Files.copy(p, dir.resolve(p.getFileName.toString))
    }
    df.coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve(s"$table.parquet").toString)
    dir.toString
  }

  private def survivesAll(dir: String, queries: Seq[String]): Seq[(String, String)] =
    queries.flatMap { name =>
      try { SparkEntry.queries(name)(spark, dir).collect(); None }
      catch { case e: Throwable =>
        val root = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
          .map(_.toString).toSeq.last
        Some(name -> root.take(200))
      }
    }

  test("adversarial embeddings (zero-norm, NaN, empty, wrong-dim, null) crash nothing") {
    import spark.implicits._
    val rng = new scala.util.Random(17)
    def vec(seed: Int): Seq[Float] = {
      val r = new scala.util.Random(seed)
      Seq.fill(64)(r.nextGaussian().toFloat)
    }
    val normal = (0L until 30L).map(i => (i, vec(i.toInt), (i % 8).toInt))
    val adversarial: Seq[(Long, Seq[Float], Int)] = Seq(
      (100L, Seq.fill(64)(0.0f), 3),                    // zero-norm (the r9 class)
      (101L, vec(1).updated(5, Float.NaN), 4),          // NaN component
      (102L, vec(2).updated(0, Float.PositiveInfinity), 5), // Inf component
      (103L, Seq.empty[Float], 6),                      // empty vector
      (104L, Seq(1.0f, 2.0f, 3.0f), 7),                 // wrong dimension
      (105L, null: Seq[Float], 0))                      // null vector
    val df = (normal ++ adversarial).toDF("vec_id", "embedding", "label")
    val failures = survivesAll(replaceTable("emb", "embeddings", df), embeddingQueries)
    assert(failures.isEmpty,
      s"${failures.size} queries crashed on adversarial embeddings:\n" +
        failures.map { case (q, e) => s"  $q: $e" }.mkString("\n"))
    val _ = rng
  }

  test("adversarial events (nulls, malformed props, tied/extreme timestamps) crash nothing") {
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val base = 1700000000000L
    val rng = new scala.util.Random(23)
    val types = Seq("view", "click", "cart", "purchase", "search")
    val normal = (0L until 60L).map(i =>
      (i, ts(base + rng.nextInt(86400000)), (i % 9) + 1L,
        types(rng.nextInt(types.size)), rng.nextDouble() * 100,
        s"""{"k":"v${i % 5}"}"""))
    val adversarial = Seq(
      (200L, ts(base), 1L, null: String, 5.0, """{"k":"v1"}"""),  // null event type
      (201L, ts(base), 2L, "view", 42.17, """{"k":"v1"}"""),      // string k (schema drift)
      (202L, ts(base), 3L, "click", -987.65, "{not json"),        // malformed props, negative value
      (203L, ts(base), 4L, "view", 7.0, null: String),            // null props
      (204L, ts(0L), 5L, "view", 1.0, "{}"),                      // epoch 0
      (205L, ts(7258118400000L), 5L, "click", 1.0, "{}"),         // year 2200
      (206L, ts(base + 1000), 6L, "view", 2.0, "{}"),             // tied-burst start
      (207L, ts(base + 1000), 6L, "view", 2.0, "{}"),
      (208L, ts(base + 1000), 6L, "click", 2.0, "{}"))
    val df = (normal ++ adversarial)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val failures = survivesAll(replaceTable("evt", "events", df), eventQueries)
    assert(failures.isEmpty,
      s"${failures.size} queries crashed on adversarial events:\n" +
        failures.map { case (q, e) => s"  $q: $e" }.mkString("\n"))
  }

  test("out-of-domain money values are rejected LOUDLY and identically on both engines — by contract") {
    // The exact-arithmetic machinery stages event values as DECIMAL(12,2)
    // (the money domain: |value| < 10^10, two decimals). A value outside it
    // — or NaN — is a schema-contract violation, and BOTH engines refuse it
    // the same way: Spark ANSI NUMERIC_VALUE_OUT_OF_RANGE here, a DuckDB
    // decimal-overflow error in the oracle replay. That consistency is the
    // contract (dq_checks exists to quarantine such rows first); silent
    // wraparound would be corruption. This test pins the failure MODE.
    import spark.implicits._
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    def corpus(bad: Double) = ((0L until 20L).map(i =>
      (i, ts(1700000000000L + i * 1000), i % 5, "view", 1.5, "{}")) :+
      (99L, ts(1700000000000L), 1L, "view", bad, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val e = intercept[Exception](SparkEntry.queries("agg_moments")(
      spark, replaceTable("evtbad", "events", corpus(-1e18))).collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(_.toString).mkString(" | ")
    assert(chain.contains("NUMERIC_VALUE_OUT_OF_RANGE"),
      s"expected the ANSI decimal-domain rejection, got: ${chain.take(300)}")
    // NaN money is DEFINED, not a crash: Spark's fractional→decimal cast
    // maps NaN/Infinity to NULL regardless of ANSI, so the row just drops
    // out of the exact-decimal aggregates on both engines
    val rows = SparkEntry.queries("agg_moments")(
      spark, replaceTable("evtnan", "events", corpus(Double.NaN))).collect()
    assert(rows.nonEmpty)
  }

  test("an empty events table crashes nothing") {
    import spark.implicits._
    val df = Seq.empty[(Long, java.sql.Timestamp, Long, String, Double, String)]
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val failures = survivesAll(replaceTable("evtempty", "events", df), eventQueries)
    assert(failures.isEmpty,
      s"${failures.size} queries crashed on the empty events table:\n" +
        failures.map { case (q, e) => s"  $q: $e" }.mkString("\n"))
  }
}
