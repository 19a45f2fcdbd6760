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
}
