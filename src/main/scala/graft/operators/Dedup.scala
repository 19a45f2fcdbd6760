package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines, designed for the
  * 100 TB regime: every candidate-generation step is a keyed shuffle
  * (group-by content hash, band bucket, or shared shingle) — never an n²
  * cartesian. Verification only runs inside candidate buckets.
  */
object Dedup {

  /** Exact dedup: group by md5 of normalized text, keep the minimum id as
    * canonical. One shuffle on the content hash — scales linearly. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), md5(TextFunctions.normalize(col(textCol)).cast(BinaryType)).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** One row per (doc, distinct k-shingle). Tokens and the shingle array
    * are staged as their own projections so the regex split and the
    * shingle build each run exactly once per doc (see
    * [[TextFunctions.shinglesFromTokens]] for why inlining would be
    * quadratic), then exploded so every downstream hash touches each
    * shingle once. All codegen'd, no shuffle. */
  private def shingleRows(docs: DataFrame, idCol: String, textCol: String,
                          k: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), TextFunctions.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), TextFunctions.shinglesFromTokens(col("t"), k).as("ss"))
      .select(col("doc_id"), explode(col("ss")).as("shingle"))

  /** K-function MinHash signatures via explode + hash-agg: md5 runs once
    * per (doc, shingle) row, then the K per-function minima are codegen'd
    * `min` aggregates in a single shuffle keyed by doc. Same arithmetic as
    * [[TextFunctions.minhashSignature]] (min over shingles of
    * (a_i*h+b_i) mod P) but linear — the column-expression form
    * re-evaluates the element hashes once per hash function because
    * higher-order lambdas are interpreted with no CSE. */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 16, shingleK: Int = 3): DataFrame = {
    import TextFunctions.{MinhashA, MinhashB, MinhashP}
    val hashed = shingleRows(docs, idCol, textCol, shingleK)
      .select(col("doc_id"), (TextFunctions.hash64(col("shingle")) % MinhashP).as("h"))
    val mins = (0 until k).map { i =>
      min((lit(MinhashA(i)) * col("h") + lit(MinhashB(i))) % MinhashP).as(s"m$i")
    }
    hashed.groupBy(col("doc_id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("doc_id"), array((0 until k).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** MinHash + LSH near-dup candidates: K-hash signature, banded into
    * `bands` buckets; docs sharing any band key become a candidate pair,
    * scored by signature agreement. Shuffles: signature agg + one
    * self-join on (band index, band key) — no cartesian. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 16, bands: Int = 4, minAgree: Double = 0.5): DataFrame = {
    val rows = k / bands
    val sig = minhashSignatures(docs, idCol, textCol, k)
    val banded = sig.select(col("doc_id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band"),
          concat_ws("_", (1 to rows).map(r => element_at(col("sig"), b * rows + r)): _*)
            .as("key")))).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("key"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    // dedup band collisions BEFORE scoring: docs colliding in b bands would
    // otherwise pay the interpreted K-element agreement fold b times; the
    // distinct on (pair, sigs) is exact since sigs are functions of the ids
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        (aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).cast(DoubleType) / k).as("sig_agree"))
      .filter(col("sig_agree") >= minAgree)
  }

  /** Exact n-gram Jaccard via inverted index: explode distinct shingles,
    * join on shingle (only docs sharing one meet), count intersections,
    * compute |A∩B| / (|A|+|B|-|A∩B|). The join is keyed by shingle, and
    * shingles appearing in more than `maxDf` documents are dropped before
    * the self-join (stop-shingle removal): one shingle shared by d docs
    * contributes d² join rows, so a single corpus-wide stop-shingle would
    * make its bucket quadratic at scale. Set sizes |A|,|B| are computed
    * before the cap, so capped pairs under-estimate Jaccard (the standard
    * stop-word approximation); results are exact when no shingle exceeds
    * the cap (sf0.1's hottest shingle has df≈25). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, threshold: Double = 0.2,
                        maxDf: Long = 10000L): DataFrame = {
    val inv0 = shingleRows(docs, idCol, textCol, k)
    // shingles are distinct per doc, so |shingle set| = exploded row count
    // (true set sizes, counted before stop-shingle removal)
    val sizes = inv0.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    // document frequency per shingle; the surviving hot set is tiny
    // (≤ total_rows / maxDf heavy hitters), so AQE broadcasts the anti-join
    val stop = inv0.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf).select(col("shingle"))
    // shuffle_hash: the shingle self-join keys are high-cardinality and
    // near-uniform once capped (hottest surviving shingle ≤ maxDf docs), so
    // a hash join per partition beats sort-merge's double sort of the
    // inverted index (measured 2x at sf0.1); AQE still splits skewed
    // partitions below the cap.
    val inv = inv0.join(stop, Seq("shingle"), "left_anti").hint("shuffle_hash")
    val inter = inv.alias("x").join(inv.alias("y"), col("x.shingle") === col("y.shingle"))
      .filter(col("x.doc_id") < col("y.doc_id"))
      .groupBy(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("na")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("nb")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("inter").cast(DoubleType) / (col("na") + col("nb") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") > threshold)
  }

  /** SimHash: 64-bit signature where bit b is set iff the majority of token
    * hashes have bit b set (hash64 is 60-bit, so bits 60+ stay clear and the
    * sign bit never sets). Explode-then-aggregate formulation: the md5-based
    * token hash is computed exactly once per token, and the 64 per-bit
    * counts are codegen'd sum aggregates in a single shuffle keyed by doc —
    * linear scaling, no interpreted higher-order loops. */
  def simhash(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(TextFunctions.normalize(col(textCol)))).as("tok"))
      .select(col("doc_id"), TextFunctions.hash64(col("tok")).as("h"))
    val bitSums = (0 until 64).map { b =>
      sum(when(col("h").bitwiseAND(lit(1L << b)) =!= 0, 1L).otherwise(0L)).as(s"c$b")
    }
    val counted = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tok"), bitSums: _*)
    val sig = (0 until 64).map { b =>
      when(col(s"c$b") * 2 > col("n_tok"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    counted.select(col("doc_id"), sig.as("simhash"))
  }

  /** SimHash near-dup pairs within `maxHamming` (≤ 3 with 4 chunks). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = simhash(docs, idCol, textCol)
    val chunked = sigs.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(c => struct(lit(c).as("chunk"),
        shiftright(col("simhash"), c * 16).bitwiseAND(65535L).as("ckey"))): _*))
        .as("ck"))
      .select(col("doc_id"), col("simhash"), col("ck.chunk"), col("ck.ckey"))
    val a = chunked.select(col("chunk"), col("ckey"), col("doc_id").as("doc_a"), col("simhash").as("sig_a"))
    val b = chunked.select(col("chunk"), col("ckey"), col("doc_id").as("doc_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("chunk", "ckey"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sig_a"), col("sig_b"))
      .distinct()
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }
}
