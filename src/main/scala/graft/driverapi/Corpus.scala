package graft.driverapi

import graft.build.{Index, IndexBuilder, InputDoc}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Adapter: the driver's `documents` table -> engine corpus.
  *
  * Segment routing is by doc_id *range* (not hash) so engine docIds are
  * monotone in doc_id — then the engine's tie-break (score desc, docId
  * asc, `core/search/HitQueue.java:76-82`) is expressible in ANSI SQL as
  * `ORDER BY score DESC, doc_id ASC` for the DuckDB oracle.
  */
object Corpus {
  /** Segments scale with corpus size (one segment ~ the docs an executor
    * inverts in memory; ~25k docs/segment here), clamped so tiny test
    * tables still exercise multi-segment paths — no fixed segment count.
    */
  def numSegments(docSpan: Long): Int =
    math.max(4, math.min(128, (docSpan / 25000L).toInt + 1))

  private val cache = scala.collection.concurrent.TrieMap.empty[String, (Index, DataFrame)]

  /** (engine index, docId->doc_id mapping) for `dir`'s documents table.
    * Keyed by (session, dir) — cached Datasets die with their session.
    */
  def get(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"std:$dir") {
      build(spark, spark.read.parquet(s"$dir/documents.parquet"), "std")
    }

  /** Sub-token analyzer variant over a compound-word derivation of the
    * documents table: adjacent word pairs are joined with '_' (a
    * deterministic transformation both the engine and the DuckDB oracle
    * apply identically), and the index is built with
    * [[graft.analysis.CodeAnalyzer.subTokenize]] — the
    * WordDelimiterGraphFilter path (`ft_subtoken_topk`).
    */
  def getSubtoken(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"sub:$dir") {
      import spark.implicits._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("text",
          regexp_replace($"text", "([a-z]+) ([a-z0-9]+)", "$1_$2"))
      build(spark, docs, "sub")
    }

  /** Combined content+path field variant — the BM25F/CombinedFieldQuery
    * materialisation (`ft_bm25f_topk`): path carries the source column,
    * so `srcN` terms hit via the path field.
    */
  def getCombinedField(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"all:$dir") {
      build(spark, spark.read.parquet(s"$dir/documents.parquet"), "all")
    }

  /** VByte posting-format variant (Codec SPI, `ft_vbyte_topk`): same
    * std analyzer, postings encoded with [[graft.codec.VByteFormat]] —
    * results must be identical to the PFOR index (codecs are
    * semantics-transparent).
    */
  def getVByte(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"vbyte:$dir") {
      build(spark, spark.read.parquet(s"$dir/documents.parquet"), "std", codec = "vbyte")
    }

  /** Position-preserving StopFilter variant (`ft_stop_*` entries). */
  def getStopFiltered(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"stop:$dir") {
      build(spark, spark.read.parquet(s"$dir/documents.parquet"), "stop")
    }

  /** ShingleFilter variant (unigrams + 2-shingles, `ft_shingle_topk`). */
  def getShingled(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"shingle:$dir") {
      build(spark, spark.read.parquet(s"$dir/documents.parquet"), "shingle")
    }

  /** Character-trigram NGramTokenizer variant (`ft_ngram_topk`). */
  def getNgram(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"ngram:$dir") {
      build(spark, spark.read.parquet(s"$dir/documents.parquet"), "ngram")
    }

  /** Porter-stemmed variant (`ft_porter_topk`): std tokens through the
    * classic Porter algorithm ([[graft.analysis.Stemmer.porter]]).
    */
  def getPorter(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"porter:$dir") {
      build(spark, spark.read.parquet(s"$dir/documents.parquet"), "porter")
    }

  /** Minimal-English-stemmed variant (`ft_stem_topk`) over a pluralized
    * derivation of the documents table: every standalone `stream` becomes
    * `streams` (a deterministic transformation, like [[getSubtoken]]'s),
    * and the s-stemmer restores the ORIGINAL token stream exactly — so
    * the DuckDB oracle is the plain BM25 SQL over the underived table,
    * and a hash match proves the stemmer actually applied (unstemmed,
    * `stream` would match nothing).
    */
  def getStemmed(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"enmin:$dir") {
      import spark.implicits._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("text", regexp_replace($"text", "\\bstream\\b", "streams"))
      build(spark, docs, "enmin")
    }

  /** French-minimal-stemmed variant (`ft_french_topk`) over a
    * French-pluralized derivation: every standalone `stream` becomes
    * `streams` (the French plural marker) and the Savoy minimal French
    * stemmer restores the ORIGINAL token stream exactly on this
    * vocabulary — so the plain BM25 oracle applies and a hash match
    * proves the stemmer ran (unstemmed, `stream` would match nothing).
    */
  def getFrench(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"frmin:$dir") {
      import spark.implicits._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("text", regexp_replace($"text", "\\bstream\\b", "streams"))
      build(spark, docs, "frmin")
    }

  /** German-minimal-stemmed variant (`ft_german_topk`) over a
    * German-infinitive derivation: every standalone `scan` becomes
    * `scannen`, which the Savoy minimal German stemmer's `-nen` rule
    * restores exactly (same proof shape as [[getFrench]]).
    */
  def getGerman(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"demin:$dir") {
      import spark.implicits._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("text", regexp_replace($"text", "\\bscan\\b", "scannen"))
      build(spark, docs, "demin")
    }

  /** German-NORMALIZED variant (`ft_denorm_topk`) over an umlauted
    * derivation: every standalone `group` becomes `gröup`, which the
    * german2 normalization folds back exactly — same restore-proof
    * shape as [[getGerman]].
    */
  def getGermanNorm(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"denorm:$dir") {
      import spark.implicits._
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("text", regexp_replace($"text", "\\bgroup\\b", "gröup"))
      build(spark, docs, "denorm")
    }

  /** Payload-lane variant (`ft_payload_topk`): std tokens, each carrying
    * a 4-byte float payload = token length ([[graft.analysis.Payloads
    * .lengthFloat]]) — per-occurrence payloads a DuckDB oracle can
    * recompute from the text.
    */
  def getLenPayload(spark: SparkSession, dir: String): (Index, DataFrame) =
    cached(spark, s"lenpayload:$dir") {
      build(spark, spark.read.parquet(s"$dir/documents.parquet"), "lenpayload")
    }

  private def cached(spark: SparkSession, key: String)(mk: => (Index, DataFrame)): (Index, DataFrame) =
    cache.getOrElseUpdate(s"${System.identityHashCode(spark)}:$key", mk)

  private val auxCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Char-ngram infix-pruning artifact over the std index's dictionary
    * ([[graft.exec.Suggest.infixGrams]]) — built once per session+dir
    * like the variant indexes.
    */
  def getInfixGrams(spark: SparkSession, dir: String): DataFrame =
    auxCache.getOrElseUpdate(s"${System.identityHashCode(spark)}:grams:$dir",
      graft.exec.Suggest.infixGrams(get(spark, dir)._1).persist())

  /** Backoff-ordered top-N unigram artifact for FreeText next-token
    * ([[graft.exec.Suggest.topUnigrams]], default alpha).
    */
  def getTopUnigrams(spark: SparkSession, dir: String): DataFrame =
    auxCache.getOrElseUpdate(s"${System.identityHashCode(spark)}:unitop:$dir",
      graft.exec.Suggest.topUnigrams(get(spark, dir)._1).persist())

  private val tokenCache = scala.collection.concurrent.TrieMap.empty[String, DataFrame]

  /** Documents table + a `ts` token-array column, tokenized ONCE per
    * session and cached — at 100 TB you tokenize into a shared column
    * instead of re-running the regex per analysis query. Consumers:
    * token counts, quality scoring, language id, fingerprints, dedup.
    */
  def docTokens(spark: SparkSession, dir: String): DataFrame =
    tokenCache.getOrElseUpdate(s"${System.identityHashCode(spark)}:$dir", {
      import spark.implicits._
      spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("ts", expr("regexp_extract_all(lower(text), '[a-z0-9_]+', 0)"))
        .persist()
    })

  /** `path` carries the table's `source` column — the second SCORED field
    * (`@path:` terms + `@norms:path` sidecar, see IndexBuilder.fieldTerm);
    * `commit` carries doc_id for the docId<->doc_id mapping.
    */
  private def build(spark: SparkSession, docs: DataFrame, analyzerMode: String,
      codec: String = graft.codec.PostingFormats.Default): (Index, DataFrame) = {
    import spark.implicits._
    val maxId = docs.agg(max($"doc_id")).head().getLong(0)
    val span = maxId / numSegments(maxId + 1) + 1
    val input = docs.select($"doc_id", $"text", $"lang", $"source")
      .as[(Long, String, String, String)]
      .map { case (id, text, lang, source) =>
        InputDoc(
          seg = (id / span).toInt,
          sortKey = f"$id%012d",
          repo = "documents", path = source, commit = id.toString, lang = lang,
          content = text)
      }
    val index = IndexBuilder.buildInMemory(spark, input, analyzerMode, codec)
    index.postings.persist()
    index.docmeta.persist()
    index.termStats.persist()
    val mapping = index.docmeta
      .select($"docId", $"commit".cast("long").as("doc_id"))
      .persist()
    (index, mapping)
  }
}
