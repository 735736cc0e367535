package graft.build

import graft.model.SourceRow
import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic source-code corpus (FIXTURES.md §1).
  *
  * Pure function of (seed, row index) — reproducible across JVMs and
  * partitionings (generated via `spark.range`, no RDD state). Mirrors the
  * role of the reference's corpus feeds
  * (`lucene/benchmark/.../feeds/LineDocSource.java`, `tf/util/LineFileDocs.java:61`):
  *  - ~30 language keywords with Zipf-like skew (mega-terms like `def`,
  *    `return` appear in nearly every file — exercises the skewed-term path);
  *  - V synthetic identifiers `ident_<n>` / `camelCaseName<n>` with a
  *    long-tail distribution;
  *  - planted rare terms `needle_<k>` in 1-3 docs for exact df/idf
  *    assertions, and planted adjacent pairs for phrase tests;
  *  - ASCII-only alphabet so our tokenizer provably equals the
  *    reference's StandardAnalyzer stream on this data (SURVEY.md §7.4.2);
  *  - log-normal-ish token-count spread (5..~3000) to exercise the norm
  *    byte buckets of SmallFloat.intToByte4.
  */
object Datagen {
  val Keywords: Array[String] = Array(
    "def", "class", "return", "val", "var", "if", "else", "for", "while",
    "import", "package", "object", "trait", "extends", "override", "private",
    "public", "static", "void", "int", "string", "match", "case", "new",
    "null", "true", "false", "try", "catch", "final")

  val Langs: Array[String] = Array("scala", "java", "py", "go", "rs")

  /** xorshift-style mix for a deterministic per-(seed,idx,step) stream. */
  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Generate the content of document `idx`. */
  def content(seed: Long, idx: Long, vocabSize: Int): String = {
    val h0 = mix(seed ^ mix(idx))
    // token count: exponential-ish spread 5..~3000
    val u = ((h0 >>> 11).toDouble / (1L << 53).toDouble)
    val nTokens = 5 + (math.exp(u * 6.4) * 1.6).toInt // 5 .. ~1000
    val sb = new java.lang.StringBuilder(nTokens * 8)
    var state = h0
    var i = 0
    while (i < nTokens) {
      state = mix(state)
      val r = (state >>> 8) & 0xffff
      val tok =
        if (r < 26214) Keywords((state >>> 24).toInt.abs % Keywords.length) // 40% keywords, Zipf-ish via modulo bias
        else if (r < 45875) s"ident_${((state >>> 24) % vocabSize).toInt.abs}" // 30% identifiers
        else if (r < 52429) s"camelCaseName${((state >>> 24) % (vocabSize / 4 + 1)).toInt.abs}" // 10%
        else if (r < 58982) ((state >>> 24) & 0x3ff).toString // 10% numbers
        else Keywords(((state >>> 24) % 8).toInt.abs) // 10% top-8 keywords again (skew)
      sb.append(tok)
      state = mix(state)
      sb.append(if ((state & 7) == 0L) ";\n" else if ((state & 7) == 1L) "(" else " ")
      i += 1
    }
    // planted rare terms + adjacent pair for phrase tests
    if (idx % 997 == 0) sb.append(" needle_").append(idx / 997)
    if (idx % 101 == 0) sb.append(" class camelCaseName7 ")
    sb.toString
  }

  def row(seed: Long, idx: Long, numRepos: Int, vocabSize: Int): SourceRow = {
    val repo = f"repo-${mix(seed ^ idx).abs % numRepos}%04d"
    val commitH = mix(seed ^ mix(idx ^ 0x5ca1ab1eL))
    SourceRow(
      repo = repo,
      path = f"src/d${(idx / 1000) % 100}%02d/File_$idx%08d.x",
      commit = f"${commitH}%016x${mix(commitH)}%016x".take(40).padTo(40, '0').mkString,
      lang = Langs((mix(idx ^ seed) % Langs.length).toInt.abs),
      content = content(seed, idx, vocabSize)
    )
  }

  /** Distributed generation — deterministic, partition-count independent.
    * `numPartitions > 0` fixes the partitioning (contiguous idx ranges),
    * which the shuffle-free partition-local build maps 1:1 to segments.
    */
  def corpus(spark: SparkSession, n: Long, seed: Long = 42L,
             numRepos: Int = 100, vocabSize: Int = 5000,
             numPartitions: Int = 0): Dataset[SourceRow] = {
    import spark.implicits._
    val rng = if (numPartitions > 0) spark.range(0, n, 1, numPartitions) else spark.range(n)
    rng.map(idx => row(seed, idx, numRepos, vocabSize))
  }

  /** Route the corpus to build segments: deterministic hash of the
    * primary key — resume-safe, independent of input partitioning.
    */
  def toInputDocs(ds: Dataset[SourceRow], numSegments: Int): Dataset[InputDoc] = {
    import ds.sparkSession.implicits._
    ds.map { r =>
      val key = s"${r.repo}/${r.path}@${r.commit}"
      val seg = math.floorMod(scala.util.hashing.MurmurHash3.stringHash(key), numSegments)
      InputDoc(seg, key, r.repo, r.path, r.commit, r.lang, r.content)
    }
  }
}
