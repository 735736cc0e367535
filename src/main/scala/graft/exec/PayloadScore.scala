package graft.exec

import graft.build.Index
import graft.codec.PostingCodec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PayloadScoreQuery analogue (`lucene/queries/src/java/org/apache/
  * lucene/queries/payloads/PayloadScoreQuery.java`): scores docs by a
  * PayloadFunction over the float payloads found at the matched terms'
  * positions ({Sum,Max,Min,Average}PayloadFunction in the same package;
  * payload bytes decoded like `PayloadDecoder.FLOAT_DECODER`). With the
  * reference's includeSpanScore=false the document score IS the payload
  * function value — composing with BM25 is a rescore pass here, like
  * `expr_rescore_topk`.
  *
  * Plan shape (100 TB): one pushed `In(term, ...)` scan of the postings
  * rows for the queried terms, a flatMap emitting (docId, payloadFloat)
  * per MATCHED position — bounded by the queried terms' ttf, never the
  * corpus — a hash aggregation by docId (map-side partials), a
  * left-semi docmeta join (tombstone filter, matched-docs-bounded), and
  * a TakeOrderedAndProject top-k. Rows without the payload lane
  * contribute nothing, like the reference returning no payloads for a
  * field indexed without them.
  */
object PayloadScore {
  val Sum = "sum"; val Max = "max"; val Min = "min"; val Avg = "avg"

  def topK(index: Index, terms: Seq[String], fn: String, k: Int): DataFrame = {
    val spark = index.postings.sparkSession
    import spark.implicits._
    val vals = index.postings
      .filter($"term".isin(terms: _*))
      .flatMap { pl =>
        if (!PostingCodec.hasPayloads(pl)) Iterator.empty
        else {
          val d = PostingCodec.decodeAll(pl, withPayloads = true)
          d.docIds.indices.iterator.flatMap { i =>
            d.payloads(i).iterator.filter(_ != null).map(b =>
              (d.docIds(i), graft.analysis.Payloads.decodeFloat(b).toDouble))
          }
        }
      }.toDF("docId", "v")
    val agg = fn match {
      case Sum => sum($"v")
      case Max => max($"v")
      case Min => min($"v")
      case Avg => avg($"v")
      case other => throw new IllegalArgumentException(s"unknown payload function '$other'")
    }
    vals.groupBy($"docId").agg(agg.as("score"))
      .join(index.docmeta.select($"docId"), Seq("docId"), "left_semi")
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
  }
}
