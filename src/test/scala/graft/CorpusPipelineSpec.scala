package graft

import graft.operators.CorpusPipeline
import org.apache.spark.sql.functions._

class CorpusPipelineSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("prepare: filters junk, dedups, chunks, splits — end to end") {
    val good = "the cat and the dog is in the house with you and that is fine " * 8 // en, long
    val df = docs(
      1L -> good,
      2L -> good,                        // exact duplicate of 1 → dropped
      3L -> "!!!",                       // junk quality → dropped
      4L -> ("zzz qqq xxx " * 30).trim)  // no markers → lang 'und', kept
    val out = CorpusPipeline.prepare(df, "text", "doc_id",
      CorpusPipeline.Config(minQuality = 0.2, languages = Seq("en", "und"),
        nearDedup = false, chunkSize = 200, chunkStride = 150, trainPct = 80))
      .cache()
    val ids = out.select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    assert(ids == Set(1L, 4L))
    // chunking multiplies rows; chunk indexes are contiguous from 0
    val doc1 = out.where(col("doc_id") === 1).orderBy("chunk_idx").collect()
    assert(doc1.length > 1)
    assert(doc1.map(_.getLong(1)).toSeq == (0L until doc1.length))
    // split is a function of doc_id only: constant within a doc
    assert(out.select("doc_id", "split").distinct().count() == 2)
    out.unpersist()
  }

  test("prepare is deterministic: identical runs, identical output") {
    val docsDf = Tables.load(spark, sfDir, "documents")
    val cfg = CorpusPipeline.Config(minQuality = 0.2, languages = Seq("en", "und"),
      nearDedupShingleN = 1, chunkSize = 128, chunkStride = 100)
    val a = CorpusPipeline.prepare(docsDf, "text", "doc_id", cfg)
      .orderBy("doc_id", "chunk_idx").collect()
    val b = CorpusPipeline.prepare(docsDf, "text", "doc_id", cfg)
      .orderBy("doc_id", "chunk_idx").collect()
    assert(a.nonEmpty && a.sameElements(b))
  }
}
