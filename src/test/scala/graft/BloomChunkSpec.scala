package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.queries.DocQueries

/** Bloom-pruned semi join exactness + chunking tiling laws. */
class BloomChunkSpec extends SparkSpec {
  import spark.implicits._

  test("bloom semi join equals plain semi join even with a saturated bloom") {
    val big = (1L to 200L).map(k => (k, s"row$k")).toDF("k", "payload")
    val small = Seq(5L, 17L, 42L, 199L).toDF("sk")
    // 16 bits for 4 keys → false positives are all but guaranteed; the
    // exact join after the prune must still produce the exact result
    val got = Relational.bloomSemiJoin(big, small, "k", "sk",
                                       estItems = 4L, numBits = 16L)
      .select($"k").as[Long].collect().sorted.toSeq
    assert(got == Seq(5L, 17L, 42L, 199L))
  }

  test("bloom semi join never loses matches (no false negatives)") {
    val big = (1L to 1000L).toDF("k")
    val small = (1L to 1000L by 7).toDF("sk")
    val got = Relational.bloomSemiJoin(big, small, "k", "sk").count()
    assert(got == (1L to 1000L by 7).size)
  }

  test("chunking tiles every document: stride spacing, full coverage, bounds") {
    val docs = Seq(
      (1L, (1 to 200).map(i => s"w$i").mkString(" ")),  // multi-chunk
      (2L, (1 to 64).map(i => s"w$i").mkString(" ")),   // exactly one chunk
      (3L, "a b c"),                                     // tiny doc
      (4L, (1 to 65).map(i => s"w$i").mkString(" "))    // chunk + 1 token
    ).toDF("doc_id", "text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_chunk")
    docs.withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val chunks = DocQueries.pipeChunkDocs(spark, tmp.toString)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap

    // doc 1: 200 tokens, chunk 64, stride 48 → ceil((200-64)/48)+1 = 4
    val c1 = chunks(1L)
    assert(c1.length == 4)
    assert(c1.map(_._3).toSeq == Seq(1, 49, 97, 145))            // starts at stride
    assert(c1.last._4 == 200)                              // covers the tail
    assert(c1.forall { case (_, _, s, e) => e - s + 1 <= 64 })
    // docs 2 and 3: single chunk covering everything
    assert(chunks(2L).toSeq == Seq((2L, 0, 1, 64)))
    assert(chunks(3L).toSeq == Seq((3L, 0, 1, 3)))
    // doc 4: second chunk starts at 49, ends at 65
    assert(chunks(4L).toSeq == Seq((4L, 0, 1, 64), (4L, 1, 49, 65)))
  }
}
