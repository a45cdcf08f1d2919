package graft

import org.apache.spark.sql.functions._

import graft.ops.Curation

/** Semantic invariants of the curation operators (the oracle gates check
  * cross-engine equality; these check the operators mean what they say). */
class CurationSpec extends SparkTestBase {

  private lazy val docs = graft.sources.Tables(spark, sf, "documents")

  test("ngram Jaccard pairs: ordered, bounded, and actually similar") {
    val pairs = Curation.ngramJaccardPairs(docs, threshold = 0.3).collect()
    assert(pairs.nonEmpty, "corpus has near-dups; expected pairs")
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be a<b (no mirrors)")
      val j = r.getDouble(2)
      assert(j >= 0.3 && j <= 1.0, s"jaccard out of range: $j")
    }
    // exact Jaccard of a pair must match a direct set computation
    val (a, b, j) = {
      val r = pairs.maxBy(_.getDouble(2)); (r.getLong(0), r.getLong(1), r.getDouble(2))
    }
    val sets = docs.where(col("doc_id").isin(a, b))
      .select(col("doc_id"), col("text")).collect()
      .map { r =>
        val w = r.getString(1).split(" ")
        r.getLong(0) -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
    val inter = (sets(a) & sets(b)).size.toDouble
    val expect = inter / (sets(a).size + sets(b).size - inter)
    assert(math.abs(j - expect) < 1e-6, s"jaccard $j != set-computed $expect")
  }

  test("short documents don't crash the shingle ops (ANSI element_at)") {
    import spark.implicits._
    // under Spark's ANSI default an unguarded element_at past the array
    // end THROWS — docs shorter than the n-gram must yield zero shingles
    val in = Seq((1L, "one two"), (2L, "single"), (3L, ""),
      (4L, "a b c d e f")).toDF("doc_id", "text")
    val pairs = Curation.ngramJaccardPairs(in, threshold = 0.1).collect()
    assert(pairs.forall(r => r.getLong(0) == 4L || r.getLong(1) == 4L) || pairs.isEmpty)
    val cont = Curation.contamination(in, benchMaxId = 2, minShared = 1).collect()
    assert(cont.forall(_.getLong(0) >= 2))
    val rep = Curation.repetitionStats(in).collect()
    assert(rep.length == 4)
    assert(rep.find(_.getLong(0) == 2L).exists(_.getDouble(3) == 0.0),
      "single-word doc must report top_bigram_frac 0.0")
  }

  test("contamination reports only corpus-vs-bench with the claimed overlap") {
    val c = Curation.contamination(docs, benchMaxId = 20, minShared = 2).collect()
    assert(c.nonEmpty)
    c.foreach { r =>
      assert(r.getLong(0) >= 20, "corpus side must exclude the benchmark")
      assert(r.getLong(1) < 20, "bench side must be benchmark docs")
      assert(r.getLong(2) >= 2)
    }
  }

  test("PII redaction removes every email and long digit run it counts") {
    import spark.implicits._
    val in = Seq(
      (1L, "write to a.b+c@ex-ample.org or call 12345678 now"),
      (2L, "nothing sensitive here 123 ok"),
      (3L, "two mails x@y.io and z@w.co plus 99999999999")).toDF("doc_id", "text")
    val out = Curation.piiRedact(in).collect().map(r =>
      r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L)._1 == "write to <EMAIL> or call <NUM> now")
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(2L)._1 == "nothing sensitive here 123 ok", "short digits stay")
    assert(out(2L)._2 == 0 && out(2L)._3 == 0)
    assert(out(3L)._2 == 2 && out(3L)._3 == 1)
    // idempotent: redacting redacted text changes nothing
    val again = Curation.piiRedact(
      Curation.piiRedact(in).select(col("doc_id"), col("clean_text").as("text")))
    assert(again.agg(sum(col("n_emails") + col("n_longnums"))).head.getLong(0) == 0)
  }

  test("sequence packing fills contiguously per source within the budget") {
    val packed = Curation.packSequences(docs, budget = 512)
    // offsets are the running sum: within a source, offset(next) =
    // offset(prev) + tokens(prev); pack_id = floor(offset/budget)
    val rows = packed.orderBy("source", "doc_id").collect()
    rows.groupBy(_.getString(1)).foreach { case (_, rs) =>
      var expect = 0L
      rs.foreach { r =>
        assert(r.getLong(4) == expect,
          s"offset gap at doc ${r.getLong(0)}: ${r.getLong(4)} != $expect")
        assert(r.getLong(3) == expect / 512)
        expect += r.getLong(2)
      }
    }
    // a pack never STARTS beyond its boundary: every pack id observed is
    // dense from 0 per source
    packed.groupBy("source").agg(max("pack_id").as("mx"),
        countDistinct("pack_id").as("n"))
      .collect().foreach(r => assert(r.getLong(2) == r.getLong(1) + 1,
        "pack ids must be dense per source"))
  }
}
