package graft

import graft.analytics.{Chunking, Dedup, Similarity}
import org.apache.spark.sql.functions._

/** The reason contamination_semantic exists, made executable: a
  * PARAPHRASED eval leak — same meaning vector, fully disjoint token
  * stream — that the n-gram screen provably scores 0 on while the
  * embedding screen catches with margin. Plus the board-level planted
  * guarantees (exactly the eval-base plants flagged, measured LSH
  * recall = 100%). */
class ContaminationSemanticSpec extends SparkSpec {

  import spark.implicits._

  test("n-gram screen misses the paraphrase; the semantic screen catches it") {
    // doc 30 paraphrases eval doc 0 with ZERO shared tokens
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog every day"),
      (30L, "a fast auburn vulpine leaps above some idle hound each morning"),
      (31L, "completely unrelated telemetry about warehouse shelving units"))
      .toDF("doc_id", "text")
    val ng = Chunking.contaminationOf(docs, evalMax = 25L).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getInt(4))).toMap
    assert(ng(30L) === ((0L, 0)), "paraphrase must share no 5-gram")
    assert(ng(31L) === ((0L, 0)))

    // the same three items in embedding space: the paraphrase sits at
    // cosine ≈ 1 to its eval twin, the unrelated doc orthogonal
    val v0 = (1 to 8).map(i => i.toDouble)
    val vPara = v0.map(_ * 0.999) // same direction, slightly scaled
    val vOther = Seq(1.0, -1.0, 1.0, -1.0, 1.0, -1.0, 1.0, -1.0)
    val e = Seq((0L, v0), (30L, vPara), (31L, vOther))
      .toDF("vec_id", "v")
      .withColumn("nrm", graft.functions.vec.l2norm(col("v")))
    val sem = Similarity.contaminationSemanticOf(e, 25L, 0.95).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sem === Map(30L -> 0L), "semantic screen must flag ONLY the paraphrase")
  }

  test("board query flags exactly the plants of eval bases, recall is measured high") {
    val flagged = Similarity.contaminationSemantic(spark, sfDir).collect()
    val ids = flagged.map(_.getLong(0)).toSet
    val expected = (0 until Dedup.EmbPlants)
      .filter(_ % Dedup.EmbPlantBases < Similarity.EvalVecMax)
      .map(p => Dedup.EmbPlantBase + p).toSet
    assert(ids === expected)
    // every flag names its own base as the nearest eval item and
    // clears the gate with margin
    flagged.foreach { r =>
      assert(r.getLong(1) === (r.getLong(0) - Dedup.EmbPlantBase) %
        Dedup.EmbPlantBases, r.toString)
      assert(r.getDouble(2) > 0.99, r.toString)
    }
    val rec = Similarity.contaminationSemanticRecall(spark, sfDir).collect()
    assert(rec.length === 1)
    assert(rec.head.getLong(0) === 50L, rec.head.toString)
    // recall is MEASURED, not assumed (the dedup_embedding_recall
    // contract): corpus-derived hyperplanes give 48/50 at sf0.001,
    // 50/50 at sf0.01 — the oracle hash-pins the exact per-corpus
    // value; the spec pins the floor a usable screen needs
    assert(rec.head.getLong(2) >= 900000L,
      s"banding recall collapsed: ${rec.head}")
  }
}
