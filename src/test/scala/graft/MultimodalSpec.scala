package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Multimodal, StubDecoder}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def payloads = Seq(
    (1L, "first payload".getBytes("UTF-8")),
    (2L, "second, longer payload bytes".getBytes("UTF-8")),
    (3L, Array[Byte]())).toDF("doc_id", "payload")

  test("extractFeatures is deterministic and schema-stable") {
    val a = Multimodal.extractFeatures(payloads, "doc_id", "payload").collect()
    val b = Multimodal.extractFeatures(payloads, "doc_id", "payload").collect()
    assert(a.map(_.toSeq).toSet == b.map(_.toSeq).toSet)
    assert(a.length == 3)
    val r1 = a.find(_.getLong(0) == 1L).get
    assert(r1.getLong(1) == "first payload".length)
    assert(r1.getInt(2) >= 32 && r1.getInt(3) >= 32 && r1.getInt(4) >= 1)
  }

  test("resizePlan fits the target box preserving aspect, never upscales") {
    val out = Multimodal.resizePlan(payloads, "doc_id", "payload", maxW = 64, maxH = 48)
      .collect()
    out.foreach { r =>
      val (sw, sh, ow, oh) = (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
      assert(ow <= 64 && oh <= 48)
      assert(ow <= sw && oh <= sh) // no upscale
      val srcAspect = sw.toDouble / sh
      val outAspect = ow.toDouble / oh
      assert(math.abs(srcAspect - outAspect) < 0.1) // aspect preserved (rounding slack)
    }
  }

  test("sampleFrames takes every stride-th index starting at 0") {
    val out = Multimodal.sampleFrames(payloads, "doc_id", "payload", stride = 2)
      .collect()
    out.foreach { r =>
      val n = r.getInt(1)
      val sampled = r.getSeq[Int](2)
      assert(sampled == (0 until n by 2))
      assert(sampled.headOption.contains(0))
    }
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(payloads, "doc_id", "payload", stride = 0)
    }
  }
}
