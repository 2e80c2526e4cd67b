package graft.llmops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world, this is a binary payload stand-in", "img"),
    (2L, "", "aud"), (3L, null.asInstanceOf[String], null.asInstanceOf[String])
  ).toDF("doc_id", "text", "source")

  private lazy val blobs = Multimodal.asBlobs(docs, "doc_id", "text", "source")

  test("asBlobs: binary payload with kind defaults") {
    val r = blobs.collect().map(x => x.getAs[Long]("blob_id") ->
      (x.getAs[String]("kind"), x.getAs[Array[Byte]]("payload"))).toMap
    assert(r(1L)._1 == "img")
    assert(r(3L)._1 == "unknown")
    assert(new String(r(1L)._2, "UTF-8").startsWith("hello world"))
    assert(r(2L)._2.length == 0)
  }

  test("blobMetadata: length, digest, magic — no decode") {
    val m = Multimodal.blobMetadata(blobs).collect()
      .map(x => x.getAs[Long]("blob_id") -> x).toMap
    assert(m(1L).getAs[Long]("n_bytes") == 46L)
    assert(m(1L).getAs[String]("sha256").length == 64)
    assert(m(1L).getAs[String]("magic") == "68656C6C") // "hell"
  }

  test("decode: stub codec is deterministic and batch-shaped") {
    val d1 = Multimodal.decode(spark, blobs).collect()
      .map(x => x.blob_id -> x).toMap
    val d2 = Multimodal.decode(spark, blobs).collect()
      .map(x => x.blob_id -> x).toMap
    assert(d1(1L).features.toSeq == d2(1L).features.toSeq)
    assert(d1(1L).width >= 16 && d1(1L).height >= 16)
    assert(d1(1L).n_bytes == 46L)
    assert(d1(2L).features.length == 8)
  }

  test("frameSample: array-typed frames per blob") {
    val f = Multimodal.frameSample(blobs).collect()
      .map(x => x.getAs[Long]("blob_id") -> x.getSeq[String](x.fieldIndex("frames")))
      .toMap
    assert(f(1L).nonEmpty)
    assert(f(2L).length == 1) // degenerate empty payload → single frame
  }
}
