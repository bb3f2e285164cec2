package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinarySpec extends SparkSpec {

  test("media table: payload bytes round-trip the text, metadata correct") {
    import spark.implicits._
    val df = Seq((1L, "hello"), (2L, "")).toDF("doc_id", "text")
    val media = Binary.toMediaTable(df, "text", "doc_id").collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(new String(media(1L).getAs[Array[Byte]]("payload"), "UTF-8") == "hello")
    assert(media(1L).getAs[Long]("n_chars") == 5L)
    assert(media(2L).getAs[Array[Byte]]("payload").isEmpty)
  }

  test("feature extraction: deterministic stub features, batched shape") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"document payload $i")).toDF("doc_id", "text")
    val media = Binary.toMediaTable(df, "text", "doc_id")
    val feats = Binary.extractFeatures(media, batchSize = 64, featureDim = 8).collect()
    assert(feats.length == 200)
    val f1 = feats.find(_.doc_id == 1L).get
    val bytes = "document payload 1".getBytes("UTF-8")
    assert(f1.byte_len == bytes.length.toLong)
    assert(f1.head_sum == bytes.take(16).map(_ & 0xff).sum.toLong)
    assert(f1.feature.length == 8)
    // deterministic: rerun gives identical features
    val again = Binary.extractFeatures(media, batchSize = 7, featureDim = 8).collect()
      .find(_.doc_id == 1L).get
    assert(again.feature.sameElements(f1.feature) && again.head_sum == f1.head_sum)
  }
}
