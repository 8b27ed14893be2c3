package graft.operators

import graft.SparkSpec

/** The multimodal plumbing must behave identically regardless of
  * partitioning (decode is per-row pure; mapPartitions only batches it),
  * and features must match an independent driver-side computation. */
class MultimodalSpec extends SparkSpec {

  test("feature extraction is partitioning-invariant and matches reference computation") {
    val s = spark
    val media = Multimodal.mediaFromDocuments(s, sfDir)

    val f2 = Multimodal.extractFeatures(media, partitions = 2)
      .collect().map(f => f.media_id -> f).toMap
    val f7 = Multimodal.extractFeatures(media, partitions = 7)
      .collect().map(f => f.media_id -> f).toMap
    assert(f2.keySet == f7.keySet && f2.keySet.nonEmpty)
    f2.foreach { case (id, f) =>
      assert(f.features.toSeq == f7(id).features.toSeq,
        s"partitioning changed features for $id")
    }

    // independent reference computation on the driver
    val raw = media.collect()
    raw.foreach { m =>
      val hist = new Array[Double](Multimodal.FeatureDim)
      m.content.foreach(b => hist((b & 0xff) % Multimodal.FeatureDim) += 1.0)
      val expected = hist.map(_ / math.max(1.0, m.content.length.toDouble)).toSeq
      assert(f2(m.media_id).features.toSeq == expected)
      assert(f2(m.media_id).n_bytes == m.content.length.toLong)
    }
  }

  test("media schema: binary content with typed metadata columns") {
    val s = spark
    val schema = Multimodal.mediaFromDocuments(s, sfDir).schema
    assert(schema("content").dataType.typeName == "binary")
    assert(schema("n_bytes").dataType.typeName == "long")
    assert(schema("mime").dataType.typeName == "string")
  }
}
