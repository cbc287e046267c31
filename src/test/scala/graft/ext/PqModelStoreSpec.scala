package graft.ext

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Fit-once / serve-many gates for [[PqModelStore]]: the persisted model
  * must round-trip bit-exact (parquet doubles, no text formatting), and a
  * serving job running against the RELOADED model must produce exactly
  * what the fitting job's own model produces — encode parity for q134,
  * full top-k identity for q135. */
class PqModelStoreSpec extends SparkSuite {
  private val sf = "/root/testdata/sf0.001"

  test("PqModel round-trips bit-exact and encode parity holds across reload") {
    import spark.implicits._
    val model = SimilaritySuite.fitPq(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("pqmodel").toString
    PqModelStore.savePq(spark, model, s"$dir/pq")
    val loaded = PqModelStore.loadPq(spark, s"$dir/pq")
    assert(loaded.m == model.m && loaded.sub == model.sub && loaded.ksub == model.ksub)
    for (j <- 0 until model.m; c <- 0 until model.ksub)
      assert(java.util.Arrays.equals(loaded.codebooks(j)(c), model.codebooks(j)(c)),
        s"centroid ($j,$c) drifted across reload")
    val base = graft.Tables(spark, sf, "embeddings")
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("arr"))
    val orig = SimilaritySuite.pqEncode(base, model).as[(Long, Seq[Int])].collect().toMap
    val re = SimilaritySuite.pqEncode(base, loaded).as[(Long, Seq[Int])].collect().toMap
    assert(orig.nonEmpty && orig == re, "codes differ across model reload")
  }

  test("IvfPqModel round-trips and q135 serving from the loaded model is identical") {
    val model = SimilaritySuite.fitIvfPq(spark, sf, nlist = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivfpqmodel").toString
    PqModelStore.saveIvfPq(spark, model, s"$dir/ivfpq")
    val loaded = PqModelStore.loadIvfPq(spark, s"$dir/ivfpq")
    assert(loaded.centers.length == model.centers.length && loaded.centers.nonEmpty)
    loaded.centers.zip(model.centers).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "coarse center drifted across reload")
    }
    def serve(m: SimilaritySuite.IvfPqModel) =
      SimilaritySuite.ivfPqTopK(spark, sf, probeId = 0L, k = 10,
        nprobe = 4, modelIn = m)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val fitServe = serve(model)
    val loadServe = serve(loaded)
    assert(fitServe.size == 10)
    assert(fitServe == loadServe,
      s"serving diverged across reload:\n$fitServe\n$loadServe")
  }
}
