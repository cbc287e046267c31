package graft.ext

import graft.ext.SimilaritySuite.{IvfPqModel, PqModel}
import org.apache.spark.sql.SparkSession

/** Persistence for the fitted ANN models (q134's [[SimilaritySuite.PqModel]]
  * and q135's [[SimilaritySuite.IvfPqModel]]). The production 100 TB shape
  * is fit-once-offline / serve-many: a fit job writes the model once, and
  * every serving job loads it instead of re-running the KMeans/Lloyd's
  * fits per query (which is what `fitPq`/`fitIvfPq` alone would imply).
  *
  * Layout: ONE parquet file of `(part, j, c, vec)` rows —
  * `part = "codebook"` rows carry subspace `j` / centroid `c` of the
  * product quantizer; `part = "center"` rows carry coarse cell `j` (a plain
  * PqModel simply has no center rows). Parquet doubles round-trip
  * bit-exact (no text-formatting loss), and the PQ geometry (`m`, `ksub`,
  * `sub`) reconstructs from the codebook rows themselves, so the file is
  * self-describing. PqModelStoreSpec pins encode parity across a
  * save/load cycle.
  */
object PqModelStore {

  def savePq(s: SparkSession, model: PqModel, path: String): Unit =
    saveIvfPq(s, IvfPqModel(Array.empty, model), path)

  def saveIvfPq(s: SparkSession, model: IvfPqModel, path: String): Unit = {
    import s.implicits._
    val cb = model.pq.codebooks
    val rows =
      (for { j <- cb.indices; c <- cb(j).indices }
        yield ("codebook", j, c, cb(j)(c).toSeq)) ++
      model.centers.zipWithIndex.map { case (v, j) => ("center", j, 0, v.toSeq) }
    // O(m·ksub + nlist) rows of small vectors — one output file, not 32.
    rows.toDF("part", "j", "c", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def loadPq(s: SparkSession, path: String): PqModel = loadIvfPq(s, path).pq

  def loadIvfPq(s: SparkSession, path: String): IvfPqModel = {
    // Driver-side collect by contract: the model is O(m·ksub·sub +
    // nlist·dim) scalars — the same data the serving plan ships to every
    // executor as codebook/center literals.
    val rows = s.read.parquet(path)
      .select("part", "j", "c", "vec").collect()
    val cbRows = rows.filter(_.getString(0) == "codebook")
    require(cbRows.nonEmpty, s"no codebook rows in $path")
    val m = cbRows.map(_.getInt(1)).max + 1
    val ksub = cbRows.map(_.getInt(2)).max + 1
    val codebooks = Array.ofDim[Array[Double]](m, ksub)
    cbRows.foreach { r =>
      codebooks(r.getInt(1))(r.getInt(2)) = r.getSeq[Double](3).toArray
    }
    require(codebooks.forall(_.forall(_ != null)),
      s"ragged codebook in $path: expected $m x $ksub centroids")
    val sub = codebooks(0)(0).length
    val centerRows = rows.filter(_.getString(0) == "center")
    val centers = Array.ofDim[Array[Double]](centerRows.length)
    centerRows.foreach { r => centers(r.getInt(1)) = r.getSeq[Double](3).toArray }
    IvfPqModel(centers, PqModel(m, sub, ksub, codebooks))
  }
}
