package graft.tools

import graft.Sessions
import graft.graphx.StarComponents
import org.apache.spark.sql.functions._

/** At-scale measurement + bit-exact cross-check of the star-contraction
  * CC ([[graft.graphx.StarComponents]]) against a GraphScale dump: reads
  * `<dir>/edges.parquet` (the symmetric closure the GraphX g08 run
  * consumed, whose labels in `<dir>/cc.parquet` are themselves
  * DuckDB-replay-verified), runs star CC on the undirected pairs, and
  * compares EVERY label. Records the wall and the round count — the
  * claim under test is that star contraction is log-round and
  * diameter-independent where label propagation is diameter-bound
  * (63-round fixpoint on the r14 chain fixture).
  *
  * Usage: StarCcCheck <graphScaleOutDir> <outJson>
  * One JSON line after GRAFT_STARCC_JSON + the artifact file; exits
  * nonzero on any label mismatch.
  */
object StarCcCheck {
  def main(args: Array[String]): Unit = {
    val Array(dir, outPath) = args
    val spark = Sessions.local("graft-starcc", freezeTolerant = true)

    val pairs = spark.read.parquet(s"$dir/edges.parquet")
      .where(col("u") < col("v")) // one row per undirected pair
      .cache()
    val nPairs = pairs.count() // materialize outside the timed window

    val t0 = System.nanoTime()
    val (labels, rounds) = StarComponents.runWithRounds(spark, pairs)
    val labelsC = labels.cache()
    val nLabels = labelsC.count()
    val wall = (System.nanoTime() - t0) / 1e9

    // Rename the GraphX label on read so the full-join compare is
    // unambiguous.
    val gx2 = spark.read.parquet(s"$dir/cc.parquet")
      .select(col("id"), col("label").as("gx_label"))
    val bad = labelsC.join(gx2, Seq("id"), "full")
      .where(col("label").isNull || col("gx_label").isNull ||
        col("label") =!= col("gx_label")).count()

    val json =
      s"""{"metric":"starcc_check","dir":"$dir","pairs":$nPairs,"vertices":$nLabels,""" +
        s""""rounds":$rounds,"wall_sec":${"%.2f".format(wall)},"label_mismatches":$bad,""" +
        s""""pass":${bad == 0L}}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println("GRAFT_STARCC_JSON")
    println(json)
    spark.stop()
    if (bad != 0L) sys.exit(1)
  }
}
