package graft.tools

import graft.Sessions
import graft.ext.SimilaritySuite
import org.apache.spark.sql.functions._

/** q53 IVF recall/nprobe frontier (r12 verdict item 4): the q53 entry
  * serves at (nlist 16, nprobe 4) and was the weakest ANN path at sf1
  * (recall@10 0.90). A user tuning IVF needs the measured frontier —
  * recall vs scanned fraction vs serve wall — not a single operating
  * point. This sweeps nprobe at the entry's nlist (and a denser nlist
  * for contrast) on a derived copy fixture, with [[RecallCommon]]'s
  * tie-robust recall@10 over the same probe set as RecallGate (one
  * shared definition since r14 — the two tools previously carried
  * duplicate copies that could drift), timing the SERVE path
  * (models fit once per nlist and memoized, the production split).
  *
  * Usage: IvfFrontier <derivedSfDir> <outJson>
  * One JSON line after GRAFT_IVFFRONTIER_JSON + the artifact file.
  */
object IvfFrontier {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val spark = Sessions.local("graft-ivf-frontier", freezeTolerant = true)
    import spark.implicits._
    val k = 10

    val base0 = RecallCommon.vecBase(spark, sfDir)
    val probes: Seq[Long] = RecallCommon.copyProbes(spark, base0)

    val dotM = expr("array_dot(arr, pvec)")

    val configs = Seq(
      (16, 1), (16, 2), (16, 4), (16, 6), (16, 8),
      (32, 2), (32, 4), (32, 8), (32, 12))

    val rows = configs.map { case (nlist, nprobe) =>
      val model = SimilaritySuite.cachedIvf(spark, sfDir, nlist)
      def serve(p: Long): Seq[Long] =
        SimilaritySuite.ivfTopK(spark, sfDir, p, k, nlist = nlist,
          nprobe = nprobe, modelIn = model)
          .select("vec_id").as[Long].collect().toSeq
      serve(probes.head) // warm the path before timing
      val t0 = System.nanoTime()
      val returned = probes.map(p => p -> serve(p)).toMap
      val serveSec = (System.nanoTime() - t0) / 1e9 / probes.size
      val recalls = probes.map { p =>
        RecallCommon.recallOf(RecallCommon.withProbe(base0, p)._1, dotM, p, k, returned(p))
      }
      val mean = recalls.sum / recalls.size
      System.err.println(f"[ivf-frontier] nlist=$nlist nprobe=$nprobe " +
        f"recall@10=$mean%.3f serve=${serveSec}%.2fs per-probe=${recalls.mkString(",")}")
      (nlist, nprobe, mean, serveSec)
    }

    def fmt(d: Double) = "%.4f".format(d)
    val body = rows.map { case (nl, np, r, s) =>
      s"""{"nlist":$nl,"nprobe":$np,"scanned_fraction":${fmt(np.toDouble / nl)},""" +
        s""""recall_at10":${fmt(r)},"serve_sec_per_probe":${fmt(s)}}"""
    }.mkString("[", ",", "]")
    val json =
      s"""{"metric":"q53_ivf_frontier","sf":"$sfDir","k":$k,"probes":[${probes.mkString(",")}],"points":$body}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(outPath), json)
    println("GRAFT_IVFFRONTIER_JSON")
    println(json)
    spark.stop()
  }
}
