package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import java.io.File
import java.nio.file.Files

/** Unit coverage for StreamBench.orderMtimes (r12 verdict item 6): the
  * mtime-stamping determinism fix is load-bearing for every future
  * streaming bench — FileStreamSource ingests in modification-time order
  * and one out-of-order chunk advances the watermark past the rest,
  * silently dropping them as late data — but until now it was exercised
  * only by the tool itself. No SparkSession needed: the contract is pure
  * file metadata.
  */
class StreamBenchSpec extends AnyFunSuite {

  private def withDir(body: File => Unit): Unit = {
    val dir = Files.createTempDirectory("graft-sbspec").toFile
    try body(dir)
    finally graft.TmpFiles.deleteRecursively(dir.getPath)
  }

  private def mk(dir: File, name: String): File = {
    val f = new File(dir, name)
    Files.write(f.toPath, Array[Byte](1, 2, 3))
    f
  }

  test("stamps part files ascending in FILENAME order regardless of creation order") {
    withDir { dir =>
      // Created in scrambled order, all within the same clock tick — the
      // exact shape a parallel range-partitioned write produces.
      val names = Seq("part-00002-x", "part-00000-x", "part-00001-x")
      val files = names.map(mk(dir, _))
      val start = 1700000000000L
      val last = StreamBench.orderMtimes(dir.getPath, startAt = start)
      val byName = files.sortBy(_.getName)
      assert(byName.map(_.lastModified()) ==
        Seq(start + 1000L, start + 2000L, start + 3000L))
      assert(last == start + 3000L, "returned mtime must be the LAST stamp")
    }
  }

  test("non part- files are left untouched") {
    withDir { dir =>
      mk(dir, "part-00000-x")
      val success = mk(dir, "_SUCCESS")
      val before = success.lastModified()
      StreamBench.orderMtimes(dir.getPath, startAt = 1700000000000L)
      assert(success.lastModified() == before)
    }
  }

  test("sentinel-last: `after` exclusion stamps only new files, strictly after the chunks") {
    withDir { dir =>
      // The s_stateful_sessions replay shape: data chunks first, then a
      // flush-sentinel write whose part file must be ingested LAST (a
      // sentinel ingested early would flush sessions before their data).
      val chunks = Seq("part-00000-a", "part-00001-a").map(mk(dir, _))
      val chunkNames = chunks.map(_.getName).toSet
      val start = 1700000000000L
      val lastChunk = StreamBench.orderMtimes(dir.getPath, startAt = start)
      val sentinel = mk(dir, "part-00000-sentinel")
      StreamBench.orderMtimes(dir.getPath, after = chunkNames,
        startAt = lastChunk + 60000L)
      val chunkMtimes = chunks.map(_.lastModified())
      assert(chunkMtimes == Seq(start + 1000L, start + 2000L),
        "chunk stamps must not move when the sentinel is stamped")
      assert(sentinel.lastModified() > chunkMtimes.max + 59000L,
        "sentinel must be stamped strictly after every chunk")
    }
  }

  test("fail-fast: a refused setLastModified throws instead of degrading silently") {
    withDir { dir =>
      val ghost = mk(dir, "part-00000-g")
      assert(ghost.delete()) // setLastModified on a missing file returns false
      val e = intercept[IllegalArgumentException] {
        StreamBench.stampAscending(Seq(ghost), 1700000000000L)
      }
      assert(e.getMessage.contains("ordered replay unavailable"))
    }
  }

  test("empty replay dir errors loudly rather than replaying nothing") {
    val missing = new File("/tmp/graft-sbspec-definitely-missing-" + System.nanoTime())
    val e = intercept[RuntimeException] {
      StreamBench.orderMtimes(missing.getPath)
    }
    assert(e.getMessage.contains("cannot list replay dir"))
  }
}
