package graft

import java.nio.file.Files

import graft.state.IngestState
import org.scalatest.funsuite.AnyFunSuite

/** State-machine KV: last-writer-wins, monotonic sequencing without
  * read-before-write, bounded file growth under many transitions. */
class IngestStateSpec extends AnyFunSuite with SparkSuite {

  test("many transitions keep the part-file count bounded; latest values survive compaction") {
    val dir = TempDirs.tempDir("graft_state").toString
    val state = new IngestState(spark, dir)

    // 3 × IngestState.CompactThreshold transitions, incl. repeated
    // overwrites of the same keys (the realistic in_progress→successful arc)
    (1 to 24).foreach { i =>
      state.setDumpStatus(s"dump$i", IngestState.InProgress)
      state.setDumpStatus(s"dump$i", IngestState.Successful)
    }
    state.setLastVersionProcessed("2.0.0")

    val parts = new java.io.File(s"$dir/state.parquet").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parts <= IngestState.CompactThreshold + 1,
      s"append log not compacted: $parts part files after 49 transitions")

    // every key resolves to its LATEST value across the compaction boundary
    (1 to 24).foreach { i =>
      assert(state.dumpStatus(s"dump$i").contains(IngestState.Successful))
      assert(state.alreadyProcessed(s"dump$i"))
    }
    assert(state.lastVersionProcessed.contains("2.0.0"))

    // writes after a compaction still win over compacted values
    state.setDumpStatus("dump1", IngestState.Failure)
    assert(state.dumpStatus("dump1").contains(IngestState.Failure))
    assert(!state.alreadyProcessed("dump1"))
  }

  test("a fresh instance (new JVM counter seed) still orders after old writes") {
    val dir = TempDirs.tempDir("graft_state2").toString
    val s1 = new IngestState(spark, dir)
    s1.setDumpStatus("d", IngestState.InProgress)
    val s2 = new IngestState(spark, dir) // fresh counter, wall-clock seeded
    s2.setDumpStatus("d", IngestState.Successful)
    assert(s2.dumpStatus("d").contains(IngestState.Successful))
    assert(s1.dumpStatus("d").contains(IngestState.Successful))
  }
}
