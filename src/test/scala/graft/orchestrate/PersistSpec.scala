package graft.orchestrate

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class PersistSpec extends AnyFunSuite {
  import Persist._

  private def tmp(name: String) =
    Files.createTempDirectory("graft_persist").resolve(name).toString

  test("tracker state JSON round-trips (property, 200 seeded samples)") {
    val r = new Random(42)
    (1 to 200).foreach { i =>
      val s = CdcTracker.State(
        lastProcessedPartition = f"year=20${r.nextInt(40)}%02d/month=01/day=01/hour=00/minute=${r.nextInt(60)}%02d",
        nextProcessedPartition = if (r.nextBoolean()) Some(s"p-$i") else None,
        lastRunId = if (r.nextBoolean()) Some(s"run-$i") else None,
        readyToRunNext = r.nextBoolean())
      assert(stateFromJson(stateToJson(s)) === s)
    }
  }

  test("tracker state survives a file round-trip") {
    val s = CdcTracker.State("year=2024/month=01/day=01/hour=00/minute=00",
      Some("year=2024/month=01/day=01/hour=01/minute=00"), Some("run-9"), readyToRunNext = false)
    val p = tmp("state.json")
    writeState(s, p)
    assert(readState(p) === Some(s))
    assert(readState(p + ".missing") === None)
  }

  test("job input round-trips incl. empty and escaped URIs") {
    val cases = Seq(
      JobInput("year=2024/month=01/day=01/hour=00/minute=01",
        "year=2024/month=01/day=01/hour=00/minute=09",
        Seq("s3://b/p/f1.json", "s3://b/p/f \"quoted\".json")),
      JobInput("a", "b", Seq.empty),
      // the hostile cases: literal backslash-n, brackets inside URIs,
      // tabs/control chars (encoded as \uXXXX), trailing backslash-ish
      JobInput("a\\nb", "c\td",
        Seq("s3://b/part[0].json", "s3://b/f]2.json", "s3://b/back\\slash.json")))
    cases.foreach { j =>
      assert(jobInputFromJson(jobInputToJson(j)) === j)
      val p = tmp("input.json")
      writeJobInput(j, p)
      assert(readJobInput(p) === j)
    }
  }

  test("state round-trips strings with backslash escapes and control chars") {
    val s = CdcTracker.State("p\\n1", Some("x\"y"), Some("run\t9"), readyToRunNext = true)
    assert(stateFromJson(stateToJson(s)) === s)
  }
}
