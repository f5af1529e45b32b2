package graft.streaming

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the flatMapGroupsWithState state-merge: however the
  * event stream is split into micro-batches, folding the batches through
  * `mergeSessions` must converge to the same sessions a single-shot batch
  * sessionization (the q26 gap rule) produces. Seeded raw ScalaCheck
  * generators (the scalatest bridge artifact is not in the offline cache).
  */
class SessionMergeSpec extends AnyFunSuite {

  private val Gap = 100L

  /** Reference: sort all points, split where gap > Gap (q26 semantics). */
  private def batchSessions(points: Seq[Long]): List[(Long, Long, Long)] = {
    if (points.isEmpty) return Nil
    val sorted = points.sorted
    val out = scala.collection.mutable.ListBuffer.empty[(Long, Long, Long)]
    var (s, e, n) = (sorted.head, sorted.head, 1L)
    sorted.tail.foreach { p =>
      if (p - e <= Gap) { e = p; n += 1 }
      else { out += ((s, e, n)); s = p; e = p; n = 1L }
    }
    (out += ((s, e, n))).toList
  }

  private val genCase: Gen[(List[Long], List[List[Long]])] = for {
    events <- Gen.listOf(Gen.chooseNum(0L, 3000L))
    marks <- Gen.listOfN(events.length, Gen.chooseNum(0, 3))
  } yield {
    val chunks = scala.collection.mutable.ListBuffer(
      scala.collection.mutable.ListBuffer.empty[Long])
    events.zip(marks).foreach { case (e, m) =>
      if (m == 0 && chunks.last.nonEmpty)
        chunks += scala.collection.mutable.ListBuffer.empty[Long]
      chunks.last += e
    }
    (events, chunks.map(_.toList).toList.filter(_.nonEmpty))
  }

  test("incremental merge over any batch split == single-shot batch sessionization") {
    (1 to 300).foreach { i =>
      val (events, chunks) = genCase(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(sys.error("gen failed"))
      val incremental = chunks.foldLeft(List.empty[(Long, Long, Long)]) {
        (state, chunk) => StreamingSessionize.mergeSessions(state, chunk, Gap)
      }
      assert(incremental == batchSessions(events),
        s"seed $i: events=$events chunks=$chunks → $incremental")
    }
  }

  test("merge is idempotent on empty input") {
    val st = List((0L, 10L, 2L), (500L, 600L, 3L))
    assert(StreamingSessionize.mergeSessions(st, Nil, Gap) == st)
  }
}
