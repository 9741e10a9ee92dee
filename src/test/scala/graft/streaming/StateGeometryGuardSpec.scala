package graft.streaming

import java.nio.file.{Files, Paths}
import java.util.concurrent.CyclicBarrier
import org.scalatest.funsuite.AnyFunSuite

/** Concurrency contract of [[StateGeometryGuard.bind]] (ADVICE r9): the
  * first-bind publish must be CREATE_NEW, not rename — on POSIX,
  * `rename(2)` silently replaces an existing target, so two concurrent
  * first binds with DIFFERENT families could both "succeed" with
  * last-writer-wins and no error. The invariant under any interleaving:
  * a bind that returns normally bound EXACTLY the family that ends up
  * in the marker; every other binder throws the mismatch error.
  */
class StateGeometryGuardSpec extends AnyFunSuite {

  test("concurrent first binds with different families: exactly one wins, " +
      "every loser throws, the marker matches the winner") {
    // nondeterministic coverage, deterministic assertions: whatever the
    // interleaving, no thread may succeed with a family that is not the
    // final marker content (the silent last-writer-wins failure mode)
    for (round <- 1 to 20) {
      val ckpt = Files.createTempDirectory(s"geom_race_$round").toString
      val n = 8
      val barrier = new CyclicBarrier(n)
      val outcomes = new Array[Either[Throwable, Int]](n)
      val threads = (0 until n).map { i =>
        val t = new Thread(() => {
          barrier.await()
          outcomes(i) =
            try { StateGeometryGuard.bind(ckpt,
              StateGeometryGuard.bloom(1024 + i, 3)); Right(i) }
            catch { case e: IllegalStateException => Left(e) }
        })
        t.start(); t
      }
      threads.foreach(_.join(30000))
      val marker = new String(Files.readAllBytes(
        Paths.get(ckpt, "_graft_state_geometry.json")), "UTF-8")
      val winners = outcomes.collect { case Right(i) => i }
      assert(winners.length == 1, s"round $round: ${winners.length} binders " +
        s"succeeded with DIFFERENT families (marker: $marker)")
      assert(marker == StateGeometryGuard.bloom(1024 + winners.head, 3).render,
        s"round $round: winner ${winners.head} but marker $marker")
      outcomes.collect { case Left(e) => e }.foreach(e =>
        assert(e.getMessage.contains("state-geometry mismatch"), e.getMessage))
      // no staging litter: the unique tmp files are always cleaned up
      val leftover = Files.list(Paths.get(ckpt)).toArray.map(_.toString)
        .filter(_.contains(".tmp"))
      assert(leftover.isEmpty, s"round $round: $leftover")
    }
  }

  test("concurrent first binds with the SAME family all succeed") {
    val ckpt = Files.createTempDirectory("geom_race_same").toString
    val n = 8
    val barrier = new CyclicBarrier(n)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (0 until n).map { i =>
      val t = new Thread(() => {
        barrier.await()
        try StateGeometryGuard.bind(ckpt, StateGeometryGuard.chunks(4))
        catch { case e: Throwable => failures.add(e) }
      })
      t.start(); t
    }
    threads.foreach(_.join(30000))
    assert(failures.isEmpty, failures.toString)
  }
}
