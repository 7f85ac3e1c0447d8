package graft.core

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based equivalence of the sessionization rewrites: on ARBITRARY
  * event timelines — random users, timestamps clustered tightly enough
  * that gaps land on both sides of the threshold, ties included — the
  * chunked (q124) and hybrid (q125) forms must reproduce the plain
  * per-user form (q29) row for row. The fixed SkewSpec scenario proves
  * the hot-user story; these properties sweep the boundary space the
  * scenario can't enumerate (events exactly gapSec apart, sessions
  * straddling chunk edges, chunk sizes smaller than the gap, single-event
  * users, duplicate timestamps with distinct event_ids). */
object SessionProperties extends Properties("Sessionize") {

  private def spark = graft.SparkSpec.session

  private val gapSec = 100L

  // timestamps drawn from a small window around an hour boundary so
  // chunk edges, sub-gap steps and super-gap jumps all occur; seconds
  // scale keeps the q29 truncation semantics in play
  private val genEvent: Gen[(Long, Long, Long, Double)] = for {
    user <- Gen.choose(1L, 4L)
    sec <- Gen.choose(3400L, 4000L)
    id <- Gen.choose(0L, 500L)
    v <- Gen.choose(0, 100).map(_ / 10.0)
  } yield (user, sec, id, v)

  private val genBatch: Gen[List[(Long, Long, Long, Double)]] =
    Gen.choose(1, 40).flatMap(n => Gen.listOfN(n, genEvent))

  // distinct (user, sec, id) keys: duplicate event_ids at the same ts
  // would make the plain form's lag() order ambiguous between runs
  private def frame(rows: List[(Long, Long, Long, Double)]) = {
    val s = spark
    import s.implicits._
    rows.distinctBy(r => (r._1, r._2, r._3))
      .map { case (u, sec, id, v) =>
        (u, new java.sql.Timestamp(sec * 1000L), id, v) }
      .toDF("user_id", "ts", "event_id", "value")
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  property("chunked == plain for arbitrary timelines and chunk sizes") =
    forAll(genBatch, Gen.oneOf(60L, 100L, 128L, 3600L)) { (batch, chunkSec) =>
      val events = frame(batch)
      rows(Skew.chunkedSessionize(events, gapSec, chunkSec)) ==
        rows(Skew.sessionize(events, gapSec))
    }

  property("hybrid == plain at thresholds that split, take-all, and " +
      "take-none") =
    forAll(genBatch, Gen.oneOf(0L, 3L, 1000L)) { (batch, hotThreshold) =>
      val events = frame(batch)
      rows(Skew.hybridChunkedSessionize(events, gapSec, 128L, hotThreshold)) ==
        rows(Skew.sessionize(events, gapSec))
    }
}
