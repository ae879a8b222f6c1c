package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class AsOfJoinSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  private def trades = Seq(
    ("A", 10L, 100.0), ("A", 20L, 101.0), ("A", 25L, 102.0),
    ("B", 15L, 50.0), ("C", 5L, 9.0)
  ).toDF("sym", "t", "px")

  private def quotes = Seq(
    ("A", 5L, 1.0), ("A", 20L, 2.0), ("A", 22L, 3.0),
    ("B", 30L, 4.0)
  ).toDF("sym", "qt", "bid")

  test("backward as-of picks latest quote at-or-before, exact ties match") {
    val res = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "qt")
      .orderBy($"sym", $"t")
      .select($"sym", $"t", $"bid").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(res.toSeq == Seq(
      ("A", 10L, 1.0), ("A", 20L, 2.0), ("A", 25L, 3.0),
      ("B", 15L, null), ("C", 5L, null)))
  }

  test("forward as-of picks earliest quote at-or-after") {
    val res = AsOfJoin.forward(trades, quotes, Seq("sym"), "t", "qt")
      .orderBy($"sym", $"t")
      .select($"sym", $"t", $"bid").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(res.toSeq == Seq(
      ("A", 10L, 2.0), ("A", 20L, 2.0), ("A", 25L, null),
      ("B", 15L, 4.0), ("C", 5L, null)))
  }

  test("tolerance nulls out matches that are too far") {
    val res = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "qt",
        tolerance = Some(3L))
      .orderBy($"sym", $"t")
      .select($"sym", $"t", $"bid").collect()
      .map(r => (r.getString(0), r.getLong(1), if (r.isNullAt(2)) null else r.getDouble(2)))
    assert(res.toSeq == Seq(
      ("A", 10L, null),   // quote at 5, distance 5 > 3
      ("A", 20L, 2.0),    // exact
      ("A", 25L, 3.0),    // quote at 22, distance 3 ≤ 3
      ("B", 15L, null), ("C", 5L, null)))
  }

  test("all left columns survive; right value columns appended") {
    val res = AsOfJoin.backward(trades, quotes, Seq("sym"), "t", "qt")
    assert(res.columns.toSeq == Seq("sym", "t", "px", "qt", "bid"))
    assert(res.count() == trades.count())
  }

  test("null timestamps never match: null-ts quotes dropped, null-ts trades unmatched") {
    val t = Seq(("A", Some(10L), 100.0), ("A", None, 101.0)).toDF("sym", "t", "px")
    val q = Seq(("A", None: Option[Long], 9.0), ("A", Some(7L), 1.0)).toDF("sym", "qt", "bid")
    val res = AsOfJoin.backward(t, q, Seq("sym"), "t", "qt")
      .orderBy($"t".asc_nulls_last)
      .select($"bid").collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    // trade@10 matches quote@7 (NOT the null-ts quote's 9.0);
    // the null-ts trade matches nothing
    assert(res.toSeq == Seq(1.0, null))
  }

  test("NULL join keys never match (the DuckDB ASOF / merge_asof rule)") {
    // Window.partitionBy groups NULL keys together — without the
    // null-key right filter a null-key left row picked up a null-key
    // right row (r16 review finding)
    val left = Seq((Option.empty[Long], 5L, "l1"), (Option(1L), 5L, "l2"))
      .toDF("k", "ts", "lv")
    val right = Seq((Option.empty[Long], 3L, "r0"), (Option(1L), 3L, "r1"))
      .toDF("k", "rts", "rv")
    val got = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts")
      .select($"lv", $"rv").as[(String, Option[String])].collect().toMap
    assert(got("l1").isEmpty, "a NULL-key left row must emit with no match")
    assert(got("l2").contains("r1"), "real keys still match")
  }

  test("mixed timestamp types refuse loudly UNDER TOLERANCE only") {
    // DateType left + TimestampType right union-coerce to timestamp,
    // and the tolerance long-conversion derived from the LEFT type
    // would fall to cast("long") SECONDS on both sides — a silently
    // wrong unit (r16 ADVICE). Refuse instead of guessing — but ONLY
    // when a tolerance is given: without one there is no unit to get
    // wrong and the coerced join is sound (pre-guard behavior kept).
    val left = Seq((1L, java.sql.Date.valueOf("2024-01-02"), "l"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "r"))
      .toDF("k", "rts", "rv")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.backward(left, right, Seq("k"), "ts", "rts",
        tolerance = Some(1000000L))
    }
    assert(e.getMessage.contains("timestamp types must match"))
    // tolerance-less: coerces and matches (quote is before the date)
    val ok = AsOfJoin.backward(left, right, Seq("k"), "ts", "rts")
      .select($"rv").as[Option[String]].collect().toSeq
    assert(ok == Seq(Some("r")))
  }

  test("tied right rows at one (key, ts) resolve deterministically (largest payload backward)") {
    // r18 review: the window tie-broke only on (_ts, _side), so the
    // matched payload depended on shuffle order; struct order over
    // _rpay pins it — backward takes the largest tied payload
    val dupQuotes = Seq(("A", 20L, 1.0), ("A", 20L, 2.0), ("A", 20L, 3.0))
      .toDF("sym", "qt", "bid").repartition(8)
    val res = (1 to 5).map { _ =>
      AsOfJoin.backward(Seq(("A", 25L)).toDF("sym", "t"), dupQuotes,
          Seq("sym"), "t", "qt")
        .select($"bid").as[Double].head()
    }
    assert(res.toSet == Set(3.0), s"nondeterministic tie payloads: $res")
    // forward takes the smallest tied payload
    val fwd = AsOfJoin.forward(Seq(("A", 15L)).toDF("sym", "t"), dupQuotes,
        Seq("sym"), "t", "qt")
      .select($"bid").as[Double].head()
    assert(fwd == 1.0)
  }

  test("a MapType payload column joins (tie-break skips unorderable fields)") {
    // r18 ADVICE: ordering by the whole _rpay struct made every right
    // value column an ordering key, so a MapType payload — legal in
    // the join itself — failed analysis. Orderable fields still
    // tie-break deterministically; the map rides through as payload.
    val right = Seq(("A", 20L, 2.0, Map("k" -> 1)), ("A", 5L, 1.0, Map("j" -> 2)))
      .toDF("sym", "qt", "bid", "meta")
    val res = AsOfJoin.backward(Seq(("A", 25L)).toDF("sym", "t"), right,
        Seq("sym"), "t", "qt")
      .select($"bid", $"meta").collect()
    assert(res.length == 1 && res(0).getDouble(0) == 2.0)
    assert(res(0).getMap[String, Int](1) == Map("k" -> 1))
    // ties still deterministic on the orderable fields beside the map
    val tied = Seq(("A", 20L, 1.0, Map("a" -> 1)), ("A", 20L, 2.0, Map("b" -> 2)))
      .toDF("sym", "qt", "bid", "meta").repartition(8)
    val picks = (1 to 5).map { _ =>
      AsOfJoin.backward(Seq(("A", 25L)).toDF("sym", "t"), tied,
          Seq("sym"), "t", "qt")
        .select($"bid").as[Double].head()
    }
    assert(picks.toSet == Set(2.0), s"nondeterministic: $picks")
  }

  test("keyless GLOBAL as-of join works (empty keys)") {
    val res = AsOfJoin.backward(Seq(Tuple1(25L)).toDF("t"),
        Seq((20L, 2.0), (5L, 1.0)).toDF("qt", "bid"), Seq.empty, "t", "qt")
      .select($"bid").as[Double].head()
    assert(res == 2.0)
  }

  test("DateType tolerance measures in days instead of crashing analysis") {
    val l = Seq(Tuple1("2024-03-10")).toDF("d").select(to_date($"d").as("ld"))
    val r = Seq(("2024-03-01", 1.0), ("2024-03-08", 2.0)).toDF("d", "v")
      .select(to_date($"d").as("rd"), $"v")
    val within = AsOfJoin.backward(l, r, Seq.empty, "ld", "rd", tolerance = Some(3L))
      .select($"v").as[Double].head()
    assert(within == 2.0, "2024-03-08 is 2 days back — inside tolerance 3")
    val out = AsOfJoin.backward(l, r, Seq.empty, "ld", "rd", tolerance = Some(1L))
      .select(when($"v".isNull, -1.0).otherwise($"v")).as[Double].head()
    assert(out == -1.0, "2 days back is outside tolerance 1")
  }

  test("salted inner join equals plain inner join") {
    val left = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong, s"v$i"))
      .toDF("k", "lv")   // heavy skew on k=1
    val right = Seq((1L, "r1"), (2L, "r2"), (950L, "r950")).toDF("k", "rv")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(canon(SkewJoin.saltedInner(left, right, Seq("k"), saltFactor = 8)) ==
      canon(left.join(right, Seq("k"))))
  }
}
