package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestSession

class MultiCountSpec extends AnyFunSuite with SparkTestSession {
  import spark.implicits._

  test("multi_substring_count counts overlapping occurrences per pattern") {
    val df = Seq("aaa bab the theater", "").toDF("t")
    val got = df.select(MultiCountFunctions.multi_substring_count(
        $"t", Seq("aa", "the", "zzz")).as("c"))
      .as[Seq[Int]].collect().toSeq
    assert(got == Seq(Seq(2, 2, 0), Seq(0, 0, 0)))   // "aaa" has 2 overlapping "aa"
  }

  test("marker_group_argmax returns best group, -1 when nothing matches") {
    val df = Seq("le chat est dans la maison", "der hund ist gut", "xyzzy").toDF("t")
    val idx = df.select(MultiCountFunctions.marker_group_argmax(
        concat(lit(" "), $"t", lit(" ")),
        Seq(" the ", " is ", " le ", " la ", " dans ", " der ", " ist "),
        Seq(2, 3, 2)).as("i"))
      .as[Int].collect().toSeq
    assert(idx == Seq(1, 2, -1))
  }

  test("langId picks the marker language; und on no match") {
    val df = Seq(
      "the cat is on the mat and the dog is here",
      "el gato que está en la casa y los perros",
      "le chat est dans la maison une fois",
      "der hund und die katze ist schön",
      "我是的了在",
      "qqqq wwww").toDF("t")
    val got = df.select(TextFunctions.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "es", "fr", "de", "zh", "und"))
  }
}
