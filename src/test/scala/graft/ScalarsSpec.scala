package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Scalars

/** Differential properties for the scalar library: Spark column
  * expressions vs straightforward JVM models, over a ScalaCheck-
  * generated (fixed-seed, deterministic) batch of adversarial strings
  * evaluated in ONE Spark job per suite — forAll-per-row would spin a
  * job per case.
  *
  * Generator stays in the BMP and avoids locale-sensitive case chars
  * (Turkish İ etc.): the reference's semantics are Python-on-BMP; the
  * models here document the engine contract, not java.lang quirks.
  */
class ScalarsSpec extends SparkSpecBase {

  private val charPool: Seq[Char] =
    ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      "/.;,!?-_ \t\n".toSeq ++
      "ءابتثجحخدذرزسشصضطظعغفقكلمنهويى".toSeq ++
      Scalars.ArabicDiacritics.toSeq ++
      "的是了在我一二三".toSeq

  private val genString: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    cs <- Gen.listOfN(n, Gen.oneOf(charPool))
  } yield cs.mkString

  /** Deterministic sample batch: fixed seed + curated edge cases. */
  private lazy val samples: Seq[String] = {
    val gen = Gen.listOfN(300, genString)
    val random = gen(Gen.Parameters.default, Seed(42L)).getOrElse(Nil)
    val edges = Seq(
      "", " ", "   ", "\t\n", "a", "A/b/C/d/e/f/g/h",
      "/leading/slash", "trailing/slash/", "//double//",
      "x" * 254, "y" * 255, "z" * 256, "w" * 300,
      "سَلامٌ عليكم", Scalars.ArabicDiacritics,
      "﻿bom-prefixed", "mixed سلام text", "ـتطويلـ")
    (edges ++ random).distinct
  }

  private lazy val rows: Map[String, org.apache.spark.sql.Row] = {
    import spark.implicits._
    samples.toDF("s")
      .select(
        col("s"),
        Scalars.truncate254(col("s")).as("t254"),
        Scalars.truncate269(col("s")).as("t269"),
        Scalars.lenGt255(col("s")).as("gt255"),
        Scalars.lenGt270(col("s")).as("gt270"),
        Scalars.lastPathComponents(col("s"), 5).as("last5"),
        Scalars.removeDiac(col("s")).as("nodiac"),
        Scalars.wordNorm(col("s")).as("norm"),
        Scalars.isBlank(col("s")).as("blank"))
      .collect()
      .map(r => r.getString(0) -> r).toMap
  }

  private def diacSet = Scalars.ArabicDiacritics.toSet

  test("truncate254/269 keep exactly the reference's off-by-one prefix") {
    samples.foreach { s =>
      val r = rows(s)
      assert(r.getString(1) === s.substring(0, math.min(254, s.length)), s"t254($s)")
      assert(r.getString(2) === s.substring(0, math.min(269, s.length)), s"t269($s)")
    }
  }

  test("lenGt255/270 flag the PRE-truncation length") {
    samples.foreach { s =>
      val r = rows(s)
      assert(r.getBoolean(3) === (s.length > 255), s"gt255($s)")
      assert(r.getBoolean(4) === (s.length > 270), s"gt270($s)")
    }
  }

  test("lastPathComponents(5) = basename_backwards_x4 model") {
    samples.foreach { s =>
      val model = s.split("/", -1).takeRight(5).mkString("/")
      assert(rows(s).getString(5) === model, s"last5($s)")
    }
  }

  test("removeDiac strips exactly the 8 diacritics, preserving all else") {
    samples.foreach { s =>
      val model = s.filterNot(diacSet)
      assert(rows(s).getString(6) === model, s"nodiac($s)")
    }
  }

  test("wordNorm = lower ∘ trim-spaces") {
    samples.foreach { s =>
      val model = s.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse.toLowerCase
      assert(rows(s).getString(7) === model, s"norm($s)")
    }
  }

  test("isBlank ⇔ empty or ASCII-whitespace-only (the ignore_word_fn contract)") {
    samples.foreach { s =>
      val model = s.isEmpty || s.matches("^\\s+$")
      assert(rows(s).getBoolean(8) === model, s"blank($s)")
    }
  }

  test("unicodeNormalize matches java.text.Normalizer on all four forms") {
    import spark.implicits._
    // ASCII (fast path), precomposed, decomposed, compatibility
    // ligature, Arabic with diacritics, and a combining mark with no
    // base letter (must pass through unchanged)
    val inputs = Seq(
      "plain ascii only",
      "café déjà",
      "café déjà",
      "ﬁle ﬂow ①",
      "مَدرس",
      "́leading mark",
      "")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = inputs.toDF("s")
        .select(Scalars.unicodeNormalize(col("s"), form))
        .collect().map(_.getString(0)).toSeq
      val want = inputs.map(
        java.text.Normalizer.normalize(_, java.text.Normalizer.Form.valueOf(form)))
      assert(got === want, form)
    }
    intercept[IllegalArgumentException] {
      Scalars.unicodeNormalize(col("s"), "NFX")
    }
  }
}
