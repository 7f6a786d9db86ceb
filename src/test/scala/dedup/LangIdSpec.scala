package dedup

import org.scalatest.funsuite.AnyFunSuite

/** Cavnar–Trenkle rank-profile langid: train/test on a deterministic
  * labeled corpus (the synthetic page tables carry no real text↔lang
  * correlation — lang is a url-hash label — so the classifier gets its
  * own corpus with genuine per-language character statistics).
  */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark

  // per-language generator vocab: common function words (public lists) +
  // shared "topic" fillers that appear in every language — the classifier
  // must key on the language-specific character statistics, not on
  // disjoint vocabularies alone
  private val vocab: Map[String, Array[String]] = Map(
    "en" -> Array("the", "a", "of", "and", "to", "in", "is", "it", "that", "for",
      "with", "was", "on", "are", "this", "which", "not", "have"),
    "de" -> Array("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit",
      "von", "den", "auch", "sich", "auf", "werden", "eine", "dass", "nach"),
    "fr" -> Array("le", "la", "les", "et", "est", "un", "une", "de", "que", "pour",
      "dans", "qui", "pas", "sur", "plus", "avec", "sont", "cette"),
    "es" -> Array("el", "la", "los", "y", "es", "un", "una", "de", "que", "por",
      "del", "se", "las", "como", "para", "con", "su", "pero"))
  private val shared = Array("data", "table", "spark", "query", "column")

  private def mkDoc(lang: String, i: Int): String = {
    val words = vocab(lang)
    val rnd = new scala.util.Random(lang.hashCode * 31 + i)
    (0 until 60).map { _ =>
      if (rnd.nextInt(5) == 0) shared(rnd.nextInt(shared.length))
      else words(rnd.nextInt(words.length))
    }.mkString(" ")
  }

  private def corpus(from: Int, until: Int) = {
    import spark.implicits._
    vocab.keys.toSeq.sorted.flatMap { lang =>
      (from until until).map(i => (lang, mkDoc(lang, i)))
    }.toDF("lang", "text")
  }

  test("fit/predict: >=0.95 held-out accuracy on 4 languages") {
    val model = LangId.fit(corpus(0, 40))
    assert(model.langs.toSeq == Seq("de", "en", "es", "fr"))
    assert(model.profiles.forall(_.size == model.profileSize) ||
      model.profiles.forall(_.nonEmpty))
    val test = corpus(40, 60)
    val pred = LangId.predict(test, model).collect()
    val acc = pred.count(r => r.getAs[String]("pred_lang") == r.getAs[String]("lang"))
      .toDouble / pred.length
    info(s"held-out accuracy: $acc over ${pred.length} docs")
    assert(acc >= 0.95, s"accuracy $acc below gate")
  }

  test("fit is deterministic at any partitioning") {
    val a = LangId.fit(corpus(0, 20).repartition(1))
    val b = LangId.fit(corpus(0, 20).repartition(7))
    assert(a.langs.sameElements(b.langs))
    (a.profiles, b.profiles).zipped.foreach((pa, pb) => assert(pa == pb))
  }

  test("empty/null text predicts und; prediction is deterministic") {
    import spark.implicits._
    val model = LangId.fit(corpus(0, 10))
    val out = LangId.predict(Seq(("x", ""), ("y", null)).toDF("id", "text"), model)
      .select("pred_lang").collect().map(_.getString(0))
    assert(out.forall(_ == "und"))
  }

  test("Pipeline --infer-lang fills null langs from text; labels untouched; " +
      "--by-lang then splits on the filled column (no __null__ bucket)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val root = java.nio.file.Files.createTempDirectory("inferlang").toString
    // labeled rows fit the model; every 3rd row loses its label
    val rows = vocab.keys.toSeq.sorted.flatMap { lang =>
      (0 until 30).map { i =>
        val labeled = i % 3 != 0
        (s"https://$lang.example.com/$i", mkDoc(lang, i),
          if (labeled) lang else null, lang)
      }
    }
    val pages = rows.toDF("url", "text", "lang", "true_lang")
      .withColumn("warc_ts", lit(null).cast("timestamp"))
      .withColumn("html", lit(null).cast("binary"))
    pages.select("url", "warc_ts", "html", "text", "lang")
      .write.mode("overwrite").parquet(s"$root/pages")
    val args = Pipeline.Args(
      input = s"$root/pages", output = s"$root/out",
      inferLang = true, byLang = true,
      cfg = DedupConfig(numPerm = 64, saltBuckets = 4))
    val (kept, assigns) = Pipeline.run(spark, args)
    assert(assigns.count() === rows.length.toLong)
    // no __null__ bucket: every null lang got a prediction
    assert(!new java.io.File(s"$root/out/lang=__null__").exists())
    val keptRows = kept.select("url", "lang").as[(String, String)].collect()
    assert(keptRows.forall(_._2 != null))
    val truth = rows.map(r => r._1 -> r._4).toMap
    val acc = keptRows.count { case (u, l) => l == truth(u) }.toDouble / keptRows.length
    info(s"filled-lang accuracy vs generator truth: $acc over ${keptRows.length}")
    assert(acc >= 0.95, s"inferred lang accuracy $acc below gate")
  }

  test("tokenGrams pads word boundaries per C&T (\"_th\", \"the\", \"he_\")") {
    val g = LangId.tokenGrams("the", 3).toSet
    assert(Set("_th", "the", "he_", "_t", "th", "he", "e_", "t", "h", "e").subsetOf(g))
    assert(!g.contains("_"))
  }
}
