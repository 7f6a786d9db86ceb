package dedup

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

class SamplingSpec extends AnyFunSuite {
  lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  test("capPerKey keeps the n smallest ids per key (window-oracle equality)") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (s"k${rnd.nextInt(9)}", i))
    val df = rows.toDF("key", "id")
    val got = Sampling.capPerKey(df, col("key"), col("id"), 5)
      .as[(String, Long)].collect().toSet
    val expect = rows.groupBy(_._1).toSeq.flatMap { case (k, g) =>
      g.map(_._2).sorted.take(5).map(k -> _)
    }.toSet
    assert(got === expect)
  }

  test("hot key: partial aggregation bounds what one task emits") {
    // one key carries 10k rows across many partitions; the plan must show
    // a partial aggregate (map-side combine) so no task ships 10k rows
    val df = (1L to 10000L).map(i => ("hot", i)).toDF("key", "id").repartition(16)
    val capped = Sampling.capPerKey(df, col("key"), col("id"), 3)
    val plan = capped.queryExecution.executedPlan.toString
    assert(plan.contains("partial_minnagg") || plan.toLowerCase.contains("partial"),
      s"no partial aggregate in plan:\n$plan")
    assert(capped.as[(String, Long)].collect().toSet ===
      Set(("hot", 1L), ("hot", 2L), ("hot", 3L)))
  }

  test("cap larger than group keeps everything; null keys dropped") {
    val df = Seq(("a", 1L), ("a", 2L), (null, 3L)).toDF("key", "id")
    val got = Sampling.capPerKey(df, col("key"), col("id"), 10)
      .as[(String, Long)].collect().toSet
    assert(got === Set(("a", 1L), ("a", 2L)))
  }

  test("partition-layout invariance") {
    val rows = (1L to 300L).map(i => (s"d${i % 7}", i))
    val a = Sampling.capPerKey(rows.toDF("key", "id").repartition(1),
      col("key"), col("id"), 4).as[(String, Long)].collect().toSet
    val b = Sampling.capPerKey(rows.toDF("key", "id").repartition(17),
      col("key"), col("id"), 4).as[(String, Long)].collect().toSet
    assert(a === b)
  }

  test("domainCap: at most N pages per registrable domain, payload intact") {
    val pages = (1L to 120L).map { i =>
      (i, s"https://sub$i.site${i % 3}.org/p/$i", s"text $i")
    }.toDF("id", "url", "text")
    val kept = Sampling.domainCap(pages, "url", "id", 10)
    assert(kept.columns.toSeq === Seq("id", "url", "text"))
    val byDomain = kept.select(UrlOps.domain(col("url")).as("d"), col("id"))
      .as[(String, Long)].collect().groupBy(_._1)
    assert(byDomain.keySet === Set("site0.org", "site1.org", "site2.org"))
    byDomain.foreach { case (d, g) =>
      assert(g.length === 10, s"domain $d kept ${g.length}")
      // min-id rule: the kept ids are the 10 smallest of the domain
      val all = (1L to 120L).filter(i => i % 3 == d.stripPrefix("site").stripSuffix(".org").toLong)
      assert(g.map(_._2).sorted.toSeq === all.sorted.take(10))
    }
  }

  test("latestPerKey: window-oracle equality, payload intact, partial agg") {
    val rnd = new scala.util.Random(3)
    val rows = (1L to 400L).map(i => (s"u${rnd.nextInt(30)}", i, s"pay$i"))
    val df = rows.toDF("url", "ts", "payload").repartition(13)
    val got = Sampling.latestPerKey(df, col("url"), col("ts"))
    assert(got.columns.toSeq === Seq("url", "ts", "payload"))
    val gotSet = got.as[(String, Long, String)].collect().toSet
    val expect = rows.groupBy(_._1).values.map(_.maxBy(_._2)).toSet
    assert(gotSet === expect)
    // hot key: map-side partial aggregation, no window in the plan
    val hot = (1L to 5000L).map(i => ("hot", i, "p")).toDF("url", "ts", "payload")
      .repartition(16)
    val plan = Sampling.latestPerKey(hot, col("url"), col("ts"))
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("partial") && !plan.contains("Window"),
      s"latestPerKey must partial-aggregate, not window:\n$plan")
  }

  test("hashUnit matches an independent MD5 computation, in [0, 2^32)") {
    val keys = Seq("hello", "a", "", "https://x/1")
    val got = keys.toDF("k").select(Sampling.hashUnit(col("k"))).as[Long].collect()
    val expect = keys.map { k =>
      val d = java.security.MessageDigest.getInstance("MD5").digest(k.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    assert(got.toSeq === expect)
    assert(got.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("hashSample: deterministic, monotone-nested, ~rate fraction kept") {
    val df = (1L to 2000L).map(i => s"key$i").toDF("k")
    def kept(r: Double) = Sampling.hashSample(df, col("k"), lit(r))
      .as[String].collect().toSet
    val k3 = kept(0.3)
    val k6 = kept(0.6)
    assert(k3.subsetOf(k6), "downsampling must nest")
    assert(kept(0.3) === k3, "rerun must keep identical rows")
    assert(math.abs(k3.size / 2000.0 - 0.3) < 0.04)
    assert(math.abs(k6.size / 2000.0 - 0.6) < 0.04)
    assert(kept(1.0).size === 2000 && kept(0.0).isEmpty)
    // null key or null rate -> dropped
    val withNull = Seq(("a", java.lang.Double.valueOf(1.0)),
      (null, java.lang.Double.valueOf(1.0)), ("b", null.asInstanceOf[java.lang.Double]))
      .toDF("k", "r")
    assert(Sampling.hashSample(withNull, col("k"), col("r")).count() === 1L)
  }

  test("temperatureRates: alpha=1 uniform; alpha<1 boosts rare keys; total on target") {
    val counts = Map("big" -> 100000L, "mid" -> 10000L, "rare" -> 1000L)
    val uni = Sampling.temperatureRates(counts, 1.0, 0.5)
    assert(uni.values.forall(r => math.abs(r - 0.5) < 1e-9))
    val t = Sampling.temperatureRates(counts, 0.3, 0.5)
    val expectedKept = counts.map { case (k, n) => t(k) * n }.sum
    assert(math.abs(expectedKept - 0.5 * counts.values.sum) < 1.0)
    // water-filling can saturate several rare keys at 1.0 — monotone, not strict
    assert(t("rare") >= t("mid") && t("mid") >= t("big") && t("rare") > t("big"),
      s"rates not rarity-monotone: $t")
    assert(t.values.forall(r => r >= 0 && r <= 1))
    // infeasible-saturation edge: target 1.0 -> every rate 1.0
    val all = Sampling.temperatureRates(counts, 0.3, 1.0)
    assert(all.values.forall(r => math.abs(r - 1.0) < 1e-9))
  }

  test("temperature sampling end-to-end: per-key kept counts track the rates") {
    val rows = (1L to 6000L).map { i =>
      val k = if (i <= 4000) "big" else if (i <= 5500) "mid" else "rare"
      (k, s"url$i")
    }
    val df = rows.toDF("lang", "url")
    val counts = rows.groupBy(_._1).map { case (k, g) => k -> g.size.toLong }
    val rates = Sampling.temperatureRates(counts, 0.5, 0.5)
    val kept = Sampling.hashSample(df, col("url"),
        element_at(typedLit(rates), col("lang")))
      .groupBy(col("lang")).count().as[(String, Long)].collect().toMap
    counts.foreach { case (k, n) =>
      val expect = rates(k) * n
      assert(math.abs(kept.getOrElse(k, 0L) - expect) < 4 * math.sqrt(expect) + 3,
        s"$k kept ${kept.get(k)} vs expected $expect (rate ${rates(k)})")
    }
  }

  test("mixtureRatesPpm: budget split by weights, water-fill saturation, exact integer replay") {
    // no saturation: rates land the budget exactly on the weight split
    val tokens = Map("a" -> 100000L, "b" -> 50000L, "c" -> 200000L)
    val weights = Map("a" -> 500000L, "b" -> 250000L, "c" -> 250000L)
    val r = Sampling.mixtureRatesPpm(tokens, weights, 100000L)
    // expected tokens from source s = T_s · r_s / 1e6 ≈ B · w_s / ΣW
    for ((s, w) <- weights) {
      val got = tokens(s) * r(s) / 1000000.0
      val want = 100000.0 * w / weights.values.sum
      assert(math.abs(got - want) < want * 0.001 + 1, s"$s got $got want $want")
    }
    // exact replay of the canonical division (the SQL-parity contract)
    assert(r("a") ===
      (BigInt(100000) * 500000 * 1000000 / (BigInt(1000000) * 100000)).toLong)
    // saturation: source b cannot supply its share -> rate 1e6, excess
    // redistributes to a and c by renormalized weights
    val tok2 = Map("a" -> 100000L, "b" -> 1000L, "c" -> 100000L)
    val r2 = Sampling.mixtureRatesPpm(tok2, weights, 100000L)
    assert(r2("b") === 1000000L, "starved source keeps everything")
    val keptA = tok2("a") * r2("a") / 1000000.0
    val keptC = tok2("c") * r2("c") / 1000000.0
    // leftover budget 99k splits 2:1 between a and c (weights 500k:250k)
    assert(math.abs(keptA - 66000.0) < 200, s"a kept $keptA")
    assert(math.abs(keptC - 33000.0) < 200, s"c kept $keptC")
    // degenerate: zero budget, empty source, weight-0 source
    val r3 = Sampling.mixtureRatesPpm(tok2, weights, 0L)
    assert(r3.values.forall(_ === 0L))
    val r4 = Sampling.mixtureRatesPpm(
      Map("a" -> 0L, "b" -> 10L), Map("a" -> 1L, "b" -> 1L), 5L)
    assert(r4("a") === 1000000L) // vacuous
    assert(r4("b") === 500000L)
    val r5 = Sampling.mixtureRatesPpm(
      Map("a" -> 10L, "b" -> 10L), Map("a" -> 0L, "b" -> 1000000L), 10L)
    assert(r5("a") === 0L && r5("b") === 1000000L)
  }

  test("pipeline --mix: token-budget mixture lands the weight split; deterministic; " +
      "unlisted langs drop without a * default") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("pipemix").toString
    val base = Pipeline.parse(Array("--synth", "600", "--output", s"$dir/a"))
    val (kept0, _) = Pipeline.run(spark, base)
    val tokensByLang = kept0
      .withColumn("ntok", size(split(col("text"), "\\s+")))
      .groupBy("lang").agg(sum("ntok").as("t")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val budget = tokensByLang.values.sum / 3
    val langs = tokensByLang.keys.toSeq.sorted
    val (l1, l2) = (langs.head, langs(1))
    // weight l1 twice l2, default covers the rest
    val args = Pipeline.parse(Array("--synth", "600", "--output", s"$dir/b",
      "--mix", s"$l1:400000,$l2:200000,*:100000", "--mix-budget", budget.toString))
    val (kept1, _) = Pipeline.run(spark, args)
    assert(kept1.count() < kept0.count())
    assert(kept1.count() > 0)
    // rerun (resume) keeps the identical row set
    val (kept2, _) = Pipeline.run(spark, args)
    assert(kept2.select("url").collect().map(_.getString(0)).sorted.toSeq
      === kept1.select("url").collect().map(_.getString(0)).sorted.toSeq)
    // without a * default, unlisted langs drop entirely
    val strict = Pipeline.parse(Array("--synth", "600", "--output", s"$dir/c",
      "--mix", s"$l1:400000", "--mix-budget", budget.toString))
    val (kept3, _) = Pipeline.run(spark, strict)
    assert(kept3.select("lang").distinct().collect().map(_.getString(0)).toSet
      === Set(l1))
    // flags must go together
    intercept[IllegalArgumentException] {
      Pipeline.parse(Array("--synth", "10", "--output", s"$dir/d", "--mix", "en:1"))
    }
    // --sample-target AND --mix together: the salted mix key makes the
    // two Bernoulli draws independent, so the kept tokens land on the
    // budget (on the shared md5(url) key, mix would keep min(1, p/r) of
    // the sampled rows and overshoot)
    val both = Pipeline.parse(Array("--synth", "600", "--output", s"$dir/e",
      "--sample-alpha", "1.0", "--sample-target", "0.5",
      "--mix", "*:1", "--mix-budget", (budget / 4).toString))
    val (kept4, _) = Pipeline.run(spark, both)
    val gotTokens = kept4
      .withColumn("ntok", size(split(col("text"), "\\s+")))
      .agg(sum(col("ntok"))).collect()(0).getLong(0)
    val want = budget / 4.0
    assert(math.abs(gotTokens - want) < want * 0.35,
      s"combined sample+mix kept $gotTokens tokens, budget ${want.toLong}")
  }

  test("pipeline --mix: null-url rows draw from a never-null key (not silently dropped)") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("pipemixnull").toString
    // 30 pages with distinct non-dup texts; ONE has a null url (the
    // ADVICE hazard: concat(url, '#mix') is null for it, so the old keep
    // predicate dropped it at ANY rate while the token counts — the rate
    // inputs — still included it)
    val pages = (0 until 30).map { i =>
      Page(
        url = if (i == 7) null else s"https://mixnull/$i",
        warc_ts = new java.sql.Timestamp(1700000000000L + i),
        html = null,
        text = (0 until 40).map(k => s"mixnull${i}w${k * i + k}").mkString(" "),
        lang = "en")
    }
    import spark.implicits._
    pages.toDF().write.mode("overwrite").parquet(s"$dir/pages")
    // rate 1 for every source (budget >= total tokens): EVERY row must
    // survive the mix stage, null-url row included
    val args = Pipeline.parse(Array("--input", s"$dir/pages",
      "--output", s"$dir/out", "--mix", "*:1", "--mix-budget", "99999999"))
    val (kept, _) = Pipeline.run(spark, args)
    assert(kept.count() === 30L)
    assert(kept.where(col("url").isNull).count() === 1L,
      "null-url row silently dropped by the mix keep-predicate")
  }

  test("pipeline --sample-target: deterministic rebalance of the kept corpus") {
    val dir = java.nio.file.Files.createTempDirectory("pipesample").toString
    val base = Pipeline.parse(Array("--synth", "400", "--output", s"$dir/a"))
    val (kept0, _) = Pipeline.run(spark, base)
    val n0 = kept0.count()
    val args = Pipeline.parse(Array("--synth", "400", "--output", s"$dir/b",
      "--sample-alpha", "0.5", "--sample-target", "0.5"))
    val (kept1, _) = Pipeline.run(spark, args)
    val n1 = kept1.count()
    assert(n1 < n0 && n1 > n0 / 4, s"sampled $n1 of $n0")
    // deterministic: a rerun (resume) returns the identical row set
    val (kept2, _) = Pipeline.run(spark, args)
    assert(kept2.select("url").as[String].collect().sorted.toSeq ===
      kept1.select("url").as[String].collect().sorted.toSeq)
  }

  test("topWords: global top-k by (count desc, word asc)") {
    val df = Seq(
      "a a a b b c", "b c d", "a  b", "").toDF("text")
    val got = TextAnalysis.topWords(df, "text", 3)
      .as[(String, Long)].collect().toSeq
    assert(got === Seq(("a", 4L), ("b", 4L), ("c", 2L)))
    val plan = TextAnalysis.topWords(df, "text", 3).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"top-k must not global-sort:\n$plan")
  }
}
