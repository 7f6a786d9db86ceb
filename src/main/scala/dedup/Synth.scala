package dedup

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §2).
  *
  * Counter-based splitmix64 PRNG keyed by (seed, docIndex, stream): fully
  * reproducible at any parallelism — no global RNG state, no
  * Date.now. Each doc's planted cluster id is carried in its url
  * (`https://synth.test/<cluster>/<i>`), so ground-truth dup pairs need no
  * side table.
  *
  * Classes (by doc index hash): unique 55%, exact-dup 15%, near-dup 20%
  * (token substitution rates {0.5%, 1%, 2%} ⇒ 5-gram shingle Jaccard
  * ≈ {0.95, 0.91, 0.83}, all safely above the 0.7 LSH threshold), substring
  * -dup 7% (shared ≥400-char run inside unique padding), short 3%
  * (< min_length tokens). Plus one hot-key cluster: HotFrac of all docs are
  * byte-identical copies of one template — every LSH band maps them to one
  * bucket, exercising salted repartitioning.
  */
object Synth {

  final val HotFrac = 0.01
  final val HotCluster = -1L

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def rng(seed: Long, i: Long, stream: Long): Long =
    mix(mix(seed ^ mix(i)) ^ stream)

  /** uniform double in [0,1) from a counter */
  private def unif(seed: Long, i: Long, stream: Long): Double =
    (rng(seed, i, stream) >>> 11).toDouble / (1L << 53).toDouble

  private val Vocab: Array[String] = {
    // fixed ~2k-word vocabulary: deterministic 3-7 letter "words"
    val letters = "abcdefghijklmnopqrstuvwxyz"
    Array.tabulate(2000) { w =>
      val len = 3 + (mix(w.toLong) & 0x3L).toInt + ((mix(w.toLong) >>> 8) & 0x1L).toInt
      val sb = new StringBuilder
      var i = 0
      while (i < len) {
        sb.append(letters(((mix(w.toLong * 31 + i) >>> 16) % 26).toInt.abs))
        i += 1
      }
      sb.toString
    }
  }

  /** Base token sequence for a cluster seed. */
  private def baseTokens(seed: Long, cluster: Long, len: Int): Array[String] =
    Array.tabulate(len) { t =>
      Vocab(java.lang.Math.floorMod(rng(seed, cluster, 1000L + t), Vocab.length.toLong).toInt)
    }

  private def docLength(seed: Long, i: Long): Int = {
    // lognormal-ish: median ~200 tokens, clamped [20, 800]
    val u = unif(seed, i, 1L)
    val v = unif(seed, i, 2L)
    val n = math.exp(math.log(200.0) + 0.6 * (u + v - 1.0) * 2.0)
    math.max(20, math.min(800, n.toInt))
  }

  case class SynthDoc(url: String, text: String, cluster: Long, cls: String)

  /** Generate doc i of n deterministically. */
  def doc(seed: Long, i: Long, n: Long): SynthDoc = {
    val hot = unif(seed, i, 0L) < HotFrac
    if (hot) {
      val toks = baseTokens(seed, HotCluster, 150)
      return SynthDoc(s"https://synth.test/hot/$i", toks.mkString(" "), HotCluster, "hot")
    }
    val u = unif(seed, i, 3L)
    // cluster geometry: consecutive blocks of 8 docs can share a base
    val block = (i / 8L) * 8L
    def mutate(toks: Array[String], rate: Double): Array[String] =
      toks.zipWithIndex.map { case (t, idx) =>
        if (unif(seed, i, 4000L + idx) < rate)
          Vocab(java.lang.Math.floorMod(rng(seed, i, 5000L + idx), Vocab.length.toLong).toInt)
        else t
      }
    if (u < 0.55) {
      val toks = baseTokens(seed, i + 1000000000L, docLength(seed, i)) // unique base
      SynthDoc(s"https://synth.test/u$i/$i", toks.mkString(" "), i + 1000000000L, "unique")
    } else if (u < 0.70) {
      val toks = baseTokens(seed, block, docLength(seed, block))
      SynthDoc(s"https://synth.test/c$block/$i", toks.mkString(" "), block, "exact")
    } else if (u < 0.90) {
      // rates chosen so mutant→base 5-gram shingle Jaccard stays >= ~0.9:
      // detection prob at the reference config (b=25, r=10) is then >=
      // 0.9996 per edge. Higher rates would park pairs on the LSH S-curve
      // knee (J~0.7-0.83, detection 0.5-0.985) where ANY MinHash-LSH —
      // the reference included — probabilistically drops them.
      val rate = Array(0.0025, 0.005, 0.01)((mix(i) & 0x7FFFFFFF).toInt % 3)
      val toks = mutate(baseTokens(seed, block, docLength(seed, block)), rate)
      SynthDoc(s"https://synth.test/c$block/$i", toks.mkString(" "), block, "near")
    } else if (u < 0.97) {
      // unique prefix + shared >=400-char run from the block base + unique suffix
      val shared = baseTokens(seed, block, 100) // ~100 tokens ≈ 500+ chars
      val pre = baseTokens(seed, i + 2000000000L, 40)
      val post = baseTokens(seed, i + 3000000000L, 40)
      val text = (pre ++ shared ++ post).mkString(" ")
      SynthDoc(s"https://synth.test/s$block/$i", text, block, "substr")
    } else {
      val toks = baseTokens(seed, i + 4000000000L, 1 + (mix(i) & 3L).toInt)
      SynthDoc(s"https://synth.test/short/$i", toks.mkString(" "), i + 4000000000L, "short")
    }
  }

  /** Distributed generation as Dataset[Page] + planted truth columns. */
  def corpus(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[SynthDoc] = {
    import spark.implicits._
    spark.range(n).map(i => doc(seed, i, n))
  }

  /** As the BASELINE.json input_hint page table. */
  def pages(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    corpus(spark, n, seed).map { d =>
      Page(
        url = d.url,
        warc_ts = new java.sql.Timestamp(1600000000000L + d.url.hashCode.toLong.abs % 100000000L),
        html = ("<html>" + d.text).getBytes(java.nio.charset.StandardCharsets.UTF_8),
        text = d.text,
        lang = Seq("en", "en", "en", "en", "de", "fr", "hi", "en")(d.url.hashCode & 0x7))
    }
  }

  /** Language → script alphabet for the multi-script corpus: 12 languages
    * across 12 DISTINCT Unicode scripts (Latin, Cyrillic, Greek,
    * Devanagari, Arabic, Hebrew, Han, Hiragana, Hangul, Thai, Tamil,
    * Bengali) — every character a LETTER in its script, so the `(?U)\W`
    * tokenizer sees the same token boundaries in every language and the
    * planted dup geometry survives transliteration intact. */
  private[dedup] val ScriptAlphabets: IndexedSeq[(String, String)] = IndexedSeq(
    "en" -> "abcdefghijklmnopqrstuvwxyz",
    "ru" -> "абвгдежзийклмнопрстуфхцчшщ",
    "el" -> "αβγδεζηθικλμνξοπρστυφχψω",
    "hi" -> "कखगघङचछजझञटठडढणतथदधनपफबभम",
    "ar" -> "ابتثجحخدذرزسشصضطظعغفقكلمن",
    "he" -> "אבגדהוזחטיכלמנסעפצקרשת",
    "zh" -> "的一是不了人我在有他这中大来上国个到说们为子和你地出",
    "ja" -> "あいうえおかきくけこさしすせそたちつてとなにぬねのはひ",
    "ko" -> "가나다라마바사아자차카타파하거너더러머버서어저처커터",
    "th" -> "กขคงจฉชซญดตถทนบปผฝพฟมยรลวสหอ",
    "ta" -> "அஆஇஈஉஊஎஏஐஒஓகஙசஞடணதநபமயரலவழ",
    "bn" -> "অআইঈউঊএঐওঔকখগঘঙচছজঝঞটঠডঢণ",
    // round 4: the remaining distinct-script languages of the reference's
    // 23-language Indic benchmark sweep plus Myanmar/Georgian/Ethiopic/
    // Armenian — 23 languages, 23 distinct Unicode scripts, all BMP
    // letters (category Lo/Ll), so (?U)\W tokenization is exercised on
    // every script family the tokenizer will meet in web text.
    "te" -> "కఖగఘఙచఛజఝఞటఠడఢణతథదధనపఫబభమయరలవ",
    "kn" -> "ಕಖಗಘಙಚಛಜಝಞಟಠಡಢಣತಥದಧನಪಫಬಭಮಯರಲವ",
    "ml" -> "കഖഗഘങചഛജഝഞടഠഡഢണതഥദധനപഫബഭമയരലവ",
    "gu" -> "કખગઘઙચછજઝઞટઠડઢણતથદધનપફબભમયરલવ",
    "pa" -> "ਕਖਗਘਙਚਛਜਝਞਟਠਡਢਣਤਥਦਧਨਪਫਬਭਮਯਰਲਵ",
    "or" -> "କଖଗଘଙଚଛଜଝଞଟଠଡଢଣତଥଦଧନପଫବଭମଯରଲଵ",
    "si" -> "කඛගඝඞචඡජඣඤටඨඩඪණතථදධනපඵබභමයරලව",
    "my" -> "ကခဂဃငစဆဇဈဉတထဒဓနပဖဗဘမယရလဝသဟအ",
    "ka" -> "აბგდევზთიკლმნოპჟრსტუფქღყშჩცძწჭხ",
    "am" -> "ሀለሐመሠረሰሸቀበተቸኀነኘአከኸወዐዘዠየደጀገጠጨጰጸፈ",
    "hy" -> "աբգդեզէըթժիլխծկհձղճմյնշոչպջռսվտ")

  /** The reference's multilingual-benchmark counterpart corpus (Indic
    * Languages Benchmark/Readme.md spans 23 languages): the SAME planted
    * dup geometry as [[pages]], transliterated per language into a real
    * non-Latin script. Language is keyed by the planted CLUSTER (not the
    * url hash) so every exact/near/substring dup class is monolingual —
    * a near-dup of a Hindi page is Hindi, and per-language truth stays
    * dense. Transliteration is a per-character map of the a-z vocabulary
    * (two Latin letters may alias in a shorter alphabet — that only
    * shrinks the vocab, identically for every member of a cluster, so
    * within-language Jaccard is preserved). */
  def multiScriptPages(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Page] = {
    import spark.implicits._
    corpus(spark, n, seed).map { d =>
      val li = java.lang.Math.floorMod(mix(d.cluster), ScriptAlphabets.length.toLong).toInt
      val (lang, alpha) = ScriptAlphabets(li)
      val sb = new StringBuilder(d.text.length)
      var i = 0
      while (i < d.text.length) {
        val c = d.text.charAt(i)
        sb.append(if (c >= 'a' && c <= 'z') alpha((c - 'a') % alpha.length) else c)
        i += 1
      }
      val text = sb.toString
      Page(
        url = d.url,
        warc_ts = new java.sql.Timestamp(1600000000000L + d.url.hashCode.toLong.abs % 100000000L),
        html = ("<html>" + text).getBytes(java.nio.charset.StandardCharsets.UTF_8),
        text = text,
        lang = lang)
    }
  }
}
