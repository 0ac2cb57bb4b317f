package graft

import graft.analysis.{Analyzer, Stemmers}
import org.apache.spark.sql.functions._

class AnalysisChainSpec extends SparkSpec {
  import spark.implicits._

  test("porter: the published worked examples (Porter 1980)") {
    // every (input, output) pair below appears verbatim as a worked
    // example in the paper's step-by-step rule listing
    val vectors = Seq(
      // step 1a
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      // step 1b (+ cleanup)
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
      "filing" -> "file",
      // step 1c
      "happy" -> "happi", "sky" -> "sky",
      // step 2
      "relational" -> "relat", "conditional" -> "condit",
      "rational" -> "ration", "valenci" -> "valenc",
      "hesitanci" -> "hesit", "digitizer" -> "digit",
      "conformabli" -> "conform", "radicalli" -> "radic",
      "differentli" -> "differ", "vileli" -> "vile",
      "analogousli" -> "analog", "vietnamization" -> "vietnam",
      "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis",
      "hopefulness" -> "hope", "callousness" -> "callous",
      "formaliti" -> "formal", "sensitiviti" -> "sensit",
      "sensibiliti" -> "sensibl",
      // step 3
      "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electriciti" -> "electr",
      "electrical" -> "electr", "hopeful" -> "hope",
      "goodness" -> "good",
      // step 4
      "revival" -> "reviv", "allowance" -> "allow",
      "inference" -> "infer", "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop", "adjustable" -> "adjust",
      "defensible" -> "defens", "irritant" -> "irrit",
      "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt",
      "homologou" -> "homolog", "communism" -> "commun",
      "activate" -> "activ", "angulariti" -> "angular",
      "homologous" -> "homolog", "effective" -> "effect",
      "bowdlerize" -> "bowdler",
      // step 5
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll")
    val failures = vectors.collect {
      case (in, want) if Stemmers.porter(in) != want =>
        s"$in -> ${Stemmers.porter(in)} (want $want)"
    }
    assert(failures.isEmpty, failures.mkString("; "))
  }

  test("porter: inflection families conflate") {
    assert(Stemmers.porter("running") == "run")
    assert(Stemmers.porter("runs") == "run")
    assert(Stemmers.porter("generalizations") == "gener")
    assert(Stemmers.porter("oscillators") == "oscil")
    assert(Stemmers.porter("as") == "as") // <= 2 chars untouched
  }

  test("minimal_english: plural rules") {
    assert(Stemmers.minimalEnglish("tables") == "table")
    assert(Stemmers.minimalEnglish("queries") == "query")
    assert(Stemmers.minimalEnglish("class") == "class") // -ss kept
    assert(Stemmers.minimalEnglish("corpus") == "corpus") // -us kept
    assert(Stemmers.minimalEnglish("goes") == "goes") // vowel+es kept
    assert(Stemmers.minimalEnglish("as") == "as") // too short
    assert(Stemmers.minimalEnglish("windows") == "window")
    assert(Stemmers.minimalEnglish("ties") == "ty") // -ies -> -y
    assert(Stemmers.minimalEnglish("aies") == "aies") // a/e before -ies kept
  }

  test("chain kernel: stop -> stem -> edge order, eval == codegen") {
    val df = Seq(
      (1L, "the tables are fast"),
      (2L, "a window scans queries")).toDF("id", "text")
    val chained = df.select(col("id"),
      Analyzer.chainText(col("text"),
        stop = Analyzer.EnglishStop, stemmer = "minimal_english").as("toks"))
      .orderBy("id").as[(Long, Seq[String])].collect()
    assert(chained(0)._2 == Seq("table", "fast"))
    assert(chained(1)._2 == Seq("window", "scan", "query"))

    // edge_ngram expansion (2..4), no stop/stem
    val eg = df.where(col("id") === 2)
      .select(Analyzer.chainText(col("text"), edge = Some((2, 4))).as("egs"))
      .as[Seq[String]].collect().head
    assert(eg.contains("wi") && eg.contains("win") && eg.contains("wind"))
    assert(!eg.contains("windo")) // beyond max
    assert(!eg.contains("a")) // below min emits nothing
    assert(eg.count(_ == "sc") == 1)

    // interpreted eval path agrees with codegen (the driver-side
    // analyzeChain is a third independent implementation)
    assert(Analyzer.analyzeChain("the tables are fast",
      Analyzer.EnglishStop, "minimal_english") == Seq("table", "fast"))
  }

  test("light_german / minimal_french / light_spanish rules") {
    import graft.analysis.Stemmers
    // german: both steps fire in order; umlauts fold first
    assert(Stemmers.lightGerman("häusern") == "haus")   // fold + -ern
    assert(Stemmers.lightGerman("vectoren") == "vector") // -en (step1)
    assert(Stemmers.lightGerman("kleinste") == "klein") // -e (step1) then -st (step2)
    assert(Stemmers.lightGerman("hashen") == "hash")
    assert(Stemmers.lightGerman("tages") == "tag")       // -es
    assert(Stemmers.lightGerman("vector") == "vector")   // untouched
    assert(Stemmers.lightGerman("hash") == "hash")       // -s only after st-consonant
    // french: len<6 guard, -aux, ordered tail strip + doubled letter
    assert(Stemmers.minimalFrench("chevaux") == "cheval")
    assert(Stemmers.minimalFrench("belles") == "bel")    // s, e, doubled l
    assert(Stemmers.minimalFrench("tables") == "tabl")   // s then e
    assert(Stemmers.minimalFrench("table") == "table")   // len 5 < 6
    assert(Stemmers.minimalFrench("prix") == "prix")     // len < 6 beats -x
    // spanish: accent fold + ordered plural/gender rules
    assert(Stemmers.lightSpanish("luces") == "luz")
    assert(Stemmers.lightSpanish("libros") == "libr")
    assert(Stemmers.lightSpanish("casas") == "cas")
    assert(Stemmers.lightSpanish("café") == "cafe")      // len<5: fold only
    assert(Stemmers.lightSpanish("rápido") == "rapid")
    // the chain kernel resolves all three by name (codegen path)
    val df2 = Seq((1L, "vectoren hashen tables")).toDF("id", "text")
    val de = df2.select(Analyzer.chainText(col("text"), stemmer = "light_german"))
      .as[Seq[String]].collect().head
    assert(de == Seq("vector", "hash", "tabl")) // 'tables' drops -es too
  }

  test("shingle / length / truncate / unique / pattern_replace filters") {
    val df3 = Seq((1L, "fast hash join path fast hash")).toDF("id", "text")
    val toks = Analyzer.tokens(col("text"))
    val sh = df3.select(Analyzer.shingleFilter(toks, 2, 3))
      .as[Seq[String]].collect().head
    // unigrams first, then distinct 2-grams, then distinct 3-grams
    assert(sh.take(6) == Seq("fast", "hash", "join", "path", "fast", "hash"))
    assert(sh.contains("fast hash") && sh.contains("hash join") &&
      sh.contains("fast hash join"))
    assert(sh.count(_ == "fast hash") == 1) // distinct within the 2-gram block
    val ln = df3.select(Analyzer.lengthFilter(toks, 5, 10))
      .as[Seq[String]].collect().head
    assert(ln == Seq()) // all tokens are length 4
    val ln2 = df3.select(Analyzer.lengthFilter(toks, 1, 4))
      .as[Seq[String]].collect().head
    assert(ln2.size == 6)
    val tr = df3.select(Analyzer.truncateFilter(toks, 3))
      .as[Seq[String]].collect().head
    assert(tr == Seq("fas", "has", "joi", "pat", "fas", "has"))
    val un = df3.select(Analyzer.uniqueFilter(toks))
      .as[Seq[String]].collect().head
    assert(un == Seq("fast", "hash", "join", "path"))
    val pr = df3.select(Analyzer.tokens(
      Analyzer.patternReplace(col("text"), "ha(sh)", "mar$1")))
      .as[Seq[String]].collect().head
    assert(pr == Seq("fast", "marsh", "join", "path", "fast", "marsh"))
  }

  test("matchChain + matchSynonyms semantics") {
    import graft.search.Search
    val df = Seq(
      (1L, "the table is fast"),
      (2L, "windows sort rows"),
      (3L, "quick merge path")).toDF("id", "text")
    val toks = Analyzer.tokens(col("text"))
    // stemmed OR-match: "tables windows" hits 1 (table) and 2 (windows)
    val hits = df.where(Search.matchChain(toks, "tables windows",
      stemmer = "minimal_english")).select("id").as[Long].collect().toSet
    assert(hits == Set(1L, 2L))
    // synonym AND: (rapid|fast|quick) AND (path|table)
    val syn = df.where(Search.matchSynonyms(toks, "rapid path",
      Map("rapid" -> Seq("fast", "quick"), "path" -> Seq("table"))))
      .select("id").as[Long].collect().toSet
    assert(syn == Set(1L, 3L))
  }

  test("fineWeb line battery: planted duplicate line flips the keep rule") {
    import graft.text.TextAnalysis
    val body = "this is a long enough body line for the fineweb battery to measure"
    val docs = Seq(
      (1L, s"menu | home\n$body\n$body tail\n- item one\ncopyright 2024"),        // clean
      (2L, s"menu | home\n$body\n$body tail\n$body\n- item one\ncopyright 2024"), // dup body
      (3L, "- a\n- b\n- c\n- d")                                                  // all bullets
    ).toDF("id", "page")
    val sig = TextAnalysis.fineWebSignals(col("page"))
    val out = docs.select(col("id") +: sig.map { case (n, c) => c.as(n) } :+
        TextAnalysis.fineWebKeep(sig.toMap).as("keep"): _*)
      .as[(Long, Long, Double, Double, Double, Double, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._4 == 0.0 && out(1L)._7)           // no dup chars -> keep
    assert(out(2L)._4 > 0.3 && !out(2L)._7)           // both body copies count -> drop
    assert(out(3L)._5 == 1.0 && !out(3L)._7)          // bullet_frac 1.0 > 0.9 -> drop
  }

  test("BPE: greedy fit learns the frequent pair first; apply counts match the merge chain") {
    import graft.text.Bpe
    // Sennrich's canonical toy corpus shape: 'low' dominates, so the
    // first merges build it up
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest"),
      (3L, "low lowest")).toDF("doc_id", "text")
    val m1 = Bpe.fit(docs, "text", 6)
    val m2 = Bpe.fit(docs, "text", 6)
    assert(m1 == m2, "fit must be deterministic")
    // 'l o' (or 'o w') is the most frequent adjacent pair — the first
    // merge must come from 'low'
    assert(Seq(("l", "o"), ("o", "w")).contains(m1.head), m1.toString)
    // after 2 merges the whole word 'low' is one symbol
    assert(m1.take(2).map(p => p._1 + p._2).contains("low"), m1.toString)

    // apply: counts under an explicit table, hand-checked
    val merges = Seq(("l", "o"), ("lo", "w"))
    val counts = Seq((1L, "low lower xy"), (2L, "wool"))
      .toDF("id", "t")
      .select(col("id"), Bpe.tokenCount(col("t"), merges).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // low -> [low] = 1; lower -> [low, e, r] = 3; xy -> [x, y] = 2
    assert(counts(1L) == 6L, counts.toString)
    // wool -> [w, o, o, l] (no 'lo'/'low' adjacency) = 4
    assert(counts(2L) == 4L)
    // documented run semantics: shared-delimiter consumption merges a
    // same-pair run alternately — 'aaaa' under (a,a) is 3 symbols,
    // not canonical BPE's 2; pinned so both engines stay identical
    val run = Seq((1L, "aaaa")).toDF("id", "t")
      .select(Bpe.tokenCount(col("t"), Seq(("a", "a"))).as("n"))
      .head().getLong(0)
    assert(run == 3L)
  }

  test("BPE distributed trainer emits the SAME merge sequence as the driver fit (r16)") {
    import graft.text.Bpe
    // the toy corpus, incl. tie-break-sensitive pairs
    val docs = Seq(
      (1L, "low low low low low"),
      (2L, "lower lower newest newest"),
      (3L, "low lowest widest ab ab cd cd")).toDF("doc_id", "text")
    assert(Bpe.fitDist(docs, "text", 8) == Bpe.fit(docs, "text", 8))
    // over the real corpus too — the parity the q_tokens_bpe_dist
    // artifact rides on
    val real = Tables.documents(spark, sfDir).limit(200)
    assert(Bpe.fitDist(real, "text", 12) == Bpe.fit(real, "text", 12))
    // merge exhaustion stops both trainers at the same table
    val tiny = Seq((1L, "ab ab")).toDF("doc_id", "text")
    val tinyFit = Bpe.fitDist(tiny, "text", 10)
    assert(tinyFit == Bpe.fit(tiny, "text", 10))
    assert(tinyFit.size == 1) // 'ab' then nothing left
  }

  test("BPE kernel stays bit-equal to the declarative replace chain") {
    import graft.text.Bpe
    // the compiled kernel must stay bit-equal to the declarative
    // replace chain (the oracle's reference semantics) on real text,
    // chained merges, and the run edge cases
    val sample = Tables.documents(spark, sfDir).limit(100)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq(
        (900001L, "aaaa aaa lower low lowest"),
        (900002L, "abab ababab xyzzy")).toDF("doc_id", "text"))
    val tables = Seq(Bpe.PretrainedMerges,
      Seq(("a", "a")), Seq(("a", "b"), ("ab", "ab")), Seq(("l", "o"), ("lo", "w")))
    tables.foreach { tbl =>
      val diff = sample.select(
        Bpe.tokenCount(col("text"), tbl).as("k"),
        Bpe.tokenCountChain(col("text"), tbl).as("c"))
        .where(col("k") =!= col("c")).count()
      assert(diff == 0, s"kernel != chain under $tbl")
    }
  }
}
