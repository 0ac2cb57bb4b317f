package graft.analysis

/** Stemmers for the configurable analysis chain (ES `stemmer` token
  * filter analog — es-hadoop itself delegates analysis to the server
  * at index time; a Spark-native engine must supply it).
  *
  * Two variants, mirroring the two ES stemmer families users pick
  * most:
  *
  *  - `minimal_english` — the plural-stripping S-stemmer class
  *    (Harman 1991; ES/Lucene `minimal_english`). Three suffix rules,
  *    fully mirrored bit-for-bit by the DuckDB oracle SQL (see
  *    SparkEntry's MStemCase) so every query over it is
  *    hash-checked.
  *  - `porter` — the classic Porter algorithm exactly as published
  *    (M.F. Porter, "An algorithm for suffix stripping", Program
  *    14(3) 1980). Too branchy for a faithful SQL mirror, so parity
  *    is spec-checked against the paper's own worked examples
  *    (PorterSpec) instead of the DuckDB oracle.
  *
  * Both are pure `String => String` on lowercase ASCII tokens (the
  * standard-analyzer output alphabet `[a-z0-9]+`), called from the
  * compiled AnalyzeChain kernel per token — no per-row allocation
  * beyond the result string.
  */
object Stemmers {

  /** `minimal_english`: strip plural `-s` with the classic guards.
    * Rules (ordered; at most one applies):
    *   1. len < 3 or no trailing `s`          -> unchanged
    *   2. `-ss` / `-us`                       -> unchanged
    *   3. `-Xies` (X not a/e), len > 3        -> `-Xy`
    *   4. `-ies` (len 3) / `-aes|-ees|-ies|-oes` kept as-is when the
    *      letter before `es` is a vowel i/a/o/e -> unchanged
    *   5. otherwise                           -> drop the final `s`
    */
  def minimalEnglish(w: String): String = {
    val n = w.length
    if (n < 3 || w.charAt(n - 1) != 's') return w
    w.charAt(n - 2) match {
      case 'u' | 's' => w
      case 'e' =>
        if (n > 3 && w.charAt(n - 3) == 'i' &&
            w.charAt(n - 4) != 'a' && w.charAt(n - 4) != 'e')
          w.substring(0, n - 3) + "y"
        else if ("iaoe".indexOf(w.charAt(n - 3)) >= 0) w
        else w.substring(0, n - 1)
      case _ => w.substring(0, n - 1)
    }
  }

  // ---- classic Porter (1980) ----

  private def isCons(w: String, i: Int): Boolean = w.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => false
    case 'y' => i == 0 || !isCons(w, i - 1)
    case _ => true
  }

  /** m = number of VC sequences in the [C](VC)^m[V] decomposition. */
  private def measure(w: String): Int = {
    var m = 0
    var i = 0
    val n = w.length
    while (i < n && isCons(w, i)) i += 1 // leading C block
    while (i < n) {
      while (i < n && !isCons(w, i)) i += 1 // V block
      if (i < n) { m += 1; while (i < n && isCons(w, i)) i += 1 }
    }
    m
  }

  private def hasVowel(w: String): Boolean =
    (0 until w.length).exists(i => !isCons(w, i))

  /** *d — ends with a double consonant. */
  private def endsDoubleCons(w: String): Boolean =
    w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      isCons(w, w.length - 1)

  /** *o — ends cvc where the final c is not w, x or y. */
  private def endsCvc(w: String): Boolean = {
    val n = w.length
    n >= 3 && isCons(w, n - 3) && !isCons(w, n - 2) && isCons(w, n - 1) && {
      val c = w.charAt(n - 1); c != 'w' && c != 'x' && c != 'y'
    }
  }

  /** Longest matching suffix from `rules` whose stem passes `cond`;
    * per the paper, only the longest-matching S1 in a rule set is
    * considered — if its condition fails, NO rule in the set fires. */
  private def ruleSet(w: String, rules: Seq[(String, String)], minM: Int): String =
    rules.filter { case (s, _) => w.endsWith(s) }
      .sortBy(-_._1.length).headOption match {
      case Some((s, r)) =>
        val stem = w.substring(0, w.length - s.length)
        if (measure(stem) > minM) stem + r else w
      case None => w
    }

  /** Classic Porter. Words of length <= 2 are returned unchanged. */
  def porter(word: String): String = {
    if (word.length <= 2) return word
    var w = word

    // step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("ss")) ()
    else if (w.endsWith("s")) w = w.dropRight(1)

    // step 1b
    if (w.endsWith("eed")) {
      if (measure(w.dropRight(3)) > 0) w = w.dropRight(1)
    } else {
      val stripped =
        if (w.endsWith("ed") && hasVowel(w.dropRight(2))) Some(w.dropRight(2))
        else if (w.endsWith("ing") && hasVowel(w.dropRight(3))) Some(w.dropRight(3))
        else None
      stripped.foreach { s =>
        w = if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s + "e"
        else if (endsDoubleCons(s) && "lsz".indexOf(s.charAt(s.length - 1)) < 0)
          s.dropRight(1)
        else if (measure(s) == 1 && endsCvc(s)) s + "e"
        else s
      }
    }

    // step 1c
    if (w.endsWith("y") && hasVowel(w.dropRight(1))) w = w.dropRight(1) + "i"

    // step 2 (m > 0)
    w = ruleSet(w, Seq(
      "ational" -> "ate", "tional" -> "tion", "enci" -> "ence", "anci" -> "ance",
      "izer" -> "ize", "abli" -> "able", "alli" -> "al", "entli" -> "ent",
      "eli" -> "e", "ousli" -> "ous", "ization" -> "ize", "ation" -> "ate",
      "ator" -> "ate", "alism" -> "al", "iveness" -> "ive", "fulness" -> "ful",
      "ousness" -> "ous", "aliti" -> "al", "iviti" -> "ive", "biliti" -> "ble"),
      minM = 0)

    // step 3 (m > 0)
    w = ruleSet(w, Seq(
      "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
      "ical" -> "ic", "ful" -> "", "ness" -> ""), minM = 0)

    // step 4 (m > 1); `ion` additionally requires the stem to end s/t
    locally {
      val rules = Seq("al", "ance", "ence", "er", "ic", "able", "ible", "ant",
        "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti", "ous",
        "ive", "ize")
      rules.filter(w.endsWith).sortBy(-_.length).headOption.foreach { s =>
        val stem = w.substring(0, w.length - s.length)
        val ionOk = s != "ion" ||
          (stem.nonEmpty && (stem.last == 's' || stem.last == 't'))
        if (measure(stem) > 1 && ionOk) w = stem
      }
    }

    // step 5a
    if (w.endsWith("e")) {
      val stem = w.dropRight(1)
      val m = measure(stem)
      if (m > 1 || (m == 1 && !endsCvc(stem))) w = stem
    }
    // step 5b
    if (endsDoubleCons(w) && w.endsWith("l") && measure(w) > 1) w = w.dropRight(1)

    w
  }

  /** `light_german` — the Savoy-style light German stemmer (the shape
    * of ES's `light_german` option): fold umlauts, then two ordered
    * suffix-strip steps. Rules (each step applies at most one):
    *   fold: ä→a ö→o ü→u (other accents are tokenizer separators here)
    *   step1: len>5 `-ern`→drop3 | len>4 `-em/-en/-er/-es`→drop2 |
    *          len>3 `-e`→drop1 | len>3 `-s` after b,d,f,g,h,k,l,m,n,t→drop1
    *   step2: len>5 `-est`→drop3 | len>4 `-er/-en`→drop2 |
    *          len>4 `-st` after b,d,f,g,h,k,l,m,n,t→drop2
    */
  def lightGerman(word: String): String = {
    val w = word.map {
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'; case c => c
    }
    def stEnding(c: Char): Boolean = "bdfghklmnt".indexOf(c) >= 0
    val s1 = {
      val n = w.length
      if (n > 5 && w.endsWith("ern")) w.dropRight(3)
      else if (n > 4 && n >= 2 && w.charAt(n - 2) == 'e' &&
        "mnrs".indexOf(w.charAt(n - 1)) >= 0) w.dropRight(2)
      else if (n > 3 && w.endsWith("e")) w.dropRight(1)
      else if (n > 3 && w.endsWith("s") && stEnding(w.charAt(n - 2))) w.dropRight(1)
      else w
    }
    val n = s1.length
    if (n > 5 && s1.endsWith("est")) s1.dropRight(3)
    else if (n > 4 && (s1.endsWith("er") || s1.endsWith("en"))) s1.dropRight(2)
    else if (n > 4 && s1.endsWith("st") && stEnding(s1.charAt(n - 3))) s1.dropRight(2)
    else s1
  }

  /** `minimal_french` — the minimal French stemmer (the shape of ES's
    * `minimal_french` option). Rules, applied to words of length ≥ 6:
    *   `-aux`→`-al` | other `-x`→drop1 | otherwise strip the ordered
    *   optional tail `s`, then `r`, then `e`, then `é` (equivalently:
    *   longest end-match of é?e?r?s?), then collapse a doubled final
    *   letter. */
  def minimalFrench(word: String): String = {
    if (word.length < 6) return word
    if (word.endsWith("aux")) return word.dropRight(3) + "al"
    if (word.endsWith("x")) return word.dropRight(1)
    var w = word
    if (w.endsWith("s")) w = w.dropRight(1)
    if (w.endsWith("r")) w = w.dropRight(1)
    if (w.endsWith("e")) w = w.dropRight(1)
    if (w.endsWith("é")) w = w.dropRight(1)
    if (w.length >= 2 && w.charAt(w.length - 1) == w.charAt(w.length - 2) &&
      w.charAt(w.length - 1).isLetter) w = w.dropRight(1)
    w
  }

  /** `light_spanish` — light Spanish plural/gender stripping (the
    * shape of ES's `light_spanish` option). Rules, applied to words
    * of length ≥ 5 after accent folding (á→a é→e í→i ó→o ú→u):
    *   `-ces`→`-z` | `-os/-as/-es`→drop2 | `-s`→drop1 |
    *   `-o/-a/-e`→drop1. Ordered, at most one applies. */
  def lightSpanish(word: String): String = {
    val w = word.map {
      case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
      case 'ó' => 'o'; case 'ú' => 'u'; case c => c
    }
    if (w.length < 5) w
    else if (w.endsWith("ces")) w.dropRight(3) + "z"
    else if (w.endsWith("os") || w.endsWith("as") || w.endsWith("es")) w.dropRight(2)
    else if (w.endsWith("s")) w.dropRight(1)
    else if (w.endsWith("o") || w.endsWith("a") || w.endsWith("e")) w.dropRight(1)
    else w
  }

  def apply(variant: String): String => String = variant match {
    case "minimal_english" => minimalEnglish
    case "porter" => porter
    case "light_german" => lightGerman
    case "minimal_french" => minimalFrench
    case "light_spanish" => lightSpanish
    case other => throw new IllegalArgumentException(s"unknown stemmer: $other")
  }
}
