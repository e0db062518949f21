package graft.core

/** Closed deterministic Russian morphological dictionary.
  *
  * The reference lemmatizes with Apache lucene-morphology's
  * `RussianLuceneMorphology` (MorphologyServiceImpl.java:221-231, 293-304;
  * pom.xml:51-75). That artifact is not available offline, so per
  * SURVEY.md §7 H2 the rebuild ships a CLOSED dictionary: every token the
  * corpus generator can emit is covered, making
  * `getNormalForms(word).get(0)` exactly reproducible. Out-of-dictionary
  * tokens lemmatize to themselves (documented spec extension — cannot
  * occur in generated fixtures).
  *
  * Particle parts of speech dropped by the reference
  * (MorphologyServiceImpl.java:36, 221-224): МЕЖД (interjection),
  * ПРЕДЛ (preposition), СОЮЗ (conjunction).
  *
  * Construction is programmatic (regular paradigms over generated stems +
  * a curated real-word set) so the table is deterministic and collision-
  * free; `RuDictSpec` asserts global form uniqueness.
  */
object RuDict {

  /** One dictionary entry: surface form -> (normal form, isParticle). */
  final case class Entry(lemma: String, isParticle: Boolean)

  private val vowels = Vector("а", "о", "у", "и")
  private val cons = Vector("б", "в", "г", "д", "з", "к", "л", "м", "н", "п", "р", "с", "т")

  /** Deterministic stem stream: CVC combos in fixed order. 13*4*13 = 676
    * available; callers take disjoint slices. */
  private def cvcStems: IndexedSeq[String] =
    for { c1 <- cons; v <- vowels; c2 <- cons } yield c1 + v + c2

  private val nounEndings = Seq("", "а", "у", "ом", "е", "ы", "ов", "ам", "ами", "ах")
  private val verbEndings = Seq("ать", "аю", "аешь", "ает", "аем", "аете", "ают", "ал", "ала", "али")
  private val adjEndings = Seq("ный", "ного", "ному", "ным", "ном", "ная", "ной", "ную", "ные", "ных", "ными")

  /** Lemma -> all surface forms (lemma itself first = normal form). */
  val paradigms: Vector[(String, Seq[String], Boolean)] = {
    val stems = cvcStems
    // Disjoint stem slices per class; forms cannot collide across classes
    // because noun forms never end in verb/adjective endings and all stems
    // within a class share one length (see RuDictSpec).
    val nounStems = stems.slice(0, 120)
    val verbStems = stems.slice(120, 160).map(_ + "ир") // 5-char verb stems
    val adjStems = stems.slice(160, 200).map(_ + "ов") // 5-char adj stems

    val nouns = nounStems.map { st =>
      (st, nounEndings.map(st + _).filter(_.length >= 3), false)
    }
    val verbs = verbStems.map { st => (st + "ать", verbEndings.map(st + _), false) }
    val adjs = adjStems.map { st => (st + "ный", adjEndings.map(st + _), false) }

    // The planted stop-lemma (>80% document frequency in fixtures — exercises
    // the reference's frequent-lemma pruning, SearchServiceImpl.java:329-344).
    val stop = ("быть", Seq("быть", "был", "была", "были", "будет", "будут", "есть"), false)

    // Particles: dropped at index AND query time (МЕЖД/ПРЕДЛ/СОЮЗ,
    // MorphologyServiceImpl.java:36). Only forms with length >= 3 matter —
    // shorter ones never survive the tokenizer (F2).
    val particles = Vector(
      ("под", Seq("под", "подо"), true), // ПРЕДЛ
      ("над", Seq("над", "надо"), true), // ПРЕДЛ
      ("при", Seq("при"), true), // ПРЕДЛ
      ("про", Seq("про"), true), // ПРЕДЛ
      ("без", Seq("без", "безо"), true), // ПРЕДЛ
      ("для", Seq("для"), true), // ПРЕДЛ
      ("через", Seq("через"), true), // ПРЕДЛ
      ("между", Seq("между"), true), // ПРЕДЛ
      ("или", Seq("или"), true), // СОЮЗ
      ("однако", Seq("однако"), true), // СОЮЗ
      ("чтобы", Seq("чтобы"), true), // СОЮЗ
      ("потому", Seq("потому"), true), // СОЮЗ
      ("увы", Seq("увы"), true), // МЕЖД
      ("ура", Seq("ура"), true) // МЕЖД
    )

    (nouns ++ verbs ++ adjs).toVector :+ stop :++ particles
  }

  /** Content lemmas (non-particle), in deterministic order; the corpus
    * generator draws from this list Zipf-weighted. */
  val contentLemmas: Vector[String] =
    paradigms.filter(!_._3).map(_._1)

  /** All inflected forms of a lemma (normal form first). */
  val formsOf: Map[String, Seq[String]] =
    paradigms.map(p => p._1 -> p._2).toMap

  /** form -> Entry. The full lookup table the lemmatizer uses. */
  val table: Map[String, Entry] = {
    val b = Map.newBuilder[String, Entry]
    for ((lemma, forms, particle) <- paradigms; f <- forms)
      b += f -> Entry(lemma, particle)
    b.result()
  }
}

/** Deterministic lemmatizer with reference `RussianLuceneMorphology`
  * call-surface semantics (MorphologyServiceImpl.java:221-231, 293-304). */
object Lemmatizer extends Serializable {

  /** getNormalForms(word).get(0) analogue; identity for OOV words
    * (spec extension, SURVEY.md §7 H2). */
  def normalForm(token: String): String =
    RuDict.table.get(token).map(_.lemma).getOrElse(token)

  /** True if ANY morph info of the word is МЕЖД/ПРЕДЛ/СОЮЗ
    * (MorphologyServiceImpl.java:221-224, 253-264). */
  def isParticle(token: String): Boolean =
    RuDict.table.get(token).exists(_.isParticle)

  /** `luceneMorphology.checkString` analogue: token is a known,
    * well-formed dictionary word (used by the snippet word filter,
    * SearchServiceImpl.java:133-134). OOV extension: accept any
    * all-Cyrillic token. */
  def checkString(token: String): Boolean =
    token.nonEmpty && token.forall(c => c >= 'а' && c <= 'я')

  /** Full doc analysis: tokenize + drop particles + lemmatize.
    * Mirrors MorphologyServiceImpl.java:212-240 (the lemma-count loop),
    * returning the flat lemma stream (aggregation to tf happens in Spark,
    * SURVEY.md §2.4 A1). */
  def lemmas(text: String): Array[String] =
    Analyzer.russian.tokenize(text)
      .filter(t => !isParticle(t))
      .map(normalForm)

  /** Lemma -> occurrence count for one text; the reference's in-memory
    * HashMap<String,Integer> (MorphologyServiceImpl.java:212-240). Used by
    * the pure-Scala oracle and query analysis. */
  def lemmaCounts(text: String): Map[String, Int] =
    lemmas(text).groupBy(identity).map { case (k, v) => k -> v.length }

  /** Index-build hot path: one char-scan pass, no intermediate token
    * arrays — semantically identical to [[lemmaCounts]] on the corpus
    * alphabet (asserted by LemmatizerEquivalenceSpec). The per-char
    * lowercase+range check realizes the reference's
    * `[^а-я\s] → space; split; len>2` pipeline directly. */
  def lemmaCountsFast(text: String): Map[String, Int] = {
    if (text == null || text.isEmpty) return Map.empty
    val m = new scala.collection.mutable.AnyRefMap[String, Int]()
    val sb = new java.lang.StringBuilder(24)
    val len = text.length
    var i = 0
    while (i <= len) {
      val lc = if (i < len) Character.toLowerCase(text.charAt(i)) else ' '
      if (lc >= 'а' && lc <= 'я') sb.append(lc)
      else {
        if (sb.length() >= 3) {
          val tok = sb.toString
          RuDict.table.get(tok) match {
            case Some(e) => if (!e.isParticle) m.update(e.lemma, m.getOrElse(e.lemma, 0) + 1)
            case None => m.update(tok, m.getOrElse(tok, 0) + 1)
          }
        }
        if (sb.length() > 0) sb.setLength(0)
      }
      i += 1
    }
    m.toMap
  }

  /** Build hot path over RAW UTF-8 html bytes: tag-skip + tokenize +
    * lemmatize + count in ONE byte-level scan — no html String, no
    * cleaned-text String (the two dominant allocations of the analyze
    * phase; at high thread counts the build is memory-bandwidth-bound,
    * so halving the char traffic is a scaling win, not just a constant).
    *
    * Semantically identical to
    * `lemmaCountsFast(HtmlText.cleanToTextFast(new String(html, UTF_8)))`
    * because the reference tokenizer (MorphologyServiceImpl.java:243-250)
    * destroys every non-[а-я] char anyway: tag bodies are skipped, every
    * ASCII byte (including the encoded entities' `&amp;` etc.) is a token
    * boundary, uppercase А-Я lowercases by +0x20 on the codepoint, and ё
    * (U+0451) falls outside [U+0430,U+044F] exactly as in the char path.
    * Equivalence is asserted corpus-wide in LemmatizerEquivalenceSpec. */
  def lemmaCountsFromHtml(html: Array[Byte]): Map[String, Long] = {
    if (html == null || html.length == 0) return Map.empty
    val m = new scala.collection.mutable.AnyRefMap[String, Long]()
    val sb = new java.lang.StringBuilder(24)
    def flush(): Unit = {
      if (sb.length() >= 3) {
        val tok = sb.toString
        RuDict.table.get(tok) match {
          case Some(e) =>
            if (!e.isParticle) m.update(e.lemma, m.getOrElse(e.lemma, 0L) + 1L)
          case None => m.update(tok, m.getOrElse(tok, 0L) + 1L)
        }
      }
      if (sb.length() > 0) sb.setLength(0)
    }
    val n = html.length
    var i = 0
    var inTag = false
    while (i < n) {
      val b = html(i) & 0xff
      if (inTag) {
        if (b == '>') inTag = false
        i += 1
      } else if (b == '<') {
        inTag = true; flush(); i += 1
      } else if ((b == 0xd0 || b == 0xd1) && i + 1 < n) {
        // 2-byte Cyrillic block: codepoint = ((b & 0x1f) << 6) | cont
        var c = ((b & 0x1f) << 6) | (html(i + 1) & 0x3f)
        if (c >= 0x410 && c <= 0x42f) c += 0x20 // А-Я -> а-я
        if (c >= 0x430 && c <= 0x44f) sb.append(c.toChar) else flush()
        i += 2
      } else { // ASCII or other multi-byte lead/continuation: boundary
        flush(); i += 1
      }
    }
    flush()
    m.toMap
  }
}
