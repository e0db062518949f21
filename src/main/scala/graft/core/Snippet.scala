package graft.core

/** Snippet builder — faithful transcription of the reference's
  * `createSnippetForPage` / `getSnippetFromText`
  * (SearchServiceImpl.java:119-178, constants :31-33), quirks preserved
  * (SURVEY.md §7 H6):
  *
  *  - body text split on a SINGLE space " " (not \s+);
  *  - per-word normalization `replaceAll("[^А-я]", " ").toLowerCase.strip`
  *    — the char class is the А..я range (both cases, ё excluded);
  *  - skip blank / len<3 / non-dictionary words;
  *  - window = [max(0, pos-5), min(len-1, pos+5)) with an EXCLUSIVE upper
  *    bound — the final window word is dropped (ref :165 `i < cAfter`);
  *  - keyword wrapped in <b></b>; every appended word followed by " ";
  *  - stop appending windows once built length exceeds 250 chars.
  */
object Snippet extends Serializable {
  val OffsetStart = 5 // SearchServiceImpl.java:31
  val OffsetEnd = 5 // SearchServiceImpl.java:32
  val MaxLength = 250 // SearchServiceImpl.java:33

  private val NonRuRange = "[^А-я]".r // [^А-я]

  /** Normalize one surface word the way the snippet matcher does
    * (SearchServiceImpl.java:133). */
  def normalizeWord(w: String): String =
    NonRuRange.replaceAllIn(w, " ").toLowerCase.strip

  /** Build the snippet for one page body text given the surviving query
    * lemmas. `bodyText` = HtmlText.bodyText(html). */
  def build(bodyText: String, queryLemmas: Set[String]): String = {
    // Java limit-0 split semantics (trailing empty strings dropped) — the
    // reference uses text.split(" ") (SearchServiceImpl.java:125), so
    // trailing spaces must not extend the window arithmetic.
    val textArray = bodyText.split(" ")
    val positions = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < textArray.length) {
      val cur = normalizeWord(textArray(i))
      if (cur.nonEmpty && cur.length >= 3 && Lemmatizer.checkString(cur)) {
        if (queryLemmas.contains(Lemmatizer.normalForm(cur))) positions += i
      }
      i += 1
    }
    fromPositions(textArray, positions.toSeq)
  }

  /** getSnippetFromText (SearchServiceImpl.java:151-178), verbatim. */
  def fromPositions(textArray: Array[String], positions: Seq[Int]): String = {
    val sb = new StringBuilder
    var done = false
    for (pos <- positions if !done) {
      val cBefore = math.max(0, pos - OffsetStart)
      val cAfter = math.min(textArray.length - 1, pos + OffsetEnd)
      var i = cBefore
      while (i < cAfter) { // exclusive bound: last window word dropped (ref quirk)
        if (i == pos) sb.append("<b>").append(textArray(i)).append("</b>")
        else sb.append(textArray(i))
        sb.append(" ")
        i += 1
      }
      if (sb.length > MaxLength) done = true
    }
    sb.toString
  }
}
