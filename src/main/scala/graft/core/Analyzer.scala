package graft.core

/** Tokenization per the reference's Cyrillic-destroying tokenizer.
  *
  * Reference semantics (MorphologyServiceImpl.java:243-250):
  *   text.toLowerCase().replaceAll("([^а-я\\s])", " ").trim().split("\\s+")
  * then keep tokens with length > 2 (MorphologyServiceImpl.java:217, 248).
  *
  * Notes preserved as observable quirks (SURVEY.md §7 H6):
  *   - `ё` (U+0451) is OUTSIDE the а-я range and is destroyed;
  *   - Latin letters, digits and punctuation all become spaces;
  *   - minimum surviving token length is 3.
  *
  * The engine generalizes the alphabet so the same machinery indexes the
  * Latin-text `documents` table (used for the DuckDB-oracle correctness
  * gate); `Analyzer.russian` is the reference-exact instance.
  */
final case class Analyzer(alphabetClass: String, minTokenLen: Int) {
  private val keep = ("[^" + alphabetClass + "\\s]").r

  /** Lowercase, destroy out-of-alphabet chars, split on whitespace,
    * drop short tokens. Pure + deterministic. */
  def tokenize(text: String): Array[String] = {
    if (text == null || text.isEmpty) return Array.empty
    val cleaned = keep.replaceAllIn(text.toLowerCase, " ").trim
    if (cleaned.isEmpty) Array.empty
    else cleaned.split("\\s+").filter(_.length >= minTokenLen)
  }
}

object Analyzer {
  /** Reference-exact: Cyrillic а-я only, min length 3
    * (MorphologyServiceImpl.java:243-250, :217). */
  val russian: Analyzer = Analyzer("а-я", 3)

  /** Latin mode for the synthetic `documents` corpus; same shape, ASCII
    * alphabet. Chosen so the identical semantics are expressible in
    * DuckDB (`string_split_regex(lower(text), '[^a-z]+')`) for the
    * oracle cross-check. */
  val latin: Analyzer = Analyzer("a-z", 3)
}
