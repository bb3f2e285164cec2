package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) self-join via symmetric-delete blocking — the
  * entity-resolution primitive: find all pairs of strings within Levenshtein
  * distance ≤ d without comparing all pairs.
  *
  * Blocking scheme (SymSpell): every string emits its ≤d-deletion
  * neighborhood — itself plus every variant obtained by deleting up to d
  * characters. Two strings with levenshtein(a, b) ≤ d ALWAYS share at least
  * one variant: each edit operation (substitute / insert / delete) is
  * neutralized by deleting at most one character from each side, so a ≤d-op
  * edit script yields a common string reachable by ≤d deletions from both.
  * The blocking is therefore EXACT — no recall loss — and the final
  * `levenshtein ≤ d` filter removes the false positives blocking admits, so
  * the result is exactly the all-pairs answer at every scale.
  *
  * Plan shape: deletion variants are a map-side generator (nested
  * `transform` lambdas — codegen'd, no UDF); the join key is xxhash64 of
  * the variant so the exchange carries 8-byte keys, never variant text
  * (hash collisions only ADD candidates, which the distance filter then
  * drops — exactness is unaffected). Candidate pairs dedup BEFORE the
  * distance verify. Keys per string ≈ 1 + L + L²/2 for d=2 on length-L
  * strings — the scheme targets short keys (names, titles, codes); for
  * corpus-scale blocking over long text use MinHash (graft.dedup) instead.
  * A pathological hot variant (many strings deleting to one key) is the
  * same hot-bucket shape as graft.dedup.Buckets — cap with that machinery
  * if a real domain ever needs it.
  *
  * Reference analog: the reference pipeline has no fuzzy matching; this is
  * part of the beyond-reference curation surface (SURVEY §2 C-block).
  */
object FuzzyJoin {

  /** All single-deletion variants of `s` (as a Column of array<string>). */
  private def deletions(s: Column): Column =
    transform(sequence(lit(0), length(s) - 1),
      i => concat(s.substr(lit(1), i), s.substr(i + 2, length(s))))

  /** The ≤d-deletion neighborhood of `s`, including `s` itself. d ∈ {1,2}. */
  def deleteNeighborhood(s: Column, maxDistance: Int): Column = {
    require(maxDistance == 1 || maxDistance == 2,
      s"symmetric-delete blocking supports d in {1,2}, got $maxDistance")
    val d1 = array_union(array(s), deletions(s))
    if (maxDistance == 1) d1
    else array_union(d1,
      array_distinct(flatten(transform(deletions(s), v => deletions(v)))))
  }

  /** Distinct unordered pairs (a < b) of values of `nameCol` with
    * levenshtein distance ≤ maxDistance. Input rows dedup on the name
    * first, so repeated values never inflate the candidate space. Output:
    * (name_a, name_b, dist). */
  def editDistancePairs(df: DataFrame, nameCol: String,
      maxDistance: Int = 1): DataFrame = {
    val names = df.select(col(nameCol).as("__name")).na.drop().distinct()
    val keyed = keyedVariants(names, maxDistance)
    val a = keyed.select(col("__key"), col("__name").as("name_a"))
    val b = keyed.select(col("__key"), col("__name").as("name_b"))
    a.join(b, Seq("__key"))
      .filter(col("name_a") < col("name_b"))
      .select(col("name_a"), col("name_b"))
      .distinct()
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= maxDistance)
  }

  /** Fuzzy LOOKUP (the two-sided form): for every query string, all
    * dictionary entries within levenshtein ≤ maxDistance — spell
    * correction / alias matching against a canonical list. Same exact
    * symmetric-delete blocking, across two tables: both sides explode
    * their ≤d-deletion neighborhoods and equi-join on the variant hash.
    * Output (query, match, dist), one row per qualifying pair. */
  def editDistanceLookup(queries: DataFrame, queryCol: String,
      dict: DataFrame, dictCol: String, maxDistance: Int = 1): DataFrame = {
    val q = keyedVariants(
      queries.select(col(queryCol).as("__name")).na.drop().distinct(), maxDistance)
      .select(col("__key"), col("__name").as("query"))
    val d = keyedVariants(
      dict.select(col(dictCol).as("__name")).na.drop().distinct(), maxDistance)
      .select(col("__key"), col("__name").as("match"))
    q.join(d, Seq("__key"))
      .select(col("query"), col("match"))
      .distinct()
      .withColumn("dist", levenshtein(col("query"), col("match")).cast("long"))
      .filter(col("dist") <= maxDistance)
  }

  private def keyedVariants(names: DataFrame, maxDistance: Int): DataFrame =
    names.select(col("__name"),
      explode(deleteNeighborhood(col("__name"), maxDistance)).as("__variant"))
      .select(col("__name"), xxhash64(col("__variant")).as("__key"))
}
