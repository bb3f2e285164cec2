package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** FuzzyJoin: symmetric-delete blocking must be EXACT — same pairs as the
  * all-pairs levenshtein scan — at both supported distances. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic name domain with planted near-pairs: typos (sub/ins/del),
    * far-apart strings, and repeated rows. */
  private lazy val names = Seq(
    "acme corp", "acme corp.", "acmee corp", "acme c0rp", "acme",
    "globex", "globexx", "g1obex", "glob", "globe x",
    "initech", "intech", "initach", "initech inc",
    "umbrella", "umbrela", "umbrellla",
    "stark industries", "stark industry",
    "wayne", "wane", "wayne ", "payne",
    "alpha-1", "alpha-2", "alpha-12", "beta-1",
    "x", "xy", "y", "z", "zz",
    "completely different", "another thing entirely"
  ) ++ (0 until 40).map(i => s"vendor-${i % 13}-${(i * 7) % 10}row$i")

  private lazy val df = (names ++ names.take(10)).toDF("name") // dups too

  private def bruteForce(d: Int) = {
    val n = df.select($"name").na.drop().distinct()
    n.select($"name".as("name_a"))
      .crossJoin(n.select($"name".as("name_b")))
      .filter($"name_a" < $"name_b")
      .withColumn("dist", levenshtein($"name_a", $"name_b").cast("long"))
      .filter($"dist" <= d)
  }

  for (d <- Seq(1, 2)) {
    test(s"editDistancePairs(d=$d) == brute-force all-pairs levenshtein") {
      val got = FuzzyJoin.editDistancePairs(df, "name", d)
        .orderBy("name_a", "name_b").collect().toSeq
      val want = bruteForce(d).orderBy("name_a", "name_b").collect().toSeq
      assert(got == want)
      assert(got.nonEmpty, "domain must actually contain close pairs")
    }
  }

  test("planted substitution, insertion, and deletion typos all surface at d=1") {
    val pairs = FuzzyJoin.editDistancePairs(df, "name", 1)
      .select("name_a", "name_b").as[(String, String)].collect().toSet
    assert(pairs.contains(("acme corp", "acme corp."))) // insertion
    assert(pairs.contains(("acme corp", "acmee corp"))) // insertion mid-string
    assert(pairs.contains(("globex", "globexx")))       // insertion at end
    assert(pairs.contains(("g1obex", "globex")))        // substitution
    assert(pairs.contains(("wane", "wayne")))           // deletion
    assert(!pairs.contains(("acme corp", "initech")))   // far apart stays out
  }

  test("distance column is the true levenshtein distance, and pairs are unique") {
    val rows = FuzzyJoin.editDistancePairs(df, "name", 2).collect()
    val asPairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(asPairs.distinct.length == asPairs.length, "no duplicate pairs")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "canonical a < b order")
      assert(r.getLong(2) >= 1 && r.getLong(2) <= 2)
    }
  }

  test("lookup: queries correct against the dictionary, exact vs brute force") {
    val dict = Seq("spark", "scala", "kafka", "flink", "parquet", "arrow")
      .toDF("entry")
    val queries = Seq("sprak", "scala", "kafkaa", "paruet", "nomatch", "arow")
      .toDF("q")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.editDistanceLookup(queries, "q", dict, "entry", d)
        .orderBy("query", "match")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
      val want = (for {
        q <- Seq("sprak", "scala", "kafkaa", "paruet", "nomatch", "arow")
        e <- Seq("spark", "scala", "kafka", "flink", "parquet", "arrow")
      } yield (q, e)).map { case (q, e) =>
        val dist = {
          val dp = Array.tabulate(q.length + 1, e.length + 1)((i, j) =>
            if (i == 0) j else if (j == 0) i else 0)
          for (i <- 1 to q.length; j <- 1 to e.length)
            dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
              dp(i - 1)(j - 1) + (if (q(i - 1) == e(j - 1)) 0 else 1))
          dp(q.length)(e.length)
        }
        (q, e, dist.toLong)
      }.filter(_._3 <= d).sortBy(p => (p._1, p._2))
      assert(got == want, s"d=$d")
    }
    // the transposition typo "sprak"→"spark" needs d=2 (plain Levenshtein)
    val d2 = FuzzyJoin.editDistanceLookup(queries, "q", dict, "entry", 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(d2.contains(("sprak", "spark")))
    assert(!d2.exists(_._1 == "nomatch"))
  }

  test("deleteNeighborhood sizes: identity + deletions (+ distinct 2-deletions)") {
    val s = Seq("abcd").toDF("s")
    val d1 = s.select(size(FuzzyJoin.deleteNeighborhood($"s", 1))).as[Int].head()
    assert(d1 == 5) // abcd + 4 single deletions, all distinct
    val d2 = s.select(size(FuzzyJoin.deleteNeighborhood($"s", 2))).as[Int].head()
    // 1 + 4 + C(4,2)=6 distinct double deletions for all-distinct chars
    assert(d2 == 11)
  }
}
