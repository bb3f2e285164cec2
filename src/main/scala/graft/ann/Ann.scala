package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{cosineSim, topKByScore}

/** Similarity search over an embedding column (SURVEY.md §2 E-block).
  *
  * E1 brute-force is the exact baseline: broadcast the (small) query set
  * against the corpus — the corpus side streams, nothing shuffles until the
  * per-query top-k. The top-k itself is a bounded-heap AGGREGATE
  * (graft.functions.expressions.TopKByScore), not a window: the map-side
  * partial already reduces each partition to ≤k rows per query, so the only
  * exchange carries `partitions × k` rows per query instead of all N·Q
  * scored rows.
  *
  * E2 LSH is the scale path: random-hyperplane signatures bucket the corpus
  * ONCE (map-side); queries probe only nearby buckets, so the candidate
  * set per query is a small fraction of the corpus. Recall is tunable with
  * multi-probe depth (`probeBits` = max hamming distance of probed buckets).
  */
object Ann {

  /** Cast a float embedding to double for engine-stable arithmetic. */
  def asDouble(emb: Column): Column = transform(emb, x => x.cast("double"))

  /** ONE-EXCHANGE group/membership frame for the rep collapses:
    * key → (__gid = min id, __gn = member count, __mids = member ids),
    * key columns retained. The r16 shape built `groups` with a groupBy
    * and re-derived `members` by joining the corpus BACK on the (wide)
    * group key — a second full exchange of the key column plus a second
    * checkpoint; collect_list folds the membership into the same
    * aggregation pass, so the key shuffles once and members derive
    * map-side by `explode(__mids)` (r17, the verdict's sf0.1
    * collapse-premium item). Buffer note: a viral group's id list lives
    * in one aggregation buffer — 8 bytes per clone (80 MB at 10M clones
    * of one vector), bounded and small next to the clone VECTORS the
    * old join-back shuffled a second time. */
  private[graft] def groupMembership(corpus: DataFrame, idCol: String,
      keyCols: Seq[String]): DataFrame =
    groupMembershipPlan(corpus, idCol, keyCols)
      .transform(graft.engine.Materialized.checkpoint)

  /** [[groupMembership]] without the materialization — for callers that
    * MEMOIZE the frame (LlmOps' per-(session, dir) index cache): a
    * memoized frame must be persist()-based and recompute-safe, never a
    * localCheckpoint that `Materialized.release` frees at the next
    * unit-of-work boundary. */
  private[graft] def groupMembershipPlan(corpus: DataFrame, idCol: String,
      keyCols: Seq[String]): DataFrame =
    corpus.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("__gid"), count(lit(1)).as("__gn"),
        collect_list(col(idCol)).as("__mids"))

  /** r17 — the rep collapse generalized from final top-k faces to
    * bounded CANDIDATE stages (the r16 verdict's q_ann_pca item): given
    * the top-(k+1) REPS per query of a rep-level scan, reconstruct the
    * exact member-level top-k candidate SET — the rows the uncollapsed
    * corpus-wide bounded heap would admit — WITHOUT expanding whole
    * memberships through a second heap (the r16 inverse step, which is
    * fine at k≈10 but puts cover·cloneFactor·|queries| rows through a
    * heap at k≈200).
    *
    * The member heap's total order is (sim desc via Double.compare, id
    * asc); members of one group tie exactly (sim is a function of the
    * group key), so groups partition into TIE CLASSES by sim and the
    * true member order is: classes in sim-desc order, members WITHIN a
    * class by id across its groups. Hence per query:
    *  - classes whose cumulative adjusted mass fits inside k expand
    *    whole (every member is an admitted candidate);
    *  - the one class straddling slot k expands, orders its members by
    *    id (`row_number` over the class — a frame bounded by the class's
    *    membership, never the corpus), and admits the remainder;
    *  - deeper classes drop.
    * "Adjusted" = the query's own row never counts toward k nor emits
    * (self-exclusion at member level, as in the r16 proof; the +1 rep
    * cover absorbs the one slot the self row can occupy). Cover
    * completeness under ties holds by the same counting argument as
    * [[bruteForceTopKCollapsed]]: a group with a member in the true
    * top-k has < k+1 strictly-preceding reps, so it IS in the rep
    * top-(k+1); absent groups (≥ k+1 preceding reps ⇒ ≥ k preceding
    * non-self members) can never contribute a true candidate, and
    * whenever a HIGHER class is incomplete its ≥ k+1 present preceders
    * already push this class's prefix mass past k, so it drops exactly
    * as the true order says it must. Known shared corner (same bar as
    * the r16 collapses): SQL equality glues ±0.0 into one class while
    * Double.compare separates them — unreachable for the live faces
    * (equal-finite subtraction and integer lanes never produce -0.0).
    *
    * `repTop`: (query_id, __gid, __sim) — the rep-level top-(k+1), self
    * rows INCLUDED. `gm`: [[groupMembership]] output. Returns
    * (query_id, __mid): exactly the uncollapsed candidate set. */
  private[graft] def expandCandidateTopK(repTop: DataFrame, gm: DataFrame,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // covered rows = (k+1)·|queries| — every frame below is bounded by
    // that times the clone factor of the ONE boundary class, never the
    // corpus. Self-membership reads off the group's own id list.
    val counted = repTop
      .join(gm.select(col("__gid"), col("__gn"), col("__mids")), "__gid")
      .withColumn("__cnt", col("__gn") -
        when(array_contains(col("__mids"), col("query_id")), 1L).otherwise(0L))
    val wCum = Window.partitionBy(col("query_id")).orderBy(col("__sim").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val wTie = Window.partitionBy(col("query_id"), col("__sim"))
    val framed = counted
      .withColumn("__cum", sum(col("__cnt")).over(wCum)) // incl. full tie class
      .withColumn("__ccnt", sum(col("__cnt")).over(wTie))
      .withColumn("__before", col("__cum") - col("__ccnt"))
    val full = framed.filter(col("__cum") <= k)
      .select(col("query_id"), explode(col("__mids")).as("__mid"))
      .filter(col("__mid") =!= col("query_id"))
    val wBoundary = Window.partitionBy(col("query_id"), col("__sim"))
      .orderBy(col("__mid"))
    val picked = framed.filter(col("__before") < k && col("__cum") > k)
      .select(col("query_id"), col("__sim"), col("__before"),
        explode(col("__mids")).as("__mid"))
      .filter(col("__mid") =!= col("query_id"))
      .withColumn("__rn", row_number().over(wBoundary))
      .filter(col("__before") + col("__rn") <= k)
      .select(col("query_id"), col("__mid"))
    full.unionByName(picked)
  }

  /** Shared reduction: (query_id, neighbor_id, sim) → best-k per query with
    * rank = position in score-desc/id-asc order (ties identical to
    * `row_number() OVER (ORDER BY sim DESC, neighbor_id)`). */
  private[ann] def topKReduce(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("neighbor_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "nbr")))
      .select(col("query_id"), col("nbr.neighbor_id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"))

  /** Rep-level top-k that KEEPS the score — the [[expandCandidateTopK]]
    * input shape: (query_id, __gid, sim) → (query_id, __gid, __sim),
    * the k best reps per query under the heap's (sim desc, id asc)
    * order. */
  private[graft] def repTopK(repScored: DataFrame, kk: Int): DataFrame =
    repScored.groupBy(col("query_id"))
      .agg(topKByScore(col("sim"), col("__gid"), kk).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.neighbor_id").as("__gid"),
        col("t.sim").as("__sim"))

  /** E1: exact top-k cosine neighbors for each query row.
    * `queries`: (query_id, qvec); `corpus`: (idCol, embCol). embCol
    * goes through [[asDouble]] (a no-op on double input) so this and
    * [[bruteForceTopKCollapsed]] score the identical arithmetic on a
    * float-array corpus too, not just on the pre-cast callers (r16
    * ADVICE — the two paths' doc claim of identical rows held only
    * for double-typed embCol before). */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries), col("query_id") =!= col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosineSim(col("qvec"), asDouble(col(embCol))).as("sim"))
    topKReduce(scored, k)
  }

  /** E1 with the LOSSLESS rep collapse in front (round 16 — the pair-face
    * expansion lesson applied to TOP-K): identical corpus vectors score
    * identically against every query, so the O(Q·N) cosine stage runs
    * over distinct vectors (min-id reps) and the true top-k recovers
    * from the top-(k+1) REPS' memberships. Exact by the heap's own
    * total order (sim desc via java.lang.Double.compare — NaN included
    * — then id asc): if a group's rep is NOT among the top-(k+1) reps,
    * at least k+1 reps strictly precede it, each of which is itself a
    * member preceding every member of that group (higher sim precedes
    * outright; equal sim means the preceding rep's id < this group's
    * min ≤ any member), and at most one of those is the query's own
    * row — so at least k non-self members precede, and no member of
    * the group can be in the top-k. The +1 exists because
    * self-exclusion happens at MEMBER level (the query's own clone
    * group still contributes its other members, exactly as the brute
    * join does). Candidates then re-score (bit-equal: members are
    * byte-identical to their rep) and the final bounded heap re-ranks —
    * identical rows and ranks to [[bruteForceTopK]] on every input. */
  def bruteForceTopKCollapsed(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int,
      gmIndex: Option[DataFrame] = None): DataFrame = {
    val emb = corpus.select(col(idCol), col(embCol))
    // r17: ONE exchange of the vector key builds groups AND memberships
    // (was: groupBy + corpus join-back — two wide exchanges, two
    // checkpoints, the measured sf0.1 collapse premium); registered
    // faces pass a MEMOIZED membership index so repeat query batches
    // skip the exchange entirely (the ANN-index deployment model)
    val gm = gmIndex.getOrElse(groupMembership(emb, idCol, Seq(embCol)))
    val repScored = gm.select(col("__gid"), col(embCol)).crossJoin(broadcast(queries))
      .select(col("query_id"), col("__gid").as("neighbor_id"),
        cosineSim(col("qvec"), asDouble(col(embCol))).as("sim"))
    val cands = topKReduce(repScored, k + 1)
      .join(gm.select(col("__gid"), explode(col("__mids")).as("__mid")),
        col("neighbor_id") === col("__gid"))
      .filter(col("__mid") =!= col("query_id"))
      .select(col("query_id"), col("__mid"))
    val rescored = cands.join(broadcast(queries), Seq("query_id"))
      .join(emb, col("__mid") === col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosineSim(col("qvec"), asDouble(col(embCol))).as("sim"))
    topKReduce(rescored, k)
  }

  /** E7 with the rep collapse (see [[bruteForceTopKCollapsed]]): groups
    * key on (vector, label) so the rep-level label disqualifier is
    * group-exact and still prunes before any cosine; the id exclusion
    * moves to member level with the same k+1 cover. */
  def hardNegativesCollapsed(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, labelCol: String, k: Int,
      gmIndex: Option[DataFrame] = None): DataFrame = {
    val emb = corpus.select(col(idCol), col(embCol), col(labelCol))
    // r17: one exchange of the (vector, label) key (see
    // [[bruteForceTopKCollapsed]]; faces pass the memoized index)
    val gm = gmIndex.getOrElse(groupMembership(emb, idCol, Seq(embCol, labelCol)))
    val repScored = gm.select(col("__gid"), col(embCol), col(labelCol))
      .join(broadcast(queries), col("qlabel") =!= col(labelCol))
      .select(col("query_id"), col("__gid").as("neighbor_id"),
        cosineSim(col("qvec"), asDouble(col(embCol))).as("sim"))
    val cands = topKReduce(repScored, k + 1)
      .join(gm.select(col("__gid"), explode(col("__mids")).as("__mid")),
        col("neighbor_id") === col("__gid"))
      .filter(col("__mid") =!= col("query_id"))
      .select(col("query_id"), col("__mid"))
    val rescored = cands.join(broadcast(queries), Seq("query_id"))
      .join(emb, col("__mid") === col(idCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        cosineSim(col("qvec"), asDouble(col(embCol))).as("sim"))
    topKReduce(rescored, k)
  }

  /** E7: hard-negative mining — for each query vector, the k most
    * SIMILAR vectors of a DIFFERENT label: the contrastive-training
    * counterpart of top-k retrieval (easy negatives are random; hard
    * negatives sit near the decision boundary and are what embedding
    * fine-tuning actually needs). Same scale shape as E1: queries
    * broadcast, corpus streams, per-query bounded-heap aggregate — the
    * label predicate rides the broadcast join condition so disqualified
    * pairs never reach the heap. For query sets too big to broadcast,
    * the E2/E3 bucketed candidate generation composes in front
    * unchanged. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame, idCol: String,
      embCol: String, labelCol: String, k: Int): DataFrame = {
    val scored = corpus
      .join(broadcast(queries),
        col("query_id") =!= col(idCol) && col("qlabel") =!= col(labelCol))
      .select(col("query_id"), col(idCol).as("neighbor_id"),
        // asDouble for float-corpus parity with hardNegativesCollapsed
        // (r16 ADVICE), a no-op on the pre-cast callers
        cosineSim(col("qvec"), asDouble(col(embCol))).as("sim"))
    topKReduce(scored, k)
  }

  /** E7 scale path: hard negatives over an LSH-bucketed corpus — E2's
    * multi-probe candidate generation with the label disqualifier ON
    * THE CANDIDATE JOIN, so same-label candidates drop before any
    * cosine is computed. `bucketed` must carry (idCol, embCol,
    * labelCol, bucket); queries carry (query_id, qvec, qlabel). At
    * cluster scale the bucket is the shuffle key and the query set
    * never needs to broadcast. */
  def hardNegativesLsh(queries: DataFrame, bucketed: DataFrame, idCol: String,
      embCol: String, labelCol: String, k: Int, dims: Int, planes: Int = 8,
      probeBits: Int = 2): DataFrame = {
    val flips = array(probeMasks(planes, probeBits).map(lit): _*)
    val probed = queries
      .withColumn("qbucket", lshBucket(col("qvec"), dims, planes))
      .select(col("query_id"), col("qvec"), col("qlabel"),
        explode(transform(flips, flip => col("qbucket").bitwiseXOR(flip))).as("bucket"))
    val candidates = probed.join(bucketed,
        probed("bucket") === bucketed("bucket") && col("query_id") =!= col(idCol) &&
          col("qlabel") =!= col(labelCol))
      .select(col("query_id"), col("qvec"), col(idCol).as("neighbor_id"), col(embCol))
      .dropDuplicates("query_id", "neighbor_id")
    topKReduce(candidates.select(col("query_id"), col("neighbor_id"),
      cosineSim(asDouble(col("qvec")), asDouble(col(embCol))).as("sim")), k)
  }

  /** D5 exact baseline: ALL pairs with cosine similarity above a
    * threshold. O(N²) with one side broadcast — correct and fast while
    * one side fits in memory (the oracle-checked reference semantics);
    * beyond that use [[nearDupPairsLsh]], which bounds candidates by
    * bucket. */
  def nearDupPairs(corpus: DataFrame, idCol: String, embCol: String, tau: Double): DataFrame = {
    val a = corpus.select(col(idCol).as("id_a"), asDouble(col(embCol)).as("emb_a"))
    val b = corpus.select(col(idCol).as("id_b"), asDouble(col(embCol)).as("emb_b"))
    a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cosineSim(col("emb_a"), col("emb_b")).as("sim"))
      .filter(col("sim") > tau)
      .select(col("id_a"), col("id_b"))
  }

  /** D5 exact pair face with the LOSSLESS rep collapse in front (round
    * 16 — the r15 apply-face collapse generalized to a PAIR face, which
    * needs the inverse step too): identical vectors reduce to their
    * min-id representative, the O(reps²) pair stage runs over reps
    * only, and the full pair matrix is recovered by EXPANDING each rep
    * pair through both groups' memberships. Exact for every τ:
    *
    *  - cross-group pair (x∈A, y∈B), A≠B: cosine is a function of the
    *    two vectors alone, so cos(x,y) = cos(rep_A, rep_B) — the pair
    *    passes iff the rep pair does, and `(least,greatest)` over the
    *    member ids reproduces the id_a<id_b convention exactly once
    *    per unordered pair (one rep pair per unordered group pair).
    *  - within-group pair (x, x'∈A): cos is the SAME self-cosine for
    *    every such pair — evaluated once per group through the very
    *    kernel the brute force runs (nonzero: 1 up to one ulp; zero
    *    vector: 0/0 = NaN, which both engines order above every τ —
    *    the DedupSpec-pinned semantic), never assumed to pass.
    *
    * On a clone-heavy corpus the cosine work shrinks by the squared
    * clone factor while the OUTPUT (quadratic by the face's contract)
    * is regenerated by two id-keyed joins whose cost is the output
    * size itself — at the 100× smoke this took the block from 396s of
    * cosines to pair generation at consume speed. */
  def nearDupPairsCollapsed(corpus: DataFrame, idCol: String, embCol: String,
      tau: Double): DataFrame = {
    val emb = corpus.select(col(idCol), col(embCol))
    // one hash exchange keyed by the vector itself; groups carry the
    // self-cosine verdict so within-group inclusion replays the kernel
    val groups = emb.groupBy(col(embCol))
      .agg(min(col(idCol)).as("__gid"), count(lit(1)).as("__gn"))
      .withColumn("__selfpass",
        cosineSim(asDouble(col(embCol)), asDouble(col(embCol))) > tau)
      .transform(graft.engine.Materialized.checkpoint)
    val members = emb.join(groups, Seq(embCol))
      .select(col("__gid"), col(idCol).as("__mid"))
      .transform(graft.engine.Materialized.checkpoint)
    val reps = groups.select(col("__gid").as(idCol), col(embCol))
    // EXPANSION PARALLELISM: each rep pair fans out |A|×|B| output rows,
    // but the rep-pair frame itself is tiny — AQE coalesces its shuffle
    // to one partition, and a broadcast expansion join inherits that,
    // serializing the (quadratic-by-contract) output generation into a
    // single task. An EXPLICIT-count repartition (exempt from AQE
    // coalescing, unlike the count-less overload) spreads pairs — and
    // with them the generation work — across the cluster; keying by
    // both ids keeps a viral group's pairs from landing on one task.
    val p = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val repPairs = nearDupPairs(reps, idCol, embCol, tau)
      .repartition(p, col("id_a"), col("id_b"))
    val ma = members.select(col("__gid").as("__ga"), col("__mid").as("__xa"))
    val mb = members.select(col("__gid").as("__gb"), col("__mid").as("__xb"))
    val cross = repPairs
      .join(ma, col("id_a") === col("__ga"))
      .join(mb, col("id_b") === col("__gb"))
      .select(least(col("__xa"), col("__xb")).as("id_a"),
        greatest(col("__xa"), col("__xb")).as("id_b"))
    val within = groups.filter(col("__gn") >= 2 && col("__selfpass"))
      .select(col("__gid").as("__g"))
      .repartition(p, col("__g"))
      .join(ma, col("__g") === col("__ga"))
      .join(mb, col("__g") === col("__gb"))
      .filter(col("__xa") < col("__xb"))
      .select(col("__xa").as("id_a"), col("__xb").as("id_b"))
    cross.unionByName(within)
  }

  /** Probe-bucket flips for multi-probe LSH: all XOR masks of hamming
    * weight ≤ probeBits over `planes` bits (probeBits=1 → 1+planes probes;
    * probeBits=2 adds the C(planes,2) two-bit flips). */
  private def probeMasks(planes: Int, probeBits: Int): Seq[Long] = {
    val single = (0 until planes).map(p => 1L << p)
    val double =
      if (probeBits < 2) Seq.empty
      else for {
        p <- 0 until planes; q <- (p + 1) until planes
      } yield (1L << p) | (1L << q)
    0L +: (single ++ double)
  }

  /** D5 scale path: LSH-bucketed near-dup pairs. Both sides bucket
    * map-side; one side additionally probes every flipped bucket within
    * `probeBits` hamming; the join keys on bucket equality (a shuffle of
    * (id, bucket, emb) rows, never N² pairs). Approximate: recall follows
    * the hyperplane collision probability 1 - angle/pi per plane — high
    * for genuinely near-duplicate vectors.
    *
    * Size `planes` ≈ log2(corpus / target-bucket-size): too few planes puts
    * the whole corpus in a handful of buckets and the join degenerates
    * toward all-pairs. `maxBucketSize` is the backstop for hot buckets
    * (clone embeddings, zero vectors): members above the cap connect as
    * star pairs to the bucket's min id (still τ-verified), the same
    * degrade as [[graft.dedup.Buckets.cappedSelfJoin]]. The hot bucket's
    * canonical additionally stays joinable on the BASE side, so a
    * small-bucket member probing into an over-cap bucket still reaches
    * that cluster through its canonical (one extra base row per hot
    * bucket — never the B² the full membership would cost); pair-level
    * recall within ±probeBits of a hot bucket remains partial by design. */
  def nearDupPairsLsh(corpus: DataFrame, idCol: String, embCol: String,
      tau: Double, dims: Int, planes: Int = 8, probeBits: Int = 1,
      maxBucketSize: Int = 10000): DataFrame = {
    val bucketed = corpus.select(col(idCol), asDouble(col(embCol)).as("__emb"),
      lshBucket(asDouble(col(embCol)), dims, planes).as("__bucket"))
    // same stats-aggregate shape as Buckets.cappedSelfJoin (a window here
    // measured far slower downstream on clone-heavy corpora)
    val stats = bucketed.groupBy(col("__bucket"))
      .agg(count(lit(1)).as("__n"), min(col(idCol)).as("__min_id"))
    // MATERIALIZED once (localCheckpoint — lineage-truncating, cleaned
    // when unreferenced): five plan branches read this frame (probe
    // side, base side, star filter, canonical lookups), and each would
    // otherwise recompute the signature dot-products AND the stats
    // aggregate+join — measured 2.2–2.5s → ~1s warm at sf0.1 for the
    // two registered LSH faces. Same fix as ImageDedup.nearDupPairs.
    val sized = bucketed.join(stats, "__bucket").transform(graft.engine.Materialized.checkpoint)
    val small = sized.filter(col("__n") <= maxBucketSize)

    // candidate stages carry IDS AND BUCKETS ONLY — the embedding joins
    // back at verify time. The previous shape exploded the full vector
    // through every probe flip, so the probe exchange carried
    // (1+planes)× the corpus's embedding mass and the base side another
    // 1× (measured as the r15 bench-tail allocation churn on this
    // face); the candidate legs are now (id, bucket) longs — ~16 bytes
    // per probe row instead of the 64-double payload — and the verify
    // join-back reads the checkpointed bucketed frame twice (2× corpus
    // embedding mass total, down from 10×, and only candidate PAIRS
    // allocate wide rows).
    val flips = array(probeMasks(planes, probeBits).map(lit): _*)
    val probing = small.select(col(idCol).as("id_a"),
      explode(transform(flips, f => col("__bucket").bitwiseXOR(f))).as("__bucket"))
    val base = small.select(col("__bucket").as("__bucket_b"), col(idCol).as("id_b"))
    val cliquePairs = probing.join(base,
        col("__bucket") === col("__bucket_b") && col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))

    // hot buckets: each member pairs with the bucket canonical only
    // (B-1 rows instead of B²)
    val starPairs = sized.filter(col("__n") > maxBucketSize)
      .filter(col(idCol) =!= col("__min_id"))
      .select(col("__min_id").as("id_a"), col(idCol).as("id_b"))

    // cross-bucket bridge: small-bucket rows probing INTO an over-cap
    // bucket still meet its canonical (the full membership would be the
    // quadratic blowup the cap exists to stop). Ids normalize via
    // least/greatest — the canonical never probes, so the id order is
    // arbitrary here; the verify join-back keys on the actual ids.
    val hotCanonBase = sized
      .filter(col("__n") > maxBucketSize && col(idCol) === col("__min_id"))
      .select(col("__bucket").as("__bucket_c"), col(idCol).as("id_c"))
    val bridgePairs = probing.join(hotCanonBase,
        col("__bucket") === col("__bucket_c") && col("id_a") =!= col("id_c"))
      .select(least(col("id_a"), col("id_c")).as("id_a"),
        greatest(col("id_a"), col("id_c")).as("id_b"))

    val candidates = cliquePairs.unionAll(starPairs).unionAll(bridgePairs)
      .dropDuplicates("id_a", "id_b")
    candidates
      .join(sized.select(col(idCol).as("id_a"), col("__emb").as("emb_a")), "id_a")
      .join(sized.select(col(idCol).as("id_b"), col("__emb").as("emb_b")), "id_b")
      .select(col("id_a"), col("id_b"), cosineSim(col("emb_a"), col("emb_b")).as("sim"))
      .filter(col("sim") > tau)
      .select(col("id_a"), col("id_b"))
  }

  /** Random-hyperplane LSH bucket signature: one bit per plane = sign of
    * the dot product with a fixed pseudo-random plane (fused custom
    * codegen expression — graft.functions.expressions.LshBucket). */
  def lshBucket(emb: Column, dims: Int, planes: Int): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(graft.functions.expressions.LshBucket(
      ColumnBridge.expression(emb), dims, planes))
  }

  /** The reusable LSH "index": the corpus with its bucket signature — one
    * map-side pass. At scale this is built once (and persisted / written
    * as a table) and shared across every query batch; the per-batch cost
    * is then only probe + join + top-k. */
  def bucketCorpus(corpus: DataFrame, idCol: String, embCol: String,
      dims: Int, planes: Int): DataFrame =
    corpus.select(col(idCol), col(embCol),
      lshBucket(col(embCol), dims, planes).as("bucket"))

  /** G20: the EMBEDDING-domain arrival-time near-dup gate — closes the
    * G8 modality grid (text simhash, image dHash, audio envelope hash
    * all stream-probe a static banded index; embeddings now do too).
    * The corpus buckets ONCE ([[bucketCorpus]] — persist/compact it
    * like any index); each arriving vector buckets map-side, XOR-flips
    * its precomputed bucket through every probe mask (a stateless
    * projection + explode, streaming-legal), equi-joins the static
    * index on bucket, and cosine-verifies the joined rows — the exact
    * candidate+verify shape of [[nearDupPairsLsh]] with the probe side
    * a stream. Emits one row per (arriving id, corpus id, sim) above
    * `tau`; no duplicate suppression is needed because a corpus vector
    * lives in exactly one bucket and each probe mask targets a distinct
    * bucket, so a pair can match through at most one probe. The stream
    * side shuffles only (id, bucket, emb) lanes; recall follows the
    * multi-probe hyperplane collision bound, as in the batch face. */
  def nearDupFlags(index: DataFrame, arriving: DataFrame, idCol: String,
      embCol: String, tau: Double, dims: Int, planes: Int = 8,
      probeBits: Int = 1): DataFrame = {
    val flips = array(probeMasks(planes, probeBits).map(lit): _*)
    val probing = arriving
      .select(col(idCol), asDouble(col(embCol)).as("__pemb"),
        lshBucket(asDouble(col(embCol)), dims, planes).as("__b"))
      .select(col(idCol), col("__pemb"),
        explode(transform(flips, f => col("__b").bitwiseXOR(f))).as("bucket"))
    probing.join(
        index.select(col("bucket"), col(idCol).as("corpus_id"),
          asDouble(col(embCol)).as("__cemb")),
        Seq("bucket"))
      .select(col(idCol), col("corpus_id"),
        cosineSim(col("__pemb"), col("__cemb")).as("sim"))
      .filter(col("sim") > tau)
  }

  /** E2: LSH-bucketed approximate top-k. Queries probe their own bucket
    * plus every flipped bucket within `probeBits` hamming (multi-probe →
    * recall). The query bucket is computed ONCE, then the probe set is
    * built by XOR-flipping the precomputed value. The per-query top-k is
    * the same bounded-heap aggregate as E1. */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
      idCol: String, embCol: String, k: Int, dims: Int, planes: Int = 8,
      probeBits: Int = 2): DataFrame =
    lshTopKBucketed(queries, bucketCorpus(corpus, idCol, embCol, dims, planes),
      idCol, embCol, k, dims, planes, probeBits)

  /** [[lshTopK]] over a pre-built [[bucketCorpus]] index. */
  def lshTopKBucketed(queries: DataFrame, bucketed: DataFrame,
      idCol: String, embCol: String, k: Int, dims: Int, planes: Int = 8,
      probeBits: Int = 2): DataFrame = {
    val flips = array(probeMasks(planes, probeBits).map(lit): _*)
    val probed = queries
      .withColumn("qbucket", lshBucket(col("qvec"), dims, planes))
      .select(col("query_id"), col("qvec"),
        explode(transform(flips, flip => col("qbucket").bitwiseXOR(flip))).as("bucket"))
    // a neighbor can surface from several probe buckets — dedupe the
    // candidate PAIRS before scoring so cosine runs once per pair
    val candidates = probed.join(bucketed,
        probed("bucket") === bucketed("bucket") && col("query_id") =!= col(idCol))
      .select(col("query_id"), col("qvec"), col(idCol).as("neighbor_id"), col(embCol))
      .dropDuplicates("query_id", "neighbor_id")
    val scored = candidates
      .select(col("query_id"), col("neighbor_id"),
        cosineSim(asDouble(col("qvec")), asDouble(col(embCol))).as("sim"))
    topKReduce(scored, k)
  }
}
