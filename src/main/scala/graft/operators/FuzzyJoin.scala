package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join (fuzzy entity matching) over a string
  * key column — the candidate-pair generator of a dedup / entity-resolution
  * pipeline (cf. the reference's exact-match joins; approximate matching is
  * the standard extension a curation pipeline needs for typo'd names).
  *
  * Semantics: over the DISTINCT values of `nameCol`, emit every unordered
  * pair (a < b) with 1 <= levenshtein(a, b) <= k, plus each name's row
  * count. Exactly brute-force-equivalent — the q-gram machinery below is a
  * LOSSLESS prune, so a DuckDB oracle can verify with a plain all-pairs
  * `levenshtein` join over the distinct names.
  *
  * Scale shape (the whole point — never O(rows²), never O(names²)):
  *   1. one shuffle collapses rows to the distinct-name frame (at 100 TB
  *      the name domain, not the row count, is what pair generation sees);
  *   2. positional q-gram explode → equality self-join on (gram, occ) →
  *      count — the multiset-intersection count filter of Gravano et al.
  *      2001 ("Approximate String Joins in a Database (Almost) for Free",
  *      VLDB): an edit op destroys at most q q-grams, so a pair within
  *      distance k shares >= max(|a|,|b|) - q + 1 - k*q positional grams.
  *      Occurrence-numbering the grams ((gram, 1st), (gram, 2nd), ...)
  *      makes the equality join count exactly sum_g min(cnt_a, cnt_b) —
  *      the MULTISET intersection the bound needs (set-distinct grams
  *      would under-count "aaaa"-style strings and break losslessness);
  *   3. exact `levenshtein` only on surviving candidates (integer result —
  *      bitwise cross-engine);
  *   4. names short enough that the bound is vacuous (len <= k*q + q - 1,
  *      where a pair can be within k while sharing ZERO grams) fall back to
  *      a length-banded self-join of the short-name subset only — a domain
  *      bounded by alphabet^len, broadcast-sized by construction.
  *
  * Every shuffle keys on the name, a (gram, occ) token, or the pair; the
  * only quadratic term is short×short over the inherently tiny short-name
  * domain. Skewed grams (an ultra-common bigram) fan out as that gram's
  * posting-list square — `maxGramFreq` drops grams whose posting list
  * exceeds the cap, which stays lossless as long as the count threshold is
  * still reachable from the remaining grams; the default Long.MaxValue
  * keeps the operator exact (the registered query's 64-name domain needs
  * no cap; a 100 TB run would set it and accept the documented recall
  * trade, mirroring dedup_jaccard's maxDocFreq knob).
  */
object FuzzyJoin {

  /** The distinct-name rollup, pre-checkpoint — exposed so PushdownSpec
    * can pin the source scan at exactly the name column (the operator's
    * lazy checkpoint hides it behind a Scan ExistingRDD). */
  private[graft] def distinctNames(df: DataFrame, nameCol: String): DataFrame =
    df.select(col(nameCol).as("name"))
      .groupBy("name").agg(count(lit(1)).as("n"))
      .withColumn("len", length(col("name")).cast("bigint"))

  /** Distinct-name fuzzy pairs: (name_a, name_b, dist, n_a, n_b). */
  def namePairs(df: DataFrame, nameCol: String, k: Int = 2, q: Int = 2,
                maxGramFreq: Long = Long.MaxValue): DataFrame = {
    require(k >= 1 && q >= 2, s"fuzzy join needs k>=1, q>=2 (got k=$k q=$q)")
    val shortLen = k * q + q - 1 // bound max(|a|,|b|) - q + 1 - k*q <= 0
    val names = distinctNames(df, nameCol).localCheckpoint(eager = false)

    // Row-local positional q-grams with multiset occurrence numbers:
    // occ(i) = |{j <= i : gram(j) = gram(i)}|. Staged through one array
    // column so the O(len) gram extraction isn't re-run per occurrence
    // check (the interpreted-HOF re-evaluation hazard text_winnow hit);
    // the occurrence scan itself is O(len^2) row-local on a name, fine.
    val grams = names
      // names shorter than q have no grams AND are <= shortLen (q <= k*q +
      // q - 1 for k >= 1), so the banded short path owns them; excluding
      // them here also keeps sequence() ascending.
      .filter(col("len") >= q.toLong)
      .withColumn("_gs", expr(s"transform(sequence(0, len - $q), i -> substring(name, i + 1, $q))"))
      .select(col("name"), col("len"),
        explode(expr(
          "transform(sequence(1, size(_gs)), i -> " +
            "struct(element_at(_gs, i) AS g, " +
            "size(filter(slice(_gs, 1, i), x -> x = element_at(_gs, i))) AS occ))"))
          .as("t"))
      .select(col("name"), col("len"), col("t.g").as("g"), col("t.occ").as("occ"))
    val pruned =
      if (maxGramFreq == Long.MaxValue) grams
      else {
        val freq = grams.groupBy("g", "occ").agg(count(lit(1)).as("_f"))
          .filter(col("_f") <= maxGramFreq).select("g", "occ")
        grams.join(freq, Seq("g", "occ"))
      }

    val a = pruned.select(col("name").as("name_a"), col("len").as("la"),
      col("g"), col("occ"))
    val b = pruned.select(col("name").as("name_b"), col("len").as("lb"),
      col("g"), col("occ"))
    val longPairs = a.join(b, Seq("g", "occ"))
      .filter(col("name_a") < col("name_b") &&
        abs(col("la") - col("lb")) <= k &&
        greatest(col("la"), col("lb")) > shortLen)
      .groupBy("name_a", "name_b", "la", "lb")
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= greatest(col("la"), col("lb")) - (q - 1) - k.toLong * q)
      .select("name_a", "name_b")

    // Both-short pairs: the count bound is vacuous, so the gram join may
    // legitimately never see them — banded self-join over the short subset.
    val short = names.filter(col("len") <= shortLen)
      .select(col("name"), col("len"))
    val shortPairs = short.select(col("name").as("name_a"), col("len").as("la"))
      .join(short.select(col("name").as("name_b"), col("len").as("lb")),
        col("name_a") < col("name_b") && abs(col("la") - col("lb")) <= k)
      .select("name_a", "name_b")

    val counts = names.select(col("name"), col("n"))
    longPairs.union(shortPairs)
      // graft_lev_bounded = min(levenshtein, k+1) via the O(k·n) Ukkonen
      // band with per-row early exit — identical to full levenshtein on
      // every surviving pair (dist <= k), ~n/k cheaper on the rejects
      .withColumn("dist",
        call_function("graft_lev_bounded", col("name_a"), col("name_b"), lit(k))
          .cast("bigint"))
      .filter(col("dist") >= 1 && col("dist") <= k)
      .join(counts.withColumnRenamed("name", "name_a").withColumnRenamed("n", "n_a"), "name_a")
      .join(counts.withColumnRenamed("name", "name_b").withColumnRenamed("n", "n_b"), "name_b")
      .select("name_a", "name_b", "dist", "n_a", "n_b")
  }
}
