package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SimHash near-duplicate detection.
  *
  * 64-bit SimHash: for each bit j, sum +1/−1 over the tokens' xxhash64 bit j;
  * the sign of the sum is bit j of the fingerprint. Documents within hamming
  * distance `maxHamming` are near-dups.
  *
  * Candidate generation uses the pigeonhole trick: split the 64-bit
  * fingerprint into `maxHamming + 1` chunks — two fingerprints within the
  * hamming budget must agree on at least one chunk, so an equality join per
  * chunk finds every candidate with shuffles only on chunk keys.
  */
object SimHash {

  /** 64-bit simhash over a column of PRE-HASHED tokens (array<bigint>),
    * via the native [[graft.functions.SimHash64Expr]] — one generated
    * bit-vote loop per row, no per-bit fold expressions. */
  def simhashFromHashes(hashed: Column): Column =
    call_function("graft_simhash64", hashed)

  /** 64-bit simhash of a token array column. */
  def simhash64(tokens: Column, seed: Long): Column =
    simhashFromHashes(transform(tokens, t => xxhash64(lit(seed), t)))

  /** Corpus-adaptive hamming budget: the largest `maxHamming ≤ cap` whose
    * pigeonhole chunk width `64 / (maxHamming + 1)` still gives every
    * chunk at least `n / targetOccupancy` buckets.
    *
    * The scale law this encodes (docs/SCALE_BOUNDS.md): the pair join is
    * Σ_bucket occupancy² per chunk, and the chunk width is FIXED by the
    * hamming budget — at maxHamming=7 there are only 2⁸ buckets per chunk
    * forever, so occupancy (and the join) grows linearly with corpus rows
    * and the operator bends super-linear (the measured 17.5× fourth-decade
    * ratio). Deriving the budget from `n` holds expected occupancy at
    * `targetOccupancy` instead: ~2ⁿ corpus growth costs one hamming step.
    * The trade is RECALL SEMANTICS, not correctness: pairs up to the
    * derived budget are still found EXACTLY (the pigeonhole guarantee
    * holds at every width); pairs between the derived budget and `cap`
    * are no longer reported. The recall cost is measured per decade in
    * docs/GEOMETRY_RECALL.json rather than asserted — 0.061 at sf1,
    * which is why the registered faces now route to the permuted-mask
    * tier instead ([[pairsFromFingerprintsAdaptive]]); this budget
    * remains only as the measured knob-curve reference
    * (dedup_simhash_h3) and for callers that truly want a narrower
    * EXACT radius.
    *
    * Floor: maxHamming=1 (32-bit chunks, 4·10⁹ buckets — enough for any
    * corpus this side of a resharding). Takes `n` as a PARAMETER so the
    * library builds no eager count into a caller's plan; faces pass a
    * (metadata-cheap) parquet count. */
  def adaptiveMaxHamming(n: Long, cap: Int = 7,
                         targetOccupancy: Long = 32L): Int = {
    require(cap >= 1 && cap <= 63, s"cap must be in [1, 63], got $cap")
    require(targetOccupancy >= 1, s"targetOccupancy must be >= 1")
    val neededBits = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOccupancy)) / math.log(2.0)).toInt
    (cap to 2 by -1).find(h => 64 / (h + 1) >= neededBits).getOrElse(1)
  }

  /** Near-dup pairs (id_a, id_b, hamming ≤ maxHamming). `d` widens the
    * pigeonhole to block combinations ([[pairsFromFingerprintsBlocked]])
    * — same result set at every d (exact recall at the radius), more
    * buckets per combinatorial step; derive it from corpus cardinality
    * with [[adaptiveBlocks]] for growing corpora. */
  def pairs(df: DataFrame, idCol: String, textCol: String,
            maxHamming: Int = 3, seed: Long = 42L, d: Int = 1): DataFrame = {
    val fp = df
      .select(col(idCol).as("id"),
        transform(split(col(textCol), " "), t => xxhash64(lit(seed), t)).as("_th"))
      .select(col("id"), simhashFromHashes(col("_th")).as("fp"))
    pairsFromFingerprintsBlocked(fp, "id", "fp", maxHamming, d)
  }

  /** The pigeonhole candidate join over an EXISTING 64-bit fingerprint
    * column — shared by the text simhash face and any other 64-bit
    * locality hash (e.g. the multimodal perceptual hash): fingerprints
    * within the hamming budget must agree on one of maxHamming+1 chunks,
    * so equality joins on chunk keys find every candidate. Equivalent to
    * [[pairsFromFingerprintsBlocked]] at `d = 1`. */
  def pairsFromFingerprints(df: DataFrame, idCol: String, fpCol: String,
                            maxHamming: Int): DataFrame =
    pairsFromFingerprintsBlocked(df, idCol, fpCol, maxHamming, d = 1)

  /** GENERALIZED pigeonhole candidate join (the block-combination scheme
    * of Manku–Jain–Sarma, WWW'07 §3, as relational dataflow): split the
    * 64-bit fingerprint into `k = maxHamming + d` blocks and key each of
    * the C(k, d) combinations of `d` blocks. ≤ `maxHamming` bit errors
    * corrupt at most `maxHamming` blocks, leaving ≥ d blocks clean, so
    * SOME combination's key matches exactly — recall at the full radius
    * is EXACT at every d, like the classic d=1 chunk join, but the key
    * carries d·(64/k) bits instead of 64/(maxHamming+1): one step of d
    * multiplies the bucket count by ~2^(64/k) while the per-doc row
    * explode grows only C(k, d). This is what keeps the FULL hamming
    * radius affordable as the corpus grows (d=1's bucket count is frozen
    * by the radius — the measured super-linear bend); derive d from
    * corpus cardinality with [[adaptiveBlocks]]. Shuffles key on
    * (combination, key) only; candidate pairs dedup after the
    * hamming-filter, exactly the d=1 plan shape. */
  def pairsFromFingerprintsBlocked(df: DataFrame, idCol: String, fpCol: String,
                                   maxHamming: Int, d: Int): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming")
    require(d >= 1, s"d must be >= 1, got $d")
    val k = maxHamming + d
    require(k <= 64, s"maxHamming + d must be <= 64, got $k")
    pairsViaGroupKeys(df, idCol, fpCol, maxHamming, blockedKeyStructs(maxHamming, d))
  }

  /** The (comb, ckey) banding structs of the block-combination pigeonhole
    * — exposed so the persisted [[FingerprintIndex]] keys probe batches
    * IDENTICALLY to the corpus rows they join against. */
  def blockedKeyStructs(maxHamming: Int, d: Int): Seq[Column] = {
    val k = maxHamming + d
    val bitsPer = 64 / k
    // 1L << 64 wraps to 1: the k=1 single-block case must key on the
    // WHOLE fingerprint, not collapse every doc into bucket 0 (results
    // would still verify, but through one all-pairs bucket)
    val blockMask = if (bitsPer >= 64) -1L else (1L << bitsPer) - 1
    // one (comb, ckey) struct per combination, exploded — C(k, d) narrow
    // rows per DISTINCT fingerprint (d=1 ⇒ the classic k chunk rows)
    val combos = (0 until k).combinations(d).toSeq
    combos.zipWithIndex.map { case (blocks, ci) =>
      val key = blocks.zipWithIndex.map { case (b, j) =>
        shiftleft(shiftright(col("fp"), b * bitsPer).bitwiseAND(blockMask),
          j * bitsPer)
      }.reduce(_ bitwiseOR _)
      struct(lit(ci).as("comb"), key.as("ckey"))
    }
  }

  /** The shared candidate-join tail of every fingerprint banding scheme
    * (block-combination pigeonhole, permuted-mask tables): collapse to
    * DISTINCT fingerprints, key each with the caller's (comb, ckey)
    * structs, bucket-join, hamming-filter INSIDE the join stage, dedup
    * fingerprint pairs, then re-expand to member id pairs. */
  private def pairsViaGroupKeys(df: DataFrame, idCol: String, fpCol: String,
                                maxHamming: Int,
                                keyStructs: Seq[Column]): DataFrame = {
    // the (id, fp) frame feeds the distinct-fp candidate join AND both
    // expansion joins — lazy-checkpoint so the fingerprint computation
    // (often a full tokenize+hash scan upstream) runs once
    val fp = df.select(col(idCol).as("id"), col(fpCol).as("fp"))
      .localCheckpoint(eager = false)
    // COLLAPSE IDENTICAL FINGERPRINTS FIRST: near-dup corpora hold large
    // exact-fingerprint groups (verbatim copies hash identically), and a
    // group of m docs would otherwise push m·keys keyed rows and m²
    // candidate rows per key through the join and the pair-dedup —
    // keyStructs.size× the true-pair volume in pure overhead. Running the
    // banding over DISTINCT fingerprints keeps the join + dedup at
    // distinct-fp scale; member pairs re-expand afterwards, emitting each
    // output pair EXACTLY ONCE (fp pairs are unique after their dedup,
    // within-group pairs are generated by one ordered self-join), so no
    // corpus-sized dropDuplicates exists anywhere in the plan.
    val groups = fp.select("fp").distinct()
    val keyed = groups.select(col("fp"),
        explode(array(keyStructs: _*)).as("_ck"))
      .select(col("fp"), col("_ck.comb").as("comb"), col("_ck.ckey").as("ckey"))
    val left = keyed.select(col("comb"), col("ckey"), col("fp").as("fp_a"))
    val right = keyed.select(col("comb"), col("ckey"), col("fp").as("fp_b"))
    // Bucket-join discipline, measured at the fourth decade (50k docs,
    // d=2, docs/SCALING.json): simhash bits are CORRELATED (common tokens
    // vote the same way in every document), so block keys are heavily
    // skewed — Σ occupancy² is ~26× the uniform-key estimate (70M
    // candidate enumerations from 50k distinct fps; hottest 14-bit bucket
    // 1,486 fps). Two consequences are encoded here:
    // 1. SHUFFLE-HASH join, not sort-merge: SMJ's buffered per-key-group
    //    iteration pays ~300ns per enumerated pair on duplicate-heavy
    //    keys (measured 19.3s for the raw enumeration); the per-partition
    //    hashmap streams the same 70M pairs through whole-stage codegen
    //    in 1.5s. The build side is the narrow 24-byte keyed frame,
    //    hashmap = build_rows/partitions per task — bounded by the same
    //    geometry that bounds the join itself; drop the hint only if a
    //    partition's build side ever outgrows executor memory (SMJ spills,
    //    13× slower here).
    // 2. HAMMING-FILTER BEFORE THE PAIR DEDUP: the popcount filter is a
    //    codegen projection inside the join stage — no exchange — so the
    //    dropDuplicates shuffle carries only true-radius pairs × their
    //    combination multiplicity (7.7M rows), not the 70M skewed
    //    collision volume. Results bitwise-identical (dedup of identical
    //    (fp_a, fp_b, hamming) rows commutes with the filter).
    // Together: candidate stage 24.6s → 2.5s, face 20.5× → ~linear decade.
    val fpPairs = left.join(right.hint("shuffle_hash"), Seq("comb", "ckey"))
      .filter(col("fp_a") < col("fp_b"))
      .withColumn("hamming",
        bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("fp_a"), col("fp_b"), col("hamming"))
      .dropDuplicates("fp_a", "fp_b")
    // cross-group expansion: every member pairing of a qualifying
    // fingerprint pair is a true output pair (canonicalized by id — the
    // fp order is not the id order)
    val cross = fpPairs
      .join(fp.select(col("fp").as("fp_a"), col("id").as("_ia")), Seq("fp_a"))
      .join(fp.select(col("fp").as("fp_b"), col("id").as("_ib")), Seq("fp_b"))
      .select(least(col("_ia"), col("_ib")).as("id_a"),
        greatest(col("_ia"), col("_ib")).as("id_b"), col("hamming"))
    // within-group pairs: identical fingerprints are hamming-0 near-dups
    // (reported at every budget, like the pre-collapse join did)
    val within = fp.select(col("fp"), col("id").as("id_a"))
      .join(fp.select(col("fp"), col("id").as("id_b")), Seq("fp"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        lit(0).cast("integer").as("hamming"))
    cross.unionByName(within)
  }

  /** Corpus-adaptive block-combination width for
    * [[pairsFromFingerprintsBlocked]]: the smallest `d ≤ maxD` whose key
    * width `d·(64/(maxHamming+d))` yields at least `n / targetOccupancy`
    * buckets — i.e. holds expected bucket occupancy (and with it the
    * Σ occupancy² bucket-local pair join) flat as the corpus grows,
    * WITHOUT narrowing the hamming radius: recall stays exact at every d.
    * d=1 up to targetOccupancy·2^(64/(h+1)) rows (the legacy geometry,
    * bitwise-identical pairs), then one combinatorial step per ~2^7
    * growth. Costs: per-doc explode C(h+d, d) (8 → 36 → 120 rows at
    * h=7), saturating at `maxD` — key width tops out near 64·d/(h+d)
    * bits, so past ~targetOccupancy·2^(3·64/(h+3)) rows (≈ 8M docs at
    * h=7, occ=32) occupancy grows linearly again; beyond that the faces
    * ROUTE to the permuted-mask tier ([[pairsFromFingerprintsAdaptive]],
    * measured recall 0.947–0.965 under forced saturation) — the old
    * radius narrowing ([[adaptiveMaxHamming]], measured recall 0.061)
    * is superseded and kept only as the knob-curve reference. */
  def adaptiveBlocks(n: Long, maxHamming: Int = 7,
                     targetOccupancy: Long = 32L, maxD: Int = 3): Int = {
    require(maxHamming >= 1 && maxD >= 1)
    val neededBits = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOccupancy)) / math.log(2.0)).toInt
    (1 to maxD).find { d =>
      val bitsPer = 64 / (maxHamming + d)
      bitsPer >= 1 && d * bitsPer >= neededBits
    }.getOrElse(maxD)
  }

  /** TRUE when [[adaptiveBlocks]] has SATURATED for this corpus: even
    * d = maxD's key width (d·(64/(maxHamming+d)) bits) cannot supply
    * `n / targetOccupancy` buckets, so occupancy — and the Σ occupancy²
    * bucket join — grows linearly again (the measured super-linear
    * regime past ~8M docs at h=7, occ=32, maxD=3). The routing predicate
    * for [[pairsFromFingerprintsAdaptive]]: below it the exact
    * block-combination pigeonhole; above it the permuted-mask tables
    * ([[pairsFromFingerprintsPermuted]]), which keep the key width
    * growing with the corpus at a MEASURED probabilistic recall instead
    * of the radius-truncation fallback's measured 0.061. */
  def blockedSaturated(n: Long, maxHamming: Int = 7,
                       targetOccupancy: Long = 32L, maxD: Int = 3): Boolean = {
    val neededBits = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOccupancy)) / math.log(2.0)).toInt
    val d = adaptiveBlocks(n, maxHamming, targetOccupancy, maxD)
    d * (64 / (maxHamming + d)) < neededBits
  }

  /** Collision probability of ONE random `maskBits`-bit mask for a pair at
    * hamming distance exactly `hamming`: the pair collides iff none of the
    * differing bits is masked — C(64−h, w)/C(64, w) as a telescoping
    * product. Monotone decreasing in both arguments; 0 when w > 64−h. */
  def maskCollisionP(maskBits: Int, hamming: Int): Double =
    if (maskBits > 64 - hamming) 0.0
    else (0 until maskBits).map(i => (64.0 - hamming - i) / (64.0 - i)).product

  /** Geometry of the PERMUTED-MASK banding tier ([[pairsFromFingerprintsPermuted]])
    * — the saturated-regime replacement for the exact pigeonhole (Manku–
    * Jain–Sarma WWW'07 §4's permuted tables, keyed as random bit-subset
    * masks: equality of `fp AND mask` IS equality on the mask's w sampled
    * positions, one codegen AND per table instead of a bit-gather).
    * Returns (maskBits, tables):
    *   - maskBits starts at the occupancy-flat width ceil(log2(n/occ)) —
    *     UNBOUNDED by the radius, unlike the pigeonhole's d·(64/(h+d)) —
    *     so bucket occupancy stays at targetOccupancy at ANY corpus size;
    *   - tables is the LSH table count that compounds the per-table
    *     worst-case collision probability p = C(64−h,w)/C(64,w) to the
    *     recall target: t = ⌈ln(1−R)/ln(1−p)⌉. Pairs closer than the full
    *     radius collide MORE often, so R is the floor over the radius.
    *   - recall-first trade: if t would exceed maxTables, the mask NARROWS
    *     until the table budget affords R — occupancy (join cost) gives
    *     way before recall does, and the give-back is logged in the
    *     returned width, never silent.
    * Growth law: p ≈ ((64−h)/64)^w, so t ≈ ln(1/(1−R))·(64/(64−h))^w —
    * polynomial in n (t ∝ n^(h/64·log₂e·…) ≈ n^0.17 at h=7, occ=32): ~21
    * tables at 8M docs; at 1B the occupancy width would need 66 tables,
    * so the mask narrows 2 bits (4× occupancy) to 63 tables at the same
    * recall. That is the honest price of holding
    * BOTH occupancy and recall at mandate scale; the exact pigeonhole
    * holds recall=1 but not occupancy, the radius truncation holds
    * occupancy but measured at recall 0.061. Measured under forced
    * saturation per decade in docs/GEOMETRY_RECALL.json. */
  def permutedGeometry(n: Long, maxHamming: Int = 7,
                       targetOccupancy: Long = 32L,
                       targetRecall: Double = 0.9,
                       maxTables: Int = 64): (Int, Int) = {
    require(maxHamming >= 1 && maxHamming <= 56, s"maxHamming in [1,56], got $maxHamming")
    require(targetRecall > 0.0 && targetRecall < 1.0, s"targetRecall in (0,1)")
    require(maxTables >= 1 && targetOccupancy >= 1)
    def tablesFor(w: Int): Long = {
      val p = maskCollisionP(w, maxHamming)
      if (p <= 0.0) Long.MaxValue
      else math.max(1L,
        math.ceil(math.log(1.0 - targetRecall) / math.log(1.0 - p)).toLong)
    }
    val wanted = math.ceil(
      math.log(math.max(1.0, n.toDouble / targetOccupancy)) / math.log(2.0)).toInt
    // the table budget is NEVER silently exceeded: if even the 1-bit mask
    // can't compound to targetRecall within maxTables (extreme recall targets
    // at wide radii), fail loudly — the caller chooses which side gives way
    // (raise maxTables or lower targetRecall), not this function. Each
    // candidate width must also admit `tables` DISTINCT masks
    // ([[permutedMasks]] rejects duplicates): t ≤ C(64, w).
    val w = (math.min(math.max(1, wanted), 64 - maxHamming) to 1 by -1)
      .find(w => tablesFor(w) <= math.min(maxTables.toLong, distinctMaskCapacity(w)))
      .getOrElse(throw new IllegalArgumentException(
        s"permutedGeometry: even a 1-bit mask needs ${tablesFor(1)} tables to " +
          s"reach recall=$targetRecall at maxHamming=$maxHamming, exceeding " +
          s"maxTables=$maxTables — raise maxTables or lower targetRecall"))
    (w, tablesFor(w).toInt)
  }

  /** Number of distinct w-bit masks over 64 positions — C(64, w), capped at
    * Int.MaxValue (exact integral recurrence; the cap guard keeps every
    * intermediate product well inside Long). */
  def distinctMaskCapacity(maskBits: Int): Long = {
    var c = 1L
    var i = 0
    while (i < maskBits && c < Int.MaxValue) { c = c * (64 - i) / (i + 1); i += 1 }
    math.min(c, Int.MaxValue.toLong)
  }

  /** `tables` deterministic DISTINCT w-bit masks (w distinct positions of
    * 0..63, Fisher–Yates over a fixed-seed java.util.Random — identical on
    * every executor and every run). Duplicate draws are rejected and redrawn:
    * a repeated mask would silently shrink the EFFECTIVE table count below
    * what [[permutedGeometry]]'s recall compounding assumed. Requires
    * tables ≤ C(64, w) so the rejection loop terminates. */
  def permutedMasks(maskBits: Int, tables: Int, seed: Long = 0x517EC0DEL): Array[Long] = {
    require(maskBits >= 1 && maskBits <= 64 && tables >= 1)
    require(tables <= distinctMaskCapacity(maskBits),
      s"$tables distinct $maskBits-bit masks requested but only " +
        s"${distinctMaskCapacity(maskBits)} exist")
    val rnd = new java.util.Random(seed)
    val seen = scala.collection.mutable.HashSet.empty[Long]
    val out = new Array[Long](tables)
    var k = 0
    while (k < tables) {
      val pos = (0 until 64).toArray
      var m = 0L
      for (i <- 0 until maskBits) {
        val j = i + rnd.nextInt(64 - i)
        val t = pos(i); pos(i) = pos(j); pos(j) = t
        m |= 1L << pos(i)
      }
      if (seen.add(m)) { out(k) = m; k += 1 } // duplicate: redraw
    }
    out
  }

  /** PERMUTED-MASK near-dup candidate join — the saturated-regime tier:
    * each of `tables` independent random w-bit masks keys every DISTINCT
    * fingerprint on `fp AND mask` (one codegen AND; mask equality is
    * position-subset equality), collisions hamming-filter inside the join
    * stage, and the same exact-verify + group-expansion tail as the
    * pigeonhole runs downstream — so precision is still EXACT (every
    * emitted pair is within the radius); only RECALL is probabilistic,
    * ≥ `targetRecall` in expectation by [[permutedGeometry]]'s table
    * count and MEASURED (not asserted) under forced saturation in
    * docs/GEOMETRY_RECALL.json. Shuffles key on (table, masked-fp) only;
    * per-doc explode is `tables` rows — flat in n for fixed geometry. */
  def pairsFromFingerprintsPermuted(df: DataFrame, idCol: String, fpCol: String,
                                    maxHamming: Int, maskBits: Int, tables: Int,
                                    seed: Long = 0x517EC0DEL): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 63,
      s"maxHamming must be in [0, 63], got $maxHamming")
    pairsViaGroupKeys(df, idCol, fpCol, maxHamming,
      permutedKeyStructs(maskBits, tables, seed))
  }

  /** The (comb, ckey) banding structs of the permuted-mask tier — see
    * [[blockedKeyStructs]] for why they are exposed. */
  def permutedKeyStructs(maskBits: Int, tables: Int,
                         seed: Long = 0x517EC0DEL): Seq[Column] =
    permutedMasks(maskBits, tables, seed).zipWithIndex.map {
      case (m, ti) =>
        struct(lit(ti).as("comb"), col("fp").bitwiseAND(lit(m)).as("ckey"))
    }.toSeq

  /** The REGIME-SWITCHED banding geometry as a persistable record — what
    * [[pairsFromFingerprintsAdaptive]] derives per call and the
    * [[FingerprintIndex]] pins at build time (probe batches must key
    * EXACTLY like the corpus rows already in the index, so the index
    * stores this record in its params table instead of re-deriving from a
    * drifting corpus count). `keyStructs` rebuilds the banding columns. */
  case class FpGeometry(regime: String, maxHamming: Int, d: Int,
                        maskBits: Int, tables: Int, seed: Long) {
    def keyStructs: Seq[Column] = regime match {
      case "blocked"  => blockedKeyStructs(maxHamming, d)
      case "permuted" => permutedKeyStructs(maskBits, tables, seed)
      case other => throw new IllegalArgumentException(s"unknown regime $other")
    }
  }

  /** Derive the [[FpGeometry]] the regime switch picks at corpus size `n`
    * — the single source for [[pairsFromFingerprintsAdaptive]] and the
    * persisted index's build/rekey. */
  def adaptiveGeometry(n: Long, maxHamming: Int,
                       targetOccupancy: Long = 32L, maxD: Int = 3,
                       targetRecall: Double = 0.9,
                       seed: Long = 0x517EC0DEL): FpGeometry =
    if (!blockedSaturated(n, maxHamming, targetOccupancy, maxD))
      FpGeometry("blocked", maxHamming,
        adaptiveBlocks(n, maxHamming, targetOccupancy, maxD), 0, 0, seed)
    else {
      val (w, t) = permutedGeometry(n, maxHamming, targetOccupancy, targetRecall)
      FpGeometry("permuted", maxHamming, 0, w, t, seed)
    }

  /** The REGIME SWITCH over an existing 64-bit fingerprint column: exact
    * block-combination pigeonhole while [[adaptiveBlocks]] has buckets to
    * give (recall 1.0 by construction — every corpus below
    * ~targetOccupancy·2^(maxD·64/(h+maxD)) rows, ≈8M docs at h=7), then
    * the permuted-mask tables ([[blockedSaturated]] regime) — measured
    * probabilistic recall at occupancy held flat, instead of the
    * radius-truncation fallback (measured recall 0.061) that was the only
    * alternative past saturation. Faces pass `n` from a cached stat
    * ([[graft.Tables.cachedCount]]) — no count job inside the plan. */
  def pairsFromFingerprintsAdaptive(df: DataFrame, idCol: String, fpCol: String,
                                    maxHamming: Int, n: Long,
                                    targetOccupancy: Long = 32L, maxD: Int = 3,
                                    targetRecall: Double = 0.9): DataFrame = {
    val g = adaptiveGeometry(n, maxHamming, targetOccupancy, maxD, targetRecall)
    pairsViaGroupKeys(df, idCol, fpCol, maxHamming, g.keyStructs)
  }

  /** [[pairsFromFingerprintsAdaptive]] over raw text (the dedup_simhash
    * face's entry): simhash the tokens, then route by regime. */
  def pairsAdaptive(df: DataFrame, idCol: String, textCol: String,
                    maxHamming: Int, n: Long, seed: Long = 42L,
                    targetOccupancy: Long = 32L, maxD: Int = 3,
                    targetRecall: Double = 0.9): DataFrame = {
    val fp = df
      .select(col(idCol).as("id"),
        transform(split(col(textCol), " "), t => xxhash64(lit(seed), t)).as("_th"))
      .select(col("id"), simhashFromHashes(col("_th")).as("fp"))
    pairsFromFingerprintsAdaptive(fp, "id", "fp", maxHamming, n,
      targetOccupancy, maxD, targetRecall)
  }
}
