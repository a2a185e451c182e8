package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot inner loops the built-ins handle
  * with per-row allocations:
  *
  *  - [[DotProductExpr]]: Σ aᵢ·bᵢ over two array<double> columns. The
  *    `zip_with`+`aggregate` formulation materializes an intermediate array
  *    per row; this is a straight fused multiply-add loop in generated code.
  *    Accumulation is sequential left-to-right, bitwise-identical to the
  *    fold (and to the DuckDB oracle).
  *  - [[SortedIntersectSizeExpr]]: |A∩B| for two SORTED distinct string
  *    arrays via an allocation-free merge — `array_intersect` builds a hash
  *    set per call (~50µs/pair on shingle arrays); the merge is ~2µs.
  *
  * Registered as SQL functions `graft_dot` / `graft_sorted_intersect_size`
  * (see [[GraftFunctions.register]]) so they're usable from `call_function`,
  * `expr(...)`, and plain SQL.
  */
case class DotProductExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    // truncating to min(nx, ny) would return a silently-wrong similarity
    // for a malformed vector — every caller pairs equal dims by contract
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"graft_dot: mixed vector dimensions ($n vs ${y.numElements()}) — " +
          "fix or filter the column")
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |${ev.value} = 0.0;
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  throw new IllegalArgumentException(
         |    "graft_dot: mixed vector dimensions (" + $n + " vs " +
         |      $b.numElements() + ") - fix or filter the column");
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

case class SortedIntersectSizeExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect_size expects (array<string>, array<string>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val cmp = ctx.freshName("cmp")
      s"""
         |${ev.value} = 0;
         |int $i = 0; int $j = 0;
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($cmp == 0) { ${ev.value}++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectSizeExpr =
    copy(left = newLeft, right = newRight)
}

case class SortedIntersectSizeLongExpr(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_intersect_size_l expects (array<bigint>, array<bigint>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size_l"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val nx = x.numElements(); val ny = y.numElements()
    while (i < nx && j < ny) {
      val l = x.getLong(i); val r = y.getLong(j)
      if (l == r) { c += 1; i += 1; j += 1 }
      else if (l < r) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val l = ctx.freshName("l")
      val r = ctx.freshName("r")
      s"""
         |${ev.value} = 0;
         |int $i = 0; int $j = 0;
         |int $nx = $a.numElements(); int $ny = $b.numElements();
         |while ($i < $nx && $j < $ny) {
         |  long $l = $a.getLong($i); long $r = $b.getLong($j);
         |  if ($l == $r) { ${ev.value}++; $i++; $j++; }
         |  else if ($l < $r) { $i++; } else { $j++; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedIntersectSizeLongExpr =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash of an array<bigint> of token hashes: per bit j, sum ±1
  * votes over tokens; the sign of the vote total is bit j. One generated
  * loop instead of 64 separate `aggregate` folds over the array. */
case class SimHash64Expr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_simhash64 expects array<bigint>, got $t")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = x.numElements()
    while (i < n) {
      val h = x.getLong(i)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (votes(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      s"""
         |${ev.value} = 0L;
         |int[] $votes = new int[64];
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $votes[$j] += ((($h >>> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) ${ev.value} |= (1L << $j);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

/** MinHash signature over an array<bigint> of shingle hashes: k minima of
  * splitmix-remixed (seed+i)-keyed hashes, computed in ONE pass over the
  * array (k parallel min-trackers) instead of k transform+array_min
  * expressions each allocating an intermediate array. */
case class MinHashSigExpr(child: Expression, k: Int, seed: Long)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_minhash expects array<bigint>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = x.numElements()
    var i = 0
    while (i < n) {
      val h = x.getLong(i)
      var j = 0
      while (j < k) {
        val v = mix(h ^ (seed + j) * 0xC2B2AE3D27D4EB4FL)
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  // Interpreted eval is already a tight primitive loop; fall back to it from
  // generated code via the default UnaryExpression codegen path.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mins = ctx.freshName("mins")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val z = ctx.freshName("z")
      s"""
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $a.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $z = ($h ^ (${seed}L + $j) * 0xC2B2AE3D27D4EB4FL) + 0x9E3779B97F4A7C15L;
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $mins[$j]) $mins[$j] = $z;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)
}

/** ALL random-hyperplane LSH signatures of a vector in one generated pass:
  * per table t, bit p is the sign of Σ_d v(d)·plane(t,p,d) with ±1 planes
  * derived from the deterministic splitmix mix of (t, p, d) — exactly
  * [[graft.similarity.AnnLsh.signature]]'s algebra (the plane literal's
  * `v·(+1.0)`/`v·(−1.0)` terms are IEEE-exact negations, and accumulation
  * runs d-ascending, so every signature is BITWISE-identical to the
  * composed form). The composed form needed tables × planes `graft_dot`
  * calls against 64-double array literals per row — thousands of constants
  * that blow whole-stage codegen onto the interpreted path (measured 12.3s
  * to sign 20k vectors at 16×9; this expression does it in one tight
  * loop). `dim` is ENFORCED per row — a mixed/corrupt vector column must
  * fail loudly (matching graft_dot's contract), never sign into a wrong
  * bucket silently. Returns array<bigint> of length `tables`. */
case class LshSignaturesExpr(child: Expression, dim: Int, planes: Int, tables: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_lsh_sigs expects array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_sigs"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"graft_lsh_sigs: vector has $n elements, expected dim=$dim")
    val sigs = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        var s = 0.0
        var d = 0
        while (d < n) {
          var z = t.toLong * 0x9E3779B97F4A7C15L + p.toLong * 0xBF58476D1CE4E5B9L +
            d.toLong * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z = z ^ (z >>> 31)
          val x = v.getDouble(d)
          s += (if ((z & 1L) == 0L) x else -x)
          d += 1
        }
        if (s >= 0) sig |= (1L << p)
        p += 1
      }
      sigs(t) = sig
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(sigs)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val z = ctx.freshName("z")
      val x = ctx.freshName("x")
      val sig = ctx.freshName("sig")
      s"""
         |long[] $sigs = new long[$tables];
         |int $n = $a.numElements();
         |if ($n != $dim)
         |  throw new IllegalArgumentException(
         |    "graft_lsh_sigs: vector has " + $n + " elements, expected dim=" + $dim);
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      long $z = (long) $t * 0x9E3779B97F4A7C15L + (long) $p * 0xBF58476D1CE4E5B9L
         |        + (long) $d * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL;
         |      $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |      $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |      $z = $z ^ ($z >>> 31);
         |      double $x = $a.getDouble($d);
         |      $s += (($z & 1L) == 0L) ? $x : -$x;
         |    }
         |    if ($s >= 0) $sig |= (1L << $p);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sigs);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshSignaturesExpr =
    copy(child = newChild)
}

/** Margin-aware MULTI-PROBE random-hyperplane LSH buckets — the
  * recall-holding companion to [[LshSignaturesExpr]]: per table, element 0
  * is the primary signature (bitwise-identical to graft_lsh_sigs — same
  * splitmix planes, same d-ascending accumulation) and elements 1..probes
  * are the signature with the i-th LOWEST-|margin| bit flipped, margin
  * being the hyperplane dot product |Σ_d v(d)·plane(t,p,d)| — the bits
  * most likely to disagree between two near-duplicate vectors are exactly
  * the ones whose projection sits nearest the hyperplane (Lv et al.,
  * multi-probe LSH, VLDB'07). Probing those buckets on ONE side of the
  * candidate join recovers most of the recall that extra tables would buy
  * at 1/probes of the signing cost: per-table collision probability rises
  * from p^planes to ≈ p^planes + probes·p^(planes−1)(1−p) while signing
  * work stays one table pass. Ties in |margin| break toward the lower
  * plane index (deterministic across executors). `dim` enforced per row
  * like graft_lsh_sigs. Returns array<array<bigint>> of `tables` rows ×
  * (1+probes) buckets. */
case class LshProbesExpr(child: Expression, dim: Int, planes: Int, tables: Int,
                         probes: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(probes >= 0 && probes <= planes,
    s"graft_lsh_probes: probes must be in [0, planes=$planes], got $probes")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_lsh_probes expects array<double>, got $t")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "graft_lsh_probes"

  override protected def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    if (n != dim)
      throw new IllegalArgumentException(
        s"graft_lsh_probes: vector has $n elements, expected dim=$dim")
    val out = new Array[Any](tables)
    val margins = new Array[Double](planes)
    val used = new Array[Boolean](planes)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var p = 0
      while (p < planes) {
        var s = 0.0
        var d = 0
        while (d < n) {
          var z = t.toLong * 0x9E3779B97F4A7C15L + p.toLong * 0xBF58476D1CE4E5B9L +
            d.toLong * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL
          z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
          z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
          z = z ^ (z >>> 31)
          val x = v.getDouble(d)
          s += (if ((z & 1L) == 0L) x else -x)
          d += 1
        }
        if (s >= 0) sig |= (1L << p)
        margins(p) = math.abs(s)
        used(p) = false
        p += 1
      }
      val buckets = new Array[Long](1 + probes)
      buckets(0) = sig
      var i = 0
      while (i < probes) {
        var best = -1
        var p2 = 0
        while (p2 < planes) {
          if (!used(p2) && (best < 0 || margins(p2) < margins(best))) best = p2
          p2 += 1
        }
        used(best) = true
        buckets(1 + i) = sig ^ (1L << best)
        i += 1
      }
      out(t) = new org.apache.spark.sql.catalyst.util.GenericArrayData(buckets)
      t += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val margins = ctx.freshName("margins")
      val used = ctx.freshName("used")
      val buckets = ctx.freshName("buckets")
      val t = ctx.freshName("t")
      val p = ctx.freshName("p")
      val p2 = ctx.freshName("p2")
      val d = ctx.freshName("d")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val z = ctx.freshName("z")
      val x = ctx.freshName("x")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      s"""
         |int $n = $a.numElements();
         |if ($n != $dim)
         |  throw new IllegalArgumentException(
         |    "graft_lsh_probes: vector has " + $n + " elements, expected dim=" + $dim);
         |Object[] $out = new Object[$tables];
         |double[] $margins = new double[$planes];
         |boolean[] $used = new boolean[$planes];
         |for (int $t = 0; $t < $tables; $t++) {
         |  long $sig = 0L;
         |  for (int $p = 0; $p < $planes; $p++) {
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      long $z = (long) $t * 0x9E3779B97F4A7C15L + (long) $p * 0xBF58476D1CE4E5B9L
         |        + (long) $d * 0x94D049BB133111EBL + 0x2545F4914F6CDD1DL;
         |      $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |      $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |      $z = $z ^ ($z >>> 31);
         |      double $x = $a.getDouble($d);
         |      $s += (($z & 1L) == 0L) ? $x : -$x;
         |    }
         |    if ($s >= 0) $sig |= (1L << $p);
         |    $margins[$p] = Math.abs($s);
         |    $used[$p] = false;
         |  }
         |  long[] $buckets = new long[${1 + probes}];
         |  $buckets[0] = $sig;
         |  for (int $i = 0; $i < $probes; $i++) {
         |    int $best = -1;
         |    for (int $p2 = 0; $p2 < $planes; $p2++) {
         |      if (!$used[$p2] && ($best < 0 || $margins[$p2] < $margins[$best])) $best = $p2;
         |    }
         |    $used[$best] = true;
         |    $buckets[1 + $i] = $sig ^ (1L << $best);
         |  }
         |  $out[$t] = new org.apache.spark.sql.catalyst.util.GenericArrayData($buckets);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): LshProbesExpr =
    copy(child = newChild)
}

/** Word n-gram shingle hashes straight from the text bytes: sorted distinct
  * xxhash64 values of each n-token window. Bitwise-identical to
  * `sort_array(array_distinct(transform(sequence(...), i ->
  * xxhash64(concat_ws(" ", slice(split(text, " "), i+1, n))))))` — tokens
  * split on single spaces reassemble to the exact byte range of the original
  * string, so each window hashes in place with ZERO allocations (the
  * composed form allocates a token array, n-element slices, and a joined
  * string per window, and the lambda runs interpreted — ~20× slower). */
/** Winnowing fingerprint picks, packed (gram_hash << 20) | gram_pos —
  * BITWISE-identical to the staged higher-order-function form in
  * [[graft.text.TextAnalysis]] (spec-pinned: same tokens via
  * `split(text, " ", -1)` byte-scanning — a space is one byte in UTF-8 and
  * never a continuation byte; same per-token feature
  * `length(tok)·7 + ascii(tok)` (first code point; 0 for empty tokens); same rolling `(h·131 + feat) mod 1e9+7` gram hash; same
  * first-min window pick with 1-based absolute positions; same
  * order-preserving distinct). The staged SQL form evaluates every lambda
  * INTERPRETED — per-element expression trees and array allocations at
  * every level — measured ~0.17 ms/doc (8–9s of the 10.1s dedup_winnow
  * face at the fourth decade, the whole curve bend); this one tight
  * JVM pass is the same O(n·(k+w)) with no allocations beyond the output
  * and runs inside whole-stage codegen. */
case class WinnowPackedExpr(child: Expression, k: Int, w: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  require(k >= 1 && w >= 1, s"graft_winnow: k and w must be >= 1, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_winnow expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override protected def nullSafeEval(t: Any): Any =
    WinnowPackedExpr.compute(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.WinnowPackedExpr.compute($a, $k, $w);")

  override protected def withNewChildInternal(newChild: Expression): WinnowPackedExpr =
    copy(child = newChild)
}

object WinnowPackedExpr {
  private val M = 1000000007L

  def compute(s: org.apache.spark.unsafe.types.UTF8String, k: Int,
              w: Int): ArrayData = {
    val bytes = s.getBytes
    // token count: split(" ", -1) keeps leading/inner/trailing empties —
    // tokens = spaces + 1, always
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == 0x20) nTok += 1; i += 1 }
    if (nTok < k)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    // per-token feature: numChars·7 + first CODE POINT (0 for empty) —
    // exactly length(tok)*7 + ascii(substring(tok, 1, 1)): Spark's ascii
    // decodes the first character, not the first byte (ascii('ü') = 252)
    val feat = new Array[Long](nTok)
    var t = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        var chars = 0L
        var j = start
        while (j < i) { if ((bytes(j) & 0xC0) != 0x80) chars += 1; j += 1 }
        val first: Long =
          if (i <= start) 0L
          else {
            val b0 = bytes(start) & 0xFF
            if (b0 < 0x80) b0.toLong
            else if ((b0 & 0xE0) == 0xC0 && start + 1 < i)
              (((b0 & 0x1F) << 6) | (bytes(start + 1) & 0x3F)).toLong
            else if ((b0 & 0xF0) == 0xE0 && start + 2 < i)
              (((b0 & 0x0F) << 12) | ((bytes(start + 1) & 0x3F) << 6) |
                (bytes(start + 2) & 0x3F)).toLong
            else if ((b0 & 0xF8) == 0xF0 && start + 3 < i)
              (((b0 & 0x07) << 18) | ((bytes(start + 1) & 0x3F) << 12) |
                ((bytes(start + 2) & 0x3F) << 6) | (bytes(start + 3) & 0x3F)).toLong
            else b0.toLong // malformed tail: best effort, matches no valid corpus
          }
        feat(t) = chars * 7L + first
        t += 1
        start = i + 1
      }
      i += 1
    }
    val g = nTok - (k - 1)
    val grams = new Array[Long](g)
    var x = 0
    while (x < g) {
      var h = 0L
      var j = 0
      while (j < k) { h = (h * 131L + feat(x + j)) % M; j += 1 }
      grams(x) = h
      x += 1
    }
    val wl = if (w < g) w else g
    val picks = new java.util.LinkedHashSet[java.lang.Long]()
    var j0 = 0
    while (j0 <= g - wl) {
      var mv = grams(j0)
      var mp = 0
      var y = 1
      while (y < wl) {
        if (grams(j0 + y) < mv) { mv = grams(j0 + y); mp = y }
        y += 1
      }
      // (mv << 20) + 1-based absolute gram position of the first minimum
      picks.add(java.lang.Long.valueOf((mv << 20) + (j0 + mp + 1).toLong))
      j0 += 1
    }
    val out = new Array[Long](picks.size())
    val it = picks.iterator()
    var z = 0
    while (it.hasNext) { out(z) = it.next(); z += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

case class ShingleHashesExpr(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_shingle_hashes expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(t: Any): Any =
    ShingleHashesExpr.compute(t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashesExpr.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashesExpr =
    copy(child = newChild)
}

/** POSITIONAL shingle hashes: xxhash64 of every n-token window in document
  * order — no sort, no dedup, array index = 0-based window position. The
  * span-dedup operators ([[graft.dedup.Dedup.substringSpans]]/`selfSpans`)
  * posexplode this so their inverted index carries (id, pos, 8-byte hash)
  * instead of (id, pos, n-token string): the pair join shuffles ~6× fewer
  * bytes and compares longs. Hash equality stands in for string equality at
  * the usual xxhash64 ~2⁻⁶⁴ collision odds (the [[ShingleHashesExpr]] /
  * dedup_jaccard precedent — the DuckDB oracle keeps literal strings, so a
  * collision would surface as a hash-gate mismatch). */
case class PositionalShingleHashesExpr(child: Expression, n: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_shingle_hashes_pos expects string, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes_pos"

  override protected def nullSafeEval(t: Any): Any =
    PositionalShingleHashesExpr.compute(
      t.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.PositionalShingleHashesExpr.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): PositionalShingleHashesExpr =
    copy(child = newChild)
}

object PositionalShingleHashesExpr {
  /** Shared by interpreted eval and generated code (via static forwarder). */
  def compute(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var spaces = 0
    var i = 0
    while (i < len) { if (s.getByte(i) == 0x20) spaces += 1; i += 1 }
    val tokenCount = spaces + 1
    if (tokenCount < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](tokenCount + 1)
    var t = 1
    i = 0
    while (i < len) { if (s.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(tokenCount) = len + 1
    val m = tokenCount - n + 1
    val hashes = new Array[Long](m)
    var w = 0
    while (w < m) {
      val from = starts(w)
      val until = starts(w + n) - 1
      hashes(w) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + from, until - from, 42L)
      w += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(hashes)
  }
}

object ShingleHashesExpr {
  /** Shared by interpreted eval and generated code (via static forwarder). */
  def compute(s: org.apache.spark.unsafe.types.UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    // Token boundaries: split on every single space byte (0x20 never occurs
    // inside a UTF-8 multi-byte sequence, so a byte scan is safe).
    var spaces = 0
    var i = 0
    while (i < len) { if (s.getByte(i) == 0x20) spaces += 1; i += 1 }
    val tokenCount = spaces + 1
    if (tokenCount < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](tokenCount + 1)
    var t = 1
    i = 0
    while (i < len) { if (s.getByte(i) == 0x20) { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(tokenCount) = len + 1 // virtual space past the end: window end = starts(j) - 1
    val m = tokenCount - n + 1
    val hashes = new Array[Long](m)
    var w = 0
    while (w < m) {
      val from = starts(w)
      val until = starts(w + n) - 1
      // seed 42 = Spark's xxhash64() default
      hashes(w) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + from, until - from, 42L)
      w += 1
    }
    java.util.Arrays.sort(hashes)
    var out = 0
    var r = 0
    while (r < m) {
      if (r == 0 || hashes(r) != hashes(r - 1)) { hashes(out) = hashes(r); out += 1 }
      r += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      if (out == m) hashes else java.util.Arrays.copyOf(hashes, out))
  }
}

/** zlib-deflated byte length of a string's UTF-8 bytes (level 6) — the
  * compression-ratio quality signal (highly repetitive text compresses far
  * below natural prose; Gopher-style filters threshold on the ratio).
  * Deflate can't be expressed in SQL built-ins; a native expression keeps
  * the per-row work inside whole-stage codegen (the generated code calls
  * one static helper — no UDF serialization, no Row boxing). */
case class DeflateLenExpr(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_deflate_len expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(a: Any): Any =
    DeflateLenExpr.deflatedLen(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.DeflateLenExpr.deflatedLen($a.getBytes());")

  override protected def withNewChildInternal(newChild: Expression): DeflateLenExpr =
    copy(child = newChild)
}

object DeflateLenExpr {
  /** Deterministic for a given input: fixed level, default strategy, one
    * whole-buffer pass. Called from both interpreted eval and codegen. */
  def deflatedLen(bytes: Array[Byte]): Int = {
    val d = new java.util.zip.Deflater(6, false)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

/** BPE token count of a text under a merge table — the honest
  * context-window budget signal beside the regex approximation. The
  * default is the embedded oracle-checked [[graft.text.Bpe.default]]
  * table; a production vocabulary arrives as a parsed merges.txt
  * ([[graft.text.Bpe.parseMerges]]) carried INSIDE the expression node —
  * it serializes with the plan and is embedded into generated code via
  * `addReferenceObj`, so it reaches every executor on a real cluster (a
  * JVM-global registry would only work in local mode). The tokenizer's
  * merge loop can't be expressed in SQL built-ins; like
  * [[DeflateLenExpr]], a native expression keeps the per-row work inside
  * whole-stage codegen — no UDF serialization, no Row boxing. */
case class BpeCountExpr(child: Expression,
                        table: graft.text.BpeTable = graft.text.Bpe.default)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"graft_bpe_count expects string, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(a: Any): Any =
    table.countText(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[graft.text.BpeTable].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $ref.countText($a.toString());")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCountExpr =
    copy(child = newChild)
}

/** Bounded (banded) Levenshtein distance: `min(levenshtein(a, b), k+1)`
  * in O(k·n) time via the Ukkonen band instead of Spark's O(n·m) full DP —
  * the similarity-join predicate form, where any distance beyond the
  * threshold is equivalent and only the band around the diagonal can hold
  * a ≤k path. Early-exits a row as soon as the band minimum exceeds k
  * (typical non-match costs ~2k cells per row, not n). Equal to Spark's
  * `levenshtein` wherever that is ≤ k (UTF-16 code units, = code points
  * for BMP text); returns exactly k+1 beyond, so `graft_lev_bounded(a,b,k)
  * <= k` is THE predicate. Static helper keeps both eval paths identical
  * and the generated code inside whole-stage codegen. */
case class BoundedLevenshteinExpr(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (StringType, StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_lev_bounded expects (string, string), got ($l, $r)")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_lev_bounded"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BoundedLevenshteinExpr.bounded(
      a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString,
      b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BoundedLevenshteinExpr.bounded(" +
        s"$a.toString(), $b.toString(), $k);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BoundedLevenshteinExpr =
    copy(left = newLeft, right = newRight)
}

object BoundedLevenshteinExpr {
  /** Banded DP, two rolling rows, cells outside |i−j|≤k never computed.
    * Returns min(dist, k+1). */
  def bounded(a: String, b: String, k: Int): Int = {
    // orient so the outer loop runs the shorter string (narrower rows)
    val (s, t) = if (a.length <= b.length) (a, b) else (b, a)
    val (n, m) = (s.length, t.length)
    if (m - n > k) return k + 1
    if (n == 0) return math.min(m, k + 1)
    val inf = k + 1
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = math.max(1, i - k)
      val hi = math.min(m, i + k)
      if (lo > 1) cur(lo - 1) = inf
      cur(0) = if (i <= k) i else inf
      var rowMin = inf
      j = lo
      while (j <= hi) {
        val cost = if (s.charAt(i - 1) == t.charAt(j - 1)) 0 else 1
        val diag = prev(j - 1) + cost
        val del = (if (j <= i - 1 + k) prev(j) else inf) + 1
        val ins = cur(j - 1) + 1
        var v = if (diag < del) diag else del
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf // seal the band edge for the next row
      if (rowMin > k) return k + 1  // no ≤k path can re-enter the band
      val tmp = prev; prev = cur; cur = tmp
      i += 1
    }
    math.min(prev(m), k + 1)
  }
}

/** Bloom-filter membership probe against a BROADCAST sketch — the native
  * form of [[graft.operators.BloomPrune]]'s scan filter. Spark's own
  * `might_contain` is optimizer-internal (InjectRuntimeFilter) and probes
  * xxh64 longs only; this one probes the same raw long/string values
  * `DataFrameStatFunctions.bloomFilter` inserts, so it composes with the
  * explicit build path. The expression carries only the broadcast HANDLE
  * (the sketch ships torrent-cached once per executor, not per task /
  * per plan copy), stays inside whole-stage codegen, and — matching the
  * join semantics it prunes for — evaluates null keys to false, never
  * null. Not registered in the SQL function registry: a broadcast handle
  * cannot be named in SQL text, so it is constructed only through
  * BloomPrune's API. */
case class BloomMightContainExpr(
    child: Expression,
    bloom: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bloom_might_contain expects an integral or string key, got $t")
  }
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val bf = bloom.value

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val k = child.eval(input)
    if (k == null) false
    else child.dataType match {
      case StringType => bf.mightContainString(k.toString)
      case _ => bf.mightContainLong(k.asInstanceOf[Number].longValue())
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val bfClass = "org.apache.spark.util.sketch.BloomFilter"
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom,
      "org.apache.spark.broadcast.Broadcast")
    // unwrap the broadcast ONCE per generated-class instance, not per row
    val bfVar = ctx.addMutableState(bfClass, "graftBloomFilter",
      v => s"$v = ($bfClass)$bcRef.value();")
    val childGen = child.genCode(ctx)
    val probe = child.dataType match {
      case StringType => s"$bfVar.mightContainString(${childGen.value}.toString())"
      case _ => s"$bfVar.mightContainLong((long)${childGen.value})"
    }
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = false;
        if (!${childGen.isNull}) { ${ev.value} = $probe; }
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainExpr =
    copy(child = newChild)
}

/** 0-based argmin over k literal centroids by squared L2 distance —
  * [[graft.similarity.KMeans]]'s assignment step as ONE data-driven codegen
  * loop. The expression-tree formulation (k `graft_dot`s against k literal
  * arrays + array_min/array_position) generates O(k·dim) Java source and
  * crosses the JVM's 64 KB method limit near k ≈ 250 at dim 64 — Janino
  * throws "Code grows beyond 64 KB" and Spark silently drops the whole
  * projection out of codegen into interpreted eval, exactly where a big
  * coarse quantizer needs the speed most (caught live by the r16
  * tools/TwoLevelIvf 256-cell run). Here the centroid matrix ships as a
  * flattened REFERENCE OBJECT (data, not code): generated source is
  * constant-size for any k, and the matrix serializes with the plan so it
  * reaches every executor on a real cluster.
  *
  * Bitwise-identical to the tree formulation: per centroid j,
  * d_j = (Σᵢ vᵢ²) − 2.0·(Σᵢ vᵢ·cⱼᵢ) + (Σᵢ cⱼᵢ²), every sum accumulated
  * left-to-right, winner = FIRST index achieving the total-order minimum
  * (java.lang.Double.compare — the same double ordering Catalyst's
  * array_min/array_position use, so −0.0/NaN corners agree too). Not in
  * the SQL registry: a centroid matrix has no SQL-text spelling (the
  * [[BloomMightContainExpr]] contract); construct through KMeans. */
case class ArgminSqDistExpr(child: Expression, centroids: Array[Array[Double]])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty, "graft_argmin_sqdist: need at least one centroid")
  require(centroids.forall(_.length == centroids(0).length),
    "graft_argmin_sqdist: ragged centroid matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_argmin_sqdist expects array<double>, got $t")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_argmin_sqdist"

  // flattened row-major matrix + per-centroid Σc² (the literal the tree
  // formulation folds): primitive locality in the inner loop, computed
  // once per plan instance on each JVM (the case-class field serializes)
  @transient private lazy val dim = centroids(0).length
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](centroids.length * dim)
    var j = 0
    while (j < centroids.length) {
      System.arraycopy(centroids(j), 0, f, j * dim, dim); j += 1
    }
    f
  }
  @transient private lazy val ccs: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  override protected def nullSafeEval(a: Any): Any =
    ArgminSqDistExpr.argmin(a.asInstanceOf[ArrayData].toDoubleArray(), flat, ccs, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("argminCentroids", flat, "double[]")
    val ccRef = ctx.addReferenceObj("argminCcs", ccs, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ArgminSqDistExpr.argmin(" +
        s"$a.toDoubleArray(), $flatRef, $ccRef, $dim);")
  }

  override protected def withNewChildInternal(newChild: Expression): ArgminSqDistExpr =
    copy(child = newChild)
}

object ArgminSqDistExpr {
  /** Shared by interpreted eval and generated code — one implementation,
    * zero drift between the two paths (the BoundedLevenshteinExpr rule). */
  def argmin(v: Array[Double], flat: Array[Double], ccs: Array[Double],
             dim: Int): Int = {
    // truncating would return a silently-wrong nearest centroid for a
    // malformed vector — the graft_dot mixed-dimensions contract
    if (v.length != dim)
      throw new IllegalArgumentException(
        s"graft_argmin_sqdist: mixed vector dimensions (${v.length} vs $dim) — " +
          "fix or filter the column")
    var selfd = 0.0
    var i = 0
    while (i < dim) { selfd += v(i) * v(i); i += 1 }
    var best = 0
    var bestd = 0.0
    var j = 0
    while (j < ccs.length) {
      var dot = 0.0
      val off = j * dim
      i = 0
      while (i < dim) { dot += v(i) * flat(off + i); i += 1 }
      val d = selfd - 2.0 * dot + ccs(j)
      if (j == 0 || java.lang.Double.compare(d, bestd) < 0) { bestd = d; best = j }
      j += 1
    }
    best
  }
}

/** Top-`k` nearest centroids of a vector, as the array<bigint> of 0-based
  * centroid INDICES ordered best-first — the coarse-quantizer multi-assign
  * / multi-probe step as ONE data-driven projection. Replaces the
  * `join(broadcast(centroids), lit(true))` + score + rank formulations,
  * which materialize rows×nLists intermediate rows and then pay either a
  * hash aggregation (graft_topk) or a window SHUFFLE (row_number over
  * rows×nLists) to keep k of them; here the only thing downstream of the
  * scan is rows×k exploded longs. Same reference-object discipline as
  * [[ArgminSqDistExpr]]: constant generated-code size at any nLists.
  *
  * Two score modes, each bitwise-identical to the column formulation it
  * replaces, ties broken by LOWER INDEX (callers order their centroid
  * matrix by list id, making index order = `asc(list)`):
  *   - `cosineScore = false`: s_j = 2.0·(v·cⱼ) − (v·v) − Σcⱼ² — the
  *     unit-sphere L2 ranking of [[graft.similarity.AnnIvf.selfPairs]]
  *     (same left-to-right sums, same association);
  *   - `cosineScore = true`: s_j = (v·cⱼ) / (√(v·v) · √(Σcⱼ²)) — the
  *     `cosine(v, cv)` ranking of the index probe paths.
  * Selection order is (score desc, index asc) under
  * java.lang.Double.compare — identical to both `graft_topk`'s heap
  * order and a Spark `orderBy(desc(score), asc(list))` window, NaN-first
  * included. Not in the SQL registry (matrix parameter); construct via
  * ColumnBridge. */
case class TopListsExpr(child: Expression, centroids: Array[Array[Double]],
                        k: Int, cosineScore: Boolean)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(centroids.nonEmpty, "graft_top_lists: need at least one centroid")
  require(centroids.forall(_.length == centroids(0).length),
    "graft_top_lists: ragged centroid matrix")
  require(k >= 1 && k <= centroids.length,
    s"graft_top_lists: k in [1, ${centroids.length}], got $k")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_top_lists expects array<double>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_top_lists"

  @transient private lazy val dim = centroids(0).length
  @transient private lazy val flat: Array[Double] = {
    val f = new Array[Double](centroids.length * dim)
    var j = 0
    while (j < centroids.length) {
      System.arraycopy(centroids(j), 0, f, j * dim, dim); j += 1
    }
    f
  }
  @transient private lazy val ccs: Array[Double] = centroids.map { c =>
    var s = 0.0; var i = 0
    while (i < c.length) { s += c(i) * c(i); i += 1 }
    s
  }

  override protected def nullSafeEval(a: Any): Any =
    TopListsExpr.topLists(a.asInstanceOf[ArrayData].toDoubleArray(),
      flat, ccs, dim, k, cosineScore)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("topListsCentroids", flat, "double[]")
    val ccRef = ctx.addReferenceObj("topListsCcs", ccs, "double[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TopListsExpr.topLists(" +
        s"$a.toDoubleArray(), $flatRef, $ccRef, $dim, $k, $cosineScore);")
  }

  override protected def withNewChildInternal(newChild: Expression): TopListsExpr =
    copy(child = newChild)
}

object TopListsExpr {
  /** Shared by interpreted eval and generated code (the
    * BoundedLevenshteinExpr rule). Insertion into a size-≤k best-first
    * array: ascending j means an equal score NEVER displaces — exactly
    * (score desc, index asc). */
  def topLists(v: Array[Double], flat: Array[Double], ccs: Array[Double],
               dim: Int, k: Int, cosineScore: Boolean): ArrayData = {
    if (v.length != dim)
      throw new IllegalArgumentException(
        s"graft_top_lists: mixed vector dimensions (${v.length} vs $dim) — " +
          "fix or filter the column")
    var selfd = 0.0
    var i = 0
    while (i < dim) { selfd += v(i) * v(i); i += 1 }
    val na = if (cosineScore) Math.sqrt(selfd) else 0.0
    val n = ccs.length
    val bestS = new Array[Double](k)
    val bestJ = new Array[Long](k)
    var size = 0
    var j = 0
    while (j < n) {
      var dot = 0.0
      val off = j * dim
      i = 0
      while (i < dim) { dot += v(i) * flat(off + i); i += 1 }
      val s =
        if (cosineScore) dot / (na * Math.sqrt(ccs(j)))
        else 2.0 * dot - selfd - ccs(j)
      if (size < k || java.lang.Double.compare(s, bestS(size - 1)) > 0) {
        // binary-search-free insertion (k is tiny): walk up from the tail
        var p = if (size < k) size else k - 1
        while (p > 0 && java.lang.Double.compare(s, bestS(p - 1)) > 0) {
          bestS(p) = bestS(p - 1); bestJ(p) = bestJ(p - 1); p -= 1
        }
        bestS(p) = s
        bestJ(p) = j.toLong
        if (size < k) size += 1
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(if (size == k) bestJ else bestJ.take(size))
  }
}

object GraftFunctions {

  /** Scalar args like k/seed parameterize generated code, so they must be
    * compile-time constants: reject non-foldable expressions with the
    * standard NON_FOLDABLE_ARGUMENT AnalysisException instead of the opaque
    * ClassCastException/NPE `eval()` would throw on a column reference. */
  private def foldableArg(fn: String, param: String, tpe: String, e: Expression): Expression = {
    if (!e.foldable)
      throw new org.apache.spark.sql.AnalysisException(
        "NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> s"`$fn`", "paramName" -> s"`$param`", "paramType" -> s""""$tpe""""),
        None)
    val v = e.eval()
    if (v == null || !v.isInstanceOf[Number])
      throw new org.apache.spark.sql.AnalysisException(
        "NON_FOLDABLE_ARGUMENT",
        Map("funcName" -> s"`$fn`", "paramName" -> s"`$param`", "paramType" -> s""""$tpe""""),
        None)
    e
  }
  private def intArg(fn: String, param: String, e: Expression): Int =
    foldableArg(fn, param, "INT", e).eval().asInstanceOf[Number].intValue()
  private def longArg(fn: String, param: String, e: Expression): Long =
    foldableArg(fn, param, "BIGINT", e).eval().asInstanceOf[Number].longValue()
  /** intArg that must be ≥ 1 — an n ≤ 0 shingle width or k would otherwise
    * surface as an executor-side ArrayIndexOutOfBounds (or silent garbage
    * hashes) mid-query instead of a clean analysis error. */
  private def positiveIntArg(fn: String, param: String, e: Expression): Int = {
    val v = intArg(fn, param, e)
    // plain IllegalArgumentException: the NON_FOLDABLE_ARGUMENT template
    // would tell the user their perfectly-foldable literal is non-foldable
    require(v >= 1, s"$fn: `$param` must be a positive INT literal, got $v")
    v
  }

  /** Idempotently register the native expressions with a session's function
    * registry (temp functions — per-session, no catalog writes). */
  /** The single source of truth for every native function: name → builder.
    * Both registration routes ([[register]] for an existing session,
    * [[GraftExtensions]] for `spark.sql.extensions`-configured sessions)
    * install exactly this list, so the two can never drift apart. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (exprs => DotProductExpr(exprs(0), exprs(1))),
    "graft_sorted_intersect_size" ->
      (exprs => SortedIntersectSizeExpr(exprs(0), exprs(1))),
    "graft_sorted_intersect_size_l" ->
      (exprs => SortedIntersectSizeLongExpr(exprs(0), exprs(1))),
    "graft_simhash64" -> (exprs => SimHash64Expr(exprs(0))),
    "graft_deflate_len" -> (exprs => DeflateLenExpr(exprs(0))),
    "graft_lev_bounded" -> (exprs => BoundedLevenshteinExpr(exprs(0), exprs(1),
      positiveIntArg("graft_lev_bounded", "k", exprs(2)))),
    // 1-arg: the embedded default table; 2-arg: a FOLDABLE merges.txt
    // string (rank-ordered "left right" lines) parsed once at plan time
    "graft_bpe_count" -> (exprs =>
      if (exprs.length <= 1) BpeCountExpr(exprs(0))
      else {
        require(exprs(1).foldable && exprs(1).dataType == StringType,
          "graft_bpe_count: the merge table must be a foldable string " +
            "(merges.txt content, e.g. lit(...))")
        val txt = exprs(1).eval(null)
        require(txt != null, "graft_bpe_count: merge table string is null")
        BpeCountExpr(exprs(0), new graft.text.BpeTable(
          graft.text.Bpe.parseMerges(txt.toString)))
      }),
    "graft_vec_avg" -> (exprs => VectorAvgAgg(exprs(0)).toAggregateExpression()),
    "graft_minhash" -> (exprs => MinHashSigExpr(exprs(0),
      positiveIntArg("graft_minhash", "k", exprs(1)),
      longArg("graft_minhash", "seed", exprs(2)))),
    "graft_lsh_sigs" -> (exprs => LshSignaturesExpr(exprs(0),
      positiveIntArg("graft_lsh_sigs", "dim", exprs(1)),
      positiveIntArg("graft_lsh_sigs", "planes", exprs(2)),
      positiveIntArg("graft_lsh_sigs", "tables", exprs(3)))),
    "graft_lsh_probes" -> (exprs => LshProbesExpr(exprs(0),
      positiveIntArg("graft_lsh_probes", "dim", exprs(1)),
      positiveIntArg("graft_lsh_probes", "planes", exprs(2)),
      positiveIntArg("graft_lsh_probes", "tables", exprs(3)),
      positiveIntArg("graft_lsh_probes", "probes", exprs(4)))),
    "graft_shingle_hashes" -> (exprs => ShingleHashesExpr(exprs(0),
      positiveIntArg("graft_shingle_hashes", "n", exprs(1)))),
    "graft_winnow" -> (exprs => WinnowPackedExpr(exprs(0),
      positiveIntArg("graft_winnow", "k", exprs(1)),
      positiveIntArg("graft_winnow", "w", exprs(2)))),
    "graft_shingle_hashes_pos" -> (exprs => PositionalShingleHashesExpr(exprs(0),
      positiveIntArg("graft_shingle_hashes_pos", "n", exprs(1)))),
    "graft_topk" -> (exprs => TopKAgg(exprs(0), exprs(1),
      intArg("graft_topk", "k", exprs(2))).toAggregateExpression()),
    "graft_topk_str" -> (exprs => TopKStrAgg(exprs(0), exprs(1), exprs(2),
      intArg("graft_topk_str", "k", exprs(3))).toAggregateExpression()))

  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    // idempotence guard: re-registering ~40 builders per Tables() call is
    // harmless but emits one "replaced a previously registered function"
    // WARN per builder per call — thousands of synchronous log lines over
    // a bench pass. Guarded PER NAME (not by a single sentinel): a builder
    // appended after the sentinel, or one function dropped/shadowed in the
    // session, must still be (re)registered — ~40 hash lookups per call.
    builders.foreach { case (name, builder) =>
      if (!registry.functionExists(
          org.apache.spark.sql.catalyst.FunctionIdentifier(name)))
        registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
    // optimizer rewrites (extraOptimizations reaches an EXISTING session,
    // where injectOptimizerRule can't); guard keeps register() idempotent
    if (!spark.experimental.extraOptimizations.contains(graft.plans.BoundedLevRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.BoundedLevRewrite
  }
}

/** `spark.sql.extensions` entry point: a platform-created session (where
  * user code never sees the builder — Connect servers, notebook services,
  * spark-submit with a shared context) gets every graft function injected
  * at session build time:
  *
  * {{{ spark.sql.extensions=graft.functions.GraftExtensions }}}
  *
  * Injected functions live in the session's base registry (not temp
  * functions), so `spark.sql("SELECT graft_dot(a, b) ...")` works in every
  * derived `newSession()` too. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        new org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "graft.functions.GraftExpressions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => graft.plans.BoundedLevRewrite)
  }
}
