package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) interpret the
  * lambda per ELEMENT — fine for one scan, ruinous inside an O(n²) pair
  * join. These expressions generate a tight primitive loop over the
  * ArrayData inside whole-stage codegen (doGenCode below; the
  * interpreted eval is the fallback), with no per-element closures and
  * no intermediate product arrays, preserving bit-identical results to
  * the sequential left-fold the HOF forms compute (same accumulation
  * order, same float→double widening) — so DuckDB oracle parity is
  * unchanged.
  */
private[functions] trait VecBinaryOp extends BinaryExpression {
  override def dataType: DataType = DoubleType

  /** Java accessor snippet for element i of an ArrayData variable,
    * widened to double. */
  protected def jGet(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  private def isNumArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  protected def leftIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  protected def rightIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult =
    if (isNumArray(left.dataType) && isNumArray(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"${getClass.getSimpleName} needs array<float>/array<double> args, " +
        s"got ${left.dataType} / ${right.dataType}")

  @inline protected final def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** dot(a, b) = Σ aᵢ·bᵢ in double, sequential accumulation. NULL on
  * length mismatch or any null element — matching what the zip_with/
  * aggregate HOF forms (and the DuckDB list functions) produce, instead
  * of a confident-looking partial sum. */
case class VecDot(left: Expression, right: Expression) extends VecBinaryOp {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = leftIsFloat
    val rf = rightIsFloat
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += elem(a, i, lf) * elem(b, i, rf)
      i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${jGet(a, i, leftIsFloat)} * ${jGet(b, i, rightIsFloat)};
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** PQ code assignment — the encode hot path of every product-quantization
  * surface ([[graft.operators.ProductQuant.codesCol]] callers: corpus
  * encode, PQ sidecar build/carry, Lloyd training assignment).
  *
  * Semantics are EXACTLY the HOF form it replaces (kept in
  * ProductQuant.codesColHof for the equivalence spec):
  * `transform(sequence(0, m−1), j => array_max(transform(books[j], en =>
  * struct(dot(slice(u, j·d+1, d), en.cvec) − en.half, en.code))).code)` —
  * per subspace j, argmax over codebook entries of `<u_j, cvec> − half`
  * with ties broken toward the HIGHER code (struct max compares (score,
  * code) lexicographically). The dot accumulates in index order in
  * double, identical to [[VecDot]]; score comparison uses
  * `Double.compare`, the same total order (−0.0 < 0.0, NaN greatest)
  * Spark's struct ordering applies — so the emitted codes are
  * bit-identical to the HOF form on every input.
  *
  * Why native: higher-order functions interpret their lambda per
  * ELEMENT, and the HOF encode evaluates m·ks (= 512 here) interpreted
  * dot/slice closures — with a fresh slice COPY of the subvector per
  * codebook entry — for every row of the corpus. This expression is one
  * tight primitive triple loop inside whole-stage codegen: no closures,
  * no per-entry slice allocation, no struct materialization.
  *
  * Inputs: `u` array<double> (unit vector, m·d elements), `books`
  * array<array<struct<code:int, cvec:array<double>, half:double>>>
  * ([[graft.operators.ProductQuant.packedBooks]]'s one-row broadcast
  * column). Returns array<int> of m codes; null if shapes are malformed
  * (u length not a multiple of m, cvec length ≠ d, null elements) —
  * cases the HOF form would fill with nulls mid-plan. */
case class PqEncodeCodes(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = {
    val uOk = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val bOk = right.dataType match {
      case ArrayType(ArrayType(StructType(fields), _), _)
        if fields.length == 3 &&
          fields(0).dataType == IntegerType &&
          fields(1).dataType == ArrayType(DoubleType, true) &&
          fields(2).dataType == DoubleType => true
      case ArrayType(ArrayType(StructType(fields), _), _)
        if fields.length == 3 &&
          fields(0).dataType == IntegerType &&
          fields(1).dataType == ArrayType(DoubleType, false) &&
          fields(2).dataType == DoubleType => true
      case _ => false
    }
    if (uOk && bOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs (array<double>, array<array<struct<int,array<double>,double>>>), " +
        s"got ${left.dataType} / ${right.dataType}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val u = l.asInstanceOf[ArrayData]
    val books = r.asInstanceOf[ArrayData]
    val m = books.numElements()
    val dim = u.numElements()
    if (m == 0 || dim % m != 0) return null
    val d = dim / m
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      if (books.isNullAt(j)) return null
      val entries = books.getArray(j)
      val ks = entries.numElements()
      if (ks == 0) return null
      var best = 0.0
      var bestCode = 0
      var first = true
      var c = 0
      while (c < ks) {
        if (entries.isNullAt(c)) return null
        val en = entries.getStruct(c, 3)
        if (en.isNullAt(0) || en.isNullAt(1) || en.isNullAt(2)) return null
        val code = en.getInt(0)
        val cvec = en.getArray(1)
        if (cvec.numElements() != d) return null
        var acc = 0.0
        var p = 0
        while (p < d) {
          if (u.isNullAt(j * d + p) || cvec.isNullAt(p)) return null
          acc += u.getDouble(j * d + p) * cvec.getDouble(p)
          p += 1
        }
        val score = acc - en.getDouble(2)
        val cmp = java.lang.Double.compare(score, best)
        if (first || cmp > 0 || (cmp == 0 && code > bestCode)) {
          best = score; bestCode = code; first = false
        }
        c += 1
      }
      codes(j) = bestCode
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (u, books) => {
      val m = ctx.freshName("m")
      val dim = ctx.freshName("dim")
      val d = ctx.freshName("d")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val entries = ctx.freshName("entries")
      val ks = ctx.freshName("ks")
      val best = ctx.freshName("best")
      val bestCode = ctx.freshName("bestCode")
      val first = ctx.freshName("first")
      val c = ctx.freshName("c")
      val en = ctx.freshName("en")
      val code = ctx.freshName("code")
      val cvec = ctx.freshName("cvec")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val score = ctx.freshName("score")
      val cmp = ctx.freshName("cmp")
      val done = ctx.freshName("done")
      s"""
         |int $m = $books.numElements();
         |int $dim = $u.numElements();
         |boolean $done = false;
         |if ($m == 0 || $dim % $m != 0) { ${ev.isNull} = true; $done = true; }
         |int $d = $done ? 0 : $dim / $m;
         |int[] $codes = $done ? null : new int[$m];
         |for (int $j = 0; !$done && $j < $m; $j++) {
         |  if ($books.isNullAt($j)) { ${ev.isNull} = true; $done = true; break; }
         |  org.apache.spark.sql.catalyst.util.ArrayData $entries = $books.getArray($j);
         |  int $ks = $entries.numElements();
         |  if ($ks == 0) { ${ev.isNull} = true; $done = true; break; }
         |  double $best = 0.0;
         |  int $bestCode = 0;
         |  boolean $first = true;
         |  for (int $c = 0; $c < $ks; $c++) {
         |    if ($entries.isNullAt($c)) { ${ev.isNull} = true; $done = true; break; }
         |    org.apache.spark.sql.catalyst.InternalRow $en = $entries.getStruct($c, 3);
         |    if ($en.isNullAt(0) || $en.isNullAt(1) || $en.isNullAt(2)) {
         |      ${ev.isNull} = true; $done = true; break;
         |    }
         |    int $code = $en.getInt(0);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cvec = $en.getArray(1);
         |    if ($cvec.numElements() != $d) { ${ev.isNull} = true; $done = true; break; }
         |    double $acc = 0.0;
         |    for (int $p = 0; $p < $d; $p++) {
         |      if ($u.isNullAt($j * $d + $p) || $cvec.isNullAt($p)) {
         |        ${ev.isNull} = true; $done = true; break;
         |      }
         |      $acc += $u.getDouble($j * $d + $p) * $cvec.getDouble($p);
         |    }
         |    if ($done) break;
         |    double $score = $acc - $en.getDouble(2);
         |    int $cmp = java.lang.Double.compare($score, $best);
         |    if ($first || $cmp > 0 || ($cmp == 0 && $code > $bestCode)) {
         |      $best = $score; $bestCode = $code; $first = false;
         |    }
         |  }
         |  if (!$done) $codes[$j] = $bestCode;
         |}
         |if (!${ev.isNull})
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** ADC score — Σ_j lut[codes[j] + j·ks] over a flat m·ks lookup table,
  * the per-row scoring of every PQ serving path. Bit-identical to the
  * chain it replaces (`(0 until m).map(j => element_at(lut, codes[j] +
  * j·ks + 1)).reduce(_ + _)` — same left-fold addition order, null when
  * any code or LUT slot is null or out of range, exactly element_at's
  * non-ANSI semantics). Why native: the chain references the LUT
  * expression m times, and for single-probe queries the LUT is an m·ks
  * LITERAL array — 16 inlined copies of 512 doubles made the PQ drives'
  * plans ~180 KB each (slow to analyze, big task binaries). One
  * reference + one codegen'd loop. ks derives from the data: lut length
  * must be a multiple of m. */
case class AdcSum(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_sum needs (array<int>, array<double>), got $l / $r")
    }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val codes = l.asInstanceOf[ArrayData]
    val lut = r.asInstanceOf[ArrayData]
    val m = codes.numElements()
    val n = lut.numElements()
    if (m == 0 || n % m != 0) return null
    val ks = n / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val idx = codes.getInt(j) + j * ks
      if (idx < 0 || idx >= n || lut.isNullAt(idx)) return null
      acc += lut.getDouble(idx)
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val n = ctx.freshName("n")
      val ks = ctx.freshName("ks")
      val acc = ctx.freshName("acc")
      val j = ctx.freshName("j")
      val idx = ctx.freshName("idx")
      s"""
         |int $m = $codes.numElements();
         |int $n = $lut.numElements();
         |if ($m == 0 || $n % $m != 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $ks = $n / $m;
         |  double $acc = 0.0;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if ($codes.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    int $idx = $codes.getInt($j) + $j * $ks;
         |    if ($idx < 0 || $idx >= $n || $lut.isNullAt($idx)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    $acc += $lut.getDouble($idx);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** One-pass cosine: dot, |a|², |b|² in a single loop, then
  * dot / (sqrt(na)·sqrt(nb)) — same combination order as the HOF form
  * `dot / (l2Norm(a) * l2Norm(b))`. */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryOp {
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != b.numElements()) return null
    val lf = leftIsFloat
    val rf = rightIsFloat
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = elem(a, i, lf)
      val y = elem(b, i, rf)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  double $na = 0.0;
         |  double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = ${jGet(a, i, leftIsFloat)};
         |    double $y = ${jGet(b, i, rightIsFloat)};
         |    $dot += $x * $y;
         |    $na += $x * $x;
         |    $nb += $y * $y;
         |  }
         |  if (!${ev.isNull})
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
