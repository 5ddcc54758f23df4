package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the hot vector/hash loops. These stay
  * inside whole-stage codegen (`doGenCode` emits a tight primitive loop),
  * replacing zip_with/aggregate HOF chains that allocate an intermediate
  * array per row-pair — the difference between ~2 GB/s and ~50 MB/s on an
  * O(n²) similarity join.
  *
  * Numeric contract: [[DotProduct]] accumulates left-to-right in element
  * order, exactly like `aggregate(zip_with(a,b,_*_),0.0,_+_)` and like
  * DuckDB's `list_dot_product` — bit-identical results, so the DuckDB
  * oracle comparison stays exact.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // callers guarantee array<double> inputs (VectorOps casts explicitly)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(left = l, right = r)
}

/** 64-bit SimHash over pre-hashed tokens (array<long>): per-bit ±1 votes,
  * bit set when votes > 0. Equivalent to 64 aggregate() HOF passes but in
  * one O(tokens × 64) codegen loop. */
case class SimHash64(child: Expression) extends UnaryExpression {

  // caller guarantees array<long> input (pre-hashed tokens)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val counts = ctx.freshName("counts")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** MinHash signature over pre-hashed shingles (array<long>): for each of
  * `numHashes` seeds, min over shingles of a splitmix64-style remix of
  * (hash, seed). One O(shingles × numHashes) loop instead of numHashes
  * transform+array_min passes. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  // caller guarantees array<long> input (pre-hashed shingles)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < hs.numElements()) {
      val h = hs.getLong(i)
      var s = 0
      while (s < numHashes) {
        val m = MinHashSignature.mix(h + (s.toLong * 0x9E3779B97F4A7C15L))
        if (m < out(s)) out(s) = m
        s += 1
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val z = ctx.freshName("z")
      s"""
         |long[] $out = new long[$numHashes];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  for (int $s = 0; $s < $numHashes; $s++) {
         |    long $z = $a.getLong($i) + ((long) $s * 0x9E3779B97F4A7C15L);
         |    $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
         |    $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
         |    $z = $z ^ ($z >>> 31);
         |    if ($z < $out[$s]) $out[$s] = $z;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSignature {
  /** splitmix64 finalizer — must match the codegen above bit for bit. */
  def mix(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** Contiguous `n`-token shingles over a token array (array<string> →
  * array<string>, tokens joined by a single space).
  *
  * Exists because the HOF formulation
  * `transform(sequence(…), i => concat_ws(" ", element_at(toks,i), …))`
  * is interpreted (HigherOrderFunction has no codegen) and re-evaluates
  * any non-attribute `toks` child once per lambda element — on a
  * `split(text)` input that turns O(tokens) into O(tokens × split(text)).
  * Here the child array is evaluated exactly once per row.
  */
case class Shingles(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "shingles"

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val m = toks.numElements() - (n - 1)
    if (m <= 0) return ArrayData.toArrayData(Array.empty[Any])
    val out = new Array[Any](m)
    val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var i = 0
    while (i < m) {
      val parts = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var k = 0
      while (k < n) {
        parts(k) = toks.getUTF8String(i + k)
        k += 1
      }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(space, parts: _*)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val space = ctx.addReferenceObj("space",
        org.apache.spark.unsafe.types.UTF8String.fromString(" "),
        "org.apache.spark.unsafe.types.UTF8String")
      val m = ctx.freshName("m")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      s"""
         |int $m = $a.numElements() - ${n - 1};
         |if ($m < 0) $m = 0;
         |Object[] $out = new Object[$m];
         |org.apache.spark.unsafe.types.UTF8String[] $parts =
         |  new org.apache.spark.unsafe.types.UTF8String[$n];
         |for (int $i = 0; $i < $m; $i++) {
         |  for (int $k = 0; $k < $n; $k++) {
         |    $parts[$k] = $a.getUTF8String($i + $k);
         |  }
         |  $out[$i] = org.apache.spark.unsafe.types.UTF8String.concatWs($space, $parts);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Nearest coarse-quantizer cell for a vector: argmax over a SMALL
  * driver-resident centroid set of `dot(v, c) / (sqrt(n2) * sqrt(cn))`,
  * ties to the first (lowest-cid) centroid — bit-identical to
  * `row_number() OVER (ORDER BY cosine DESC, cid ASC) = 1` including
  * Spark/DuckDB's NaN-sorts-largest double ordering
  * (java.lang.Double.compare). The centroids are constructor constants
  * (embedded via codegen references, like a broadcast), so cell
  * assignment is a pure per-row map: NO crossJoin row expansion and NO
  * exchange — at 100 TB the assignment costs exactly one corpus scan.
  *
  * `centIds` must be sorted ascending; `centVecs`/`centNorms` are
  * positionally aligned with it.
  */
case class NearestCell(vec: Expression, norm2: Expression,
    centVecs: Array[Array[Double]], centNorms: Array[Double],
    centIds: Array[Long]) extends BinaryExpression {

  require(centIds.length == centVecs.length &&
    centIds.length == centNorms.length && centIds.nonEmpty,
    "centroid ids/vectors/norms must be non-empty and aligned")

  override def left: Expression = vec
  override def right: Expression = norm2
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val sq = math.sqrt(b.asInstanceOf[Double])
    var best = 0.0
    var bestId = 0L
    var j = 0
    while (j < centIds.length) {
      val cv = centVecs(j)
      val n = math.min(v.numElements(), cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * cv(i); i += 1 }
      val cos = dot / (sq * math.sqrt(centNorms(j)))
      if (j == 0 || java.lang.Double.compare(cos, best) > 0) {
        best = cos; bestId = centIds(j)
      }
      j += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cents = ctx.addReferenceObj("centVecs", centVecs, "double[][]")
      val norms = ctx.addReferenceObj("centNorms", centNorms, "double[]")
      val ids = ctx.addReferenceObj("centIds", centIds, "long[]")
      val sq = ctx.freshName("sq")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val j = ctx.freshName("j")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val cos = ctx.freshName("cos")
      s"""
         |double $sq = java.lang.Math.sqrt($b);
         |double $best = 0.0;
         |long $bestId = 0L;
         |for (int $j = 0; $j < $ids.length; $j++) {
         |  double[] $cv = $cents[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $cv[$i];
         |  }
         |  double $cos = $dot / ($sq * java.lang.Math.sqrt($norms[$j]));
         |  if ($j == 0 || java.lang.Double.compare($cos, $best) > 0) {
         |    $best = $cos; $bestId = $ids[$j];
         |  }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(vec = l, norm2 = r)
}

/** Flat nearest-cell assignment with the centroid set as DATA: the third
  * child is a COLUMN of (cid, cv, cn) structs in ascending-cid order —
  * in practice one `collect_list` row broadcast to every task — so a
  * Lloyd training loop can chain iterations entirely in DataFrames: no
  * centroid ever returns to the driver to be re-embedded as a plan
  * constant. Per-row cost, cosine arithmetic, and tie-breaking are
  * exactly [[NearestCell]]'s (first index wins on ties ⇔ ascending-cid
  * ⇔ `row_number() OVER (ORDER BY cos DESC, cid)` = 1); spec-asserted
  * bit-equal to [[NearestCell]] under the same centroid set. */
case class NearestCellData(vec: Expression, norm2: Expression,
    cents: Expression) extends TernaryExpression {

  override def first: Expression = vec
  override def second: Expression = norm2
  override def third: Expression = cents
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cell_data"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val sq = math.sqrt(b.asInstanceOf[Double])
    val cs = c.asInstanceOf[ArrayData]
    var best = 0.0
    var bestId = 0L
    var j = 0
    while (j < cs.numElements()) {
      val cRow = cs.getStruct(j, 3)
      val cv = cRow.getArray(1)
      val n = math.min(v.numElements(), cv.numElements())
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * cv.getDouble(i); i += 1 }
      val cos = dot / (sq * math.sqrt(cRow.getDouble(2)))
      if (j == 0 || java.lang.Double.compare(cos, best) > 0) {
        best = cos; bestId = cRow.getLong(0)
      }
      j += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) => {
      val sq = ctx.freshName("sq")
      val best = ctx.freshName("best")
      val bestId = ctx.freshName("bestId")
      val j = ctx.freshName("j")
      val cRow = ctx.freshName("cRow")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val cos = ctx.freshName("cos")
      s"""
         |double $sq = java.lang.Math.sqrt($b);
         |double $best = 0.0;
         |long $bestId = 0L;
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  org.apache.spark.sql.catalyst.InternalRow $cRow = $c.getStruct($j, 3);
         |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $cRow.getArray(1);
         |  int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $cv.getDouble($i);
         |  }
         |  double $cos = $dot / ($sq * java.lang.Math.sqrt($cRow.getDouble(2)));
         |  if ($j == 0 || java.lang.Double.compare($cos, $best) > 0) {
         |    $best = $cos; $bestId = $cRow.getLong(0);
         |  }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): Expression =
    copy(vec = f, norm2 = s, cents = t)
}

/** Two-level (coarse → fine) nearest-cell assignment in one per-row
  * codegen map: argmax cosine over the coarse centroids picks an index,
  * then argmax cosine over THAT cell's fine centroids returns the fine
  * cell id. Per-row cost is O(nCoarse + nFine) centroid dots — for K
  * total cells sized nCoarse = nFine = √K, O(2·√K) instead of the flat
  * [[NearestCell]]'s O(K) — the path past the flat quantizer's
  * plan-size clamp. Tie-breaking and cosine arithmetic are exactly
  * [[NearestCell]]'s (first index wins on ties ⇔ ascending-id order ⇔
  * `row_number() OVER (ORDER BY cos DESC, id)` = 1), so the assignment
  * is oracle-checkable with the same nested-row_number SQL.
  *
  * `coarse*` arrays are ascending-id aligned; `fine*(j)` are the fine
  * centroids of coarse index j, each ascending by `fineIds(j)`. */
case class NearestCellTwoLevel(vec: Expression, norm2: Expression,
    coarseVecs: Array[Array[Double]], coarseNorms: Array[Double],
    fineVecs: Array[Array[Array[Double]]], fineNorms: Array[Array[Double]],
    fineIds: Array[Array[Long]]) extends BinaryExpression {

  require(coarseVecs.nonEmpty &&
    coarseVecs.length == coarseNorms.length &&
    coarseVecs.length == fineVecs.length &&
    coarseVecs.length == fineNorms.length &&
    coarseVecs.length == fineIds.length &&
    fineIds.forall(_.nonEmpty),
    "coarse/fine centroid arrays must be non-empty and aligned")

  override def left: Expression = vec
  override def right: Expression = norm2
  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cell_two_level"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val sq = math.sqrt(b.asInstanceOf[Double])
    var bestCos = 0.0
    var bestJ = 0
    var j = 0
    while (j < coarseVecs.length) {
      val cv = coarseVecs(j)
      val n = math.min(v.numElements(), cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * cv(i); i += 1 }
      val cos = dot / (sq * math.sqrt(coarseNorms(j)))
      if (j == 0 || java.lang.Double.compare(cos, bestCos) > 0) {
        bestCos = cos; bestJ = j
      }
      j += 1
    }
    val fv = fineVecs(bestJ)
    val fn = fineNorms(bestJ)
    val fi = fineIds(bestJ)
    var bestF = 0.0
    var bestId = 0L
    var k = 0
    while (k < fi.length) {
      val cv = fv(k)
      val n = math.min(v.numElements(), cv.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += v.getDouble(i) * cv(i); i += 1 }
      val cos = dot / (sq * math.sqrt(fn(k)))
      if (k == 0 || java.lang.Double.compare(cos, bestF) > 0) {
        bestF = cos; bestId = fi(k)
      }
      k += 1
    }
    bestId
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cvs = ctx.addReferenceObj("coarseVecs", coarseVecs, "double[][]")
      val cns = ctx.addReferenceObj("coarseNorms", coarseNorms, "double[]")
      val fvs = ctx.addReferenceObj("fineVecs", fineVecs, "double[][][]")
      val fns = ctx.addReferenceObj("fineNorms", fineNorms, "double[][]")
      val fis = ctx.addReferenceObj("fineIds", fineIds, "long[][]")
      val sq = ctx.freshName("sq")
      val bestCos = ctx.freshName("bestCos")
      val bestJ = ctx.freshName("bestJ")
      val bestF = ctx.freshName("bestF")
      val bestId = ctx.freshName("bestId")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val cv = ctx.freshName("cv")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val cos = ctx.freshName("cos")
      s"""
         |double $sq = java.lang.Math.sqrt($b);
         |double $bestCos = 0.0;
         |int $bestJ = 0;
         |for (int $j = 0; $j < $cvs.length; $j++) {
         |  double[] $cv = $cvs[$j];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $cv[$i];
         |  }
         |  double $cos = $dot / ($sq * java.lang.Math.sqrt($cns[$j]));
         |  if ($j == 0 || java.lang.Double.compare($cos, $bestCos) > 0) {
         |    $bestCos = $cos; $bestJ = $j;
         |  }
         |}
         |double $bestF = 0.0;
         |long $bestId = 0L;
         |for (int $k = 0; $k < $fis[$bestJ].length; $k++) {
         |  double[] $cv = $fvs[$bestJ][$k];
         |  int $n = java.lang.Math.min($a.numElements(), $cv.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $a.getDouble($i) * $cv[$i];
         |  }
         |  double $cos = $dot / ($sq * java.lang.Math.sqrt($fns[$bestJ][$k]));
         |  if ($k == 0 || java.lang.Double.compare($cos, $bestF) > 0) {
         |    $bestF = $cos; $bestId = $fis[$bestJ][$k];
         |  }
         |}
         |${ev.value} = $bestId;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression)
      : Expression = copy(vec = l, norm2 = r)
}

/** Product-quantization encoder: split the input vector into
  * `codebooks.length` contiguous subspaces and emit, per subspace, the
  * index of the L2-nearest codeword — all m codes in ONE per-row codegen
  * map (array<long> out). The codebooks are constructor constants
  * (driver-resident, embedded like a broadcast), so encoding a 100 TB
  * corpus is exactly one scan: no join, no exchange, no per-row
  * allocation beyond the m-long code array.
  *
  * Ties go to the smallest code (strict `<` keeps the first minimum);
  * NaN distances follow java.lang.Double.compare, mirroring the SQL
  * oracle's `ORDER BY d ASC, code ASC`. `codebooks(s)(j)` is codeword j
  * of subspace s; all subspaces must share one sub-dimension.
  */
case class PqEncode(vec: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "codebooks must be non-empty per subspace")
  private val subDim = codebooks(0)(0).length
  require(codebooks.forall(_.forall(_.length == subDim)),
    "all codewords must share one sub-dimension")

  override def child: Expression = vec
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val m = codebooks.length
    val codes = new Array[Long](m)
    var s = 0
    while (s < m) {
      val cb = codebooks(s)
      val off = s * subDim
      var best = 0.0
      var bj = 0L
      var j = 0
      while (j < cb.length) {
        val cw = cb(j)
        var d = 0.0
        var i = 0
        while (i < subDim && off + i < v.numElements()) {
          val diff = v.getDouble(off + i) - cw(i)
          d += diff * diff
          i += 1
        }
        if (j == 0 || java.lang.Double.compare(d, best) < 0) { best = d; bj = j }
        j += 1
      }
      codes(s) = bj
      s += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
      val codes = ctx.freshName("codes")
      val s = ctx.freshName("s")
      val sub = ctx.freshName("sub")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bj = ctx.freshName("bj")
      val j = ctx.freshName("j")
      val cw = ctx.freshName("cw")
      val d = ctx.freshName("d")
      val i = ctx.freshName("i")
      val diff = ctx.freshName("diff")
      s"""
         |long[] $codes = new long[$cb.length];
         |for (int $s = 0; $s < $cb.length; $s++) {
         |  double[][] $sub = $cb[$s];
         |  int $off = $s * $subDim;
         |  double $best = 0.0;
         |  long $bj = 0L;
         |  for (int $j = 0; $j < $sub.length; $j++) {
         |    double[] $cw = $sub[$j];
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $subDim && $off + $i < $a.numElements(); $i++) {
         |      double $diff = $a.getDouble($off + $i) - $cw[$i];
         |      $d += $diff * $diff;
         |    }
         |    if ($j == 0 || java.lang.Double.compare($d, $best) < 0) {
         |      $best = $d; $bj = $j;
         |    }
         |  }
         |  $codes[$s] = $bj;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(vec = c)
}

/** z = Rᵀ·x with R a driver-resident square constant (embedded in the
  * plan like a broadcast, same pattern as [[NearestCell]]/[[PqEncode]]):
  * one fused primitive loop inside whole-stage codegen, replacing the
  * `transform(sequence…, aggregate(sequence…))` HOF form whose lambdas
  * run interpreted and re-evaluate per element — the corpus-wide OPQ
  * rotation at scan speed.
  *
  * Numeric contract: output j accumulates R(i,j)·x(i) for i ascending,
  * left-to-right — bit-identical to the HOF fold it replaces, so
  * rotation-identity tests (R = I ⇒ z = x exactly) keep holding. */
case class MatVecT(vec: Expression, matrix: Array[Array[Double]])
    extends UnaryExpression {

  private val d = matrix.length
  require(d > 0 && matrix.forall(_.length == d), "matrix must be square")

  override def child: Expression = vec
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "mat_vec_t"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    // a mis-sized vector must fail loudly: truncating or zero-padding
    // would silently rotate into the wrong subspace and corrupt every
    // downstream OPQ code without any visible error
    if (v.numElements() != d) throw new IllegalArgumentException(
      s"mat_vec_t: vector has ${v.numElements()} elements, rotation is ${d}x$d")
    val out = new Array[Double](d)
    var j = 0
    while (j < d) {
      var acc = 0.0
      var i = 0
      while (i < d) { acc += matrix(i)(j) * v.getDouble(i); i += 1 }
      out(j) = acc
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("matrix", matrix, "double[][]")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $d) {
         |  throw new IllegalArgumentException(
         |    "mat_vec_t: vector has " + $a.numElements() +
         |    " elements, rotation is $d" + "x" + "$d");
         |}
         |double[] $out = new double[$d];
         |for (int $j = 0; $j < $d; $j++) {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    $acc += $m[$i][$j] * $a.getDouble($i);
         |  }
         |  $out[$j] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(vec = c)
}

object VectorExpressions {
  import org.apache.spark.sql.graft.Bridge.{column, expression}

  def dotProduct(a: Column, b: Column): Column =
    column(DotProduct(expression(a), expression(b)))
  def simhash64(hashes: Column): Column = column(SimHash64(expression(hashes)))
  def minhashSignature(hashes: Column, numHashes: Int): Column =
    column(MinHashSignature(expression(hashes), numHashes))
  def shingles(tokens: Column, n: Int): Column =
    column(Shingles(expression(tokens), n))
  def nearestCell(vec: Column, norm2: Column, centVecs: Array[Array[Double]],
      centNorms: Array[Double], centIds: Array[Long]): Column =
    column(NearestCell(expression(vec), expression(norm2),
      centVecs, centNorms, centIds))
  def nearestCellData(vec: Column, norm2: Column, cents: Column): Column =
    column(NearestCellData(expression(vec), expression(norm2),
      expression(cents)))
  def pqEncode(vec: Column, codebooks: Array[Array[Array[Double]]]): Column =
    column(PqEncode(expression(vec), codebooks))
  def matVecT(vec: Column, matrix: Array[Array[Double]]): Column =
    column(MatVecT(expression(vec), matrix))
  def lshBandKeys(vec: Column, planes: Array[Array[Double]],
      bands: Int, bits: Int): Column =
    column(LshBandKeys(expression(vec), planes, bands, bits))
  def nearestCellTwoLevel(vec: Column, norm2: Column,
      coarseVecs: Array[Array[Double]], coarseNorms: Array[Double],
      fineVecs: Array[Array[Array[Double]]], fineNorms: Array[Array[Double]],
      fineIds: Array[Array[Long]]): Column =
    column(NearestCellTwoLevel(expression(vec), expression(norm2),
      coarseVecs, coarseNorms, fineVecs, fineNorms, fineIds))
}

/** All `bands` LSH band keys of a vector in ONE compact codegen loop:
  * key(b) = Σ_i [v · plane(b·bits+i) ≥ 0] · 2^i + (b << 32).
  *
  * Replaces bands×bits separate [[DotProduct]]-against-literal
  * expressions — at 4×11 planes the inlined per-plane loops blow the
  * whole-stage-codegen method budget and the projection silently falls
  * back to interpreted evaluation (measured ~7 s for 20k rows where this
  * loop takes well under one). Numeric contract: each projection
  * accumulates left-to-right over min(|v|, |plane|) elements — exactly
  * [[DotProduct]] — so band keys (and the golden-pinned x07 corpus
  * entry) are bit-identical to the composed form. */
case class LshBandKeys(vec: Expression, planes: Array[Array[Double]],
    bands: Int, bits: Int) extends UnaryExpression {

  require(bands > 0 && bits > 0 && planes.length == bands * bits,
    "planes must hold bands*bits rows")

  override def child: Expression = vec
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_band_keys"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = b.toLong << 32
      var i = 0
      while (i < bits) {
        val row = planes(b * bits + i)
        val n = math.min(v.numElements(), row.length)
        var acc = 0.0
        var k = 0
        while (k < n) { acc += v.getDouble(k) * row(k); k += 1 }
        if (acc >= 0) key += 1L << i
        i += 1
      }
      out(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val p = ctx.addReferenceObj("planes", planes, "double[][]")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val key = ctx.freshName("key")
      val row = ctx.freshName("row")
      s"""
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = ((long) $b) << 32;
         |  for (int $i = 0; $i < $bits; $i++) {
         |    double[] $row = $p[$b * $bits + $i];
         |    int $n = java.lang.Math.min($a.numElements(), $row.length);
         |    double $acc = 0.0;
         |    for (int $k = 0; $k < $n; $k++) {
         |      $acc += $a.getDouble($k) * $row[$k];
         |    }
         |    if ($acc >= 0) $key += 1L << $i;
         |  }
         |  $out[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(vec = newChild)
}
