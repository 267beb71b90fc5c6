package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expression for the dense-vector dot product over
  * `array<float>` / `array<double>` columns, with whole-stage codegen.
  *
  * The higher-order-function formulation (`aggregate(zip_with(...))`) is a
  * CodegenFallback: each pair evaluation allocates a zipped array and runs an
  * interpreted fold. This expression compiles to a primitive Java loop over
  * the two `ArrayData` buffers — the hot path of every cosine/kNN operator
  * in `graft.operators.Similarity`.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {

  private def isSupported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isSupported(left.dataType) && isSupported(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"float_dot requires array<float>/array<double> inputs, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "float_dot"

  private def elemIsFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  // Null result when lengths mismatch (a dimension bug should surface, not
  // silently truncate) or when any element is null — matching what the
  // aggregate(zip_with(...)) formulation would produce.
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val lf = elemIsFloat(left)
    val rf = elemIsFloat(right)
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $s += (double) $x.$lGet($i) * (double) $y.$rGet($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native argmin-over-centroids for k-means assignment: given a vector
  * column and a BOUNDED model (cell ids + centroid vectors, baked into the
  * expression as reference objects, ordered by ascending cell id), returns
  * `struct(d2: double, cell: bigint)` — the nearest centroid under exact
  * sequential (x−c)² folds with ties toward the smaller cell id.
  *
  * Semantically identical to `array_min(zip_with(centroids, cells, ...))`
  * over per-centroid folds (same IEEE op order, same tie rule — the
  * [[graft.operators.KMeans]] replay contract), but those higher-order
  * functions are CodegenFallback: at k=196, D=64 the interpreted argmin
  * dominated the sf10 SemDeDup decade. This compiles to two nested
  * primitive loops over the `ArrayData` buffer and a `double[][]` model —
  * n·k·D multiply-adds with no allocation per row.
  *
  * Nulls: a null vector, a dimension mismatch with any centroid, a null
  * element, or a NaN distance sum (NaN/±Inf elements — NaN fails every
  * strict-< comparison, so it could otherwise silently pin cell to the
  * smallest id) yields null (surface the bug, don't truncate — the
  * [[FloatDot]] rule).
  */
case class NearestCentroid(
    child: Expression,
    cells: Array[Long],
    centroids: Array[Array[Double]]) extends UnaryExpression {

  require(cells.nonEmpty && cells.length == centroids.length,
    "need one cell id per centroid, at least one centroid")

  private def isSupported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isSupported(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid requires an array<float>/array<double> input, got " +
        child.dataType.simpleString)

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cell", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "nearest_centroid"

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val isF = elemIsFloat
    var best = Double.PositiveInfinity
    var bestCell = 0L
    var k = 0
    while (k < centroids.length) {
      val c = centroids(k)
      if (c.length != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (vec.isNullAt(i)) return null
        val x = if (isF) vec.getFloat(i).toDouble else vec.getDouble(i)
        val d = x - c(i)
        s += d * d
        i += 1
      }
      // a non-finite sum (NaN or ±Inf elements) either fails every strict-<
      // comparison or pins +Infinity at cell 0 — surface it as null instead,
      // the same rule as a null element
      if (!java.lang.Double.isFinite(s)) return null
      // strict < + ascending-cell iteration == array_min's (d2, cell) order
      if (s < best) { best = s; bestCell = cells(k) }
      k += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestCell)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val cellsRef = ctx.addReferenceObj("ncCells", cells, "long[]")
    val centRef = ctx.addReferenceObj("ncCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, v => {
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val best = ctx.freshName("best")
      val bestCell = ctx.freshName("bestCell")
      val c = ctx.freshName("c")
      s"""
         |int $n = $v.numElements();
         |double $best = Double.POSITIVE_INFINITY;
         |long $bestCell = 0L;
         |for (int $k = 0; $k < $centRef.length && !${ev.isNull}; $k++) {
         |  double[] $c = $centRef[$k];
         |  if ($c.length != $n) { ${ev.isNull} = true; break; }
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $d = (double) $v.$get($i) - $c[$i];
         |    $s += $d * $d;
         |  }
         |  if (!${ev.isNull} && !Double.isFinite($s)) { ${ev.isNull} = true; }
         |  if (!${ev.isNull} && $s < $best) { $best = $s; $bestCell = $cellsRef[$k]; }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $best, $bestCell });
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** GROUPED argmin-over-centroids — the sub-level of a two-level (IVF-
  * hierarchy) quantizer: each row carries a group id (its coarse cell) and
  * the argmin runs ONLY over that group's sub-centroids. This is what makes
  * two-level assignment n·√k instead of n·k: the flat [[NearestCentroid]]
  * scans every centroid per row, which at SemDeDup's corpus-scaled
  * k = n/1024 turns assignment into n²/1024 distance folds (the r13 sf100
  * decade measured 622 s / 41× per decade on exactly that); here a row
  * scans just its own coarse cell's ≤⌈k/k1⌉ sub-centroids.
  *
  * Model layout (reference objects, no per-row allocation): `groupIds`
  * sorted ascending with `starts` delimiting each group's slice of the
  * flattened `cells`/`centroids` arrays (slice i = [starts(i),
  * starts(i+1))), each slice sorted by ascending cell id so the strict-<
  * scan reproduces the (d2, cell) tie rule. Group lookup is a binary
  * search — O(log k1) per row, branch-predictable.
  *
  * Null/error semantics follow [[NearestCentroid]]: null vector or group,
  * unknown group id, dimension mismatch, null element, or a non-finite
  * distance sum yields null (surface the bug, don't truncate).
  */
case class NearestCentroidIn(
    left: Expression,
    right: Expression,
    groupIds: Array[Long],
    starts: Array[Int],
    cells: Array[Long],
    centroids: Array[Array[Double]]) extends BinaryExpression {

  require(groupIds.nonEmpty && starts.length == groupIds.length + 1 &&
    starts.head == 0 && starts.last == cells.length &&
    cells.length == centroids.length,
    "need sorted group offsets delimiting one non-empty slice per group")

  private def vecSupported(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && vecSupported(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nearest_centroid_in requires (bigint group, array<float>/array<double> vec), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cell", LongType, nullable = false)))

  override def nullable: Boolean = true

  override def prettyName: String = "nearest_centroid_in"

  private def elemIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(g: Any, v: Any): Any = {
    val gi = java.util.Arrays.binarySearch(groupIds, g.asInstanceOf[Long])
    if (gi < 0) return null
    val vec = v.asInstanceOf[ArrayData]
    val n = vec.numElements()
    val isF = elemIsFloat
    var best = Double.PositiveInfinity
    var bestCell = 0L
    var k = starts(gi)
    val end = starts(gi + 1)
    while (k < end) {
      val c = centroids(k)
      if (c.length != n) return null
      var s = 0.0
      var i = 0
      while (i < n) {
        if (vec.isNullAt(i)) return null
        val x = if (isF) vec.getFloat(i).toDouble else vec.getDouble(i)
        val d = x - c(i)
        s += d * d
        i += 1
      }
      if (!java.lang.Double.isFinite(s)) return null
      if (s < best) { best = s; bestCell = cells(k) }
      k += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestCell)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val gidsRef = ctx.addReferenceObj("nciGroups", groupIds, "long[]")
    val startsRef = ctx.addReferenceObj("nciStarts", starts, "int[]")
    val cellsRef = ctx.addReferenceObj("nciCells", cells, "long[]")
    val centRef = ctx.addReferenceObj("nciCentroids", centroids, "double[][]")
    nullSafeCodeGen(ctx, ev, (g, v) => {
      val gi = ctx.freshName("gi")
      val n = ctx.freshName("n")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      val end = ctx.freshName("end")
      val best = ctx.freshName("best")
      val bestCell = ctx.freshName("bestCell")
      val c = ctx.freshName("c")
      s"""
         |int $gi = java.util.Arrays.binarySearch($gidsRef, $g);
         |if ($gi < 0) { ${ev.isNull} = true; }
         |int $n = $v.numElements();
         |double $best = Double.POSITIVE_INFINITY;
         |long $bestCell = 0L;
         |if (!${ev.isNull}) {
         |  int $end = $startsRef[$gi + 1];
         |  for (int $k = $startsRef[$gi]; $k < $end && !${ev.isNull}; $k++) {
         |    double[] $c = $centRef[$k];
         |    if ($c.length != $n) { ${ev.isNull} = true; break; }
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($v.isNullAt($i)) { ${ev.isNull} = true; break; }
         |      double $d = (double) $v.$get($i) - $c[$i];
         |      $s += $d * $d;
         |    }
         |    if (!${ev.isNull} && !Double.isFinite($s)) { ${ev.isNull} = true; }
         |    if (!${ev.isNull} && $s < $best) { $best = $s; $bestCell = $cellsRef[$k]; }
         |  }
         |}
         |if (!${ev.isNull}) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[] { $best, $bestCell });
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorExpressions {
  /** Column API for [[FloatDot]] — usable in any session, no registration
    * needed (see [[GraftExtensions]] for the SQL-name route).
    */
  def floatDot(a: Column, b: Column): Column =
    Bridge.column(FloatDot(Bridge.expression(a), Bridge.expression(b)))

  /** Column API for [[NearestCentroid]]; the model is sorted by cell id so
    * the strict-< scan reproduces the (d2, cell) tie rule.
    */
  def nearestCentroid(vec: Column, model: Array[(Long, Array[Double])]): Column = {
    val sorted = model.sortBy(_._1)
    Bridge.column(NearestCentroid(Bridge.expression(vec),
      sorted.map(_._1), sorted.map(_._2)))
  }

  /** Column API for [[NearestCentroidIn]] — grouped model as
    * `group id → (cell, centroid)*`; groups and each group's slice are
    * sorted ascending here so the binary search and the (d2, cell) tie
    * rule hold.
    */
  def nearestCentroidIn(
      group: Column,
      vec: Column,
      model: Map[Long, Array[(Long, Array[Double])]]): Column = {
    val groups = model.toArray.sortBy(_._1)
    val groupIds = groups.map(_._1)
    val slices = groups.map(_._2.sortBy(_._1))
    val starts = slices.scanLeft(0)(_ + _.length)
    Bridge.column(NearestCentroidIn(
      Bridge.expression(group), Bridge.expression(vec),
      groupIds, starts, slices.flatMap(_.map(_._1)),
      slices.flatMap(_.map(_._2))))
  }
}
