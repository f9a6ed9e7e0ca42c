package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expressions for the dense-vector hot path (reference
  * cpp/src_prims/linalg/ — norm.h, distance/): a fused dot product and
  * squared distance over `array<double>` columns.
  *
  * Why not `zip_with`/`aggregate` or an unrolled `element_at` chain: the
  * higher-order functions run their lambdas with per-element closures and an
  * intermediate array allocation per row, and the unrolled chain pays a
  * bounds/null check per element and grows the generated method linearly
  * with the dimension. These expressions compile to ONE tight `for` loop
  * over the underlying ArrayData inside whole-stage codegen — the pair scan
  * of a kNN / ANN / embedding-dedup join does a single primitive loop per
  * pair, which is what a 100 TB scan needs.
  *
  * FP contract: accumulation is sequential over i = 0..n-1, left-to-right —
  * bit-identical to the left-associated `element_at` sum it replaces, so
  * every DuckDB oracle hash is unchanged.
  *
  * Elements must be non-null (embedding vectors are dense); a null ARRAY
  * yields null (nullIntolerant).
  */
abstract class ArrayPairLoop extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true

  /** Scala accumulation step, mirrored exactly by [[javaStep]]. */
  protected def step(acc: Double, x: Double, y: Double): Double
  /** Java source for one step; `s`, `x`, `y` are in scope. */
  protected def javaStep: String

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s = step(s, x.getDouble(i), y.getDouble(i)); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double x = $a.getDouble($i);
         |  double y = $b.getDouble($i);
         |  $javaStep
         |}
         |${ev.value} = $s;
       """.stripMargin.replace("ACC", s)
    })
}

/** Σ aᵢ·bᵢ. */
case class DotProduct(left: Expression, right: Expression) extends ArrayPairLoop {
  protected def step(acc: Double, x: Double, y: Double): Double = acc + x * y
  protected def javaStep: String = "ACC += x * y;"
  override def prettyName: String = "graft_dot"
  protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Σ (aᵢ−bᵢ)². */
case class SquaredDistance(left: Expression, right: Expression) extends ArrayPairLoop {
  protected def step(acc: Double, x: Double, y: Double): Double = { val d = x - y; acc + d * d }
  protected def javaStep: String = "double d = x - y; ACC += d * d;"
  override def prettyName: String = "graft_sqdist"
  protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SquaredDistance =
    copy(left = newLeft, right = newRight)
}

/** Index (0-based, FIRST index on exact ties) of the winning dim-sized
  * block of `blocks` scored against `vec`: blocks holds k contiguous
  * anchor vectors flattened to one array of k·dim doubles, and the
  * expression returns argbest_j score(vec, blocks[j·dim .. j·dim+dim)).
  *
  * This is the quantizer-assign primitive: ONE codegen'd projection per
  * row (the flat-semdedup `array_position(array_max)` shape) instead of a
  * k-way join + per-id argmax aggregate — the aggregate route forces a
  * SortAggregate (struct-max buffers are not hash-aggregable) over k rows
  * PER INPUT ROW, each dragging the full vector payload through the sort
  * (measured 210 s for a 200k×45 fine assign; this expression does the
  * identical arithmetic in ~2 s). Per-block accumulation order and the
  * first-max tie rule match the SQL oracle's per-anchor list_sum replay
  * with min(index) FILTER (score = best) exactly. */
abstract class BlockArgBest extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullIntolerant: Boolean = true

  /** One accumulation step, mirrored by [[javaStep]]. */
  protected def step(acc: Double, x: Double, y: Double): Double
  protected def javaStep: String
  /** true = higher score wins (dot); false = lower wins (distance). */
  protected def maximize: Boolean

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val blocks = b.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val k = if (dim == 0) 0 else blocks.numElements() / dim
    var best = if (maximize) Double.NegativeInfinity else Double.PositiveInfinity
    var idx = 0
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      while (i < dim) { s = step(s, v.getDouble(i), blocks.getDouble(j * dim + i)); i += 1 }
      if (if (maximize) s > best else s < best) { best = s; idx = j }
      j += 1
    }
    idx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val best = ctx.freshName("best")
      val idx = ctx.freshName("idx")
      val cmp = if (maximize) s"$s > $best" else s"$s < $best"
      val init = if (maximize) "Double.NEGATIVE_INFINITY" else "Double.POSITIVE_INFINITY"
      s"""
         |int $dim = $a.numElements();
         |int $k = $dim == 0 ? 0 : $b.numElements() / $dim;
         |double $best = $init;
         |int $idx = 0;
         |for (int $j = 0; $j < $k; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    double x = $a.getDouble($i);
         |    double y = $b.getDouble($j * $dim + $i);
         |    $javaStep
         |  }
         |  if ($cmp) { $best = $s; $idx = $j; }
         |}
         |${ev.value} = $idx;
       """.stripMargin.replace("ACC", s)
    })
}

/** argmax_j Σᵢ vᵢ·blocks[j·dim+i] — nearest-by-dot quantizer cell. */
case class BlockArgMaxDot(left: Expression, right: Expression) extends BlockArgBest {
  protected def step(acc: Double, x: Double, y: Double): Double = acc + x * y
  protected def javaStep: String = "ACC += x * y;"
  protected def maximize: Boolean = true
  override def prettyName: String = "graft_block_argmax_dot"
  protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BlockArgMaxDot =
    copy(left = newLeft, right = newRight)
}

/** argmin_j Σᵢ (vᵢ−blocks[j·dim+i])² — nearest-pivot split cell. */
case class BlockArgMinSqDist(left: Expression, right: Expression) extends BlockArgBest {
  protected def step(acc: Double, x: Double, y: Double): Double = { val d = x - y; acc + d * d }
  protected def javaStep: String = "double d = x - y; ACC += d * d;"
  protected def maximize: Boolean = false
  override def prettyName: String = "graft_block_argmin_sqdist"
  protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BlockArgMinSqDist =
    copy(left = newLeft, right = newRight)
}

/** Hyperplane sign signature: bit j of the result is set iff
  * Σᵢ vᵢ·blocks[j·dim+i] ≥ 0 — the random-hyperplane LSH bucket id over k
  * planes flattened into one array (k ≤ 63). One codegen'd loop; the
  * per-plane `when(dot ≥ 0, 2^b)` chain it replaces stops whole-stage
  * compiling past a few dozen planes (the BlockArgBest lesson). Oracle
  * replay: SUM(CASE WHEN dot ≥ 0 THEN 1<<b ELSE 0 END) over a generated
  * plane table. */
case class BlockSignBits(left: Expression, right: Expression)
  extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_block_sign_bits"

  protected override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val blocks = b.asInstanceOf[ArrayData]
    val dim = v.numElements()
    val k = if (dim == 0) 0 else math.min(blocks.numElements() / dim, 63)
    var sig = 0L
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      while (i < dim) { s += v.getDouble(i) * blocks.getDouble(j * dim + i); i += 1 }
      if (s >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val dim = ctx.freshName("dim")
      val k = ctx.freshName("k")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      val sig = ctx.freshName("sig")
      s"""
         |int $dim = $a.numElements();
         |int $k = $dim == 0 ? 0 : java.lang.Math.min($b.numElements() / $dim, 63);
         |long $sig = 0L;
         |for (int $j = 0; $j < $k; $j++) {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $s += $a.getDouble($i) * $b.getDouble($j * $dim + $i);
         |  }
         |  if ($s >= 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): BlockSignBits =
    copy(left = newLeft, right = newRight)
}

object ArrayMath {
  def dot(a: Column, b: Column): Column =
    Bridge.column(DotProduct(Bridge.expression(a), Bridge.expression(b)))

  def sqDist(a: Column, b: Column): Column =
    Bridge.column(SquaredDistance(Bridge.expression(a), Bridge.expression(b)))

  def blockArgMaxDot(v: Column, blocks: Column): Column =
    Bridge.column(BlockArgMaxDot(Bridge.expression(v), Bridge.expression(blocks)))

  def blockArgMinSqDist(v: Column, blocks: Column): Column =
    Bridge.column(BlockArgMinSqDist(Bridge.expression(v), Bridge.expression(blocks)))

  def blockSignBits(v: Column, blocks: Column): Column =
    Bridge.column(BlockSignBits(Bridge.expression(v), Bridge.expression(blocks)))
}
