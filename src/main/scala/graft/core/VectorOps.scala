package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-column vector math as native Catalyst expressions (zip_with /
  * aggregate / transform) — whole-stage-codegen friendly, no UDFs, so the
  * hot path of kNN / ANN / dedup scans stays inside codegen at scale.
  *
  * Mirrors the dense-vector primitives of the reference's ml-prims
  * (cpp/src_prims/linalg — reference cpp/src_prims/linalg/norm.h) without
  * any of its CUDA execution model.
  */
object VectorOps {
  /** Σ a_i * b_i for two array<float|double> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Σ a_i². */
  def sqNorm(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v * v)

  def norm(a: Column): Column = sqrt(sqNorm(a))

  /** Squared euclidean distance between two array columns. */
  def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity; 0-vectors yield NULL (division by zero → null in SQL). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Scale an array column by a scalar column. */
  def scale(a: Column, s: Column): Column = transform(a, x => x * s)

  /** Elementwise sum of two array columns. */
  def add(a: Column, b: Column): Column = zip_with(a, b, (x, y) => x + y)
}
