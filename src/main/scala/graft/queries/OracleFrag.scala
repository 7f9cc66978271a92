package graft.queries

/** DuckDB SQL fragments restating the Catalyst vector expressions as the
  * same index-ordered double folds, for bit-identical oracle results.
  */
object OracleFrag {
  def dkL2sq(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> (CAST($a[i] AS DOUBLE) - CAST($b[i] AS DOUBLE))^2))"
  def dkDot(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  def dkNormSq(a: String): String = dkDot(a, a)
  def dkCos(a: String, b: String): String =
    s"(1 - ${dkDot(a, b)} / sqrt(${dkNormSq(a)} * ${dkNormSq(b)}))"
}
