package graft

import org.apache.spark.sql.types.{DataType, DecimalType, StructType, ArrayType, MapType, StructField}

/** The z1 rule, enforced structurally: NO gated query may expose a
  * DecimalType column in its OUTPUT schema. The retired z1 probe proved
  * (and README documents) that decimal output columns are categorically
  * unsafe for the driver's cross-engine hash — the hasher renders
  * decimals differently from DuckDB at string level even when values
  * are exactly equal (round 7's x190 was the one query that violated
  * this and the round's one red CORRECTNESS row). DecimalType remains
  * fine INTERNALLY (exact casts, integer-exact graph iterations); this
  * gate checks only the final projected schema of every registered
  * query. Constructing the DataFrames at sf0.001 analyzes every plan
  * (and runs the few driver-side fixpoint loops) without executing the
  * gated outputs.
  */
class SchemaGateSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private def decimalPaths(dt: DataType, path: String): Seq[String] = dt match {
    case _: DecimalType => Seq(path)
    case s: StructType =>
      s.fields.flatMap { case StructField(n, t, _, _) => decimalPaths(t, s"$path.$n") }.toSeq
    case a: ArrayType => decimalPaths(a.elementType, s"$path[]")
    case m: MapType =>
      decimalPaths(m.keyType, s"$path.key") ++ decimalPaths(m.valueType, s"$path.value")
    case _ => Seq.empty
  }

  test("z1 rule: no registered query exposes a DecimalType output column") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      val schema = q(spark, sfDir).schema
      schema.fields.flatMap { case StructField(n, t, _, _) =>
        decimalPaths(t, n).map(p => s"$name: $p")
      }
    }
    assert(offenders.isEmpty,
      s"decimal OUTPUT columns are unsafe for the driver hash (z1 rule; README):\n" +
        offenders.mkString("\n"))
  }
}
