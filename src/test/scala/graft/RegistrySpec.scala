package graft

import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions

/** SQL function-registry hygiene: the library must not shadow Spark
  * builtins (a SQL user typing a builtin name must get Spark's semantics),
  * and re-registration must be silent (gate queries call registerAll every
  * run — round 1's bench log was full of "replaced a previously registered
  * function" warnings). */
class RegistrySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("no registered name collides with a Spark builtin") {
    val builtins = FunctionRegistry.builtin.listFunction().map(_.funcName).toSet
    val clashes = GraftFunctions.registeredNames.filter(builtins.contains)
    assert(clashes.isEmpty,
      s"these names would shadow Spark builtins for SQL users: $clashes")
  }

  test("registerAll is idempotent — second call does not re-register") {
    GraftFunctions.registerAll(spark)
    val registry = spark.sessionState.functionRegistry
    val before = GraftFunctions.registeredNames.map { n =>
      registry.lookupFunctionBuilder(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)).orNull
    }
    GraftFunctions.registerAll(spark)
    val after = GraftFunctions.registeredNames.map { n =>
      registry.lookupFunctionBuilder(
        org.apache.spark.sql.catalyst.FunctionIdentifier(n)).orNull
    }
    assert(before.zip(after).forall { case (a, b) => a eq b },
      "re-registration must leave existing builder instances in place")
    // and the functions actually work through SQL after both calls
    val r = spark.sql("SELECT st_x(st_point(3.0, 4.0)) AS x").head()
    assert(r.getDouble(0) == 3.0)
  }

  test("geohash family is SQL-callable, casts DECIMAL literals, codegens") {
    GraftFunctions.registerAll(spark)
    // 57.64911 parses as DECIMAL — ImplicitCastInputTypes must coerce
    val r = spark.sql(
      """SELECT geohash_encode(57.64911, 10.40744, 11) AS h,
               geohash_lat(geohash_encode(57.64911, 10.40744, 11)) AS la,
               geohash_lon('not-a-hash') AS bad""").head()
    assert(r.getString(0) == "u4pruydqqvj")
    assert(math.abs(r.getDouble(1) - 57.64911) < 1e-5)
    assert(r.isNullAt(2), "malformed hash maps to SQL NULL")
  }
}
