package graft

import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** ScalaCheck algebraic invariants over the relational operators
  * (SURVEY §5): semi/anti partition, set-op identities, dedup idempotence.
  * 10 cases per property — each case runs real Spark jobs. */
object SetOpProps extends Properties("graft.setops") {
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkSpec.session
  import org.apache.spark.sql.functions._

  private val keys: Gen[List[Int]] = Gen.listOfN(30, Gen.choose(0, 15))

  property("semi + anti partition the left side") = forAll(keys, keys) { (a, b) =>
    import spark.implicits._
    val l = a.toDF("k")
    val r = b.toDF("k")
    val semi = l.join(r, Seq("k"), "left_semi").count()
    val anti = l.join(r, Seq("k"), "left_anti").count()
    semi + anti == l.count()
  }

  property("intersect + except partition distinct left") = forAll(keys, keys) { (a, b) =>
    import spark.implicits._
    val l = a.toDF("k")
    val r = b.toDF("k")
    l.intersect(r).count() + l.except(r).count() == l.distinct().count()
  }

  property("union-distinct is commutative") = forAll(keys, keys) { (a, b) =>
    import spark.implicits._
    val l = a.toDF("k")
    val r = b.toDF("k")
    val ab = l.union(r).distinct().collect().map(_.getInt(0)).sorted.toSeq
    val ba = r.union(l).distinct().collect().map(_.getInt(0)).sorted.toSeq
    ab == ba
  }

  property("dropDuplicates is idempotent") = forAll(keys) { a =>
    import spark.implicits._
    val d = a.toDF("k").dropDuplicates("k")
    d.dropDuplicates("k").count() == d.count()
  }

  property("salted two-phase agg equals direct agg") = forAll(keys) { a =>
    import spark.implicits._
    val df = a.toDF("k")
    val direct = df.groupBy($"k").count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val salted = df.withColumn("salt", pmod(hash($"k"), lit(4)))
      .groupBy($"k", $"salt").agg(count(lit(1)).as("c"))
      .groupBy($"k").agg(sum($"c").as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    direct == salted
  }
}
