package graft.operators

import graft.SparkFixture
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property check for the d6 star-contraction fallback: on RANDOM
  * graphs (not just the hand-picked chains in DedupGroupsSpec) the
  * distributed large-star/small-star fixpoint must label every node
  * with exactly its union-find component minimum. Runs the real
  * Spark operator per case; 10 cases on 15-node graphs keeps the
  * suite fast while still covering cycles, stars, chains and forests
  * the generator produces. */
object StarContractPropSpec extends Properties("starContract") {

  private lazy val spark = SparkFixture.session

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(for {
      a <- Gen.chooseNum(0L, 14L)
      b <- Gen.chooseNum(0L, 14L) if a != b
    } yield (a, b))

  property("labelsEqualUnionFindComponents") = Prop.forAll(edgeGen) { es =>
    import spark.implicits._
    val labels = Dedup.starContract(es.toDF("src", "dst")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = es.flatMap(e => Seq(e._1, e._2)).distinct
      .map(id => id -> find(id)).toMap
    labels == expected
  }
}
