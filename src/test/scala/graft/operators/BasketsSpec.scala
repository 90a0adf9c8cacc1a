package graft.operators

import graft.SparkTestBase

class BasketsSpec extends SparkTestBase {

  private def baskets = {
    val ss = spark
    import ss.implicits._
    Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 2L), // duplicate line must not double count
      (3L, 1L), (3L, 2L),
      (4L, 3L)
    ).toDF("o", "p")
  }

  test("cooccurrence: exact supports, pair counts, and lift") {
    val out = Baskets.cooccurrence(baskets, "o", "p", topK = 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    // supports: item1 in 3 baskets, item2 in 3, item3 in 2; nB = 4
    assert(out.toSeq == Seq(
      (1L, 2L, 3L, 3L, 3L, 1.3333), // lift = 3*4/(3*3)
      (1L, 3L, 1L, 3L, 2L, 0.6667),
      (2L, 3L, 1L, 3L, 2L, 0.6667)))
  }

  test("cooccurrence refuses a basket past maxBasket loudly") {
    val ex = intercept[IllegalArgumentException] {
      Baskets.cooccurrence(baskets, "o", "p", topK = 10, maxBasket = 2)
    }
    assert(ex.getMessage.contains("maxBasket"))
  }
}
