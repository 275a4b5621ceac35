package graft.operators

import graft.SparkSpec

class CoresetSpec extends SparkSpec {
  import spark.implicits._

  test("kCenter: farthest-point rounds, tie-to-id, assignment counts") {
    // 1-D points at 0, 1, 10, 11, 20 (ids 0,1,2,3,4). Seed = id 0.
    // Round 2: farthest is 20 (d²=400e9). Round 3: min-dists are
    // {0, 1e9, 100e9, 81e9} → picks 10. Assignments: {0,1}→c1,
    // {20}→c2, {10,11}→c3.
    val df = Seq((0L, Array(0f)), (1L, Array(1f)), (2L, Array(10f)),
      (3L, Array(11f)), (4L, Array(20f))).toDF("vec_id", "emb")
    val got = Coreset.kCenter(df, "vec_id", "emb", k = 3)
      .collect().map(r => r.getAs[Long]("sel_round") -> r).toMap
    assert(got(1L).getAs[Long]("center_id") == 0L)
    assert(got(1L).isNullAt(got(1L).fieldIndex("sel_dist")))
    assert(got(1L).getAs[Long]("n_assigned") == 2L)
    assert(got(2L).getAs[Long]("center_id") == 4L)
    assert(got(2L).getAs[Long]("sel_dist") == 400000000000L)
    assert(got(2L).getAs[Long]("n_assigned") == 1L)
    assert(got(3L).getAs[Long]("center_id") == 2L)
    assert(got(3L).getAs[Long]("sel_dist") == 100000000000L)
    assert(got(3L).getAs[Long]("n_assigned") == 2L)
  }

  test("kCenter: duplicate-vector center later never steals (tie rule)") {
    // ids 0 and 1 share a vector; k=2 with only two distinct positions
    // → c2 is the far point, and the duplicate assigns to round 1
    val df = Seq((0L, Array(0f)), (1L, Array(0f)), (2L, Array(5f)))
      .toDF("vec_id", "emb")
    val got = Coreset.kCenter(df, "vec_id", "emb", k = 2)
      .collect().map(r => r.getAs[Long]("sel_round") -> r).toMap
    assert(got(1L).getAs[Long]("n_assigned") == 2L)
    assert(got(2L).getAs[Long]("center_id") == 2L)
    assert(got(2L).getAs[Long]("n_assigned") == 1L)
  }
}
