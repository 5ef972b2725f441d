package graft

import org.apache.spark.sql.SparkSessionExtensions

/** The SQL surface of graft's codegen expressions: GraftExtensions
  * injects them at session build (SparkSessionExtensions), and
  * registerAll installs them into a live session — both paths share
  * one builder list, so testing the live-registry route plus applying
  * the extension object covers the wiring. */
class SqlExtensionsSpec extends SparkTestBase {

  test("float_dot is callable from SQL and matches the Column API bit-for-bit") {
    val spark0 = spark
    import spark0.implicits._
    GraftExtensions.registerAll(spark)

    val d = spark.sql(
      """SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)),
        |                 array(CAST(3 AS FLOAT), CAST(0.5 AS FLOAT))) AS d""".stripMargin)
      .as[Double].head()
    assert(d == 1.5 * 3 + 2 * 0.5)

    val dir = "/root/testdata/sf0.001"
    spark.read.parquet(s"$dir/embeddings.parquet").createOrReplaceTempView("emb_sql")
    val viaSql = spark.sql(
      "SELECT vec_id, float_dot(embedding, embedding) AS d FROM emb_sql")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val viaApi = spark.read.parquet(s"$dir/embeddings.parquet")
      .select($"vec_id", graft.functions.FloatDot($"embedding", $"embedding").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(viaSql == viaApi)
    assert(viaSql.nonEmpty && viaSql.values.forall(_ > 0.0))
  }

  test("float_dot matches the zip_with fold on RAGGED and null-element input (null, not garbage)") {
    GraftExtensions.registerAll(spark)
    // ragged: zip_with pads the shorter array with nulls -> fold NULL;
    // a truncated dot product would return a plausible number instead
    def both(sql: String): (Option[Double], Option[Double]) = {
      val r = spark.sql(
        s"""SELECT float_dot($sql) AS fd,
           |  aggregate(zip_with($sql, (x, y) -> x * y),
           |            CAST(0.0 AS DOUBLE), (a, x) -> a + CAST(x AS DOUBLE)) AS fold""".stripMargin)
        .head()
      (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
        if (r.isNullAt(1)) None else Some(r.getDouble(1)))
    }
    val ragged = both(
      "array(CAST(1 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT))")
    assert(ragged._1.isEmpty && ragged._1 == ragged._2, ragged.toString)
    val nullElem = both(
      "array(CAST(1 AS FLOAT), CAST(NULL AS FLOAT)), array(CAST(3 AS FLOAT), CAST(4 AS FLOAT))")
    assert(nullElem._1.isEmpty && nullElem._1 == nullElem._2, nullElem.toString)
    val clean = both(
      "array(CAST(1.5 AS FLOAT), CAST(2 AS FLOAT)), array(CAST(3 AS FLOAT), CAST(0.5 AS FLOAT))")
    assert(clean._1.contains(1.5 * 3 + 2 * 0.5) && clean._1 == clean._2, clean.toString)
  }

  test("float_dot rejects non-float arrays at analysis (getFloat on doubles would be garbage)") {
    GraftExtensions.registerAll(spark)
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT float_dot(array(1.0D), array(2.0D))").collect()
    }
  }

  test("the extension object injects the same builders without error") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext) // session-build path: same list wired in
    // arity misuse is rejected by the shared builder
    val (_, _, builder) = GraftExtensions.functions.head
    intercept[IllegalArgumentException] { builder(Seq.empty) }
  }
}
