package graft

/** Smoke: every SparkEntry query runs at sf0.001 and its oracle SQL (when
  * present) is non-empty. Full value-level checking is the driver's DuckDB
  * compare (tools/check_oracle.py replicates it locally).
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sf("sf0.001")).count(); None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("oracle coverage: every query has oracle SQL") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle: $missing")
  }

  test("no query output has complex-typed columns (driver compare sorts with pandas)") {
    // The driver's correctness harness sorts result rows via pandas
    // sort_values, which cannot order array/map/struct cells (q40 failed
    // r2 this way: `unhashable type: numpy.ndarray`). Render vectors as
    // strings (concat_ws / array_to_string) instead.
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        fn(spark, sf("sf0.001")).schema.fields.collect {
          case f if f.dataType.isInstanceOf[ArrayType]
            || f.dataType.isInstanceOf[MapType]
            || f.dataType.isInstanceOf[StructType] => s"$name.${f.name}"
        }
    }
    assert(offenders.isEmpty, s"complex-typed output columns: $offenders")
  }

  test("String-overload rollup after a join is ambiguous (pinned Spark 4.1 limitation)") {
    // rollup("a", "b") trips DetectAmbiguousSelfJoin when the child is a
    // join with aliased columns; rollup(col("a"), col("b")) — which q30
    // uses — does not. If this starts PASSING on a Spark upgrade, the
    // String overload is usable again.
    import org.apache.spark.sql.functions._
    val d = sf("sf0.001")
    val base = Tables.customer(spark, d)
      .join(Tables.nation(spark, d), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation_name"), col("c_acctbal"))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      base.rollup("nation_name")
        .agg(count(lit(1)).as("n"))
        .collect()
    }
    assert(ex.getMessage.toLowerCase.contains("ambiguous"))
  }

  test("q37 HLL sketch is within 10% of exact once registers are populated") {
    // sf0.01 has ~150 distinct users per event_type over 64 buckets —
    // the populated-register regime the raw estimator targets
    val rows = queries.TrainingDataQueries.q37ApproxDistinct
      .fn(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Long]("hll_est").toDouble
      assert(math.abs(est - exact) / exact < 0.10,
        s"${r.getString(0)}: est $est vs exact $exact")
    }
  }

  test("q30 DataFrame rollup equals the SQL ROLLUP path") {
    // pins that the Column-overload rollup + GROUPING() flags stay
    // value-identical to the SQL analyzer's formulation
    val d = sf("sf0.001")
    val df = queries.AnalyticsQueries.q30Rollup.fn(spark, d).collect().toSeq
    Tables.customer(spark, d).createOrReplaceTempView("q30s_customer")
    Tables.nation(spark, d).createOrReplaceTempView("q30s_nation")
    Tables.region(spark, d).createOrReplaceTempView("q30s_region")
    val sql = spark.sql(
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal,
        |  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS grouping_flags
        |FROM q30s_customer
        |JOIN q30s_nation ON c_nationkey = n_nationkey
        |JOIN q30s_region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY grouping_flags, region_name ASC NULLS FIRST,
        |  nation_name ASC NULLS FIRST""".stripMargin).collect().toSeq
    assert(df == sql)
  }

  test("q63 integer outlier flag agrees with the fixed-point z-score") {
    val rows = queries.TextQueries.q63LengthOutliers
      .fn(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Long]("z_fp6")
      val flag = r.getAs[Boolean]("is_outlier")
      // the flag is exact integer math; the fp6 z is the same quantity
      // through one sqrt+divide — they must agree away from the 2σ
      // boundary (1e3 fp6 ≈ z within 0.001 of ±2)
      if (math.abs(math.abs(z) - 2000000L) > 1000L)
        assert(flag == (math.abs(z) > 2000000L),
          s"doc ${r.get(0)}: z_fp6 $z vs flag $flag")
    }
    val nOut = rows.count(_.getAs[Boolean]("is_outlier"))
    assert(nOut < rows.length / 10, s"$nOut outliers of ${rows.length}")
  }

  test("q64 KMV estimate: exact when exhaustive, within 50% when sketching") {
    val rows = queries.TrainingDataQueries.q64KmvDistinct
      .fn(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      val exact = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("est")
      if (k < 32) assert(est == exact, s"${r.get(0)}: exhaustive but $est != $exact")
      else assert(math.abs(est - exact).toDouble / exact < 0.5,
        s"${r.get(0)}: est $est vs exact $exact")
    }
  }

  test("q66 gap-fill: no hour missing, no unfilled value, flags consistent") {
    val rows = queries.EventQueries.q66GapfillLocf
      .fn(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, rs) =>
      val hrs = rs.map(_.getAs[Long]("hr_us")).sorted
      // the spine is dense: consecutive hours differ by exactly 1h
      hrs.sliding(2).foreach { case Array(a, b) =>
        assert(b - a == 3600000000L, s"user $u: gap in spine $a -> $b")
      case _ => ()
      }
    }
    rows.foreach { r =>
      assert(!r.isNullAt(r.fieldIndex("filled_value")),
        s"unfilled hour ${r.get(1)} for user ${r.get(0)}")
      assert(r.getAs[Boolean]("is_gap") == (r.getAs[Long]("n_events") == 0L))
    }
  }

  test("q67 layout write produces one hive directory per language") {
    queries.LayoutQueries.q67PartitionedLayout.fn(spark, sf("sf0.001")).count()
    // the query writes under the per-JVM Scratch token — resolve the
    // SAME path it used, never a hardcoded literal (a stale literal
    // passed for rounds off a leftover /tmp dir until a clean host
    // exposed it)
    val out = new java.io.File(graft.Scratch.dir("layout", sf("sf0.001")))
    val langDirs = out.listFiles().filter(_.getName.startsWith("lang="))
    val langs = Tables.documents(spark, sf("sf0.001"))
      .select("lang").distinct().count()
    assert(langDirs.length == langs,
      s"${langDirs.length} lang= dirs vs $langs languages")
  }

  test("q68 pipeline funnel is monotone and the sample is balanced") {
    val rows = queries.TextQueries.q68CorpusPipeline
      .fn(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val Seq(t, q, u, c, s) = Seq("n_total", "n_quality", "n_unique",
        "n_clean", "n_sampled").map(r.getAs[Long](_))
      assert(t >= q && q >= u && u >= c && c >= s && s > 0,
        s"${r.get(0)}: funnel $t >= $q >= $u >= $c >= $s violated")
    }
    // hash-mod thresholding at rate min/|stratum| lands every language
    // within ~25% of the smallest stratum
    val samples = rows.map(_.getAs[Long]("n_sampled"))
    assert(samples.max <= samples.min * 5 / 4 + 2,
      s"unbalanced sample: ${samples.mkString(",")}")
  }

  test("q69 Dice scores are valid ratios and support floor holds") {
    val rows = queries.TextQueries.q69BigramDice
      .fn(spark, sf("sf0.01")).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("c_xy") >= 3)
      val dice = r.getAs[Long]("dice_fp")
      // 2c_xy <= c_x + c_y always, so dice in (0, 1e6]
      assert(dice > 0 && dice <= 1000000L, s"${r.get(0)}: dice $dice")
    }
  }

  test("q70 NTILE quartiles are balanced within 1 row and bounds nest") {
    val rows = queries.AnalyticsQueries.q70NtileQuartiles
      .fn(spark, sf("sf0.01")).collect()
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      assert(rs.length == 4, s"$lang: ${rs.length} buckets")
      val sizes = rs.map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1, s"$lang: ${sizes.mkString(",")}")
      // bucket q's min must not precede bucket q-1's max
      rs.sortBy(_.getAs[Long]("q")).sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("min_tokens") >= a.getAs[Long]("max_tokens") - 0,
            s"$lang: overlapping quartile bounds")
        case _ => ()
      }
    }
  }

  test("q71 hopping windows count every event exactly size/slide times") {
    val d = sf("sf0.01")
    val total = Tables.events(spark, d).count()
    val winSum = queries.EventQueries.q71HoppingWindow.fn(spark, d)
      .agg(org.apache.spark.sql.functions.sum("n_events")).collect()(0).getLong(0)
    assert(winSum == 2 * total, s"$winSum != 2*$total")
  }

  test("q72 full outer keeps unmatched sides; q73 cube margins sum; q74 ranks cohere") {
    val d = sf("sf0.01")
    val r72 = queries.RelationalQueries.q72FullOuterReconcile
      .fn(spark, d).collect()
    assert(r72.map(_.getAs[String]("side")).distinct.length >= 2,
      "full outer degenerated to inner (only 'both' rows)")
    r72.foreach(r =>
      assert(r.getAs[Long]("n_cust") + r.getAs[Long]("n_supp") > 0))

    val r73 = queries.AnalyticsQueries.q73Cube.fn(spark, d).collect()
    val grand = r73.filter(_.getAs[Long]("grouping_flags") == 3L)
    assert(grand.length == 1)
    assert(grand(0).getAs[Long]("n_customers") ==
      Tables.customer(spark, d).count())

    val r74 = queries.AnalyticsQueries.q74RankingSuite.fn(spark, d).collect()
    r74.foreach { r =>
      assert(r.getAs[Long]("rnk") >= r.getAs[Long]("drnk"))
      val pr = r.getAs[Long]("pr_fp6")
      assert(pr >= 0 && pr <= 1000000L)
    }
    // nth_value over the full frame is constant within each partition
    r74.groupBy(_.getAs[String]("event_type")).values.foreach { rs =>
      assert(rs.map(_.getAs[Double]("third_value")).distinct.length == 1)
    }
  }

  test("q78 transition rows sum to ~1e6 per from_type; q79 age-0 retention is 100%") {
    val d = sf("sf0.01")
    queries.EventQueries.q78TransitionMatrix.fn(spark, d).collect()
      .groupBy(_.getAs[String]("from_type")).foreach { case (ft, rs) =>
        val total = rs.map(_.getAs[Long]("p_fp6")).sum
        // floor per cell loses < 1 per cell
        assert(total > 1000000L - rs.length && total <= 1000000L,
          s"$ft: probabilities sum to $total")
      }
    queries.EventQueries.q79CohortRetention.fn(spark, d).collect()
      .filter(_.getAs[Long]("age") == 0L).foreach { r =>
        assert(r.getAs[Long]("retention_fp6") == 1000000L,
          s"cohort ${r.get(0)}: age-0 retention != 100%")
        assert(r.getAs[Long]("n_active") == r.getAs[Long]("cohort_size"))
      }
  }

  test("q80 containment is a valid ratio and exact dups contain fully") {
    val rows = queries.TextQueries.q80Containment
      .fn(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ab = r.getAs[Long]("cont_ab_fp6")
      val ba = r.getAs[Long]("cont_ba_fp6")
      assert(ab > 0 && ab <= 1000000L && ba > 0 && ba <= 1000000L)
    }
    // sf0.01 has no byte-identical texts but it DOES have partial
    // copies: at least one pair where A's grams are fully inside B —
    // the asymmetric case Jaccard dilutes and containment is for
    assert(rows.exists(r => r.getAs[Long]("cont_ab_fp6") == 1000000L ||
      r.getAs[Long]("cont_ba_fp6") == 1000000L),
      "no fully-contained direction found despite subset docs in the corpus")
  }

  test("q82 prefix filtering is exact: equals brute-force Jaccard >= 0.6") {
    import org.apache.spark.sql.functions._
    import graft.functions.TextFunctions.{tokens, wordNgrams}
    val d = sf("sf0.001")
    val got = queries.TextQueries.q82PrefixFilterJoin.fn(spark, d)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1)))
    val g = Tables.documents(spark, d)
      .select(col("doc_id"),
        array_distinct(wordNgrams(tokens(col("text")), 3)).as("gs"))
      .filter(size(col("gs")) > 0)
    val brute = g.as("a").crossJoin(g.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .withColumn("ni", size(array_intersect(col("a.gs"), col("b.gs"))))
      .withColumn("nu", size(col("a.gs")) + size(col("b.gs")) - col("ni"))
      .filter(col("ni") * 5 >= col("nu") * 3)
      .select(col("a.doc_id"), col("b.doc_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet == brute.toSet,
      s"prefix filter missed ${(brute.toSet -- got.toSet).size} pairs, " +
        s"invented ${(got.toSet -- brute.toSet).size}")
  }

  test("q83 PQ: codebook seeds quantize to themselves with zero error") {
    val rows = queries.VectorQueries.q83ProductQuantization
      .fn(spark, sf("sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.filter(_.getAs[Long]("vec_id") < 16).foreach { r =>
      val id = r.getAs[Long]("vec_id")
      assert(r.getAs[String]("code") == Seq.fill(8)(id).mkString("-"),
        s"seed $id: code ${r.getAs[String]("code")}")
      assert(r.getAs[Long]("err_fp6") == 0L, s"seed $id: nonzero error")
    }
    // non-seed vectors must carry positive quantization error
    assert(rows.filter(_.getAs[Long]("vec_id") >= 16)
      .forall(_.getAs[Long]("err_fp6") > 0L))
  }

  test("q65 CMS estimates are one-sided: est >= exact for every token") {
    val rows = queries.TrainingDataQueries.q65CmsHeavyHitters
      .fn(spark, sf("sf0.01")).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_cms") >= r.getAs[Long]("n_exact"),
        s"${r.get(0)}: CMS under-counted")
    }
  }
}
