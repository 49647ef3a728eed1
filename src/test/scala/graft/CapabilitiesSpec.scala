package graft

import graft.model._
import graft.operators.{GraphTraversal, HybridRetrieval, RecallQueries, RelationalQueries, RetrievalRouter}
import graft.sources.Tables
import graft.validation.Scenarios
import org.apache.spark.sql.functions._

/** Coverage tests for the remaining SURVEY §2 inventory: R12 flatten,
  * P3 graph BFS, P5/P6 hybrid capabilities, X7 JSONL scan, X8 scenario
  * lookups, approx-distinct sketches. */
class CapabilitiesSpec extends SparkSuite {

  test("R12: legacy flatten duplicates nested fields additively") {
    val resp = graft.operators.RecallOrchestrator.runRecall(
      spark, "test high confidence query")
    val compat = McpCompatResponse.fromRetrievalResponse(resp)
    assert(compat.candidates == resp.contextPacket.candidates)
    assert(compat.branch == resp.contextPacket.summary.branch)
    assert(compat.confidence == resp.contextPacket.summary.top_confidence)
    assert(compat.contextPacket == resp.contextPacket) // canonical untouched
    val bare = McpCompatResponse.fromRetrievalResponse(resp, includeLegacy = false)
    assert(bare.candidates.isEmpty && bare.branch == "" && bare.confidence == 0.0)
  }

  test("P3: BFS distances are sane on the bipartite order graph") {
    val rows = GraphTraversal.qGraph2Hop(spark, sfDir).collect()
    val byDist = rows.groupBy(_.getAs[Long]("dist")).view.mapValues(_.length).toMap
    assert(byDist(0L) == 1, "exactly the seed at dist 0")
    assert(byDist.getOrElse(1L, 0) > 0, "supplier 1 supplies someone")
    // hop-1 nodes are customers (offset namespace), hop-2 are suppliers
    rows.filter(_.getAs[Long]("dist") == 1L)
      .foreach(r => assert(r.getAs[Long]("node") >= GraphTraversal.CustOffset))
    rows.filter(_.getAs[Long]("dist") == 2L)
      .foreach(r => assert(r.getAs[Long]("node") < GraphTraversal.CustOffset))
  }

  test("P3: BFS leaves no cached blocks behind (checkpointed hops, adj released)") {
    spark.catalog.clearCache() // isolate from other suites' pinned state
    GraphTraversal.qGraph2Hop(spark, sfDir).collect()
    val persisted = spark.sparkContext.getPersistentRDDs
    assert(persisted.isEmpty,
      s"BFS should unpersist its adjacency cache; still pinned: ${persisted.values.map(_.name)}")
  }

  test("funnel is monotone, cohort matrix covers every user, vocab coverage accumulates") {
    import org.apache.spark.sql.functions._
    val f = graft.operators.AdvancedQueries.qEventFunnel(spark, sfDir).head()
    val (n1, n2, n3) = (f.getAs[Long]("n_signup"),
      f.getAs[Long]("n_click_after_signup"),
      f.getAs[Long]("n_purchase_after_click"))
    assert(n1 >= n2 && n2 >= n3, s"funnel must shrink: $n1 >= $n2 >= $n3")
    assert(n1 > 0 && n3 > 0, "testdata must populate every funnel step")

    val cohort = graft.operators.AdvancedQueries.qCohortRetention(spark, sfDir)
      .collect()
    assert(cohort.forall(_.getAs[Long]("week_offset") >= 0))
    assert(cohort.forall(_.getAs[Long]("n_users") > 0))
    // every user appears in their own cohort's offset-0 cell
    val offset0 = cohort.filter(_.getAs[Long]("week_offset") == 0L)
      .map(_.getAs[Long]("n_users")).sum
    val users = graft.sources.Tables.load(spark, sfDir, "events")
      .select(countDistinct(col("user_id"))).head().getLong(0)
    assert(offset0 == users,
      s"offset-0 cells must cover all $users users, got $offset0")

    val vocab = graft.operators.TextAnalysis.tVocabCoverage(spark, sfDir)
      .collect()
    assert(vocab.map(_.getAs[Long]("rank")).toSeq == (1L to 20L))
    val cums = vocab.map(_.getAs[Long]("cum_n")).toSeq
    assert(cums == cums.sorted && cums.distinct == cums,
      "cumulative counts must strictly increase")
    assert(cums.last <= vocab.head.getAs[Long]("total_n"))
  }

  test("triangle census matches a brute-force reference on the same graph") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.GraphTraversal.pTriangleStats(spark, sfDir).head()
    // independent reference: rebuild the co-purchase edge set, collect
    // it (45 edges at this sf), and count triangles by enumeration
    val li = graft.sources.Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sp")).distinct()
    val edges = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.sp") < col("b.sp"))
      .groupBy(col("a.sp").as("i"), col("b.sp").as("j"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= graft.operators.GraphTraversal.CoPurchaseMinShared)
      .select("i", "j").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    def adj(a: Long, b: Long): Boolean =
      edges((math.min(a, b), math.max(a, b)))
    val ns = nodes.toSeq.sorted
    val bruteTriangles = (for {
      ai <- ns.indices; bi <- (ai + 1) until ns.size if adj(ns(ai), ns(bi))
      ci <- (bi + 1) until ns.size if adj(ns(ai), ns(ci)) && adj(ns(bi), ns(ci))
    } yield 1).size
    val wedges = ns.map(n => edges.count(e => e._1 == n || e._2 == n).toLong)
      .map(d => d * (d - 1) / 2).sum
    assert(r.getAs[Long]("n_nodes") == nodes.size.toLong)
    assert(r.getAs[Long]("n_edges") == edges.size.toLong)
    assert(r.getAs[Long]("n_wedges") == wedges)
    assert(r.getAs[Long]("n_triangles") == bruteTriangles.toLong)
    assert(bruteTriangles > 0, "graph at this sf must contain triangles")
  }

  test("pageRank matches a driver-side fixed-point reference BIT-EXACTLY") {
    import spark.implicits._
    import graft.operators.GraphTraversal
    val S = GraphTraversal.PageRankScale
    // driver-side twin of the scaled-Long update rule
    def reference(undirected: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
      val edges = undirected ++ undirected.map(e => (e._2, e._1))
      val outdeg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val inbound = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
      val nodes = outdeg.keySet
      val n = nodes.size.toLong
      var r = nodes.map(_ -> S / n).toMap
      for (_ <- 1 to iters) r = r.map { case (node, _) =>
        val inflow = inbound.getOrElse(node, Seq.empty)
          .map(u => r(u) / outdeg(u)).sum
        node -> ((3 * S) / (20 * n) + (17 * inflow) / 20)
      }
      r
    }
    def run(undirected: Seq[(Long, Long)]): Map[Long, Long] = {
      val und = undirected.toDF("i", "j")
      val edges = und.select(col("i").as("src"), col("j").as("dst"))
        .union(und.select(col("j").as("src"), col("i").as("dst")))
      GraphTraversal.pageRank(edges).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    // path graph 1-2-3: asymmetric degrees
    val path = Seq((1L, 2L), (2L, 3L))
    val gotPath = run(path)
    assert(gotPath == reference(path, GraphTraversal.PageRankIters),
      "scaled-Long ranks must match the reference exactly")
    // truncation-only loss: sum within iters × n steps of the scale
    assert(math.abs(gotPath.values.sum - S) < 1000L, "ranks must sum to ~1")
    // semantic sanity vs a plain DOUBLE power iteration with the same
    // iteration count — fixed-point truncation drift is ≤1e-16/step
    var dr = Map(1L -> 1.0 / 3, 2L -> 1.0 / 3, 3L -> 1.0 / 3)
    val outdeg = Map(1L -> 1, 2L -> 2, 3L -> 1)
    val inbound = Map(1L -> Seq(2L), 2L -> Seq(1L, 3L), 3L -> Seq(2L))
    for (_ <- 1 to GraphTraversal.PageRankIters)
      dr = dr.map { case (n, _) =>
        n -> (0.15 / 3 + 0.85 * inbound(n).map(u => dr(u) / outdeg(u)).sum)
      }
    gotPath.foreach { case (n, v) =>
      assert(math.abs(v.toDouble / S - dr(n)) < 1e-5, s"node $n vs double ref")
    }
    // a star's hub must decisively outrank its leaves, again bit-exact
    val star = (2L to 6L).map(k => (1L, k))
    val gotStar = run(star)
    assert(gotStar == reference(star, GraphTraversal.PageRankIters))
    assert(gotStar(1L) > 2 * gotStar(2L), s"hub vs leaf: $gotStar")
  }

  test("P6: hybrid score stays in [0,1] and ranks by the weighted sum") {
    val rows = HybridRetrieval.p6HybridScore(spark, sfDir).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.forall(v => v >= 0.0 && v <= 1.0))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("accurate-mode merge dedups by id keeping the best provider hit") {
    val rows = HybridRetrieval.accurateMerge(spark, sfDir).collect()
    val ids = rows.map(_.getAs[Long]("doc_id"))
    assert(ids.distinct.length == ids.length, "dup ids after merge")
    // ids divisible by 6 exist in both providers; mem0 (unscaled conf) must win
    rows.filter(_.getAs[Long]("doc_id") % 6 == 0)
      .foreach(r => assert(r.getAs[String]("provider") == "mem0"))
  }

  test("R12 distributed: per-source envelope packs ordered top-k candidate structs") {
    val rows = RecallQueries.r12EnvelopePerSource(spark, sfDir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val cands = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("candidates")
      assert(cands.length <= Defaults.TopK && cands.nonEmpty)
      val confs = cands.map(_.getAs[Double]("confidence")).toSeq
      assert(confs == confs.sorted.reverse, "candidates not sorted desc")
      assert(r.getAs[Double]("top_confidence") == confs.head)
    }
  }

  test("as-of join: at-or-before semantics, null for rows with no predecessor") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, "r100"), (1L, 150L, "r150"), (2L, 60L, "r60"))
      .toDF("k", "t", "v")
    val out = graft.operators.AsOfJoin.asOf(left, right, "k", "t", Seq("v"))
      .collect().map(r => (r.getAs[String]("tag"), Option(r.getAs[String]("v")))).toMap
    assert(out("a") == Some("r100"), "equal timestamp counts as at-or-before")
    assert(out("b") == Some("r150"), "latest prior wins")
    assert(out("c") == None, "no predecessor -> null")
  }

  test("as-of join carries the matched right ROW atomically (nulls not backfilled)") {
    import spark.implicits._
    // matched row (t=10) has a null value column; an older row (t=5) has
    // a value — per-column carry would stitch a frankenstein row
    val left = Seq((1L, 20L, "x")).toDF("k", "t", "tag")
    val right = Seq((1L, 5L, Some("id5"), Some("v5")),
        (1L, 10L, Some("id10"), Option.empty[String]))
      .toDF("k", "t", "rid", "rv")
    val row = graft.operators.AsOfJoin.asOf(left, right, "k", "t", Seq("rid", "rv"))
      .collect().head
    assert(row.getAs[String]("rid") == "id10")
    assert(row.getAs[String]("rv") == null,
      "null in the matched row must stay null, not backfill from t=5")
  }

  test("X7: event-sourced work-item JSONL scans with the declared schema") {
    val tmp = java.nio.file.Files.createTempFile("issues", ".jsonl")
    java.nio.file.Files.writeString(tmp,
      """{"id":"a-1","title":"first","status":"open","priority":2,"issue_type":"task","created_at":"2026-01-05T07:15:49.002Z","updated_at":"2026-01-06T00:00:00.000Z","dependencies":[],"labels":["x"],"comments":[]}
        |{"id":"a-2","title":"second","status":"closed","priority":1,"issue_type":"bug","created_at":"2026-01-07T12:00:00.000Z","updated_at":"2026-01-08T00:00:00.000Z","dependencies":["a-1"],"labels":[],"comments":["done"]}
        |""".stripMargin)
    val df = Tables.loadIssues(spark, tmp.toString)
    assert(df.count() == 2)
    val open = df.filter(col("status") === "open").collect()
    assert(open.length == 1 && open.head.getAs[String]("id") == "a-1")
    assert(df.filter(array_contains(col("dependencies"), "a-1")).count() == 1)
    assert(df.schema("created_at").dataType.typeName == "timestamp")
  }

  test("X8: scenario catalog lookups by id and tag") {
    assert(Scenarios.byId("S001").exists(_.tags.contains("smoke")))
    assert(Scenarios.byId("S999").isEmpty)
    assert(Scenarios.byTag("smoke").map(_.id).toSet ==
      Set("S001", "S002", "S003", "S004"))
    assert(Scenarios.byTag("deterministic").map(_.id) == Seq("S048"))
    assert(Scenarios.all.map(_.id).distinct.size == Scenarios.all.size)
  }

  test("approx distinct users within 5% of exact per event type") {
    val rows = RelationalQueries.qApproxDistinct(spark, sfDir)
      .join(RelationalQueries.qExactDistinct(spark, sfDir), "event_type")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) =
        (r.getAs[Long]("n_users_approx"), r.getAs[Long]("n_users"))
      assert(math.abs(approx - exact).toDouble / exact <= 0.05,
        s"${r.getAs[String]("event_type")}: approx=$approx exact=$exact")
    }
  }

  test("router + per-source classification compose: degraded provider routes away") {
    // sanity link between the config plane (router) and data plane (r9)
    val route = RetrievalRouter.route(
      RetrievalRequest("q"), ProviderStatus(Map(
        Providers.Mem0 -> Providers.Degraded,
        Providers.Supabase -> Providers.Available)), FeatureFlags())
    assert(route.provider == Providers.Supabase)
    val branches = RecallQueries.r9BranchPerSource(spark, sfDir)
      .select("branch").distinct().collect().map(_.getString(0)).toSet
    assert(branches.subsetOf(Set("SUCCESS", "LOW_CONFIDENCE", "EMPTY_SET")))
  }
}
