package graft

import graft.operators.{Multimodal, MultimodalStub, PlanDiff}

class PlanDiffMultimodalSpec extends SparkSuite {

  private val plan =
    """# Feature plan
      |### Relevant Codebase Files
      |- `src/core/engine.scala` - main engine
      |- `src/core/util.scala`
      |### New Files to Create
      |- `src/feature/alpha.scala` - the feature
      |- `src/feature/alpha_test.scala`
      |## STEP-BY-STEP TASKS
      |### CREATE src/feature/alpha.scala with care
      |- **PATTERN**: follow (src/core/engine.scala:42)
      |### UPDATE src/core/engine.scala
      |- detail line
      |## VALIDATION
      |nothing here
      |""".stripMargin

  test("X1/X2: extraction pulls deduped paths from all three sections") {
    val ex = PlanDiff.extractPlannedFiles(plan)
    assert(ex.plannedFiles.toSet == Set(
      "src/feature/alpha.scala", "src/feature/alpha_test.scala",
      "src/core/engine.scala", "src/core/util.scala"))
    assert(ex.plannedTargets.toSet ==
      Set("src/feature/alpha.scala", "src/core/engine.scala"))
    assert(ex.referencedPatterns == Seq("src/core/engine.scala:42"))
  }

  test("X3-X5: metrics compute overlap, creep, missing and rounded ratios") {
    val ex = PlanDiff.extractPlannedFiles(plan)
    val actual = Seq("src/feature/alpha.scala", "src/core/engine.scala",
      "docs/readme.md")
    val m = PlanDiff.calculateMetrics(ex, actual,
      detailedDiff = "diff --git src/core/engine.scala ...")
    assert(m.overlap.toSet == Set("src/feature/alpha.scala", "src/core/engine.scala"))
    assert(m.scopeCreep == Seq("docs/readme.md"))
    assert(m.missingFiles.toSet ==
      Set("src/feature/alpha_test.scala", "src/core/util.scala"))
    assert(m.fileAdherence == 50.0)
    assert(m.patternCompliance == 100.0)
  }

  test("empty plan yields 100% adherence by definition") {
    val m = PlanDiff.calculateMetrics(
      PlanDiff.extractPlannedFiles("# nothing"), Seq("a.txt"))
    assert(m.fileAdherence == 100.0 && m.totalPlanned == 0)
  }

  test("distributed set-algebra metrics agree with the driver-side ones") {
    import spark.implicits._
    val ex = PlanDiff.extractPlannedFiles(plan)
    val actual = Seq("src/feature/alpha.scala", "src/core/engine.scala",
      "docs/readme.md")
    val row = PlanDiff.distributedMetrics(spark,
      ex.plannedFiles.toDF("path"), actual.toDF("path")).collect().head
    assert(row.getAs[Long]("n_overlap") == 2)
    assert(row.getAs[Long]("n_creep") == 1)
    assert(row.getAs[Long]("n_missing") == 2)
    assert(row.getAs[Double]("file_adherence") == 50.0)
  }

  test("multimodal: features are deterministic, bounded, batch-shaped") {
    val assets = Multimodal.assetTable(spark, sfDir)
    val feats = Multimodal.extractFeatures(assets).collect()
    assert(feats.length == 500)
    feats.foreach { f =>
      assert(f.features.length == 8)
      assert(f.features.forall(v => v >= 0f && v <= 1f))
      assert(f.checksum.length == 32)
    }
    // determinism: re-run produces identical features
    val again = Multimodal.extractFeatures(assets).collect()
      .map(f => f.asset_id -> f.features.toSeq).toMap
    feats.foreach(f => assert(again(f.asset_id) == f.features.toSeq))
  }

  test("multimodal stub: payload bytes drive the fake decode") {
    val a = MultimodalStub.decodeToFeatures(Array[Byte](0, 0, 0, 0), 2)
    val b = MultimodalStub.decodeToFeatures(Array[Byte](-1, -1, -1, -1), 2)
    assert(a.toSeq == Seq(0f, 0f))
    assert(b.toSeq == Seq(1f, 1f))
  }

  test("modality stats never read the payload column (column pruning)") {
    val plan = Multimodal.modalityStats(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), "payload column should be pruned from the scan")
  }

  test("frame sampling slices stride-aligned frames with an exact partial tail") {
    val frames = Multimodal.sampleFrames(Multimodal.assetTable(spark, sfDir))
      .collect()
    assert(frames.nonEmpty)
    // every sampled index is stride-aligned and every full-width frame
    // is exactly FrameBytes; at most the asset's LAST sampled frame may
    // be shorter
    frames.groupBy(_.asset_id).values.foreach { fs =>
      fs.foreach(f => assert(f.frame_idx % 4 == 0, "stride alignment"))
      val maxIdx = fs.map(_.frame_idx).max
      fs.filter(_.frame_idx != maxIdx)
        .foreach(f => assert(f.frame_payload.length == Multimodal.FrameBytes))
      fs.foreach(f => assert(f.frame_payload.length > 0 &&
        f.frame_payload.length <= Multimodal.FrameBytes))
    }
    // slices are the payload's actual bytes, not copies of the head
    val asset = Multimodal.assetTable(spark, sfDir)
      .filter(_.modality == "video").head()
    val sampled = frames.filter(_.asset_id == asset.asset_id)
      .sortBy(_.frame_idx)
    sampled.foreach { f =>
      val start = f.frame_idx.toInt * Multimodal.FrameBytes
      assert(f.frame_payload.toSeq ==
        asset.payload.slice(start, start + Multimodal.FrameBytes).toSeq)
    }
  }

  test("resize decimates payloads by the factor and tags the metadata") {
    val resized = Multimodal.resizeAssets(Multimodal.assetTable(spark, sfDir))
      .collect()
    assert(resized.nonEmpty)
    val originals = Multimodal.assetTable(spark, sfDir)
      .filter(_.modality == "image").collect()
      .map(a => a.asset_id -> a.payload).toMap
    resized.foreach { a =>
      val orig = originals(a.asset_id)
      assert(a.payload.length == (orig.length + 1) / 2, "ceil(len/2) bytes")
      a.payload.zipWithIndex.foreach { case (b, i) => assert(b == orig(i * 2)) }
      assert(a.meta("resized") == "1/2")
    }
  }
}
