package graft.queries

// SCRATCH PROBE (not part of the suite contract): times q193's stages
// one by one at the SPARK_GRAFT_PROBE_SF fixture to find the hot
// stage. Run manually:
//   SPARK_GRAFT_PROBE_SF=/root/testdata/sf0.1 sbt "testOnly graft.queries.ReleaseStageProbe"
class ReleaseStageProbe extends graft.SparkTestBase {
  test("stage timing") {
    val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_SF", "")
    assume(dir.nonEmpty, "set SPARK_GRAFT_PROBE_SF to run the probe")
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[stage] $tag%-20s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import org.apache.spark.sql.functions._
    import graft.sources.Tables
    import graft.functions.{GraftFunctions, PiiScrub, RepetitionStats}
    import graft.operators._
    graft.functions.GraftFunctions.register(spark)
    val docs = t("load")(Tables.load(spark, dir, "documents"))
    t("count")(docs.count())
    val evalSet = docs.where(col("doc_id") % CurationQueries.EvalMod === 0)
    val dk = docs.select(col("doc_id"), col("lang"), col("source"),
      col("text"), size(split(col("text"), " ")).cast("long").as("n_tok"))
    val train = dk.where(col("doc_id") % CurationQueries.EvalMod =!= 0)
    val contam = t("decontam")(Decontaminate
      .contaminatedIds(train, evalSet, "doc_id", "text",
        CurationQueries.NGram))
    t("decontam_count")(contam.count())
    val s1 = t("s1_ckpt")(FrameMemo.checkpointed(
      train.join(broadcast(contam), Seq("doc_id"), "left_anti")))
    val aug = CurationQueries.augmented(col("text"), col("doc_id"))
    val pii = s1.select(col("doc_id"),
      size(split(PiiScrub.redact(aug), " ")).cast("long").as("rtok"),
      (PiiScrub.emailCount(aug) + PiiScrub.phoneCount(aug) +
        PiiScrub.ipv4Count(aug)).as("hits"))
    t("pii_count")(pii.count())
    val toksC = split(col("text"), " ")
    val s3 = t("s3_quality_ckpt")(FrameMemo.checkpointed(
      s1.where(PipelineQueries.qualityOk(toksC, col("text")) &&
        !RepetitionStats.dupTokenFlag(toksC, CurationQueries.DupTokenPct) &&
        !(size(RepetitionStats.grams2(toksC)) > 0 &&
          RepetitionStats.topGram2Flag(toksC,
            CurationQueries.TopGram2Pct)))))
    val model = t("lm_train")(NgramLm.train(
      docs.where(expr(LmQueries.TrainSplitSql)), "text"))
    val scored = NgramLm.score(docs, "text", model, Seq("doc_id"))
      .select(col("doc_id"), col("n_tok").as("lm_tok"), col("cost_micro"))
    t("lm_score_count")(scored.count())
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(col("cost_micro").cast("double") / col("lm_tok"),
        col("doc_id"))
    val s4 = t("s4_ckpt")(FrameMemo.checkpointed(s3.join(scored, "doc_id")
      .withColumn("bucket", ntile(3).over(w))
      .where(col("bucket") <= 2)
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("n_tok"), col("cost_micro"))))
    val winner = s4.groupBy(md5(col("text")))
      .agg(min(col("doc_id")).as("doc_id")).select(col("doc_id"))
    val ndrop = t("neardup_pairs")(NearDupQueries.verifiedPairs(spark, dir)
      .select(col("doc_b").as("doc_id")).distinct())
    t("neardup_count")(ndrop.count())
    val sdrop = t("semdedup")(SemanticDedup
      .dropIds(SimilarityQueries.ivfIndex(spark, dir),
        CurationQueries.semTau)
      .select(col("vec_id").as("doc_id")))
    t("semdedup_count")(sdrop.count())
    val s5 = t("s5_ckpt")(FrameMemo.checkpointed(
      s4.join(winner, Seq("doc_id"), "left_semi")
        .join(broadcast(ndrop), Seq("doc_id"), "left_anti")
        .join(broadcast(sdrop), Seq("doc_id"), "left_anti")))
    val folded = DataSplit.withFold(s5, "doc_id", "42")
    val tr2 = folded.where(col("fold") === "train")
    val rated = DomainMix.rates(
      tr2.select(col("doc_id"), col("source"), col("n_tok")),
      "source", col("n_tok"), CurationQueries.MixDenom)
    val s7 = t("s7_ckpt")(FrameMemo.checkpointed(tr2
      .join(broadcast(rated.select(col("source"), col("rate_bp"))),
        "source")
      .where(DataSplit.bucketBp(col("doc_id"),
        CurationQueries.MixSeed) < col("rate_bp"))
      .select(col("doc_id"), col("lang"), col("source"), col("text"),
        col("n_tok"))))
    val packed = SequencePack.assignBins(
      s7.select(col("doc_id"), col("n_tok")), "doc_id", "n_tok",
      numShards = 4, budgetTokens = 1500L, seed = "pk")
    t("pack_count")(packed.count())
    val merges = t("bpe_train")(BpeTrain.train(docs, "text", 8))
    val enc = BpeTrain.encodeCounts(s7, "text", "doc_id", merges)
    t("bpe_encode_count")(enc.count())
  }
}
