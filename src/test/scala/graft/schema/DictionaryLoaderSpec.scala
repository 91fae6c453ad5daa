package graft.schema

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.pipeline.Translator
import graft.sources.TubeGraphSource

/** Loads the reference's public ibdgc test fixture (schema.json +
  * etlMapping.yaml + graphs/ text dumps) end-to-end: dictionary →
  * GraphSchema, mapping YAML → label-resolved EtlMapping, dumps →
  * documents. This is a real user's first step with the engine. */
class DictionaryLoaderSpec extends SparkSpec {

  private val fixtureDir =
    "/root/reference/tests/dataframe_tests/test_data/ibdgc"
  private lazy val schema = DictionaryLoader.loadFile(s"$fixtureDir/schema.json")
  private lazy val mapping = DictionaryLoader.resolveMapping(schema,
    MappingYaml.parse(new String(
      Files.readAllBytes(Paths.get(s"$fixtureDir/etlMapping.yaml")), "UTF-8")))

  test("dictionary nodes load with categories and resolved prop types") {
    val p = schema.node("participant")
    assert(p.category === "administrative")
    assert(p.tableName === "participant") // TubeGraphSource adds `node_`
    assert(p.props("submitter_id") === StringType)      // ["string","null"]
    assert(p.props("consortium_id") === LongType)        // ["integer"]
    assert(p.props("consent_codes") === ArrayType(StringType))
    assert(p.props("consented_for_data_sharing") === BooleanType)
    assert(p.props("state") === StringType)              // $ref → oneOf enum
    assert(p.props("updated_datetime") === StringType)   // $ref → oneOf
    assert(!p.props.contains("id"))                      // systemAlias node_id
    assert(!p.props.contains("type"))
    assert(!p.props.contains("centers"))                 // link placeholder
  }

  test("shared $ref property blocks merge into file nodes") {
    val f = schema.node("summary_file")
    assert(f.category === "data_file")
    assert(f.props("file_size") === LongType)   // _definitions #/file_size
    assert(f.props("md5sum") === StringType)
    assert(f.props("object_id") === StringType)
    assert(f.props("data_format") === StringType) // node's own prop
  }

  test("links carry name/backref/multiplicity and the reference table names") {
    val l = schema.linksOf("participant", "center")
    assert(l.name === "centers")
    assert(l.backref === "participants")
    assert(l.multiplicity === "many_to_one")
    assert(l.edgeTable === "edge_participantrecruitedatcenter")
    // long names shorten to the md5+abbreviation convention
    val ar = schema.linksOf("aligned_reads", "alignment_workflow")
    assert(ar.edgeTable === "edge_4342b971_alredafralwo")
    // subgroup links flatten (diagnosis declares visit+participant parents)
    assert(schema.linksOf("diagnosis", "participant").multiplicity
      === "many_to_many")
  }

  test("etlMapping paths resolve through link names and backrefs") {
    val agg = mapping.indices.find(_.name == "qa-ibd").get
    assert(agg.root === "participant")
    assert(agg.parentProps.flatMap(_.steps.map(_.label)).distinct
      === Seq("center"))
    assert(agg.flattenProps.map(_.path) === Seq("demographic", "diagnosis"))
    assert(agg.aggregatedProps.map(_.path) === Seq(Seq("sample")))
    assert(agg.flattenProps.find(_.path == "diagnosis").get.sortedBy
      === Some(("updated_datetime", true)))
  }

  test("ibdgc graphs translate end-to-end: aggregator documents") {
    val source = TubeGraphSource(spark, schema, s"$fixtureDir/graphs")
    val agg = mapping.indices.find(_.name == "qa-ibd").get
    val docs = new Translator(schema, source).translate(agg)
    val rows = docs.collect()
    assert(rows.nonEmpty)
    val cols = docs.columns.toSet
    assert(Set("submitter_id", "project_id", "country", "gender",
      "ibd_affection_status", "_samples_count").subsetOf(cols))
    // parent_props default relation collects sets; every participant has
    // exactly one recruiting center in the fixture
    val withCountry = rows.filter { r =>
      val v = r.getSeq[String](r.fieldIndex("country"))
      v != null && v.nonEmpty
    }
    assert(withCountry.nonEmpty)
    // _samples_count zero-fills and is non-negative
    assert(rows.forall(r => r.getLong(r.fieldIndex("_samples_count")) >= 0L))
  }

  test("every public fixture dictionary loads and its mapping resolves") {
    Seq("ibdgc", "jcoin", "midrc", "parent").foreach { name =>
      val base = s"/root/reference/tests/dataframe_tests/test_data/$name"
      val sch = DictionaryLoader.loadFile(s"$base/schema.json")
      assert(sch.nodes.nonEmpty, name)
      assert(sch.links.nonEmpty, name)
      val em = MappingYaml.parse(new String(Files.readAllBytes(
        Paths.get(s"$base/etlMapping.yaml")), "UTF-8"))
      val resolved = DictionaryLoader.resolveMapping(sch, em)
      assert(resolved.indices.nonEmpty, name)
      // every resolved aggregator path step must now be a real node label
      resolved.indices.filter(_.kind != "collector").foreach { m =>
        (m.parentProps.flatMap(_.steps.map(_.label)) ++
          m.flattenProps.map(_.path) ++ m.aggregatedProps.flatMap(_.path))
          .foreach(l => assert(sch.nodes.exists(_.label == l), s"$name/$l"))
      }
      // and every index TRANSLATES from the fixture's graph dumps (the
      // parent fixture has no goldens but exercises nested_props)
      val src = TubeGraphSource(spark, sch, s"$base/graphs")
      val t = new Translator(sch, src)
      resolved.indices.foreach { m =>
        assert(t.translate(m).count() >= 0L, s"$name/${m.name}")
      }
    }
  }

  test("qa-ibd documents match the reference's own golden translate_final") {
    val source = TubeGraphSource(spark, schema, s"$fixtureDir/graphs")
    val agg = mapping.indices.find(_.name == "qa-ibd").get
    val mine = new Translator(schema, source).translate(agg)
    val golden = spark.read.parquet(
      s"$fixtureDir/dataframe/participant__1_Translator.translate_final")
    // golden was generated with an older mapping that also carried
    // consortium_id; compare on the CURRENT mapping's output columns.
    // Set-valued parent props are unordered in the reference — sort both.
    val cols = Seq("_participant_id", "submitter_id", "project_id",
      "country", "name", "investigator_name", "gender", "race", "jewish",
      "hispanic", "ibd_affection_status", "diagnosis", "control",
      "_samples_count")
    def norm(df: org.apache.spark.sql.DataFrame) = {
      val sorted = Seq("country", "name", "investigator_name")
        .foldLeft(df)((d, c) =>
          d.withColumn(c, org.apache.spark.sql.functions.array_sort(
            org.apache.spark.sql.functions.col(c))))
      sorted.select(cols.map(c =>
        org.apache.spark.sql.functions.col(c).cast("string").as(c)): _*)
    }
    val a = norm(mine); val b = norm(golden)
    assert(a.count() === 190)
    assert(b.count() === 190)
    assert(a.exceptAll(b).isEmpty, "rows we produce that the golden lacks")
    assert(b.exceptAll(a).isEmpty, "golden rows we fail to produce")
  }

  test("qa-ibd_file collector matches the reference's golden translate_final") {
    val source = TubeGraphSource(spark, schema, s"$fixtureDir/graphs")
    val coll = mapping.indices.find(_.name == "qa-ibd_file").get
    val mine = new Translator(schema, source).translate(coll)
    val golden = spark.read.parquet(
      s"$fixtureDir/dataframe/file__1_Translator.translate_final__translate_final")
    val cols = Seq("_file_id", "project_id", "object_id", "md5sum",
      "file_name", "file_size", "data_format", "data_type", "state",
      "source_node", "program_name", "project_code", "site")
    def norm(df: org.apache.spark.sql.DataFrame) = {
      val sorted = Seq("program_name", "project_code", "site")
        .foldLeft(df)((d, c) =>
          d.withColumn(c, org.apache.spark.sql.functions.array_sort(
            org.apache.spark.sql.functions.col(c))))
      sorted.select(cols.map(c =>
        org.apache.spark.sql.functions.col(c).cast("string").as(c)): _*)
    }
    val a = norm(mine); val b = norm(golden)
    assert(b.count() === 531)
    assert(a.exceptAll(b).isEmpty, "rows we produce that the golden lacks")
    assert(b.exceptAll(a).isEmpty, "golden rows we fail to produce")
  }

  /** Translate `indexName` from `fixture`'s dumps and require set-equality
    * with the reference's checked-in golden parquet on all shared columns
    * (goldens may carry columns from older mapping revisions — tolerate at
    * most `slack` of those). Array columns compare as sorted sets. */
  private def assertMatchesGolden(fixture: String, indexName: String,
                                  goldenFile: String, slack: Int = 2,
                                  viaRunAll: Boolean = false): Unit = {
    import org.apache.spark.sql.functions.{array_sort, col}
    val base = s"/root/reference/tests/dataframe_tests/test_data/$fixture"
    val sch = DictionaryLoader.loadFile(s"$base/schema.json")
    val em = DictionaryLoader.resolveMapping(sch, MappingYaml.parse(new String(
      Files.readAllBytes(Paths.get(s"$base/etlMapping.yaml")), "UTF-8")))
    val m = em.indices.find(_.name == indexName)
      .getOrElse(fail(s"no index $indexName in $fixture"))
    val src = TubeGraphSource(spark, sch, s"$base/graphs")
    val mine =
      if (viaRunAll) Translator.runAll(sch, src, em)(indexName)
      else new Translator(sch, src).translate(m)
    val golden = spark.read.parquet(s"$base/dataframe/$goldenFile")
    val common = golden.columns.filter(mine.columns.contains(_)).toSeq
    assert(common.length >= golden.columns.length - slack,
      s"missing golden columns: ${golden.columns.toSeq.diff(common)}")
    val arrCols = golden.schema.fields
      .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
      .map(_.name).filter(common.contains)
    // compare array cells as SORTED STRING SETS: the reference's injected
    // sets are stringly-typed in places where we keep the dictionary type
    def norm(df: org.apache.spark.sql.DataFrame) =
      arrCols.foldLeft(df.select(common.map(col): _*))((d, c) =>
          d.withColumn(c, array_sort(col(c).cast("array<string>"))))
        .select(common.map(c => col(c).cast("string").as(c)): _*)
    val a = norm(mine); val b = norm(golden)
    assert(a.count() === b.count(), s"$fixture/$indexName row count")
    assert(a.exceptAll(b).isEmpty, s"$fixture/$indexName: rows beyond golden")
    assert(b.exceptAll(a).isEmpty, s"$fixture/$indexName: golden rows missed")
  }

  test("jcoin aggregators and collector match the reference goldens") {
    assertMatchesGolden("jcoin", "jcoin_etl",
      "participant__1_Translator.translate_final")
    assertMatchesGolden("jcoin", "jcoin_saes",
      "serious_adverse_event__1_Translator.translate_final")
    assertMatchesGolden("jcoin", "jcoin_etl_time_points",
      "time_point__1_Translator.translate_final")
    assertMatchesGolden("jcoin", "jcoin_file",
      "file__1_Translator.translate_final__translate_final")
  }

  test("midrc simple aggregators and collector match the reference goldens") {
    assertMatchesGolden("midrc", "midrc_measurement",
      "measurement__1_Translator.translate_final")
    assertMatchesGolden("midrc", "midrc_annotation",
      "annotation__1_Translator.translate_final")
    assertMatchesGolden("midrc", "midrc_data_file",
      "data_file__1_Translator.translate_final__translate_final")
  }

  test("midrc index-to-index join matches the joining goldens " +
      "(array-valued join keys explode per referenced id)") {
    // the midrc graphs snapshot is smaller than its goldens (5 case rows vs
    // 90), so — exactly like the reference's own dataframe tests — feed the
    // golden INPUT frames through the joining stage and compare outputs
    val base = "/root/reference/tests/dataframe_tests/test_data/midrc/dataframe"
    val joinProps = Seq("object_id", "data_format", "data_type", "data_category")
      .map(n => (PropDef(n, n), Some("set")))
    for ((docGolden, outGolden, key) <- Seq(
      ("case__1", "case__1_Translator.translate_joining_props", "_case_id"),
      ("imaging_study__1",
        "imaging_study__1_Translator.translate_joining_props",
        "_imaging_study_id"))) {
      // the golden inputs pre-declare the joined props as null placeholder
      // columns (reference PropFactory declares the full doc schema up
      // front); the join fills them, so drop the placeholders first
      val docs = spark.read.parquet(s"$base/$docGolden")
        .drop("object_id", "data_format", "data_type", "data_category")
      val files = spark.read.parquet(
        s"$base/data_file__1_Translator.translate_final__translate_final")
      val joined = graft.operators.GraphOps.indexJoin(
        docs, files, Seq(key), joinProps)
      val golden = spark.read.parquet(s"$base/$outGolden")
      val common = golden.columns.filter(joined.columns.contains(_)).toSeq
      assert(common.length === golden.columns.length, s"$outGolden columns")
      import org.apache.spark.sql.functions.{array_sort, col}
      val arrCols = golden.schema.fields
        .filter(_.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType])
        .map(_.name).toSeq
      def norm(df: org.apache.spark.sql.DataFrame) =
        arrCols.foldLeft(df.select(common.map(col): _*))((d, c) =>
            d.withColumn(c, array_sort(col(c).cast("array<string>"))))
          .select(common.map(c => col(c).cast("string").as(c)): _*)
      val a = norm(joined); val b = norm(golden)
      assert(a.count() === b.count(), s"$outGolden rows")
      assert(a.exceptAll(b).isEmpty, s"$outGolden: rows beyond golden")
      assert(b.exceptAll(a).isEmpty, s"$outGolden: golden rows missed")
    }
  }

  test("RunEtl end-to-end: dictionary + mapping + dumps -> published indices") {
    val out = Files.createTempDirectory("graft_etl").toString
    val published = graft.RunEtl.run(spark,
      s"$fixtureDir/schema.json", s"$fixtureDir/etlMapping.yaml",
      s"$fixtureDir/graphs", out, nowMillis = 1700000000000L)
    assert(published.contains("qa-ibd"))
    val (idx, rows) = published("qa-ibd")
    assert(idx === "qa-ibd_0")
    assert(rows > 0)
    // published documents are really there and readable
    val docs = spark.read.parquet(s"$out/$idx/docs")
    assert(docs.count() === rows)
    assert(docs.columns.contains("country"))
    // a second run publishes the next version and flips the alias
    val again = graft.RunEtl.run(spark,
      s"$fixtureDir/schema.json", s"$fixtureDir/etlMapping.yaml",
      s"$fixtureDir/graphs", out, nowMillis = 1700000001000L)
    assert(again("qa-ibd")._1 === "qa-ibd_1")
    // S11 incremental gate: no source transaction newer than the sink
    // timestamp -> the whole run is a no-op (nothing translated/published)
    val gated = graft.RunEtl.run(spark,
      s"$fixtureDir/schema.json", s"$fixtureDir/etlMapping.yaml",
      s"$fixtureDir/graphs", out, nowMillis = 1700000002000L,
      latestSourceTxMillis = Some(1700000000500L))
    assert(gated.isEmpty)
    assert(!new graft.sinks.FsEsClient(java.nio.file.Paths.get(out))
      .indices().contains("qa-ibd_2"))
    // --force overrides the gate
    val forced = graft.RunEtl.run(spark,
      s"$fixtureDir/schema.json", s"$fixtureDir/etlMapping.yaml",
      s"$fixtureDir/graphs", out, nowMillis = 1700000003000L,
      latestSourceTxMillis = Some(1700000000500L), force = true)
    assert(forced("qa-ibd")._1 === "qa-ibd_2")
  }

  test("ibdgc collector translates: data_file leaves union with injection") {
    val source = TubeGraphSource(spark, schema, s"$fixtureDir/graphs")
    val coll = mapping.indices.find(_.name == "qa-ibd_file").get
    assert(coll.kind === "collector")
    val docs = new Translator(schema, source).translate(coll)
    val rows = docs.collect()
    assert(rows.nonEmpty)
    assert(docs.columns.contains("source_node"))
    assert(docs.columns.contains("site")) // injected from core_metadata_collection
  }
}
