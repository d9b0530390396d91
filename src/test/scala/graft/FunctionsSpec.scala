package graft

import graft.functions.{GraftFunctions, HashKernels}
import graft.pipeline.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Custom Catalyst function surface: the native SimHash64 expression
  * and the MinHashAgg TypedImperativeAggregate must agree exactly with
  * the relational pipelines they accelerate, and be reachable from SQL
  * text and via SparkSessionExtensions. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    .filter($"doc_id" < 50).cache()

  test("simhash64 expression equals the relational simhash pipeline") {
    GraftFunctions.register(spark)
    val viaExpr = docs
      .select($"doc_id", GraftFunctions.simhash64($"text").as("sh"))
      .select($"doc_id", posexplode(array((0 until 4).map(i =>
        expr(s"shiftrightunsigned(sh, ${16 * i}) & 65535")): _*))
        .as(Seq("part", "sig")))
      .as[(Long, Int, Long)].collect().toSet
    val viaPipeline = Dedup.simHashParts(docs, "text", "doc_id")
      .as[(Long, Int, Long)].collect().toSet
    assert(viaExpr === viaPipeline)
  }

  test("simhash64 works from SQL text and inside codegen") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("fn_docs")
    val sqlRes = spark.sql(
      "SELECT doc_id, simhash64(text) AS sh FROM fn_docs")
    sqlRes.collect()
    // the expression must not force a codegen fallback
    val executed = sqlRes.queryExecution.executedPlan.toString
    assert(executed.contains("*("), executed)
    // null-safety
    val n = spark.sql("SELECT simhash64(CAST(NULL AS STRING))")
      .collect().head
    assert(n.isNullAt(0))
    // type check error surfaces at analysis
    intercept[Exception] {
      spark.sql("SELECT simhash64(42)").collect()
    }
  }

  test("gram_stats expression equals the relational repetition counts") {
    GraftFunctions.register(spark)
    val viaExpr = docs
      .select($"doc_id", GraftFunctions.gram_stats($"text", 3).as("g"))
      .select($"doc_id", $"g.n_grams", $"g.n_distinct")
      .as[(Long, Long, Long)].collect().toSet
    val viaRelational = graft.pipeline.TextAnalysis
      .repetitionStats(docs, "text", 3)
      .select($"doc_id", $"n_grams", $"n_distinct")
      .as[(Long, Long, Long)].collect().toSet
    assert(viaExpr === viaRelational)
    // edge shapes: punctuation-only, short, repetitive, empty
    val edge = Seq((1L, "!!! ... ???"), (2L, "one two"),
      (3L, "x y x y x y x y"), (4L, ""))
      .toDF("doc_id", "text")
    val e1 = edge.select($"doc_id",
        GraftFunctions.gram_stats($"text", 3).as("g"))
      .select($"doc_id", $"g.n_grams", $"g.n_distinct")
      .as[(Long, Long, Long)].collect().toSet
    val e2 = graft.pipeline.TextAnalysis.repetitionStats(edge, "text", 3)
      .select($"doc_id", $"n_grams", $"n_distinct")
      .as[(Long, Long, Long)].collect().toSet
    assert(e1 === e2)
    assert(e1.contains((3L, 6L, 2L))) // xyx / yxy alternate
  }

  test("gram_stats works from SQL text and inside codegen") {
    GraftFunctions.register(spark)
    docs.createOrReplaceTempView("fn_docs_gs")
    val sqlRes = spark.sql(
      "SELECT doc_id, gram_stats(text, 3).n_grams AS g FROM fn_docs_gs")
    sqlRes.collect()
    val executed = sqlRes.queryExecution.executedPlan.toString
    assert(executed.contains("*("), executed)
    // null-safety
    assert(spark.sql("SELECT gram_stats(CAST(NULL AS STRING), 3)")
      .collect().head.isNullAt(0))
    // default n and type/arity errors surface at analysis
    assert(spark.sql("SELECT gram_stats('a b c d').n_grams")
      .collect().head.getLong(0) === 2)
    intercept[Exception] { spark.sql("SELECT gram_stats(42, 3)").collect() }
    intercept[Exception] {
      spark.sql("SELECT gram_stats('x', text)").collect()
    }
  }

  test("minhash_sigs scalar equals the relational signature pipeline") {
    GraftFunctions.register(spark)
    val viaScalar = docs
      .select($"doc_id", GraftFunctions.minhash_sigs($"text", 8).as("sig"))
      .filter($"sig".isNotNull)
      .as[(Long, Seq[String])].collect().toMap
    val viaRelational = Dedup.minHashSignatures(docs, "text", "doc_id")
      .as[(Long, String, String, String, String, String, String, String,
        String)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9))
      .toMap
    assert(viaScalar === viaRelational)
    // a no-shingle document yields null, mirroring the groupBy's
    // absent row; codegen path must agree with eval
    val short = Seq((1L, "two words"), (2L, "a b c d")).toDF("doc_id", "text")
    val r = short
      .select($"doc_id", GraftFunctions.minhash_sigs($"text", 8).as("sig"))
      .collect().map(x => x.getLong(0) -> x.isNullAt(1)).toMap
    assert(r(1L) === true)
    assert(r(2L) === false)
  }

  test("minhash_agg equals the 8-way min() relational signature") {
    GraftFunctions.register(spark)
    val sh = Dedup.shingles(docs, "text", "doc_id")
    val viaAgg = sh.groupBy($"doc_id")
      .agg(GraftFunctions.minhash_agg($"shingle", 8).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val viaMins = Dedup.minHashSignatures(docs, "text", "doc_id")
      .as[(Long, String, String, String, String, String, String, String,
        String)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5, r._6, r._7, r._8, r._9))
      .toMap
    assert(viaAgg === viaMins)
  }

  test("minhash_agg partial aggregation merges across partitions") {
    GraftFunctions.register(spark)
    val sh = Dedup.shingles(docs, "text", "doc_id").repartition(7)
    val spread = sh.groupBy($"doc_id")
      .agg(GraftFunctions.minhash_agg($"shingle", 8).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    val single = Dedup.shingles(docs, "text", "doc_id").coalesce(1)
      .groupBy($"doc_id")
      .agg(GraftFunctions.minhash_agg($"shingle", 8).as("sig"))
      .as[(Long, Seq[String])].collect().toMap
    assert(spread === single)
  }

  test("GraftExtensions injection wiring builds working expressions") {
    // a same-JVM test cannot create a second session with different
    // extensions (getOrCreate reuses the active one), so exercise the
    // injector directly: it must register builders that produce the
    // same expressions GraftFunctions.register wires up
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val e = graft.functions.SimHash64(
      org.apache.spark.sql.catalyst.expressions.Literal("hello world"))
    assert(e.eval(null) === HashKernels.simHash64(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
    // registered-name path (temp function) resolves from SQL text
    GraftFunctions.register(spark)
    val viaSql = spark.sql("SELECT simhash64('hello world') AS h")
      .collect().head.getLong(0)
    assert(viaSql === e.eval(null))
    // bloom_agg/bloom_contains ride the same builders from register()
    // and GraftExtensions (once register()-only — ADVICE r6); prove the
    // shared builders produce a working sketch + probe from SQL text
    val bf = spark.sql(
      """SELECT bloom_agg(xxhash64(g), 10L, 1024L) AS bf
        |FROM VALUES ('a'), ('b') AS t(g)""".stripMargin)
      .collect().head.getAs[Array[Byte]](0)
    assert(bf.nonEmpty)
    val hit = spark.sql(
      "SELECT bloom_contains(x'" + bf.map("%02x".format(_)).mkString +
        "', xxhash64('a')) AS hit").collect().head.getBoolean(0)
    assert(hit)
    // pin extension/register() surface parity by name so a function
    // added to one path can never silently miss the other again
    val injected = classOf[org.apache.spark.sql.SparkSessionExtensions]
      .getDeclaredFields.find(_.getName.contains("injectedFunctions"))
      .map { f =>
        f.setAccessible(true)
        f.get(ext).asInstanceOf[scala.collection.mutable.Buffer[
          (org.apache.spark.sql.catalyst.FunctionIdentifier, _, _)]]
          .map(_._1.funcName).toSet
      }
    // reflection target present in Spark 4.1; skip-proof if renamed
    injected.foreach { names =>
      val expected = Set("simhash64", "gram_stats", "minhash_sigs",
        "minhash_agg", "vec_dot", "vec_norm", "vec_dot_long",
        "vec_dot_int8", "vec_quantize_int8", "word_ngrams",
        "word_ngrams_bos", "char_gram_counts", "word_gram_counts",
        "bloom_agg", "bloom_contains", "nfc_normalize")
      assert(names === expected)
    }
  }

  test("vec_dot/vec_norm kernels match the higher-order formulation bit-for-bit") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .filter($"vec_id" < 40)
    val hof = e.select($"vec_id",
        graft.pipeline.Similarity.dot($"embedding", $"embedding").as("d"),
        graft.pipeline.Similarity.norm($"embedding").as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val native = e.select($"vec_id",
        GraftFunctions.vec_dot($"embedding", $"embedding").as("d"),
        GraftFunctions.vec_norm($"embedding").as("n"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    // bit-identical, not approximately equal
    assert(native.sortBy(_._1).toSeq === hof.sortBy(_._1).toSeq)
  }

  test("int8 kernels match the relational formulation exactly; null rules hold") {
    GraftFunctions.register(spark)
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .filter($"vec_id" < 40)
    // relational reference: floor(x*127/max|x| + 0.5) as longs
    val v = transform($"embedding", _.cast("double"))
    val ma = array_max(transform(v, abs(_)))
    val rel = e.select($"vec_id", v.as("v"), ma.as("ma"))
      .filter($"ma" > 0)
      .select($"vec_id", transform($"v",
        x => floor(x * lit(127.0) / $"ma" + lit(0.5)).cast("long")).as("q"))
      .withColumn("d", aggregate(zip_with($"q", $"q", _ * _), lit(0L), _ + _))
    val relRows = rel.select($"vec_id", $"q", $"d")
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1).toSeq
    // native one-pass quantizer + integer dot kernels
    val nat = graft.pipeline.Similarity.quantizeInt8(e, "embedding", "vec_id")
    val natRows = nat.select($"vec_id",
        transform($"q", _.cast("long")).as("q"),
        GraftFunctions.vec_dot_int8($"q", $"q").as("d"))
      .as[(Long, Seq[Long], Long)].collect().sortBy(_._1).toSeq
    assert(natRows === relRows)
    // vec_dot_long agrees with vec_dot_int8 on widened arrays
    val viaLong = nat.select($"vec_id",
        GraftFunctions.vec_dot_long(transform($"q", _.cast("long")),
          transform($"q", _.cast("long"))).as("d"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(viaLong === relRows.map(r => (r._1, r._3)))
    // null element and length mismatch both null-propagate
    assert(spark.sql(
      """SELECT vec_dot_long(array(1L, cast(null as bigint)),
        |                    array(2L, 3L)) AS d""".stripMargin)
      .collect().head.isNullAt(0))
    assert(spark.sql(
      "SELECT vec_dot_long(array(1L), array(2L, 3L)) AS d")
      .collect().head.isNullAt(0))
    // Long overflow nulls (never wraps): 2^62 * 4 overflows the product
    assert(spark.sql(
      s"SELECT vec_dot_long(array(${1L << 62}L), array(4L)) AS d")
      .collect().head.isNullAt(0))
    // ... and the running-sum overflow path too
    assert(spark.sql(
      s"""SELECT vec_dot_long(array(${Long.MaxValue}L, ${Long.MaxValue}L),
         |                    array(1L, 1L)) AS d""".stripMargin)
      .collect().head.isNullAt(0))
    // quantizer: all-zero and null-slotted vectors yield null
    assert(spark.sql(
      """SELECT vec_quantize_int8(array(cast(0.0 as float),
        |                               cast(0.0 as float))) AS q"""
        .stripMargin).collect().head.isNullAt(0))
    assert(spark.sql(
      """SELECT vec_quantize_int8(array(cast(1.0 as float),
        |                               cast(null as float))) AS q"""
        .stripMargin).collect().head.isNullAt(0))
  }

  test("word_ngrams kernel matches the relational gram chain exactly") {
    GraftFunctions.register(spark)
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val n = 5
    val terms = (0 until n).map(j => s"tk[i + $j]").mkString(", ")
    val rel = d.withColumn("tk",
        filter(split(lower($"text"), "\\W+"), _ =!= ""))
      .select($"doc_id", when(size($"tk") >= n, expr(
        s"transform(sequence(0, size(tk) - $n)," +
          s" i -> concat_ws(' ', $terms))"))
        .otherwise(array()).as("g"))
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    val nat = d.select($"doc_id",
        GraftFunctions.word_ngrams($"text", n).as("g"))
      .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
    assert(nat === rel)
    // short and null texts: empty array / null, same as the guard
    assert(spark.sql("SELECT word_ngrams('one two', 3) AS g")
      .collect().head.getSeq[String](0).isEmpty)
    assert(spark.sql("SELECT word_ngrams(cast(null as string), 3) AS g")
      .collect().head.isNullAt(0))
  }

  test("char_gram_counts kernel matches the relational charGrams explode+count exactly") {
    GraftFunctions.register(spark)
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val n = 3
    // relational reference: Classify.charGrams explode → per-doc count
    val rel = d.select($"doc_id",
        explode(graft.pipeline.Classify.charGrams($"text", n))
          .as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("cnt"))
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    val nat = d.select($"doc_id",
        explode(GraftFunctions.char_gram_counts($"text", n))
          .as(Seq("token", "cnt")))
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    assert(nat === rel)
    // multi-byte code points: substr counts code points, so must we
    val mb = spark.sql(
      "SELECT char_gram_counts('École😀ﬆé', 3) AS m")
      .collect().head.getMap[String, Long](0)
    val mbRel = spark.createDataset(Seq("École😀ﬆé")).toDF("t")
      .select(explode(graft.pipeline.Classify.charGrams($"t", 3))
        .as("token"))
      .groupBy($"token").agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    assert(mb.toMap === mbRel)
    // short text → empty map (the relational empty-array guard);
    // null propagates (explode drops the row either way)
    assert(spark.sql("SELECT char_gram_counts('ab', 3) AS m")
      .collect().head.getMap[String, Long](0).isEmpty)
    assert(spark.sql(
      "SELECT char_gram_counts(cast(null as string), 3) AS m")
      .collect().head.isNullAt(0))
  }

  test("word_gram_counts kernel matches tokens explode+count; codegen compiles") {
    GraftFunctions.register(spark)
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val rel = d.select($"doc_id",
        explode(graft.pipeline.TextAnalysis.tokens($"text"))
          .as("token"))
      .groupBy($"doc_id", $"token").agg(count(lit(1)).as("cnt"))
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    val nat = d.select($"doc_id",
        explode(GraftFunctions.word_gram_counts($"text", 1))
          .as(Seq("token", "cnt")))
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
      .toSeq
    assert(nat === rel)
    // both kernels must COMPILE inside whole-stage codegen — with the
    // fallback disabled a compile failure THROWS (the round-7 vec_*
    // Janino lesson: silent interpreted fallback is the failure mode)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val q = d.select(
        explode(GraftFunctions.char_gram_counts($"text", 3))
          .as(Seq("t", "c")))
      q.collect()
      assert(q.queryExecution.executedPlan.toString.contains("*("))
      val q2 = d.select(
        explode(GraftFunctions.word_gram_counts($"text", 1))
          .as(Seq("t", "c")))
      q2.collect()
      assert(q2.queryExecution.executedPlan.toString.contains("*("))
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("word_ngrams_bos kernel matches the relational boundary-padded reference") {
    GraftFunctions.register(spark)
    val d = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    for (n <- Seq(2, 5)) {
      val rel = d.select($"doc_id",
          graft.pipeline.TextAnalysis.wordNgramsBounded($"text", n)
            .as("g"))
        .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
      val nat = d.select($"doc_id",
          GraftFunctions.word_ngrams_bos($"text", n).as("g"))
        .as[(Long, Seq[String])].collect().sortBy(_._1).toSeq
      assert(nat === rel, s"n=$n")
    }
    // empty text: the one <s>…</s> gram; null propagates
    assert(spark.sql("SELECT word_ngrams_bos('', 3) AS g")
      .collect().head.getSeq[String](0) === Seq("<s> <s> </s>"))
    assert(spark.sql(
      "SELECT word_ngrams_bos(cast(null as string), 3) AS g")
      .collect().head.isNullAt(0))
    // stays inside whole-stage codegen (no fallback)
    d.createOrReplaceTempView("fn_bos_docs")
    val q = spark.sql(
      "SELECT word_ngrams_bos(text, 5) AS g FROM fn_bos_docs")
    q.collect()
    assert(q.queryExecution.executedPlan.toString.contains("*("))
  }

  test("vec_quantize_int8 properties: range, extremes, signs, non-finite") {
    GraftFunctions.register(spark)
    val rnd = new scala.util.Random(7)
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.fill(16)((rnd.nextFloat() - 0.5f) * 200f))
    }
    val out = vecs.toDF("id", "v")
      .select($"id", $"v",
        GraftFunctions.vec_quantize_int8($"v").as("q"))
      .as[(Long, Seq[Float], Option[Seq[Byte]])].collect()
    out.foreach { case (_, v, qo) =>
      val q = qo.getOrElse(fail("finite non-zero vector quantized to null"))
      assert(q.length === v.length)
      assert(q.forall(b => b >= -127 && b <= 127))
      // the max-|x| element maps to ±127 exactly
      val mi = v.indices.maxBy(i => math.abs(v(i).toDouble))
      assert(math.abs(q(mi).toInt) === 127, s"$v -> $q")
      // quantization never flips a sign
      v.indices.foreach { i =>
        assert(q(i) == 0 || (q(i) > 0) == (v(i) > 0f), s"$v -> $q")
      }
    }
    // NaN / Infinity elements poison the vector to null, never to 0s
    assert(spark.sql(
      """SELECT vec_quantize_int8(array(cast(1.0 as float),
        |                               cast('NaN' as float))) AS q"""
        .stripMargin).collect().head.isNullAt(0))
    assert(spark.sql(
      """SELECT vec_quantize_int8(array(cast(1.0 as float),
        |                               cast('Infinity' as float))) AS q"""
        .stripMargin).collect().head.isNullAt(0))
  }

  test("Graft.session returns a working session with functions available") {
    val s = graft.Graft.session()
    val r = s.sql(
      """SELECT simhash64('hello world') AS h,
        |vec_norm(array(cast(3.0 as float), cast(4.0 as float))) AS n"""
        .stripMargin).collect().head
    assert(r.getLong(0) === HashKernels.simHash64(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
    assert(math.abs(r.getDouble(1) - 5.0) < 1e-12)
  }

  test("vec_dot/vec_norm null-propagate like the HOF form; bad calls error cleanly") {
    GraftFunctions.register(spark)
    // null element → null result (not silently 0)
    val r1 = spark.sql(
      """SELECT vec_dot(array(cast(1.0 as float), cast(null as float)),
        |               array(cast(2.0 as float), cast(3.0 as float))) AS d"""
        .stripMargin).collect().head
    assert(r1.isNullAt(0))
    // mismatched lengths → null (zip_with pads with null)
    val r2 = spark.sql(
      """SELECT vec_dot(array(cast(1.0 as float)),
        |               array(cast(2.0 as float), cast(3.0 as float))) AS d"""
        .stripMargin).collect().head
    assert(r2.isNullAt(0))
    val r3 = spark.sql(
      "SELECT vec_norm(array(cast(null as float))) AS n").collect().head
    assert(r3.isNullAt(0))
    // minhash_agg misuse surfaces as a clean error, not MatchError/NPE
    docs.createOrReplaceTempView("fn_docs2")
    intercept[Exception] {
      spark.sql("SELECT minhash_agg(text, 0) FROM fn_docs2").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT minhash_agg(text, doc_id) FROM fn_docs2").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT minhash_agg() FROM fn_docs2").collect()
    }
  }

  test("VecFusionRule rewrites the HOF dot/norm into kernels, same results") {
    import graft.functions.{VecDot, VecFusionRule, VecNorm}
    import graft.pipeline.Similarity
    val e = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
      .limit(50)
    val hof = e.select($"vec_id",
      Similarity.dot($"embedding", $"embedding").as("d"),
      Similarity.norm($"embedding").as("n"))
    // the rule fires on the analyzed plan
    val fused = VecFusionRule(hof.queryExecution.analyzed)
    val fusedExprs = fused.collect { case pl => pl.expressions }
      .flatten.flatMap(_.collect {
        case d: VecDot => d
        case n: VecNorm => n
      })
    assert(fusedExprs.count(_.isInstanceOf[VecDot]) === 1, fused)
    assert(fusedExprs.count(_.isInstanceOf[VecNorm]) === 1, fused)

    // end-to-end through extraOptimizations: optimized plan carries the
    // kernels and the results are bit-identical to the unfused run
    val before = hof.as[(Long, Double, Double)].collect().toSeq.sorted
    graft.functions.GraftFunctions.register(spark)
    val hof2 = e.select($"vec_id",
      Similarity.dot($"embedding", $"embedding").as("d"),
      Similarity.norm($"embedding").as("n"))
    val opt = hof2.queryExecution.optimizedPlan
    assert(opt.exists(_.expressions.exists(
      _.exists(_.isInstanceOf[VecDot]))), opt)
    assert(hof2.as[(Long, Double, Double)].collect().toSeq.sorted
      === before)

    // double arrays (e.g. the SRP hyperplane dot) must NOT fuse —
    // VecDot is a float kernel
    val dbl = e.select(transform($"embedding", _.cast("double"))
      .as("emb_d"))
    val dblHof = dbl.select(aggregate(zip_with($"emb_d", $"emb_d",
      _ * _), lit(0.0), _ + _).as("d"))
    val dblFused = VecFusionRule(dblHof.queryExecution.analyzed)
    assert(!dblFused.exists(_.expressions.exists(
      _.exists(_.isInstanceOf[VecDot]))), dblFused)
  }

  test("kernel: simhash is order- and duplicate-insensitive over tokens") {
    import org.apache.spark.unsafe.types.UTF8String.{fromString => u}
    assert(HashKernels.simHash64(u("a b c")) ===
      HashKernels.simHash64(u("c b a")))
    assert(HashKernels.simHash64(u("a b c")) ===
      HashKernels.simHash64(u("a a b. c,b")))
    assert(HashKernels.simHash64(u("A B C")) ===
      HashKernels.simHash64(u("a b c")))
    assert(HashKernels.simHash64(u("a b c")) !==
      HashKernels.simHash64(u("a b d")))
  }

  test("vec expressions survive whole-stage codegen when combined in one scope") {
    // Regression: every vec_* doGenCode used a FIXED local variable
    // name, so two calls in one generated scope (dot / norms in a
    // single projection — the cosine shape every ANN scorer and the
    // k-means assignment use) redefined it, failed Janino, and
    // silently dropped the stage to interpreted execution. With
    // fallback disabled a compile failure THROWS, so this pins the
    // generated code actually compiling.
    GraftFunctions.register(spark)
    val prev = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val v = Seq(
        (1L, Array(1.0f, 0.0f, 2.0f), Array(2.0f, 1.0f, 0.0f)),
        (2L, Array(0.5f, 0.5f, 0.5f), Array(1.0f, 1.0f, 1.0f)))
        .toDF("id", "a", "b")
      val cos = v.select($"id",
        (GraftFunctions.vec_dot($"a", $"b") /
          (GraftFunctions.vec_norm($"a") *
            GraftFunctions.vec_norm($"b"))).as("cos"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(math.abs(cos(2L) - 1.0) < 1e-12)
      // the long/int8 kernels in one scope too
      val q = Seq((Array(1L, 2L, 3L), Array(3L, 2L, 1L)))
        .toDF("x", "y")
        .select((GraftFunctions.vec_dot_long($"x", $"y") +
          GraftFunctions.vec_dot_long($"y", $"x")).as("s"))
        .collect()(0).getLong(0)
      assert(q === 20L)
    } finally spark.conf.set("spark.sql.codegen.fallback", prev)
  }

  test("nfc_normalize: composed == decomposed after NFC; ASCII passthrough; fingerprints unify") {
    GraftFunctions.register(spark)
    // "café" composed (U+00E9) vs decomposed (e + U+0301)
    val composed = "café au lait"
    val decomposed = "café au lait"
    assert(composed != decomposed) // raw strings differ...
    val df = Seq((1L, composed), (2L, decomposed), (3L, "plain ascii"))
      .toDF("id", "t")
    val out = df.select($"id",
        GraftFunctions.nfc_normalize($"t").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === out(2L)) // ...but NFC unifies them
    assert(out(3L) === "plain ascii") // ASCII untouched
    // and the normalized fingerprint groups them where the plain
    // chain keeps two "distinct" docs
    val plain = Dedup.fingerprintGroups(df, "t", "id").count()
    val nfc = Dedup.fingerprintGroupsNfc(df, "t", "id")
    assert(plain === 3L)
    assert(nfc.count() === 2L)
    assert(nfc.filter($"group_size" === 2).select($"keeper")
      .as[Long].collect().toSeq === Seq(1L))
  }
}
