package graft.queries

import graft.engine.{Converter, GraphTables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, round}

/** Driver-visible demonstrations of the XML property-graph surface.
  *
  * These queries run the full engine (ingest → adapters → corpus query)
  * over the bundled reference fixtures; they ignore the scale-factor
  * directory argument because their input is XML, which the synthetic
  * star schema cannot supply. The driver therefore records rows-only
  * checks for them (no oracle SQL) — their exact-output verification
  * lives in the ScalaTest golden suites (IngestSpec, AdapterSpec,
  * CorpusSpec).
  */
object XmlQueries {

  /** Bundled copies of the reference's fixtures (FIXTURES.md §A). */
  val fixturesDir: String = sys.env.getOrElse("GRAFT_FIXTURES",
    "/root/repo/src/test/resources/fixtures")

  /** A one-document patch corpus applied ON TOP of [[fixturesDir]] via
    * [[Converter.upsert]] — the reference's incremental re-conversion
    * path, and the only way a conversion can strand cross-references
    * (see upsert's scaladoc). Drives the non-empty branch of the
    * broken-references health query. */
  val updateDir: String = sys.env.getOrElse("GRAFT_FIXTURES_UPDATE",
    "/root/repo/src/test/resources/fixtures_update")

  @volatile private var cached: Option[(SparkSession, GraphTables)] = None
  @volatile private var cachedUpsert: Option[(SparkSession, GraphTables)] =
    None

  /** Convert once per session and reuse across the query map. */
  def tables(spark: SparkSession): GraphTables = synchronized {
    cached match {
      case Some((s, t)) if s eq spark => t
      case _ =>
        val t = new Converter(spark, Converter.allAdapters)
          .convert(fixturesDir)
        // localCheckpoint truncates the ingest/adapter lineage so each
        // downstream query plans against flat in-memory tables instead
        // of re-analyzing the whole conversion pipeline. coalesce(1)
        // first: the raw lineage ends in unions of many shuffles (the
        // xref table arrives with ~576 near-empty partitions), and at
        // fixture scale every downstream query would otherwise schedule
        // hundreds of empty tasks — per scan, per recursion level.
        val materialized = GraphTables(
          t.documents.coalesce(1).localCheckpoint(),
          t.nodes.coalesce(1).localCheckpoint(),
          t.properties.coalesce(1).localCheckpoint(),
          t.crossReferences.coalesce(1).localCheckpoint())
        cached = Some((spark, materialized))
        materialized
    }
  }

  /** Upsert the patch corpus onto the cached base conversion, once per
    * session (same materialization treatment as [[tables]]). */
  def upsertTables(spark: SparkSession): GraphTables = synchronized {
    cachedUpsert match {
      case Some((s, t)) if s eq spark => t
      case _ =>
        val t = new Converter(spark, Converter.allAdapters)
          .upsert(tables(spark), updateDir)
        val materialized = GraphTables(
          t.documents.coalesce(1).localCheckpoint(),
          t.nodes.coalesce(1).localCheckpoint(),
          t.properties.coalesce(1).localCheckpoint(),
          t.crossReferences.coalesce(1).localCheckpoint())
        cachedUpsert = Some((spark, materialized))
        materialized
    }
  }

  @volatile private var cachedStreamed:
    Option[(SparkSession, (DataFrame, DataFrame, DataFrame))] = None

  /** Stream-convert the fixture corpus once per session:
    * [[graft.streaming.XmlStreamIngest]] discovers every fixture file
    * through the file-source in one AvailableNow pass, appends
    * per-micro-batch parquet via foreachBatch, and `compact` resolves
    * cross-batch keys — exactly the tables a continuous deployment
    * would serve. Materialized small (the [[tables]] treatment) so
    * the comparison gate re-reads flat checkpoint blocks. */
  private def streamedTables(spark: SparkSession)
      : (DataFrame, DataFrame, DataFrame) = synchronized {
    cachedStreamed match {
      case Some((s, t)) if s eq spark => t
      case _ =>
        val out = java.nio.file.Files
          .createTempDirectory("graft_xml_streamed").toString
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft_xml_streamed_ckpt").toString
        val q = graft.streaming.XmlStreamIngest.run(spark, fixturesDir,
          out, ckpt,
          org.apache.spark.sql.streaming.Trigger.AvailableNow())
        q.awaitTermination()
        graft.streaming.XmlStreamIngest.compact(spark, out)
        def read(n: String) = spark.read
          .parquet(s"$out/compacted/$n").coalesce(1).localCheckpoint()
        val t = (read("documents"), read("nodes"),
          read("node_properties"))
        cachedStreamed = Some((spark, t))
        t
    }
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    // §2.9 end-to-end: the streaming XML ingest (file-source
    // discovery → the batch converter's own parse/explode/dedup
    // stages → foreachBatch append → compaction) must produce tables
    // MULTISET-EQUAL to the one-shot batch conversion of the same
    // corpus on every deterministic column (parsed_at/created_at are
    // ingest wall clocks). The gate returns the comparison itself —
    // row counts plus both multiset differences via exceptAll — so
    // the golden pins streamed == batch, not just cardinality.
    "xml_convert_streamed" ->
      ((s: SparkSession, _: String) => {
        import s.implicits._
        val (sd, sn, sp) = streamedTables(s)
        val b = tables(s)
        def cmp(name: String, streamed: DataFrame, batch: DataFrame,
            cols: Seq[String]): (String, Long, Long, Long) = {
          val a = streamed.select(cols.map(col): _*)
          val bb = batch.select(cols.map(col): _*)
          (name, a.count(), a.exceptAll(bb).count(),
            bb.exceptAll(a).count())
        }
        Seq(
          cmp("documents", sd, b.documents,
            Seq("id", "filename", "file_hash", "file_size")),
          cmp("node_properties", sp, b.properties,
            Seq("node_id", "property_name", "property_value",
              "data_type", "document_id")),
          cmp("nodes", sn, b.nodes,
            Seq("id", "node_type", "document_id", "parent_id",
              "position", "content", "xpath")))
          .toDF("table_name", "n_rows", "n_only_streamed",
            "n_only_batch")
          .orderBy(col("table_name"))
      }),
    // The broken-references health query (sql_queries.md:193-199) over
    // the one state that can strand a reference: the incremental
    // re-conversion ([[Converter.upsert]] of [[updateDir]]'s patch,
    // which evicts book_1 from its (books, 0) sibling slot while the
    // base conversion's edges to it persist). Golden is hand-derived:
    // the patch removes exactly book_1, so the distinct dangling target
    // set is {book_1}.
    "xml_broken_references" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.brokenReferences(upsertTables(s))
          .orderBy(col("missing_node_id"))),
    "xml_count_by_type" ->
      ((s: SparkSession, _: String) => GraphQueries.countByType(tables(s))),
    // The gate entry projects away `created_at` (an ingest wall-clock
    // timestamp) so the output is run-to-run deterministic and
    // hash-comparable; GraphQueries.searchByAttribute itself keeps the
    // reference's `SELECT n.*` shape.
    "xml_search_attribute" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.searchByAttribute(tables(s), "category", "cat_fiction")
          .select(col("id"), col("node_type"), col("document_id"),
            col("parent_id"), col("position"), col("content"), col("xpath"),
            col("property_value"))
          .orderBy(col("id"))),
    "xml_node_tree" ->
      ((s: SparkSession, _: String) => GraphQueries.nodeTree(tables(s))),
    // avg/ratio aggregates rounded to 6dp in the gate entry so the
    // float outputs are literal-representable in the VALUES golden
    // (min/max/count are already exact).
    "xml_relationship_summary" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.relationshipSummary(tables(s))
          .withColumn("avg_confidence", round(col("avg_confidence"), 6))),
    "xml_most_connected" ->
      ((s: SparkSession, _: String) => GraphQueries.mostConnected(tables(s))),
    "xml_relationship_counts" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.relationshipCounts(tables(s))),
    "xml_ancestors" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.ancestors(tables(s), "reviewer_1")),
    "xml_descendants" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.descendants(tables(s), "books")),
    "xml_bidirectional" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.bidirectionalPairs(tables(s))
          .orderBy(col("node1_id"), col("node2_id"), col("reference_type"),
            col("attribute_name"))),
    "xml_statistics" ->
      ((s: SparkSession, _: String) => GraphQueries.statistics(tables(s))),
    "xml_hierarchical_paths" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.hierarchicalPaths(tables(s))),
    // --- round 4: the rest of the reference's navigation corpus,
    // driver-gated with the same VALUES-golden pattern. Each gate entry
    // adds a total ORDER BY (and, for node scans, projects away the
    // ingest-wall-clock created_at) so output is hash-deterministic;
    // the GraphQueries methods themselves keep the reference's shape.
    "xml_relationships_of" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.relationshipsOf(tables(s), "book_1")
          .orderBy(col("direction"), col("reference_type"),
            col("related_node"), col("confidence"))),
    "xml_direct_children" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.directChildren(tables(s), "books")
          .orderBy(col("child_id"))),
    "xml_siblings" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.siblingsOf(tables(s), "book_1")
          .orderBy(col("sibling_id"))),
    "xml_references_to" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.referencesTo(tables(s), "book_1")
          .orderBy(col("confidence").desc, col("source_node_id"),
            col("attribute_name"))),
    "xml_xpath_search" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.xpathSearch(tables(s), "%/book[%")
          .select(col("id"), col("node_type"), col("document_id"),
            col("parent_id"), col("position"), col("content"), col("xpath"))
          .orderBy(col("id"))),
    "xml_content_search" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.contentSearch(tables(s), "quantum")
          .select(col("id"), col("node_type"), col("document_id"),
            col("parent_id"), col("position"), col("content"), col("xpath"))
          .orderBy(col("id"))),
    "xml_properties_of_type" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.propertiesOfType(tables(s), "book", "category")),
    "xml_properties_by_datatype" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.propertiesByDataType(tables(s), "integer")),
    "xml_eav_conjunction" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.eavConjunction(tables(s), "rating", "5",
            "date", "datetime")
          .orderBy(col("id"))),
    "xml_pivot_properties" ->
      ((s: SparkSession, _: String) =>
        GraphQueries.pivotProperties(tables(s),
            Seq("name", "category", "rating"))
          .orderBy(col("node_id"))),
    // S2's schema-on-read path: the widened per-rowTag read with an
    // explicit schema (no inference pass), flattened to scalar columns
    // so the driver comparator can hash it. Golden is hand-derived
    // straight from sample_library.xml's three <book> elements.
    "xml_widened_read" ->
      ((s: SparkSession, _: String) => {
        import org.apache.spark.sql.types._
        val schema = StructType(Seq(
          StructField("_id", StringType),
          StructField("_isbn", StringType),
          StructField("title", StringType),
          StructField("pages", LongType),
          StructField("price", StructType(Seq(
            StructField("_VALUE", DoubleType),
            StructField("_currency", StringType))))))
        graft.ingest.XmlIngest
          .widenedRead(s, fixturesDir, "book", Some(schema))
          .select(col("_id").as("id"), col("_isbn").as("isbn"),
            col("title"), col("pages"),
            col("price._currency").as("currency"),
            col("price._VALUE").as("price"))
          .orderBy(col("id"))
      }))

  /** Golden outputs for the XML queries, expressed as VALUES relations
    * so the driver's DuckDB oracle can hash-verify every xml_* entry.
    * The three below are hand-derived from FIXTURES.md §A2's element
    * inventory (sample_library) plus simple.xml's
    * root/child/child/nested — independently recountable from the
    * fixture files. The rest live in [[XmlGoldens]]
    * (generated from a verified dump over the independently-pinned
    * corpus tables; spot-checked: statistics' 40 nodes == the
    * count_by_type golden's sum, relationship_summary's 118 same_type
    * rows == Σ n(n−1) over same-typed id-carrying elements, and
    * avg=0.955/min=0.8500000000000001 reproduce the reference's
    * base+0.05 confidence doubles. Round-4 navigation goldens,
    * recounted from the fixtures by hand: direct_children(books) =
    * {book_1,book_2,book_3}; xpath_search('%/book[%') = 18 = the 3
    * books + 3 authors + 3 awards + 9 tags under them (only book has
    * ambiguous-sibling positional predicates); pivot_properties = 21 =
    * 15 name-carrying elements (2 category + 4 subcategory + 3 author
    * + 3 reviewer + 3 award) + 3 category-carrying books + 3
    * rating-carrying reviews; eav_conjunction(rating=5 ∧ datetime
    * date) = {review_1, review_3}; properties_by_datatype(integer) =
    * 9 = count×2 + depth + year×3 + rating×3.
    *
    * Round-6 recounts for the remaining five, from sample_library.xml:
    *  - siblings(book_1) = {book_2, book_3}: `books` has exactly three
    *    id-carrying children, book_1 excluded from its own siblings.
    *  - references_to(book_1) = 2: the only attributes anywhere whose
    *    value is `book_1` are review_1.book_id and review_2.book_id;
    *    `book_id` matches the `*_id` identifier pattern ⇒ confidence
    *    1.0 exactly.
    *  - relationships_of(book_1) = 17 = 2 (author_1 is book_1's only
    *    id-carrying direct child: parent_child out + child_parent in)
    *    + 2 (books: parent_child in + child_parent out) + 2 (book_2:
    *    next_sibling out + previous_sibling in — book_3 is not
    *    adjacent) + 4 (sibling in/out × {book_2, book_3}) + 4
    *    (same_type 0.6 in/out × {book_2, book_3}) + 1 (category=
    *    "cat_fiction": no identifier suffix ⇒ semantic base 0.8 + 0.05
    *    existence bonus = 0.8500000000000001 in doubles) + 2
    *    (review_1/review_2 book_id in at 1.0).
    *  - content_search('quantum') = 6: descendant-concatenated content
    *    contains lowercase "quantum" for tag_quantum
    *    ("quantum-physics"), review_1 ("quantum mechanics"), book_1
    *    (via its description), and their ancestors with ids — books,
    *    reviews, main_library. "The Quantum Garden" alone would NOT
    *    match (capital Q, LIKE is case-sensitive), and `title` carries
    *    no id so it is never a node.
    *  - properties_of_type(book, category) = 3: each of the three
    *    books carries exactly one `category` attribute
    *    (cat_fiction / cat_mystery / cat_history). */
  val oracle: Map[String, String] = XmlGoldens.oracle ++ Map(
    // Hand-derived: the fixture corpus has exactly 2 parseable XML
    // documents (simple + sample_library — the statistics golden's
    // document count); 40 nodes == the count_by_type golden's sum;
    // 51 properties == the fixtures' id-carrying elements' attribute
    // inventory. Both multiset differences MUST be 0 — that is the
    // stream==batch equivalence the gate exists to pin.
    "xml_convert_streamed" ->
      """SELECT CAST(c0 AS VARCHAR) AS table_name,
         CAST(c1 AS BIGINT) AS n_rows,
         CAST(c2 AS BIGINT) AS n_only_streamed,
         CAST(c3 AS BIGINT) AS n_only_batch FROM (VALUES
         ('documents', 2, 0, 0),
         ('node_properties', 51, 0, 0),
         ('nodes', 40, 0, 0)) AS t(c0, c1, c2, c3)
         ORDER BY table_name""",
    "xml_broken_references" ->
      """SELECT CAST(c0 AS VARCHAR) AS missing_node_id FROM (VALUES
         ('book_1')) AS t(c0) ORDER BY missing_node_id""",
    "xml_count_by_type" ->
      """SELECT node_type, CAST(cnt AS BIGINT) AS count FROM (VALUES
         ('tag', 9), ('subcategory', 4), ('author', 3), ('award', 3),
         ('book', 3), ('review', 3), ('reviewer', 3), ('category', 2),
         ('child', 2), ('books', 1), ('categories', 1), ('library', 1),
         ('location', 1), ('metadata', 1), ('nested', 1), ('reviews', 1),
         ('root', 1)) AS t(node_type, cnt)
         ORDER BY count DESC, node_type""",
    "xml_ancestors" ->
      """SELECT ancestor_id, CAST(depth AS INT) AS depth, path FROM (VALUES
         ('review_1', 1, 'review_1 -> reviewer_1'),
         ('reviews', 2, 'reviews -> review_1 -> reviewer_1'),
         ('main_library', 3,
          'main_library -> reviews -> review_1 -> reviewer_1'))
         AS t(ancestor_id, depth, path) ORDER BY depth""",
    "xml_descendants" ->
      """SELECT descendant_id, CAST(depth AS INT) AS depth, path FROM (VALUES
         ('book_1', 1, 'books -> book_1'),
         ('book_2', 1, 'books -> book_2'),
         ('book_3', 1, 'books -> book_3'),
         ('author_1', 2, 'books -> book_1 -> author_1'),
         ('author_2', 2, 'books -> book_2 -> author_2'),
         ('author_3', 2, 'books -> book_3 -> author_3'))
         AS t(descendant_id, depth, path) ORDER BY depth, descendant_id""",
    "xml_widened_read" ->
      """SELECT CAST(c0 AS VARCHAR) AS id, CAST(c1 AS VARCHAR) AS isbn,
         CAST(c2 AS VARCHAR) AS title, CAST(c3 AS BIGINT) AS pages,
         CAST(c4 AS VARCHAR) AS currency, CAST(c5 AS DOUBLE) AS price
         FROM (VALUES
         ('book_1', '978-0-123456-47-2', 'The Quantum Garden', 342,
          'USD', 24.99),
         ('book_2', '978-0-987654-32-1', 'The Silent Echo', 298,
          'USD', 19.99),
         ('book_3', '978-0-555555-55-5', 'Ancient Civilizations', 456,
          'USD', 34.99)) AS t(c0, c1, c2, c3, c4, c5)
         ORDER BY id""")
}
