package graft

import org.apache.spark.sql.functions._

import graft.functions.exprs
import graft.operators.{Dedup, TextOps}

/** Edge cases + cross-implementation equivalence for the custom
  * expressions.
  */
class ExpressionEdgeSpec extends SparkSuite {
  import spark.implicits._

  test("ngramHashes: cardinality equals the string-shingle formulation") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(100)
    val both = docs.select(
      size(exprs.ngramHashes(col("text"), 3)).as("h"),
      size(Dedup.shingles(col("text"), 3)).as("s")).collect()
    both.foreach(r => assert(r.getInt(0) == r.getInt(1)))
  }

  test("ngramHashes edge cases: empty, short, whitespace-only, null") {
    val rows = Seq(null, "", "   ", "one", "one two", "one two three", "a\tb\nc")
      .toDF("t")
      .select(exprs.ngramHashes($"t", 3).as("h")).collect()
    assert(rows(0).isNullAt(0), "null in → null out")
    assert(rows(1).getSeq[Long](0).isEmpty)
    assert(rows(2).getSeq[Long](0).isEmpty)
    assert(rows(3).getSeq[Long](0).isEmpty)
    assert(rows(4).getSeq[Long](0).isEmpty)
    assert(rows(5).getSeq[Long](0).length == 1)
    assert(rows(6).getSeq[Long](0).length == 1, "any whitespace splits")
  }

  // Composed reference spells whitespace as the explicit RE2 class
  // [\t\n\f\r ] (the oracle dialect); the fuzz alphabet includes
  // \u000B precisely because Java's \s and RE2's \s disagree on it —
  // the kernel must treat it as a NON-space character.
  test("cleanText ≡ trim(regexp_replace(coalesce(cast, ''), [\\t\\n\\f\\r ]+, ' ')) incl. edges") {
    val edges = Seq(
      null, "", " ", "   ", "a", "  a  ", "a b", "a  b", "\t a \n b \r",
      "ab", "a\fb\r\n c", "tab\tsep", "ñandú  café x", //   is NOT \s
      "多  字　节", "mixed　ideographic") // 　 is NOT Java \s
    val df = edges.toDF("t").select(
      exprs.cleanText($"t".cast("string")).as("kernel"),
      trim(regexp_replace(coalesce($"t".cast("string"), lit("")), "[\\t\\n\\f\\r ]+", " ")).as("composed"))
    df.collect().foreach { r =>
      assert(!r.isNullAt(0), "kernel is never null")
      assert(r.getString(0) == r.getString(1), s"mismatch for ${r.getString(1)}")
    }
    // SQL registration surface
    GraftExtensions.register(spark)
    val viaSql = spark.sql("SELECT clean_text('  a\tb  ') AS c").head.getString(0)
    assert(viaSql == "a b")
  }

  test("cleanText fuzz: equals composed formulation on 500 seeded random strings") {
    val rng = new scala.util.Random(20260812L)
    val alphabet: IndexedSeq[Char] =
      "abcXYZ019ñ€字 　".toIndexedSeq ++ Seq('\t', '\n', '\u000B', '\f', '\r', ' ')
    val strings = IndexedSeq.fill(500)(
      IndexedSeq.fill(rng.nextInt(24))(alphabet(rng.nextInt(alphabet.length))).mkString)
    val df = strings.toDF("t").select(
      exprs.cleanText($"t".cast("string")).as("kernel"),
      trim(regexp_replace(coalesce($"t".cast("string"), lit("")), "[\\t\\n\\f\\r ]+", " ")).as("composed"))
    df.collect().foreach { r =>
      assert(r.getString(0) == r.getString(1),
        s"kernel '${r.getString(0)}' != composed '${r.getString(1)}'")
    }
  }

  test("simhashText ≡ simhash64(tokens) on lowercase text") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    val both = docs.select(
      exprs.simhashText(col("text")).as("a"),
      exprs.simhash64(TextOps.tokens(col("text"))).as("b")).collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("winnowFingerprint: shorter than k → empty; identical text → identical set") {
    val rows = Seq("abc", "abcdefgh", "abcdefghijkl").toDF("t")
      .select(exprs.winnowFingerprint($"t", 8, 4).as("f")).collect()
    assert(rows(0).getSeq[Long](0).isEmpty)
    assert(rows(1).getSeq[Long](0).length == 1)
    val two = Seq("same text here padded out", "same text here padded out").toDF("t")
      .select(exprs.winnowFingerprint($"t", 8, 4).as("f")).collect()
    assert(two(0).getSeq[Long](0) == two(1).getSeq[Long](0))
  }

  test("vecDot: nulls, length mismatch, empty") {
    GraftExtensions.register(spark)
    val d = spark.sql(
      """SELECT
        |  vec_dot(array(1.0D, 2.0D, 3.0D), array(1.0D, 1.0D)) AS mismatch,
        |  vec_dot(array(CAST(NULL AS DOUBLE), 2.0D), array(3.0D, 4.0D)) AS withnull,
        |  vec_dot(array(CAST(1.0 AS DOUBLE)), array(CAST(2.0 AS DOUBLE))) AS one
        |""".stripMargin)
    val r = d.collect()(0)
    assert(r.getDouble(0) == 3.0, "min-length semantics")
    assert(r.getDouble(1) == 8.0, "null element skipped")
    assert(r.getDouble(2) == 2.0)
  }

  test("minhashSig: null for null/empty shingles, length = numHashes, monotone under superset") {
    val df = Seq(
      ("a b c d e f g h", 1),
      ("", 2),
      (null.asInstanceOf[String], 3)
    ).toDF("text", "id")
    val sigs = df.select(col("id"),
      exprs.minhashSig(exprs.ngramHashes(col("text"), 3), 16).as("sig"))
      .collect().map(r => r.getInt(0) -> Option(r.getSeq[Long](1))).toMap
    assert(sigs(1).get.length == 16)
    assert(sigs(2).isEmpty) // too short to shingle -> null signature
    assert(sigs(3).isEmpty)
    // a superset of shingles can only lower (or keep) each minhash
    val sup = Seq(("a b c d e f g h i j k l", 1)).toDF("text", "id")
      .select(exprs.minhashSig(exprs.ngramHashes(col("text"), 3), 16))
      .collect()(0).getSeq[Long](0)
    sigs(1).get.zip(sup).foreach { case (base, wider) => assert(wider <= base) }
  }

  test("minhashSig: identical shingle sets -> identical signatures regardless of order") {
    val a = Seq("x y z w x y z").toDF("text")
      .select(exprs.minhashSig(exprs.ngramHashes(col("text"), 2), 32))
      .collect()(0).getSeq[Long](0)
    // same bigram set {xy, yz, zw, wx}, different arrival order
    val b = Seq("z w x y z").toDF("text")
      .select(exprs.minhashSig(exprs.ngramHashes(col("text"), 2), 32))
      .collect()(0).getSeq[Long](0)
    assert(a == b)
  }

  test("longArrayMatchCount: full, partial, none, length mismatch, nulls") {
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L), 3),
      (Seq(1L, 2L, 3L), Seq(1L, 9L, 3L), 2),
      (Seq(1L, 2L), Seq(3L, 4L), 0),
      (Seq(1L, 2L, 3L), Seq(1L, 2L), 2) // compares up to shorter length
    ).toDF("a", "b", "expected")
    val got = df.select(exprs.longArrayMatchCount(col("a"), col("b")).as("m"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    val withNull = Seq((Seq(1L), Option.empty[Seq[Long]])).toDF("a", "b")
      .select(exprs.longArrayMatchCount(col("a"), col("b")))
      .collect()(0)
    assert(withNull.isNullAt(0))
  }

  test("hyperplaneBuckets: deterministic per seed, length = tables, float/double agree") {
    val vf = Seq(Seq(1.0f, -2.0f, 0.5f)).toDF("v")
    val vd = Seq(Seq(1.0, -2.0, 0.5)).toDF("v")
    val bf = vf.select(exprs.hyperplaneBuckets(col("v"), 3, 4, 8, 42L))
      .collect()(0).getSeq[Long](0)
    val bd = vd.select(exprs.hyperplaneBuckets(col("v"), 3, 4, 8, 42L))
      .collect()(0).getSeq[Long](0)
    assert(bf.length == 4 && bf == bd)
    val again = vf.select(exprs.hyperplaneBuckets(col("v"), 3, 4, 8, 42L))
      .collect()(0).getSeq[Long](0)
    assert(again == bf)
    val otherSeed = vf.select(exprs.hyperplaneBuckets(col("v"), 3, 4, 8, 7L))
      .collect()(0).getSeq[Long](0)
    assert(otherSeed != bf) // 32 random bits agreeing by chance: ~2^-32
  }

  test("centroidIds: nearest first, nprobe order, clamp to nlist") {
    val cs = Seq(Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(-10.0, 0.0))
    val df = Seq(Seq(9.0f, 1.0f)).toDF("v")
    val ids = df.select(exprs.centroidIds(col("v"), cs, 2))
      .collect()(0).getSeq[Int](0)
    assert(ids == Seq(0, 1)) // nearest centroid 0, then 1
    val all = df.select(exprs.centroidIds(col("v"), cs, 99))
      .collect()(0).getSeq[Int](0)
    assert(all.length == 3 && all.head == 0)
  }

  test("centroidIds: NaN input degrades to index order, no crash") {
    val cs = Seq(Seq(10.0, 0.0), Seq(0.0, 10.0), Seq(-10.0, 0.0))
    val nan = Seq(Seq(Float.NaN, 1.0f)).toDF("v")
    val ids = nan.select(exprs.centroidIds(col("v"), cs, 2))
      .collect()(0).getSeq[Int](0)
    assert(ids == Seq(0, 1), "all-NaN scores fall back to centroid index order")
  }

  test("spaceEncode: byte-identical to the composed regexp chain") {
    val cases = Seq(
      null, "", "   ", "\t\n\f\r ", "a", "ab", "a b", "  a  b  ",
      "The Fast KEY", "a\tb\nc\fd\re", "xy", // vertical tab is a CHAR, not ws
      "cafÉ Über", // multi-byte lowercase: É→é, Ü→ü
      "mixed   runs\t\t of\n\nspace", "|pipes| stay |",
      "a| b", "||x||", "| |", "|", "a ||| b")
      .toDF("t")
    val composed = regexp_replace(
      regexp_replace(
        regexp_replace(lower(coalesce($"t", lit(""))), "[\\t\\n\\f\\r ]+", "|"),
        "^\\|+|\\|+$", ""),
      "(.)", " $1 ")
    val rows = cases.select(
      exprs.spaceEncode(coalesce($"t", lit(""))).as("k"),
      composed.as("r")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"kernel ${r.getString(0).replace(" ", "_")} != regex ${r.getString(1).replace(" ", "_")}"))
  }

  private def htmlComposed(t: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    trim(regexp_replace(
      Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
        "&nbsp;" -> " ", "&amp;" -> "&")
        .foldLeft(
          regexp_replace(
            regexp_replace(
              regexp_replace(coalesce(t, lit("")),
                "(?s)<script[^>]*>.*?</script>", " "),
              "(?s)<style[^>]*>.*?</style>", " "),
            "<[^>]*>", " ")) { case (acc, (p, r)) => replace(acc, lit(p), lit(r)) },
      "[\\t\\n\\f\\r ]+", " "))

  test("htmlExtract: byte-identical to the composed regex/replace chain incl. edges") {
    val cases = Seq(
      null, "", "plain text no markup", "<p>hello</p>",
      "<script>if (a > b) { x = \"<p>\"; }</script>ok",
      "<script type=\"text/javascript\">var x = 1 &lt; 2;</script>after",
      "<script>var x = 1; unclosed rest stays",      // no close → tag-strip path
      "<style>body { color: red; }</style>visible",
      "<style media=\"all\">s</style><script>j</script>mix",
      "<div><span>nested</span></div>",
      "&amp;lt; stays literal",                        // double escape
      "&lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b &amp; done",
      "<a href=\"#>anchor\">link</a>",               // '>' inside attribute
      "< lone", "lone < at end", "a < b > c", "trailing <unclosed",
      "<script>a</script><script>b</script>c",        // adjacent blocks
      "<SCRIPT>X</SCRIPT> upper is not a block",      // case-sensitive contract
      "héllo <b>wörld</b> 中文",   // multi-byte safety
      "  \t lead <br/> trail \n ")
      .toDF("t")
    val rows = cases.select(
      exprs.htmlExtract(coalesce($"t", lit(""))).as("k"),
      htmlComposed($"t").as("r")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"kernel [${r.getString(0)}] != chain [${r.getString(1)}]"))
  }

  test("htmlExtract fuzz: equals composed chain on 300 seeded fragment strings") {
    val frags = Array(
      "<script>", "</script>", "<script type=\"a>b\">", "<style>", "</style>",
      "<p>", "</p>", "<div class=\"x\">", "<br/>", "<", ">", "&lt;", "&gt;",
      "&amp;", "&amp;lt;", "&quot;", "&#39;", "&nbsp;", "&bogus;", "&", ";",
      "word", "two words", " ", "\t", "\n", "café")
    val rnd = new scala.util.Random(1234)
    val cases = (0 until 300).map { _ =>
      (0 until (1 + rnd.nextInt(12))).map(_ => frags(rnd.nextInt(frags.length))).mkString
    }.toDF("t")
    val n = cases.select(
      exprs.htmlExtract(coalesce($"t", lit(""))).as("k"),
      htmlComposed($"t").as("r"))
      .filter($"k" =!= $"r").count()
    assert(n == 0L)
  }

  test("urlCanon: byte-identical to the composed split/sort chain incl. edges") {
    val cases = Seq(
      "HTTP://Shop.Example.COM:80/Item/7?utm_source=x&b=2&a=1#frag",
      "https://example.com:443/", "https://example.com:8443/x",
      "http://example.com", "ftp://Files.Example.com:80/x",
      "no-scheme-plain TEXT", "http://example.com?b=1&a=2",
      "http://example.com/p?fbclid=1&ref=x&refer=y&z",
      "http://example.com/p?a=1&a=1&A=2",
      "http://example.com/Path/UPPER?x=1",
      "", "#onlyfrag", "http://#frag", "a://b?c",
      "http://e.com/p?a=1?b=2", "http://e.com/p?a=1&",
      "http://e.com:80x/y", "HTTPS://E.COM:443?Z=1&gclid=g",
      "http://e.com/p?utm_=1&utm=2&UTM_S=3", // utm_ prefix case-sensitive; bare 'utm' kept
      "http://e.com/??a", "http://:80/x")
      .toDF("u")
    cases.createOrReplaceTempView("urlcases")
    val chain = spark.sql(
      """SELECT u, canon FROM (
        |  SELECT u, nf, sp, scheme, host, path,
        |    array_join(array_sort(filter(split(q, '&'), p ->
        |      length(p) > 0 AND NOT startswith(p, 'utm_')
        |      AND NOT split_part(p, '=', 1) IN ('fbclid', 'gclid', 'ref'))), '&') AS q2,
        |    CASE WHEN sp = 0 THEN lower(nf) ELSE
        |      concat(scheme, '://', host,
        |        CASE WHEN path = '' THEN '/' ELSE path END,
        |        CASE WHEN array_join(array_sort(filter(split(q, '&'), p ->
        |            length(p) > 0 AND NOT startswith(p, 'utm_')
        |            AND NOT split_part(p, '=', 1) IN ('fbclid', 'gclid', 'ref'))), '&') = ''
        |          THEN '' ELSE concat('?', array_join(array_sort(filter(split(q, '&'), p ->
        |            length(p) > 0 AND NOT startswith(p, 'utm_')
        |            AND NOT split_part(p, '=', 1) IN ('fbclid', 'gclid', 'ref'))), '&')) END)
        |    END AS canon
        |  FROM (
        |    SELECT u, nf, sp, scheme, hl, pathq,
        |      CASE WHEN scheme = 'http' AND endswith(hl, ':80')
        |             THEN substring(hl, 1, length(hl) - 3)
        |           WHEN scheme = 'https' AND endswith(hl, ':443')
        |             THEN substring(hl, 1, length(hl) - 4)
        |           ELSE hl END AS host,
        |      split_part(pathq, '?', 1) AS path,
        |      CASE WHEN instr(pathq, '?') = 0 THEN ''
        |           ELSE substring(pathq, instr(pathq, '?') + 1) END AS q
        |    FROM (
        |      SELECT u, nf, sp,
        |        lower(substring(nf, 1, sp - 1)) AS scheme,
        |        lower(regexp_extract(rest, '^[^/?]*', 0)) AS hl,
        |        substring(rest, length(regexp_extract(rest, '^[^/?]*', 0)) + 1) AS pathq
        |      FROM (
        |        SELECT u, nf, instr(nf, '://') AS sp,
        |          CASE WHEN instr(nf, '://') = 0 THEN ''
        |               ELSE substring(nf, instr(nf, '://') + 3) END AS rest
        |        FROM (SELECT u, split_part(u, '#', 1) AS nf FROM urlcases))))) t""".stripMargin)
    val rows = chain
      .select(exprs.urlCanon($"u").as("k"), $"canon".as("r"), $"u")
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"kernel [${r.getString(0)}] != chain [${r.getString(1)}] for [${r.getString(2)}]"))
  }

  test("urlCanon fuzz: equals composed chain on 300 seeded url-ish strings; null in null out") {
    val frags = Array(
      "http://", "HTTPS://", "ftp://", "Example.COM", "e.com", ":80", ":443",
      ":8080", "/path", "/P/Q", "?", "a=1", "b=2", "&", "#frag", "#", "utm_x=1",
      "fbclid=z", "ref=r", "z", "=v", "??", "://", "", "x")
    val rnd = new scala.util.Random(4321)
    val cases = (0 until 300).map { _ =>
      (0 until (1 + rnd.nextInt(10))).map(_ => frags(rnd.nextInt(frags.length))).mkString
    }.toDF("u")
    cases.createOrReplaceTempView("urlcases")
    val chain = spark.sql(
      """SELECT u,
        |  CASE WHEN sp = 0 THEN lower(nf) ELSE
        |    concat(scheme, '://', host,
        |      CASE WHEN path = '' THEN '/' ELSE path END,
        |      CASE WHEN q2 = '' THEN '' ELSE concat('?', q2) END)
        |  END AS canon
        |FROM (
        |  SELECT u, nf, sp, scheme, host, path,
        |    array_join(array_sort(filter(split(q, '&'), p ->
        |      length(p) > 0 AND NOT startswith(p, 'utm_')
        |      AND NOT split_part(p, '=', 1) IN ('fbclid', 'gclid', 'ref'))), '&') AS q2
        |  FROM (
        |    SELECT u, nf, sp, scheme, hl, pathq,
        |      CASE WHEN scheme = 'http' AND endswith(hl, ':80')
        |             THEN substring(hl, 1, length(hl) - 3)
        |           WHEN scheme = 'https' AND endswith(hl, ':443')
        |             THEN substring(hl, 1, length(hl) - 4)
        |           ELSE hl END AS host,
        |      split_part(pathq, '?', 1) AS path,
        |      CASE WHEN instr(pathq, '?') = 0 THEN ''
        |           ELSE substring(pathq, instr(pathq, '?') + 1) END AS q
        |    FROM (
        |      SELECT u, nf, sp,
        |        lower(substring(nf, 1, sp - 1)) AS scheme,
        |        lower(regexp_extract(rest, '^[^/?]*', 0)) AS hl,
        |        substring(rest, length(regexp_extract(rest, '^[^/?]*', 0)) + 1) AS pathq
        |      FROM (
        |        SELECT u, nf, instr(nf, '://') AS sp,
        |          CASE WHEN instr(nf, '://') = 0 THEN ''
        |               ELSE substring(nf, instr(nf, '://') + 3) END AS rest
        |        FROM (SELECT u, split_part(u, '#', 1) AS nf FROM urlcases))))) t""".stripMargin)
    val bad = chain
      .select($"u", exprs.urlCanon($"u").as("k"), $"canon".as("r"))
      .filter($"k" =!= $"r").limit(5).collect()
    assert(bad.isEmpty, bad.map(r =>
      s"u=[${r.getString(0)}] kernel=[${r.getString(1)}] chain=[${r.getString(2)}]")
      .mkString("\n"))
    val nulls = Seq[Option[String]](None).map(_.orNull).toDF("u")
      .select(exprs.urlCanon($"u").as("k")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("luhnCheck: known-valid cards, known-invalid runs, edge cases") {
    // Valid numbers are the standard public test-card values (Luhn
    // checksum holds); invalid ones flip one digit.
    val cases = Seq(
      ("4532015112830366", true),
      ("79927398713", true),      // classic Luhn example
      ("4111111111111111", true),
      ("1234567890123456", false),
      ("79927398710", false),
      ("4532015112830367", false),
      ("0", true),                // single zero: sum 0 % 10 == 0
      ("7", false),
      ("", false),
      ("4532a15112830366", false) // non-digit → false
    )
    val rows = cases.map(_._1).toDF("d")
      .select($"d", exprs.luhnCheck($"d").as("v")).collect()
    rows.zip(cases).foreach { case (r, (digits, expected)) =>
      assert(r.getBoolean(1) == expected, s"luhn($digits)")
    }
    val nulls = Seq[Option[String]](None).map(_.orNull).toDF("d")
      .select(exprs.luhnCheck($"d")).collect()
    assert(nulls.head.isNullAt(0), "null in, null out")
  }

  test("spaceEncode: corpus-wide equality with the regex form") {
    val n = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(
        exprs.spaceEncode(coalesce($"text", lit(""))).as("k"),
        regexp_replace(
          regexp_replace(
            regexp_replace(lower(coalesce($"text", lit(""))), "[\\t\\n\\f\\r ]+", "|"),
            "^\\|+|\\|+$", ""),
          "(.)", " $1 ").as("r"))
      .filter($"k" =!= $"r").count()
    assert(n == 0L)
  }

  test("nfcNormalize: null, ASCII identity, composition, idempotence") {
    val rows = Seq(
      null, "", "plain ascii", "Café", "Café",
      "Ångstrom", "Ångstrom", "mixed Café and Å end")
      .toDF("t")
      .select($"t", exprs.nfcNormalize($"t").as("n")).collect()
    assert(rows(0).isNullAt(1), "null in → null out")
    assert(rows(1).getString(1) == "")
    assert(rows(2).getString(1) == "plain ascii")
    assert(rows(3).getString(1) == "Café", "combining acute composes")
    assert(rows(4).getString(1) == "Café", "already-NFC unchanged")
    assert(rows(5).getString(1) == "Ångstrom", "combining ring composes")
    assert(rows(6).getString(1) == "Ångstrom", "ANGSTROM SIGN singleton maps")
    assert(rows(7).getString(1) == "mixed Café and Å end")
    // idempotence: normalizing the normalized column is a no-op
    val again = Seq("Café", "Ångstrom").toDF("t")
      .select(exprs.nfcNormalize(exprs.nfcNormalize($"t")).as("a"),
        exprs.nfcNormalize($"t").as("b"))
      .filter($"a" =!= $"b").count()
    assert(again == 0L)
  }
}
