package graft.operators

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** Chunker invariants: coverage (every token lands in ≥1 chunk, the
  * tail is never dropped), overlap (consecutive chunks share exactly
  * `overlap` tokens while the previous chunk is full), offsets
  * (chunk_idx · stride), and reconstruction (stride-prefixes of the
  * chunks concatenate back to the document).
  */
class ChunkerSpec extends SparkSpec {

  import org.apache.spark.sql.Row

  private def oneDoc(text: String, size: Int, overlap: Int) = {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, text)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("doc_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("text",
          org.apache.spark.sql.types.StringType))))
    Chunker.chunk(df, "doc_id", "text", size, overlap)
      .orderBy("chunk_idx").collect()
  }

  test("10 tokens, size 4, overlap 1: starts 0/3/6/9, short tail kept") {
    val toks = (0 until 10).map(i => s"t$i")
    val rows = oneDoc(toks.mkString(" "), 4, 1)
    assert(rows.map(_.getLong(2)).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(rows.map(_.getLong(3)).toSeq == Seq(4L, 4L, 4L, 1L))
    assert(rows.last.getString(4) == "t9", "tail chunk is the last token")
    assert(rows.head.getString(4) == "t0 t1 t2 t3")
  }

  test("exact fit: size dividing token count leaves no stub chunk") {
    // 8 tokens, size 4, overlap 0 → exactly chunks [0,4), [4,8)
    val rows = oneDoc((0 until 8).map("w" + _).mkString(" "), 4, 0)
    assert(rows.length == 2)
    assert(rows.map(_.getLong(3)).toSeq == Seq(4L, 4L))
  }

  test("consecutive chunks overlap by exactly `overlap` tokens") {
    val rows = oneDoc((0 until 50).map("x" + _).mkString(" "), 16, 4)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        val at = a.getString(4).split(" ")
        val bt = b.getString(4).split(" ")
        if (at.length == 16) // only full chunks promise the overlap
          assert(at.takeRight(4).toSeq == bt.take(4).toSeq)
      case _ =>
    }
  }

  test("corpus: coverage is total and offsets are stride multiples") {
    val docs = Tables.documents(spark, sf("sf0.001"))
    val chunks = Chunker.chunk(docs, "doc_id", "text", 64, 16)
    val stats = Chunker.chunkStats(chunks)
    val joined = docs
      .select(col("doc_id"), size(split(lower(col("text")), " ")).as("n_toks"))
      .join(stats, "doc_id")
    // last_token_covered == n_tokens for every doc: nothing truncated
    assert(joined.filter(col("last_token_covered") =!= col("n_toks")).count() == 0)
    assert(chunks.filter(col("first_token_offset") % 48 =!= 0).count() == 0)
    // every doc present (tokens() never yields an empty array on strings)
    assert(stats.count() == docs.count())
  }

  test("stride-prefix reconstruction rebuilds the exact document") {
    val docs = Tables.documents(spark, sf("sf0.001")).limit(50)
    val chunks = Chunker.chunk(docs, "doc_id", "text", 64, 16)
    val lastIdx = chunks.groupBy("doc_id")
      .agg(max("chunk_idx").as("last_idx"))
    val rebuilt = chunks.join(lastIdx, "doc_id")
      .withColumn("piece",
        // all but the final chunk contribute their first `stride`
        // tokens (non-last chunks always hold > stride tokens); the
        // final chunk contributes everything
        when(col("chunk_idx") < col("last_idx"),
          array_join(slice(split(col("chunk_text"), " "), 1, 48), " "))
          .otherwise(col("chunk_text")))
      .groupBy("doc_id")
      // collect in chunk order: sort_array over (idx, piece) structs
      .agg(array_join(transform(
        sort_array(collect_list(struct(col("chunk_idx"), col("piece")))),
        s => s.getField("piece")), " ").as("rebuilt"))
    val diff = docs.select(col("doc_id"), lower(col("text")).as("orig"))
      .join(rebuilt, "doc_id")
      .filter(col("orig") =!= col("rebuilt"))
    assert(diff.count() == 0)
  }

  test("cdcChunks is byte-exact on non-ASCII text (cuts, slices and " +
      "digests all share the UTF-8 byte domain)") {
    // seeded blobs mixing 1-, 2- and 3-byte code points, so character
    // index != byte index almost everywhere — the regression the
    // string-sliced chunker had: boundaries from byte windows, slices
    // from characters
    val rnd = new scala.util.Random(4242)
    val alphabet = "ab €éü東京 ß" // 1B, 2B and 3B UTF-8 units
    val blobs = (1 to 60).map { i =>
      (i.toLong, (1 to (8 + rnd.nextInt(160)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }.filter(_._2.getBytes("UTF-8").length >= 8)
    val df = spark.createDataFrame(blobs).toDF("doc_id", "text")
    val (win, mod) = (8, 16)
    val got = Chunker.cdcChunks(df, "doc_id", "text", win, mod)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    // JVM reference: same hash60 windows over raw bytes, chunks as raw
    // byte slices, md5 over the slice bytes
    def hash60(bytes: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(bytes)
      java.lang.Long.parseLong(
        d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    val want = blobs.map { case (id, text) =>
      val b = text.getBytes("UTF-8")
      val cuts = ((win to b.length).filter { e =>
        hash60(b.slice(e - win, e)) % mod == 0
      } :+ b.length).distinct.sorted
      val md = java.security.MessageDigest.getInstance("MD5")
      id -> cuts.zip(0L +: cuts.map(_.toLong)).map { case (cut, prev) =>
        val slice = b.slice(prev.toInt, cut)
        (cut - prev,
          md.digest(slice).map("%02x".format(_)).mkString)
      }.toSet
    }.toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, chunks) =>
      assert(got(id) == chunks, s"doc $id: byte-domain chunk mismatch")
    }
    // total coverage in BYTES: chunk lengths sum to octet_length
    val cov = Chunker.cdcChunks(df, "doc_id", "text", win, mod)
      .groupBy("doc_id").agg(sum("len").as("bytes"))
      .join(df.select(col("doc_id"),
        octet_length(col("text").cast("binary")).cast("long").as("n")),
        "doc_id")
      .filter(col("bytes") =!= col("n"))
    assert(cov.count() == 0, "chunk lengths must cover every byte")
  }
}
