package graft.pipeline

import graft.C
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: per-stage wall-clock breakdown of the dedup_minhash_lsh
  * pipeline (and friends) so perf work targets the measured hot spot, not
  * the suspected one. Usage:
  *   tools/run.sh graft.pipeline.ProfileTool /root/testdata/sf0.1 [passes]
  * Each stage is materialized with .count() after clearCache so stages
  * aren't charged to each other via the persisted shingle relation.
  */
object ProfileTool {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = graft.GraftSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.Tables

    def time(label: String)(f: => Long): Unit = {
      (1 to passes).foreach { p =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val n = f
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[profile] $label%-42s pass=$p rows=$n%9d  $sec%8.3f s")
      }
    }

    val docs = Tables.documents(spark, sfDir)
    docs.count() // warm page cache

    // stage 1: tokenize + shingle explode + md5 + distinct
    time("1 shingleHashes (explode+md5+distinct)") {
      Dedup.shingleHashes(docs).count()
    }
    // stage 1b: explode only, no distinct
    time("1b shingles explode+md5 (no distinct)") {
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"), explode(
          transform(sequence(lit(1), size(col("toks")) - 2),
            i => concat_ws(" ",
              element_at(col("toks"), i),
              element_at(col("toks"), i + 1),
              element_at(col("toks"), i + 2)))).as("shingle"))
        .select(col("doc_id"), C.md5Long(col("shingle")).as("h0"))
        .count()
    }
    // stage 1c: tokens only
    time("1c tokenize only") {
      docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), size(col("toks")).as("n")).agg(sum("n")).count()
    }

    val sh = Dedup.shingleHashes(docs)

    // stage 2: 16-min signature agg (current expr-based form)
    time("2 signature agg (16 min of expr-mix)") {
      val minAggs = (0 until 16).map { j => min(expr(Dedup.mixExpr(j))).as(s"mh$j") }
      sh.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*).count()
    }
    // stage 2b: precompute mixes as projection columns, then min
    time("2b signature agg (project mixes, then min)") {
      val mixCols = (0 until 16).map(j => expr(Dedup.mixExpr(j)).as(s"x$j"))
      val minAggs = (0 until 16).map(j => min(col(s"x$j")).as(s"mh$j"))
      sh.select(col("doc_id") +: mixCols: _*)
        .groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*).count()
    }

    // stage 3: full pipeline to candidates
    time("3 bands+selfjoin -> cand") {
      val shp = Dedup.shingleHashes(docs).persist()
      val minAggs = (0 until 16).map { j => min(expr(Dedup.mixExpr(j))).as(s"mh$j") }
      val sig = shp.groupBy(col("doc_id")).agg(minAggs.head, minAggs.tail: _*)
      val bandStructs = (0 until 4).map { b =>
        struct(lit(b).as("band"),
          C.md5Long(concat_ws(",",
            (0 until 4).map(r => col(s"mh${b * 4 + r}").cast("string")): _*))
            .as("bucket"))
      }
      val bands = sig
        .select(col("doc_id"), explode(array(bandStructs: _*)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
      val n = bands.as("a")
        .join(bands.as("b"),
          col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
        .count()
      shp.unpersist()
      n
    }

    // stage 4: the whole query as shipped
    time("4 dedupMinhashLsh full") {
      Dedup.dedupMinhashLsh(docs).count()
    }

    // ---- ngram-jaccard pair-stream breakdown (round-16 optimization) ----
    // the exact-jaccard chain's quadratic heart: posting lists → pair
    // explode → intersection counts; 5a..5c isolate the explode strategy
    val shp2 = Dedup.shingleHashes(docs).persist()
    shp2.count()
    val postings = shp2
      .groupBy(col("h0"))
      .agg(sort_array(collect_list(col("doc_id"))).as("docs"))
      .filter(size(col("docs")) >= 2)
      .persist()
    postings.count()
    time("5a pairs via nested transform explode") {
      postings
        .select(explode(flatten(transform(
          sequence(lit(1), size(col("docs")) - 1),
          i => transform(
            sequence(i + 1, size(col("docs"))),
            j => struct(element_at(col("docs"), i).as("doc_a"),
              element_at(col("docs"), j).as("doc_b")))))).as("p"))
        .groupBy(col("p.doc_a"), col("p.doc_b")).agg(count(lit(1)))
        .count()
    }
    time("5b pairs via posexplode x explode-slice") {
      postings
        .select(posexplode(col("docs")).as(Seq("i", "doc_a")), col("docs"))
        .select(col("doc_a"),
          explode(slice(col("docs"), col("i") + 2,
            size(col("docs")))).as("doc_b"))
        .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)))
        .count()
    }
    time("5c pairs via sh self-join on h0") {
      shp2.as("a")
        .join(shp2.as("b"),
          col("a.h0") === col("b.h0") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id")).agg(count(lit(1)))
        .count()
    }
    postings.unpersist(); shp2.unpersist()

    spark.stop()
  }
}
