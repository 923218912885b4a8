package graft.operators

import graft.SparkSpec

/** Semantic check for q24's language-ID heuristic on text that
  * genuinely differs by language (the driver fixture's `lang` labels
  * are arbitrary — its text is the same token soup for every label, so
  * no classifier can recover them; the oracle gate only proves
  * Spark==DuckDB there).
  */
class LangIdSemanticsSpec extends SparkSpec {

  test("function-word marker lang-ID classifies real-language text correctly") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (0L, "the cat is on the roof and the dog is in the house of a friend", "en"),
      (1L, "the quick brown fox jumps over a lazy dog and the day is long", "en"),
      (2L, "el perro y el gato de la casa que es grande y la calle es larga", "es"),
      (3L, "la vida es bella y el sol de la manana que brilla en la ciudad", "es"),
      (4L, "der hund und die katze das haus ist gross und der tag ist lang", "de"),
      (5L, "die sonne und der mond das wetter ist schoen und die nacht ist still", "de"),
      (6L, "le chien et le chat est dans les rues et une maison est grande", "fr"),
      (7L, "les enfants et le soleil est beau dans une ville et les arbres", "fr"),
      (8L, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod", "und"),
    ).map { case (id, text, lang) => (id, text, lang, "synthetic", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_langid")
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val got = graft.SparkEntry.queries("q24_langid")(s, dir.toString)
      .select("doc_id", "labeled_lang", "predicted_lang")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    got.foreach { case (id, (labeled, predicted)) =>
      assert(predicted == labeled, s"doc $id: labeled $labeled, predicted $predicted")
    }
  }
}
