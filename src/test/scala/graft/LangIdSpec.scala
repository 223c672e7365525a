package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions
import graft.llm.LangIdNb

/** Trainable char-trigram NB language ID: real separation on a genuine
  * multilingual fixture (including accented text where the marker-word
  * heuristic returns "und"), Column-path equivalence, and the ppm
  * contract's partitioning independence. */
class LangIdSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  // three training sentences + one held-out sentence per language,
  // written with each language's typical orthography
  private val train = Seq(
    ("en", "the quick brown fox jumps over the lazy dog near the river"),
    ("en", "she walked through the quiet town while the children played outside"),
    ("en", "a strong wind blew across the fields during the early morning"),
    ("es", "la niña pequeña come una manzana roja en la cocina de su casa"),
    ("es", "los estudiantes escriben cartas largas durante las tardes de verano"),
    ("es", "el viento fuerte sopla sobre las montañas cada mañana del invierno"),
    ("fr", "le garçon français mange une baguette près de la fenêtre ouverte"),
    ("fr", "les enfants jouent dans le jardin pendant que leur mère prépare le dîner"),
    ("fr", "une lumière douce éclaire la vieille église au bord de la rivière"),
    ("de", "der große hund läuft schnell durch den dunklen wald am abend"),
    ("de", "die kinder spielen fröhlich im garten hinter dem alten haus"),
    ("de", "ein starker wind weht über die berge während des kalten winters"))
  private val heldOut = Seq(
    (1L, "en", "a small child reads an old book under the bright morning sun"),
    (2L, "es", "el perro grande duerme tranquilo junto a la puerta del jardín"),
    (3L, "fr", "la jeune fille achète des fleurs au marché chaque dimanche matin"),
    (4L, "de", "die kleine katze springt über den hohen zaun im garten"))

  private def model = LangIdNb.train(
    train.toDF("lang", "text"), "text", "lang", n = 3, nBuckets = 1024)

  test("held-out sentences classify to their true language") {
    val docs = heldOut.toDF("id", "true_lang", "text")
    val pred = LangIdNb.classify(docs, model, "id", "text", n = 3, nBuckets = 1024)
      .select($"id", $"pred_lang").as[(Long, String)].collect().toMap
    heldOut.foreach { case (id, lang, _) =>
      assert(pred(id) == lang, s"doc $id: expected $lang got ${pred(id)}")
    }
  }

  test("NB separates accented text where the marker-word heuristic gives und") {
    // no marker words from TextFunctions.LangMarkers appear; trigram
    // orthography (accents, 'sch', 'ção'-class patterns) must carry it
    val tricky = Seq(
      (1L, "fr", "quelques personnes marchaient lentement vers chez eux"),
      (2L, "de", "mehrere menschen gingen langsam nach hause zurück"))
    val docs = tricky.toDF("id", "true_lang", "text")
    val heur = docs.select($"id", TextFunctions.langId($"text").as("h"))
      .as[(Long, String)].collect().toMap
    assert(heur(1L) == "und" && heur(2L) == "und",
      s"fixture must be marker-free for the contrast to mean anything: $heur")
    val pred = LangIdNb.classify(docs, model, "id", "text", n = 3, nBuckets = 1024)
      .select($"id", $"pred_lang").as[(Long, String)].collect().toMap
    assert(pred(1L) == "fr" && pred(2L) == "de", s"$pred")
  }

  test("langIdColumn literal-model path equals the classify DataFrame path") {
    val collected = model.as[(String, Long, Long)].collect()
    val docs = (heldOut.map { case (i, l, t) => (i, t) } ++
      Seq((10L, "der wind"), (11L, ""), (12L, "xy"))).toDF("id", "text")
    val viaColumn = docs.select($"id",
        LangIdNb.langIdColumn(collected, n = 3, nBuckets = 1024)($"text").as("p"))
      .as[(Long, String)].collect().toMap
    val viaClassify = LangIdNb.classify(docs, model, "id", "text", 3, 1024)
      .select($"id", $"pred_lang").as[(Long, String)].collect().toMap
    assert(viaColumn == viaClassify)
  }

  test("scores are partitioning-independent (ppm contract)") {
    val docs = heldOut.toDF("id", "true_lang", "text")
    def run(nPart: Int) =
      LangIdNb.classify(docs.repartition(nPart), model, "id", "text", 3, 1024)
        .orderBy($"id").as[(Long, String, Long)].collect().toSeq
    assert(run(1) == run(7))
  }

  test("train model shape: sparse weights plus per-lang base and prior rows") {
    val m = model.as[(String, Long, Long)].collect()
    val langs = m.map(_._1).distinct.sorted
    assert(langs.toSeq == Seq("de", "en", "es", "fr"))
    langs.foreach { l =>
      assert(m.count(r => r._1 == l && r._2 == LangIdNb.BaseBucket) == 1)
      assert(m.count(r => r._1 == l && r._2 == LangIdNb.PriorBucket) == 1)
    }
    assert(m.forall { case (_, b, _) => b >= -2 && b < 1024 })
    // equal doc counts → equal priors
    val priors = m.collect { case (_, LangIdNb.PriorBucket, w) => w }.toSet
    assert(priors.size == 1)
  }
}
